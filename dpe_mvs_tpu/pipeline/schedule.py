"""Coarse-to-fine pipeline driver (``RunDPEPipeline``, main.cpp:474-600).

Schedule per resolution round i (scale = 2^(rounds-1-i)):
  pass A  — photometric: FIRST_INIT (round 0) or REFINE_INIT;
  pass B  — 3x geometric-consistency REFINE_ITER sweeps.

Like the reference, all inter-sweep state lives on disk under
``<dense>/DPE/<%08d>/`` (depths.dmb / normals.dmb / weak.bin /
selected_views.bin), which makes every sweep resumable (SURVEY.md §5
"checkpoint/resume"); unlike the reference, the per-scale edge maps and the
compiled sweep are cached in memory across problems too.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import jax
import numpy as np

from .. import config
from ..config import EngineConfig, PatchMatchParams, PixelState, RunState
from ..edges import dual_level
from ..engine import state as state_mod
from ..engine.sweep import run_sweep
from ..io import formats, scene

# AOT-compiled sweep executables keyed by (shape signature, params). Explicit
# ahead-of-time compilation keeps one executable per (scene-size, schedule
# variant) and avoids re-dispatch overhead in the per-problem loop.
_COMPILED_SWEEPS: Dict = {}

# Host-side rectification data keyed by (scene, view, size): the epipolar
# frames depend only on cameras and image size, so one build serves every
# pass of a round.
_RECT_HOSTS: Dict = {}

# Per-(scene, scale) common rect frame (see round_rect_frame).
_ROUND_FRAMES: Dict = {}


def use_rect_engine(cfg: EngineConfig) -> bool:
    """Pick the cost engine: the rectified row-local Pallas engine is the
    TPU path (XLA TPU serializes 2-D gathers — BASELINE.md), the XLA-gather
    engine the CPU path. ``cfg.use_rect`` forces either."""
    if cfg.use_rect is not None:
        return cfg.use_rect
    return jax.default_backend() not in ("cpu",)


def _rect_host(problem: scene.Problem, inputs, v_pad: int,
               rect_frame=None):
    from ..engine import rectcost

    key = (str(problem.dense_folder), problem.ref_image_id,
           inputs.width, inputs.height, v_pad, rect_frame)
    rh = _RECT_HOSTS.get(key)
    if rh is None:
        rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                      inputs.height, v_pad,
                                      force_size=rect_frame,
                                      stacked=rect_frame is not None)
        _RECT_HOSTS[key] = rh
    return rh


def round_rect_frame(problems: List[scene.Problem], scale_size: int,
                     v_pad: int):
    """Common (wp, hp) rect frame for every problem of a round, from camera
    algebra alone (no image IO). With a shared frame + stacked statics, ONE
    compiled stage set serves all problems — per-problem transpose statics
    otherwise force a full recompile per problem (minutes each on the
    remote TPU compile service).

    Precondition: every image in the scene shares problems[0]'s dimensions
    — both pipeline runners enforce this via scene.check_images (the
    reference's CheckImages, main.cpp:310-329) before any frame is derived;
    the scaled size below is computed from problems[0] alone."""
    from ..geometry import rectify

    key = (str(problems[0].dense_folder), scale_size, v_pad)
    fr = _ROUND_FRAMES.get(key)
    if fr is not None:
        return fr
    img0 = scene.load_image_gray(problems[0].dense_folder,
                                 problems[0].ref_image_id)
    H0, W0 = img0.shape
    new_cols, new_rows = scene.scaled_size(W0, H0, scale_size)
    sx, sy = new_cols / W0, new_rows / H0
    wp = hp = 0
    for p in problems:
        ids = [p.ref_image_id] + list(p.src_image_ids)[:v_pad]
        cams = [scene.load_camera(p.dense_folder, i).scaled(
            sx, sy, new_cols, new_rows) for i in ids]
        ref = cams[0]
        for src in cams[1:]:
            pair = rectify.build_rect_pair(
                ref.K, ref.R, ref.t, src.K, src.R, src.t,
                new_cols, new_rows, max_scale=1.6)
            wp = max(wp, pair.width)
            hp = max(hp, pair.height)
    _ROUND_FRAMES[key] = (wp, hp)
    return wp, hp


def _compiled_sweep(data, st, params, verbose=False):
    import jax

    key = (jax.tree.map(lambda x: (x.shape, str(x.dtype)), (data, st)), params)
    key = str(key)
    fn = _COMPILED_SWEEPS.get(key)
    if fn is None:
        t0 = time.time()
        fn = jax.jit(run_sweep, static_argnames=("params",)).lower(
            data, st, params).compile()
        if verbose:
            print(f"  [compile] sweep variant in {time.time() - t0:.1f}s")
        _COMPILED_SWEEPS[key] = fn
    return fn


def compute_round_num(problems: List[scene.Problem], cfg: EngineConfig) -> int:
    img = scene.load_image_gray(problems[0].dense_folder,
                                problems[0].ref_image_id)
    return config.compute_round_num(img.shape[1], img.shape[0], cfg)


def get_problem_edges(problem: scene.Problem, scale_size: int,
                      params: PatchMatchParams) -> None:
    """Compute + cache per-scale edge/label maps (``GetProblemEdges``,
    main.cpp:331-388)."""
    scale = 0
    while (1 << scale) < scale_size:
        scale += 1
    rf = problem.result_folder
    img = scene.load_image_gray(problem.dense_folder, problem.ref_image_id)

    edge_path = rf / f"edges_{scale}.dmb"
    if not edge_path.exists():
        new_cols, new_rows = scene.scaled_size(img.shape[1], img.shape[0],
                                               scale_size)
        scaled = scene.resize_linear(img, new_cols, new_rows).astype(np.uint8)
        edge = dual_level.fine_edges(scaled, params.high_res_img)
        formats.write_dmb(edge_path, edge)
        if problem.show_medium_result:
            cv2.imwrite(str(rf / f"rawedge_{scale}.jpg"), edge)

    label_path = rf / f"labels_{scale}.dmb"
    if not label_path.exists():
        label = dual_level.coarse_labels(img.astype(np.uint8), scale,
                                         params.high_res_img)
        formats.write_dmb(label_path, label)
        if problem.show_medium_result:
            # Colorized connected regions (``connect_<s>.jpg``, main.cpp:382).
            rng = np.random.default_rng(0)
            colors = rng.integers(0, 256, (label.max() + 2, 3), np.uint8)
            colors[0] = 0
            img_connect = colors[np.maximum(label, 0)]
            img_connect[label < 0] = 0
            cv2.imwrite(str(rf / f"connect_{scale}.jpg"), img_connect)


def load_support_maps(problem: scene.Problem, scale_size: int, max_scale: int,
                      params: PatchMatchParams, width: int, height: int):
    """Read cached edge/label maps for the current round
    (``SupportInitialization``, DPE.cpp:1025-1052)."""
    scale = 0
    while (1 << scale) < scale_size:
        scale += 1
    rf = problem.result_folder
    edge = formats.read_dmb(rf / f"edges_{scale}.dmb") > 0
    low_scale = max_scale if params.high_res_img else scale
    edge_low = formats.read_dmb(rf / f"edges_{low_scale}.dmb") > 0
    label = formats.read_dmb(rf / f"labels_{scale}.dmb").astype(np.int32)
    if edge.shape != (height, width):
        edge = scene.rescale_nearest(edge, width, height)
    if label.shape != (height, width):
        label = scene.rescale_nearest(label, width, height)
    return edge, edge_low, label


def process_problem(problem: scene.Problem, params: PatchMatchParams,
                    scale_size: int, max_scale: int, v_pad: int,
                    cfg: EngineConfig, verbose: bool = False,
                    inputs: "Optional[scene.ProblemInputs]" = None,
                    timer=None, rect_frame=None) -> None:
    """One sweep over one problem (``ProcessProblem``, main.cpp:411-472).

    ``inputs`` may be supplied pre-loaded (the scheduler prefetches the next
    problem's images while the device sweeps the current one)."""
    from ..utils.profiling import GLOBAL_TIMER
    timer = timer if timer is not None else GLOBAL_TIMER
    t0 = time.time()
    with timer.span("load"):
        if inputs is None:
            inputs = scene.load_problem_inputs(
                problem, scale_size,
                need_prior=params.state != RunState.FIRST_INIT,
                need_weak=params.use_APD,
                need_src_depths=params.geom_consistency,
            )
        edge, edge_low, label = load_support_maps(
            problem, scale_size, max_scale, params, inputs.width,
            inputs.height)
        data = state_mod.build_sweep_data(inputs, v_pad, edge, edge_low,
                                          label)
        key = jax.random.key(
            cfg.seed + problem.ref_image_id * 1000 + problem.iteration)
        st = state_mod.init_pm_state(inputs, v_pad, key, params.use_APD)

    rstat = None
    if use_rect_engine(cfg):
        from ..engine import rectcost

        with timer.span("rectify"):
            rh = _rect_host(problem, inputs, v_pad, rect_frame=rect_frame)
            src_d = (inputs.src_depths[1:]
                     if params.geom_consistency and
                     inputs.src_depths is not None
                     else None)
            rviews = rectcost.build_rect_views(rh, inputs.images, src_d,
                                               cameras=inputs.cameras)
            data = data._replace(rect=rviews)
            rstat = rh.statics

    # Failure handling (SURVEY.md §5: the reference exits on any CUDA error;
    # here transient device/tunnel failures are retried with backoff).
    from ..utils.retry import with_retry

    def _do_sweep():
        with timer.span("sweep"):
            if rstat is not None:
                from ..engine.stages import run_sweep_staged
                out = run_sweep_staged(data, st, params, rstat=rstat)
            else:
                out = _compiled_sweep(data, st, params, verbose)(data, st)
            jax.block_until_ready(out.plane)
        return out

    st = with_retry(_do_sweep)

    with timer.span("writeback"):
        plane = np.asarray(st.plane)
        depth = plane[..., 3].copy()
        normal = plane[..., :3].copy()
        weak = np.asarray(st.weak).copy()
        out_of_range = (depth < inputs.depth_min) | \
            (depth > inputs.depth_max) | ~np.isfinite(depth)
        depth[out_of_range] = 0.0
        weak[out_of_range] = int(PixelState.UNKNOWN)

        rf = problem.result_folder
        formats.write_dmb(rf / "depths.dmb", depth.astype(np.float32))
        formats.write_dmb(rf / "normals.dmb", normal.astype(np.float32))
        formats.write_dmb(rf / "weak.bin", weak.astype(np.uint8))
        formats.write_dmb(rf / "selected_views.bin",
                          np.asarray(st.selected).astype(np.int32))

    if problem.show_medium_result:
        from ..utils import viz
        it = problem.iteration
        viz.save_depth_map(rf / f"depth_{it}.jpg", depth,
                           inputs.depth_min, inputs.depth_max)
        viz.save_normal_map(rf / f"normal_{it}.jpg", normal)
        viz.save_weak_map(rf / f"weak_{it}.jpg", weak)
    if verbose:
        print(f"  image {problem.ref_image_id:08d} iter {problem.iteration} "
              f"({inputs.width}x{inputs.height}) done in "
              f"{time.time() - t0:.2f}s")


def export_npy(problem: scene.Problem, *, depth: bool, normal: bool,
               weak: bool, edge: bool) -> None:
    """Final .npy exports (main.cpp:99-260)."""
    rf = problem.result_folder
    if depth:
        d = formats.read_dmb(rf / "depths.dmb").astype(np.float32)
        w = formats.read_dmb(rf / "weak.bin")
        d[w == int(PixelState.UNKNOWN)] = 0.0
        np.save(rf / "depth.npy", d)
    if normal:
        n = formats.read_dmb(rf / "normals.dmb").astype(np.float32)
        np.save(rf / "normal.npy", n)
    if weak:
        w = formats.read_dmb(rf / "weak.bin")
        enc = np.zeros(w.shape, np.int8)
        enc[w == int(PixelState.WEAK)] = 1
        enc[w == int(PixelState.STRONG)] = 2
        np.save(rf / "weak.npy", enc)
    if edge:
        for idx in range(8):
            p = rf / f"edges_{idx}.dmb"
            if p.exists():
                e = (formats.read_dmb(p) > 0).astype(np.int8)
                np.save(rf / "edge.npy", e)
                break


def cleanup_intermediates(problems: List[scene.Problem], round_num: int) -> None:
    """Delete intermediate state files (main.cpp:581-595)."""
    if problems:
        _progress_path(problems[0].dense_folder).unlink(missing_ok=True)
    for p in problems:
        rf = p.result_folder
        for name in ("weak.bin", "depths.dmb", "normals.dmb",
                     "selected_views.bin"):
            (rf / name).unlink(missing_ok=True)
        for j in range(round_num):
            (rf / f"edges_{j}.dmb").unlink(missing_ok=True)
            (rf / f"labels_{j}.dmb").unlink(missing_ok=True)


def _progress_path(dense_folder: Path) -> Path:
    return dense_folder / "DPE" / "progress.json"


def _load_progress(dense_folder: Path) -> int:
    """Last fully-completed iteration index, or -1 (checkpoint/resume:
    SURVEY.md §5 — the reference resumes only by accident of its disk
    layout; here it is explicit)."""
    import json
    p = _progress_path(dense_folder)
    if p.exists():
        try:
            return int(json.loads(p.read_text()).get("iteration", -1))
        except Exception:
            return -1
    return -1


def _save_progress(dense_folder: Path, iteration: int) -> None:
    import json
    _progress_path(dense_folder).write_text(
        json.dumps({"iteration": iteration}))


def run_pipeline(
    dense_folder,
    *,
    verbose: bool = True,
    fusion: bool = False,
    viz: bool = False,
    depth: bool = True,
    normal: bool = False,
    weak: bool = False,
    edge: bool = False,
    cfg: Optional[EngineConfig] = None,
    keep_intermediates: bool = False,
    resume: bool = False,
) -> int:
    """Full pipeline (``RunDPEPipeline``, main.cpp:474-600). Returns 0 on
    success. With ``resume=True``, previously completed iterations (tracked
    in DPE/progress.json, state in the per-view .dmb checkpoints) are
    skipped."""
    cfg = cfg or EngineConfig()
    dense_folder = Path(dense_folder)
    (dense_folder / "DPE").mkdir(parents=True, exist_ok=True)

    problems = scene.generate_sample_list(dense_folder, viz)
    if not scene.check_images(problems):
        print("Images may error, check it!")
        return 1
    if verbose:
        print(f"There are {len(problems)} images to be processed!")

    round_num = compute_round_num(problems, cfg)
    base = cfg.profile.apply(PatchMatchParams())
    v_pad = max(min(len(p.src_image_ids), cfg.max_images - 1)
                for p in problems)
    v_pad = max(v_pad, 1)

    # Precompute edges for every scale (main.cpp:494-501).
    max_scale_size = 1
    for i in range(round_num):
        scale_size = 2 ** (round_num - 1 - i)
        max_scale_size = max(max_scale_size, scale_size)
        for p in problems:
            get_problem_edges(p, scale_size, base)
    max_scale = 0
    while (1 << max_scale) < max_scale_size:
        max_scale += 1

    if verbose:
        print(f"There are {round_num} resolution stages, "
              f"{round_num * 4} iterations")

    done_iter = _load_progress(dense_folder) if resume else -1
    iteration = 0
    for i in range(round_num):
        scale_size = 2 ** (round_num - 1 - i)
        # One stacked rect frame per round: all problems share one compiled
        # stage set instead of paying per-problem transpose-static variants.
        rect_frame = (round_rect_frame(problems, scale_size, v_pad)
                      if use_rect_engine(cfg) and len(problems) > 1
                      else None)
        for j in [None, 0, 1, 2]:
            params = config.schedule_params(base, i, j)
            if iteration > done_iter:
                # Prefetch the next problem's inputs (jpg decode + resize)
                # while the device sweeps the current one — the host-side
                # data loader runs one problem ahead.
                import concurrent.futures as cf

                def load(p):
                    return scene.load_problem_inputs(
                        p, scale_size,
                        need_prior=params.state != RunState.FIRST_INIT,
                        need_weak=params.use_APD,
                        need_src_depths=params.geom_consistency)

                with cf.ThreadPoolExecutor(max_workers=1) as pool:
                    fut = pool.submit(load, problems[0])
                    for idx, p in enumerate(problems):
                        inputs = fut.result()
                        if idx + 1 < len(problems):
                            fut = pool.submit(load, problems[idx + 1])
                        p.iteration = iteration
                        process_problem(p, params, scale_size, max_scale,
                                        v_pad, cfg, verbose, inputs=inputs,
                                        rect_frame=rect_frame)
                _save_progress(dense_folder, iteration)
                if verbose:
                    print(f"Iteration {iteration + 1} / {round_num * 4} done")
            elif verbose:
                print(f"Iteration {iteration + 1} / {round_num * 4} "
                      "resumed from checkpoint")
            iteration += 1
        # Round boundary: this scale's rect hosts (O(views x H x W) f32 warp
        # fields per problem) and compiled variants are never used again —
        # evict so host memory stays bounded across a multi-round run.
        _RECT_HOSTS.clear()
        _COMPILED_SWEEPS.clear()
        _ROUND_FRAMES.clear()

    for p in problems:
        export_npy(p, depth=depth, normal=normal, weak=weak, edge=edge)

    if fusion:
        from . import fusion as fusion_mod
        fusion_mod.run_fusion(dense_folder, problems, verbose=verbose)

    if not keep_intermediates:
        cleanup_intermediates(problems, round_num)
    if verbose:
        from ..utils.profiling import GLOBAL_TIMER
        if GLOBAL_TIMER.totals:
            print("Per-stage wall clock:\n" + GLOBAL_TIMER.summary())
        print("All done")
    return 0
