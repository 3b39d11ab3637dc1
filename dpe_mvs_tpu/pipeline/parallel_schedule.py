"""Mesh-parallel pipeline execution: device-resident view-sharded rounds.

Replaces the reference's sequential ``for problem: ProcessProblem`` loop
(main.cpp:508-567) with data-parallel execution: all problems are stacked
(padded to the device count, padding masked), sharded over the mesh, and kept
**device-resident across the four passes of a resolution round**. The
geometric-consistency passes read source-view depths through the
``parallel.mesh.exchange_depths`` all-gather over ICI — the in-memory
replacement for the reference's ``depths.dmb`` disk round-trip
(DPE.cpp:826-844). State only returns to the host at round boundaries
(for the cross-round rescale, which the reference also does host-side).

Cross-view semantics: the reference is accidentally Gauss-Seidel (each
problem reads whatever mix of old/new depth maps is on disk); the parallel
executor is deterministically Jacobi — every sweep of pass k reads pass k-1
depths, the natural semantics of a collective with a barrier (SURVEY.md
§2.3).
"""
from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .. import config
from ..config import EngineConfig, PatchMatchParams, PixelState, RunState
from ..io import formats, scene
from ..utils.profiling import StageTimer
from . import schedule as seq

UNKNOWN = int(PixelState.UNKNOWN)
STRONG = int(PixelState.STRONG)


@functools.lru_cache(maxsize=None)
def _reinit_exec(use_weak: bool):
    """Jitted between-pass state reset: sanitize depths (out-of-range -> 0,
    weak -> UNKNOWN, as process_problem does host-side, main.cpp:423-437) and
    rebuild the transient fields the way ``init_pm_state`` would."""
    import jax
    import jax.numpy as jnp
    from ..engine.state import PMState

    def reinit(state: PMState, depth_min, depth_max, keys) -> PMState:
        depth = state.plane[..., 3]
        lo = depth_min[:, None, None]
        hi = depth_max[:, None, None]
        bad = (depth < lo) | (depth > hi) | ~jnp.isfinite(depth)
        plane = state.plane.at[..., 3].set(jnp.where(bad, 0.0, depth))
        weak = jnp.where(bad, jnp.uint8(UNKNOWN), state.weak)
        if not use_weak:
            weak = jnp.full_like(weak, STRONG)
        return PMState(
            plane=plane,
            cost=jnp.full_like(state.cost, 2.0),
            selected=state.selected,
            view_weight=jnp.zeros_like(state.view_weight),
            weak=weak,
            key=keys,
        )

    # No donation: donating ran ~10x slower on the axon backend
    # (see engine/stages.py).
    return jax.jit(reinit)


class ParallelRunner:
    def __init__(self, mesh, problems: List[scene.Problem], v_pad: int,
                 cfg: EngineConfig, timer: Optional[StageTimer] = None):
        self.mesh = mesh
        self.n_dev = len(mesh.devices.flat)
        self.problems = problems
        self.v_pad = v_pad
        self.cfg = cfg
        self.timer = timer or StageTimer()
        # Padded problem count: the SPMD batch must divide the mesh; padding
        # slots replicate problem 0's inputs and are masked out of writeback
        # and the exchange index (nothing reads their results).
        self.n_pad = max(
            ((len(problems) + self.n_dev - 1) // self.n_dev) * self.n_dev,
            self.n_dev)
        self.valid = np.arange(self.n_pad) < len(problems)
        ids = [p.ref_image_id for p in problems]
        self.src_index = np.full((self.n_pad, v_pad), -1, np.int32)
        from ..parallel import mesh as mesh_mod
        self.src_index[:len(problems)] = mesh_mod.build_src_index(
            ids, [list(p.src_image_ids) for p in problems], v_pad)
        self.rstat = None            # stacked RectStatics when rect engine on
        # Host-side global state per problem (the cross-round checkpoint).
        self.depth: Dict[int, np.ndarray] = {}
        self.normal: Dict[int, np.ndarray] = {}
        self.weak: Dict[int, np.ndarray] = {}
        self.selected: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------
    # Host <-> device boundary (round edges)
    # ------------------------------------------------------------------

    def _load_round(self, params_a: PatchMatchParams, scale_size: int,
                    max_scale: int):
        """Load every problem's inputs at this round's scale and stack them,
        with priors/weak resampled from the previous round's host state.
        Done ONCE per round (the reference re-reads everything per pass)."""
        import jax
        from ..engine import state as st_mod
        from ..parallel import mesh as mesh_mod

        datas, states, inputs_list = [], [], []
        for b in range(self.n_pad):
            p = self.problems[b] if self.valid[b] else self.problems[0]
            inputs = scene.load_problem_inputs(
                p, scale_size, need_prior=False, need_weak=False,
                need_src_depths=False)
            H, W = inputs.height, inputs.width
            if params_a.state != RunState.FIRST_INIT and \
                    p.ref_image_id in self.depth:
                inputs.prior_depth = scene.rescale_nearest(
                    self.depth[p.ref_image_id], W, H)
                inputs.prior_normal = scene.rescale_nearest(
                    self.normal[p.ref_image_id], W, H)
                inputs.prior_selected_views = scene.rescale_nearest(
                    self.selected[p.ref_image_id], W, H)
            if params_a.use_APD and p.ref_image_id in self.weak:
                inputs.weak_info = scene.rescale_nearest(
                    self.weak[p.ref_image_id], W, H)
            edge, edge_low, label = seq.load_support_maps(
                p, scale_size, max_scale, params_a, W, H)
            inputs_list.append(inputs)
            datas.append(st_mod.build_sweep_data(
                inputs, self.v_pad, edge, edge_low, label))
            key = jax.random.key(self.cfg.seed + p.ref_image_id * 1000)
            states.append(st_mod.init_pm_state(
                inputs, self.v_pad, key, params_a.use_APD))

        self.rstat = None
        if seq.use_rect_engine(self.cfg):
            datas = self._attach_rect(datas, inputs_list)
        data = mesh_mod.shard_put(self.mesh, mesh_mod.stack_pytrees(datas))
        state = mesh_mod.shard_put(self.mesh, mesh_mod.stack_pytrees(states))
        return data, state

    def _attach_rect(self, datas, inputs_list):
        """Build per-problem rectification in stacked mode: a common rect
        frame size across all problems + runtime warp-transpose flags, so
        every RectView pytree stacks under the one sharded executable
        (engine/rectcost.py stacked mode)."""
        from ..engine import rectcost

        nat = []
        for inputs in inputs_list:
            rh0 = rectcost.build_rect_host(
                inputs.cameras, inputs.width, inputs.height, self.v_pad)
            nat.append((rh0.statics.wp, rh0.statics.hp))
        wp = max(w for w, _ in nat)
        hp = max(h for _, h in nat)
        out = []
        for inputs, data in zip(inputs_list, datas):
            rh = rectcost.build_rect_host(
                inputs.cameras, inputs.width, inputs.height, self.v_pad,
                force_size=(wp, hp), stacked=True)
            rv = rectcost.build_rect_views(rh, inputs.images, None,
                                           cameras=inputs.cameras)
            out.append(data._replace(rect=rv))
            self.rstat = rh.statics
        return out

    def _writeback(self, data, state) -> None:
        """Pull the round's final state to the host dicts (sanitized the way
        process_problem sanitizes before writing .dmb files)."""
        planes = np.asarray(state.plane)
        weaks = np.asarray(state.weak)
        sels = np.asarray(state.selected)
        dmin = np.asarray(data.depth_min)
        dmax = np.asarray(data.depth_max)
        for b, p in enumerate(self.problems):
            depth = planes[b, ..., 3].copy()
            normal = planes[b, ..., :3].copy()
            weak = weaks[b].copy()
            bad = (depth < dmin[b]) | (depth > dmax[b]) | ~np.isfinite(depth)
            depth[bad] = 0.0
            weak[bad] = UNKNOWN
            self.depth[p.ref_image_id] = depth.astype(np.float32)
            self.normal[p.ref_image_id] = normal.astype(np.float32)
            self.weak[p.ref_image_id] = weak.astype(np.uint8)
            self.selected[p.ref_image_id] = sels[b].astype(np.int32)

    # ------------------------------------------------------------------
    # One resolution round, device-resident
    # ------------------------------------------------------------------

    def run_round(self, round_idx: int, scale_size: int, max_scale: int,
                  base: PatchMatchParams, verbose: bool = False) -> None:
        import jax
        import jax.numpy as jnp
        from ..parallel import mesh as mesh_mod

        params_a = config.schedule_params(base, round_idx, None)
        with self.timer.span("load"):
            data, state = self._load_round(params_a, scale_size, max_scale)
        src_index = self.src_index            # host pair graph (NumPy)
        ref_ids = jnp.asarray(
            [self.problems[b].ref_image_id if self.valid[b] else 1_000_000 + b
             for b in range(self.n_pad)], jnp.uint32)
        base_key = jax.random.key(self.cfg.seed)

        for j in [None, 0, 1, 2]:
            params = config.schedule_params(base, round_idx, j)
            t0 = time.time()
            if j is not None:
                # Between-pass state reset + in-ICI depth exchange. The
                # exchange reads the *sanitized* previous pass's depths
                # (the reference reads the sanitized .dmb files).
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(base_key, i))(
                        ref_ids * 1000 + (4 * round_idx + j + 1))
                with self.timer.span("reinit"):
                    state = _reinit_exec(params.use_APD)(
                        state, data.depth_min, data.depth_max, keys)
                with self.timer.span("exchange"):
                    src = mesh_mod.exchange_depths(
                        self.mesh, state.plane[..., 3], src_index)
                data = data._replace(src_depths=src)
            # Transient-fault retry (parity with the sequential runner's
            # with_retry — one axon hiccup must not kill a pod round). The
            # sharded executables do not donate their inputs, so the
            # pre-sweep state stays valid for a retry.
            from ..utils.retry import with_retry

            def _do_sweep(data=data, state=state, params=params):
                with self.timer.span("sweep"):
                    if self.rstat is not None:
                        out = mesh_mod.sharded_sweep_staged(
                            self.mesh, data, state, params,
                            rstat=self.rstat)
                    else:
                        out = mesh_mod.sharded_sweep(self.mesh, data, state,
                                                     params)
                    jax.block_until_ready(out.plane)
                return out

            state = with_retry(_do_sweep)
            if verbose:
                dt = time.time() - t0
                n = len(self.problems)
                print(f"  round {round_idx} pass "
                      f"{'A' if j is None else f'B{j}'}: {n} problems in "
                      f"{dt:.2f}s ({n / max(dt, 1e-9):.2f} dm/s)")

        with self.timer.span("writeback"):
            self._writeback(data, state)

    def flush_to_disk(self) -> None:
        """Write the reference's per-view checkpoint files."""
        for p in self.problems:
            rf = p.result_folder
            formats.write_dmb(rf / "depths.dmb", self.depth[p.ref_image_id])
            formats.write_dmb(rf / "normals.dmb", self.normal[p.ref_image_id])
            formats.write_dmb(rf / "weak.bin", self.weak[p.ref_image_id])
            formats.write_dmb(rf / "selected_views.bin",
                              self.selected[p.ref_image_id])

    def load_from_disk(self) -> bool:
        """Reload the host round state from the checkpoint files (resume).
        Returns False if any file is missing."""
        for p in self.problems:
            rf = p.result_folder
            try:
                self.depth[p.ref_image_id] = formats.read_dmb(
                    rf / "depths.dmb").astype(np.float32)
                self.normal[p.ref_image_id] = formats.read_dmb(
                    rf / "normals.dmb").astype(np.float32)
                self.weak[p.ref_image_id] = formats.read_dmb(
                    rf / "weak.bin").astype(np.uint8)
                self.selected[p.ref_image_id] = formats.read_dmb(
                    rf / "selected_views.bin").astype(np.int32)
            except Exception:
                return False
        return True


def run_pipeline_parallel(
    dense_folder,
    *,
    mesh=None,
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
    """Mesh-parallel variant of ``run_pipeline``. Identical outputs.

    ``resume=True`` resumes at *round* granularity: each completed round is
    checkpointed to the reference's .dmb files plus DPE/progress.json
    (iteration = 4*(round+1) - 1), and completed rounds are skipped by
    reloading that state (SURVEY.md §5 checkpoint/resume)."""
    from ..parallel import mesh as mesh_mod

    cfg = cfg or EngineConfig()
    dense_folder = Path(dense_folder)
    (dense_folder / "DPE").mkdir(parents=True, exist_ok=True)
    problems = scene.generate_sample_list(dense_folder, viz)
    if not scene.check_images(problems):
        print("Images may error, check it!")
        return 1
    mesh = mesh if mesh is not None else mesh_mod.make_mesh()
    round_num = seq.compute_round_num(problems, cfg)
    base = cfg.profile.apply(PatchMatchParams())
    v_pad = max(max(min(len(p.src_image_ids), cfg.max_images - 1)
                    for p in problems), 1)

    max_scale_size = 1
    for i in range(round_num):
        scale_size = 2 ** (round_num - 1 - i)
        max_scale_size = max(max_scale_size, scale_size)
        for p in problems:
            seq.get_problem_edges(p, scale_size, base)
    max_scale = 0
    while (1 << max_scale) < max_scale_size:
        max_scale += 1

    timer = StageTimer()
    runner = ParallelRunner(mesh, problems, v_pad, cfg, timer)
    if verbose:
        print(f"{len(problems)} problems over {runner.n_dev} devices "
              f"(batch {runner.n_pad}), {round_num} rounds")

    done_iter = seq._load_progress(dense_folder) if resume else -1
    done_rounds = (done_iter + 1) // 4
    if done_rounds > 0 and not runner.load_from_disk():
        done_rounds = 0

    for i in range(round_num):
        scale_size = 2 ** (round_num - 1 - i)
        if i < done_rounds:
            if verbose:
                print(f"Round {i + 1} / {round_num} resumed from checkpoint")
            continue
        runner.run_round(i, scale_size, max_scale, base, verbose)
        runner.flush_to_disk()
        seq._save_progress(dense_folder, 4 * (i + 1) - 1)
        if verbose:
            print(f"Round {i + 1} / {round_num} done")
    for p in problems:
        seq.export_npy(p, depth=depth, normal=normal, weak=weak, edge=edge)
    if fusion:
        from . import fusion as fusion_mod
        fusion_mod.run_fusion(dense_folder, problems, verbose=verbose)
    if not keep_intermediates:
        seq.cleanup_intermediates(problems, round_num)
    if verbose:
        print("Per-stage wall clock:\n" + timer.summary())
        print("All done")
    return 0
