"""Mesh-parallel pipeline execution: waves of view-sharded sweeps.

Replaces the reference's sequential ``for problem: ProcessProblem`` loop
(main.cpp:508-567) with data-parallel waves: each wave stacks one problem per
device, runs the sharded sweep (parallel.mesh.sharded_sweep), and feeds the
geometric-consistency passes from an in-memory global depth stack instead of
the reference's ``depths.dmb`` disk round-trip (DPE.cpp:826-844).

Cross-view semantics: the reference is accidentally Gauss-Seidel (each
problem reads whatever mix of old/new depth maps is on disk); the parallel
executor is deterministically Jacobi — every sweep of iteration k reads
iteration k-1 depths, which is the natural semantics of the all-gather
exchange on a pod (SURVEY.md §2.3). On fully device-resident pods the
``parallel.mesh.exchange_depths`` collective replaces the host staging used
here.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .. import config
from ..config import EngineConfig, PatchMatchParams, PixelState, RunState
from ..io import formats, scene
from . import schedule as seq


class ParallelRunner:
    def __init__(self, mesh, problems: List[scene.Problem], v_pad: int,
                 cfg: EngineConfig):
        import jax
        self.mesh = mesh
        self.n_dev = len(mesh.devices.flat)
        self.problems = problems
        self.v_pad = v_pad
        self.cfg = cfg
        # Host-side global state per problem (the "checkpoint" store).
        self.depth: Dict[int, np.ndarray] = {}
        self.normal: Dict[int, np.ndarray] = {}
        self.weak: Dict[int, np.ndarray] = {}
        self.selected: Dict[int, np.ndarray] = {}

    def _load_inputs(self, p: scene.Problem, params: PatchMatchParams,
                     scale_size: int) -> scene.ProblemInputs:
        inputs = scene.load_problem_inputs(
            p, scale_size, need_prior=False, need_weak=False,
            need_src_depths=False)
        H, W = inputs.height, inputs.width
        if params.state != RunState.FIRST_INIT and p.ref_image_id in self.depth:
            inputs.prior_depth = scene.rescale_nearest(
                self.depth[p.ref_image_id], W, H)
            inputs.prior_normal = scene.rescale_nearest(
                self.normal[p.ref_image_id], W, H)
            inputs.prior_selected_views = scene.rescale_nearest(
                self.selected[p.ref_image_id], W, H)
        if params.use_APD and p.ref_image_id in self.weak:
            inputs.weak_info = scene.rescale_nearest(
                self.weak[p.ref_image_id], W, H)
        if params.geom_consistency:
            # In-memory depth exchange (previous iteration, Jacobi).
            ids = [p.ref_image_id] + list(p.src_image_ids)
            stack = []
            for iid in ids:
                d = self.depth.get(iid)
                if d is None:
                    d = np.zeros((H, W), np.float32)
                stack.append(scene.rescale_nearest(d, W, H))
            inputs.src_depths = np.stack(stack)
        return inputs

    def run_iteration(self, params: PatchMatchParams, scale_size: int,
                      max_scale: int, iteration: int,
                      verbose: bool = False) -> None:
        import jax
        from ..engine import state as st_mod
        from ..parallel import mesh as mesh_mod

        n = len(self.problems)
        for w0 in range(0, n, self.n_dev):
            wave = [self.problems[min(w0 + i, n - 1)]
                    for i in range(self.n_dev)]
            real = [w0 + i < n for i in range(self.n_dev)]
            t0 = time.time()
            datas, states = [], []
            for b, p in enumerate(wave):
                inputs = self._load_inputs(p, params, scale_size)
                edge, edge_low, label = seq.load_support_maps(
                    p, scale_size, max_scale, params, inputs.width,
                    inputs.height)
                datas.append(st_mod.build_sweep_data(
                    inputs, self.v_pad, edge, edge_low, label))
                key = jax.random.key(
                    self.cfg.seed + p.ref_image_id * 1000 + iteration)
                states.append(st_mod.init_pm_state(
                    inputs, self.v_pad, key, params.use_APD))
                self._last_inputs = inputs
            stacked_d = mesh_mod.stack_pytrees(datas)
            stacked_s = mesh_mod.stack_pytrees(states)
            out = mesh_mod.sharded_sweep(self.mesh, stacked_d, stacked_s,
                                         params)
            planes = np.asarray(out.plane)
            weaks = np.asarray(out.weak)
            sels = np.asarray(out.selected)
            for b, p in enumerate(wave):
                if not real[b]:
                    continue
                depth = planes[b, ..., 3].copy()
                normal = planes[b, ..., :3].copy()
                weak = weaks[b].copy()
                dmin = float(stacked_d.depth_min[b])
                dmax = float(stacked_d.depth_max[b])
                bad = (depth < dmin) | (depth > dmax) | ~np.isfinite(depth)
                depth[bad] = 0.0
                weak[bad] = int(PixelState.UNKNOWN)
                self.depth[p.ref_image_id] = depth.astype(np.float32)
                self.normal[p.ref_image_id] = normal.astype(np.float32)
                self.weak[p.ref_image_id] = weak.astype(np.uint8)
                self.selected[p.ref_image_id] = sels[b].astype(np.int32)
            if verbose:
                print(f"  wave {w0 // self.n_dev}: "
                      f"{sum(real)} problems in {time.time() - t0:.2f}s")

    def flush_to_disk(self) -> None:
        """Write the reference's per-view checkpoint files."""
        for p in self.problems:
            rf = p.result_folder
            formats.write_dmb(rf / "depths.dmb", self.depth[p.ref_image_id])
            formats.write_dmb(rf / "normals.dmb", self.normal[p.ref_image_id])
            formats.write_dmb(rf / "weak.bin", self.weak[p.ref_image_id])
            formats.write_dmb(rf / "selected_views.bin",
                              self.selected[p.ref_image_id])


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
) -> int:
    """Mesh-parallel variant of ``run_pipeline``. Identical outputs."""
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

    runner = ParallelRunner(mesh, problems, v_pad, cfg)
    if verbose:
        print(f"{len(problems)} problems over {runner.n_dev} devices, "
              f"{round_num} rounds")

    iteration = 0
    for i in range(round_num):
        scale_size = 2 ** (round_num - 1 - i)
        for j in [None, 0, 1, 2]:
            params = config.schedule_params(base, i, j)
            runner.run_iteration(params, scale_size, max_scale, iteration,
                                 verbose)
            if verbose:
                print(f"Iteration {iteration + 1} / {round_num * 4} done")
            iteration += 1

    runner.flush_to_disk()
    for p in problems:
        seq.export_npy(p, depth=depth, normal=normal, weak=weak, edge=edge)
    if fusion:
        from . import fusion as fusion_mod
        fusion_mod.run_fusion(dense_folder, problems, verbose=verbose)
    if not keep_intermediates:
        seq.cleanup_intermediates(problems, round_num)
    if verbose:
        print("All done")
    return 0
