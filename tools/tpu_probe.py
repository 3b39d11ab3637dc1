"""Per-stage TPU probe: compile + execute each sweep stage at a given size.

Usage: python tools/tpu_probe.py [WIDTH HEIGHT VIEWS [apd|noapd] [geom]]

Runs the staged sweep (engine/stages.py) with a StageTimer, printing per-stage
wall-clock for the first (compile) and second (steady-state) sweep. The tool
exists to localize compile wedges / device faults to a single stage
(VERDICT round 1: the monolithic 800x600x6 sweep faulted with no attribution).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpe_mvs_tpu.utils import jaxconfig

jaxconfig.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    import tempfile
    from dpe_mvs_tpu.config import PatchMatchParams, RunState, schedule_params
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.engine.stages import run_sweep_staged
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.utils.profiling import StageTimer
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 800
    height = int(args[1]) if len(args) > 1 else 600
    views = int(args[2]) if len(args) > 2 else 6
    apd = len(args) > 3 and args[3] == "apd"
    geom = len(args) > 4 and args[4] == "geom"
    skip = set((args[5] if len(args) > 5 else "").split(","))
    use_rect = not (len(args) > 6 and args[6] == "norect")

    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.time()
    folder = tempfile.mkdtemp(prefix="dpe_probe_")
    sc = make_plane_scene(folder, width=width, height=height,
                          num_views=views, seed=3)
    problems = scene_mod.generate_sample_list(sc.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    print(f"host scene gen in {time.time() - t0:.1f}s", flush=True)
    t0b = time.time()
    v_pad = views - 1
    data = st_mod.build_sweep_data(inputs, v_pad)
    rstat = None
    if use_rect:
        from dpe_mvs_tpu.engine import rectcost
        rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                      inputs.height, v_pad)
        rviews = rectcost.build_rect_views(
            rh, inputs.images, None, cameras=inputs.cameras)
        data = data._replace(rect=rviews)
        rstat = rh.statics
        print(f"rect frames: {rstat.hp}x{rstat.wp} "
              f"f_tr={rstat.f_transposed} b_tr={rstat.b_transposed}",
              flush=True)
    print(f"device data build in {time.time() - t0b:.1f}s", flush=True)
    if geom:
        mid = 0.5 * (inputs.depth_min + inputs.depth_max)
        import numpy as _np
        data = data._replace(src_depths=jax.numpy.asarray(
            _np.full((v_pad, height, width), mid, _np.float32)))

    if apd:
        params = schedule_params(PatchMatchParams(), 1, 0 if geom else None)
    else:
        params = schedule_params(PatchMatchParams(), 0, None)
    import os
    ps = os.environ.get("DPE_PROBE_PROPAGATE_STRIDE")
    if ps:
        params = params.replace(propagate_stride=int(ps))
        print(f"propagate_stride override: {ps}", flush=True)
    print(f"scene ready in {time.time() - t0:.1f}s; params: APD={params.use_APD} "
          f"edge={params.use_edge} geom={params.geom_consistency} "
          f"state={params.state.name}", flush=True)

    warm = None
    if apd:
        # A REFINE_INIT+APD sweep needs a real prior (depths, selected
        # views, weak map) — the schedule always enters it from round 0's
        # output (main.cpp:508-556). Produce one with a FIRST_INIT sweep.
        import jax.numpy as jnp
        p0 = schedule_params(PatchMatchParams(), 0, None)
        st0 = st_mod.init_pm_state(inputs, v_pad, jax.random.key(99), False)
        t1 = time.time()
        st0 = run_sweep_staged(data, st0, p0, rstat=rstat,
                               timer=StageTimer(echo=True))
        np.asarray(jax.device_get(st0.plane))
        print(f"--- warmup FIRST_INIT sweep: {time.time() - t1:.2f}s "
              f"(weak frac "
              f"{float(jnp.mean((st0.weak == 0).astype(jnp.float32))):.2f})",
              flush=True)
        warm = st0

    for rep in range(3):
        timer = StageTimer(echo=True)
        if apd:
            st = st_mod.PMState(
                plane=warm.plane, cost=warm.cost, selected=warm.selected,
                view_weight=warm.view_weight, weak=warm.weak,
                key=jax.random.key(rep))
        else:
            st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(rep),
                                      apd)
        t1 = time.time()
        st = run_sweep_staged(data, st, params, rstat=rstat, timer=timer,
                              skip=skip)
        # Axon gotcha: block_until_ready returns early; a host readback is
        # the only honest sync.
        d = np.asarray(jax.device_get(st.plane))[..., 3]
        label = "compile+exec" if rep == 0 else "steady"
        print(f"--- sweep {rep} ({label}): {time.time() - t1:.2f}s total",
              flush=True)
        print(timer.summary(), flush=True)
        print(f"    depth stats: min={d.min():.3f} max={d.max():.3f} "
              f"mean={d.mean():.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
