"""Benchmark: depth-maps/sec/chip on the flagship PatchMatch sweep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the steady-state rate of full photometric PatchMatch sweeps
(ProcessProblem equivalents) at the reference's coarse working resolution
(max dim ~800, the resolution every scene is swept at in rounds 0..n-1,
main.cpp:390-408) on a synthetic multi-view scene, through the rectified
row-local cost engine (the TPU path). North-star target from BASELINE.json:
>= 1 depth-map/s/chip.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from dpe_mvs_tpu.utils import jaxconfig

jaxconfig.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    import tempfile
    from dpe_mvs_tpu.config import PatchMatchParams, schedule_params
    from dpe_mvs_tpu.engine import rectcost
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.engine.stages import run_sweep_staged
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    width, height, num_views = 800, 600, 6
    folder = tempfile.mkdtemp(prefix="dpe_bench_")
    sc = make_plane_scene(folder, width=width, height=height,
                          num_views=num_views, seed=3)
    problems = scene_mod.generate_sample_list(sc.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    v_pad = num_views - 1
    data = st_mod.build_sweep_data(inputs, v_pad)
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    rviews = rectcost.build_rect_views(rh, inputs.images, None,
                                       cameras=inputs.cameras)
    data = data._replace(rect=rviews)
    params = schedule_params(PatchMatchParams(), 0, None)  # round-0 pass A
    st0 = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)

    bench_start = time.time()

    def sweep(st, seed, p):
        st = run_sweep_staged(data, st._replace(key=jax.random.key(seed)),
                              p, rstat=rh.statics)
        # Axon gotcha: block_until_ready returns early; force a readback.
        np.asarray(jax.device_get(st.plane[..., 3]))
        return st

    def measure(st, p, reps=5):
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            sweep(st, i + 1, p)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    # Pass A (round 0): FIRST_INIT photometric. Warm-up compiles stages.
    st_a = sweep(st0, 0, params)
    t_a = measure(st0, params)
    out = {
        "metric": "depth-maps/sec/chip",
        "value": round(1.0 / t_a, 4),
        "unit": "dm/s",
        "vs_baseline": round(1.0 / t_a, 4),
    }

    # Pass B (rounds >= 1): REFINE_ITER with APD + edge + geometric
    # consistency — the schedule's modal sweep (3 of every 4,
    # main.cpp:508-556). Skipped if compile already ate the time budget
    # (the axon compile service is sometimes wedged for >20 min).
    budget_s = float(__import__("os").environ.get("DPE_BENCH_BUDGET", 3000))
    if time.time() - bench_start < budget_s:
        try:
            import jax.numpy as jnp
            params_b = schedule_params(PatchMatchParams(), 1, 0)
            mid = 0.5 * (inputs.depth_min + inputs.depth_max)
            src_d = np.full((v_pad, height, width), mid, np.float32)
            rviews_b = rectcost.build_rect_views(
                rh, inputs.images, src_d, cameras=inputs.cameras)
            data = data._replace(
                rect=rviews_b,
                src_depths=jnp.asarray(src_d))
            st_b0 = st_a._replace(key=jax.random.key(100))
            sweep(st_b0, 0, params_b)
            t_b = measure(st_b0, params_b, reps=3)
            out["passB_dms"] = round(1.0 / t_b, 4)
            # One schedule round = pass A + 3 geometric passes.
            out["round_dms"] = round(1.0 / (t_a + 3 * t_b), 4)
        except Exception as e:  # pragma: no cover - report partial result
            out["passB_error"] = f"{type(e).__name__}: {str(e)[:100]}"

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
