"""Benchmark: depth-maps/sec/chip on the flagship PatchMatch sweep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the steady-state rate of full photometric PatchMatch sweeps
(ProcessProblem equivalents) at the reference's coarse working resolution
(max dim ~800, the resolution every scene is swept at in rounds 0..n-1,
main.cpp:390-408) on a synthetic multi-view scene. North-star target from
BASELINE.json: >= 1 depth-map/s/chip.
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
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.engine.sweep import run_sweep
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
    params = schedule_params(PatchMatchParams(), 0, None)  # round-0 pass A
    st0 = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)

    # AOT compile + warm up.
    fn = jax.jit(run_sweep, static_argnames=("params",)).lower(
        data, st0, params).compile()
    st = fn(data, st0)
    jax.block_until_ready(st.plane)

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        st = fn(data, st0._replace(key=jax.random.key(i + 1)))
        jax.block_until_ready(st.plane)
        times.append(time.perf_counter() - t0)
    sweep_time = float(np.median(times))
    value = 1.0 / sweep_time

    print(json.dumps({
        "metric": "depth-maps/sec/chip",
        "value": round(value, 4),
        "unit": "dm/s",
        "vs_baseline": round(value / 1.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
