"""Minimal repro probe for the classify (DepthToWeak) TPU fault.

Usage: python tools/classify_probe.py WIDTH HEIGHT VIEWS [refine|sweeponly]

Runs just the classify stage (or the raw disparity_sweep) on a synthetic
scene with a mid-depth fronto-parallel plane state, in a fresh process, so
worker crashes don't poison other experiments.
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
    from dpe_mvs_tpu.config import PatchMatchParams, schedule_params
    from dpe_mvs_tpu.engine import patchmatch as pm
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 800
    height = int(args[1]) if len(args) > 1 else 600
    views = int(args[2]) if len(args) > 2 else 6
    mode = args[3] if len(args) > 3 else "classify"

    print(f"devices: {jax.devices()}", flush=True)
    folder = tempfile.mkdtemp(prefix="dpe_cls_")
    sc = make_plane_scene(folder, width=width, height=height,
                          num_views=views, seed=3)
    problems = scene_mod.generate_sample_list(sc.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    v_pad = views - 1
    data = st_mod.build_sweep_data(inputs, v_pad)
    params = schedule_params(PatchMatchParams(), 0, None)
    st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)
    # Plausible state: fronto-parallel plane at mid depth, all views selected.
    mid = 0.5 * (inputs.depth_min + inputs.depth_max)
    plane = np.zeros((height, width, 4), np.float32)
    plane[..., 2] = -1.0
    plane[..., 3] = mid
    st = st._replace(
        plane=jax.numpy.asarray(plane),
        selected=jax.numpy.full((height, width), (1 << (views - 1)) - 1,
                                jax.numpy.uint32),
        view_weight=jax.numpy.ones((height, width, v_pad), jax.numpy.int32),
    )

    if mode == "sweeponly":
        disps = np.arange(-30, 31, dtype=np.float32)
        fn = jax.jit(lambda d, s: pm.disparity_sweep(d, s, params, disps))
    elif mode == "refine":
        fn = jax.jit(lambda d, s: pm.local_refine(d, s, params))
    else:
        fn = jax.jit(lambda d, s: pm.depth_to_weak(d, s, params))

    t0 = time.time()
    out = fn(data, st)
    r = np.asarray(jax.device_get(out))
    print(f"{mode} @ {width}x{height}x{views}: OK in {time.time()-t0:.1f}s; "
          f"out shape {r.shape} dtype {r.dtype} "
          f"stats min={float(r.min()):.3f} max={float(r.max()):.3f}",
          flush=True)
    t1 = time.time()
    out = fn(data, st)
    np.asarray(jax.device_get(out))
    print(f"steady: {time.time()-t1:.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
