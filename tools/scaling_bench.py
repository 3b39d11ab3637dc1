"""Scaling-efficiency measurement on the virtual CPU mesh (VERDICT r4 #4).

Real multi-chip hardware is unavailable in this environment, so this tool
measures what CAN be measured without a pod:

  * sweep throughput (depth-maps/s and dm/s/device) of the sharded staged
    executor at 1 / 2 / 4 / 8 virtual CPU devices, same total problem count
    (problems >> devices), modal pass-B params (REFINE_ITER+APD+edge+geom);
  * the depth-exchange collective's share of a sharded pass-B wall clock
    (exchange_depths timed separately from the sweep).

Caveat recorded with the numbers: this host exposes 2 physical cores, so
wall-clock "scaling" across >2 virtual devices measures core contention,
not ICI behaviour — the honest readings are the exchange share and the
sharded-executor overhead vs the 1-device run. Run on a real v5e slice,
this same harness produces the BASELINE.json >=80% scaling-efficiency
datapoints.

Usage: python tools/scaling_bench.py [WIDTH HEIGHT VIEWS [B]]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

from dpe_mvs_tpu.utils import jaxconfig  # noqa: E402

jaxconfig.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402

# The axon TPU plugin pins the platform over the JAX_PLATFORMS env var
# (same gotcha as __graft_entry__.dryrun_multichip) — force CPU through
# the config knob BEFORE any backend initialization, or this "CPU mesh"
# bench silently runs on the tunneled chip.
jax.config.update("jax_platforms", "cpu")


def main() -> int:
    import tempfile

    from dpe_mvs_tpu.config import EngineConfig, PatchMatchParams, \
        schedule_params
    from dpe_mvs_tpu.engine import rectcost
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.parallel import mesh as mesh_mod
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 160
    height = int(args[1]) if len(args) > 1 else 120
    views = int(args[2]) if len(args) > 2 else 4
    B = int(args[3]) if len(args) > 3 else 8

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}", flush=True)
    if devs[0].platform != "cpu":
        raise SystemExit("refusing to run the virtual-mesh scaling bench "
                         "on a real accelerator: wall-clock would mix chip "
                         "contention into the scaling numbers")
    folder = tempfile.mkdtemp(prefix="dpe_scale_")
    sc = make_plane_scene(folder, width=width, height=height,
                          num_views=max(views, B), seed=3)
    problems = scene_mod.generate_sample_list(sc.folder)[:B]
    v_pad = views - 1

    # Shared rect frame so one compiled stage set serves all problems.
    from dpe_mvs_tpu.pipeline.schedule import round_rect_frame
    frame = round_rect_frame(problems, max(width, height), v_pad)

    datas, states = [], []
    rstat = None
    for i, p in enumerate(problems):
        inputs = scene_mod.load_problem_inputs(
            p, 1, need_prior=False, need_weak=False, need_src_depths=False)
        rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                      inputs.height, v_pad,
                                      force_size=frame, stacked=True)
        rviews = rectcost.build_rect_views(rh, inputs.images, None,
                                           cameras=inputs.cameras)
        d = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=rviews)
        # Geom pass: mid-range src depths (shape-realistic, content-fake).
        mid = 0.5 * (inputs.depth_min + inputs.depth_max)
        d = d._replace(src_depths=jax.numpy.asarray(
            np.full((v_pad, height, width), mid, np.float32)))
        datas.append(d)
        states.append(st_mod.init_pm_state(
            inputs, v_pad, jax.random.key(100 + i), True))
        rstat = rh.statics
    datas = mesh_mod.stack_pytrees(datas)
    states = mesh_mod.stack_pytrees(states)

    params = schedule_params(PatchMatchParams(), 1, 0).replace(
        max_iterations=2)
    src_index = mesh_mod.build_src_index(
        [p.ref_image_id for p in problems],
        [list(p.src_image_ids) for p in problems], v_pad)

    results = []
    for nd in (1, 2, 4, 8):
        if nd > len(devs) or B % nd:
            continue
        mesh = mesh_mod.make_mesh(devs[:nd])
        d_sh = mesh_mod.shard_put(mesh, datas)
        s_sh = mesh_mod.shard_put(mesh, states)

        # Exchange timing (separately): sanitized depths -> (B, V, H, W).
        depths = d_sh.src_depths[:, 0]
        t0 = time.time()
        ex = mesh_mod.exchange_depths(mesh, depths, src_index)
        jax.block_until_ready(ex)
        t_ex_cold = time.time() - t0
        t0 = time.time()
        ex = mesh_mod.exchange_depths(mesh, depths, src_index)
        jax.block_until_ready(ex)
        t_ex = time.time() - t0
        d_sh = d_sh._replace(src_depths=ex)

        t0 = time.time()
        out = mesh_mod.sharded_sweep_staged(mesh, d_sh, s_sh, params,
                                            rstat=rstat)
        jax.block_until_ready(out.plane)
        t_cold = time.time() - t0
        reps = []
        for _ in range(3):
            t0 = time.time()
            out = mesh_mod.sharded_sweep_staged(mesh, d_sh, s_sh, params,
                                                rstat=rstat)
            jax.block_until_ready(out.plane)
            reps.append(time.time() - t0)
        t = float(np.median(reps))
        dms = B / t
        results.append((nd, t, dms, dms / nd, t_ex))
        print(f"n_dev={nd}: sweep {t:.2f}s ({t_cold:.1f}s cold) = "
              f"{dms:.3f} dm/s, {dms / nd:.3f} dm/s/dev; "
              f"exchange {t_ex * 1e3:.1f} ms ({t_ex_cold:.1f}s cold) = "
              f"{100 * t_ex / (t_ex + t):.2f}% of pass wall", flush=True)

    if len(results) > 1:
        base = results[0][2]
        print("\nscaling table (B=%d problems, %dx%dx%d, 2 physical cores):"
              % (B, width, height, views))
        for nd, t, dms, dmsd, t_ex in results:
            eff = dms / (base * nd)
            print(f"  {nd} dev: {dms:.3f} dm/s  eff={100 * eff:.0f}%  "
                  f"exchange={1e3 * t_ex:.1f}ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
