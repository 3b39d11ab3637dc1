"""Microprobe for gen_neighbours internals (the support-stage dominant).

Times gen_neighbours steady-state plus its suspected sinks in isolation:
the per-step line-of-sight crossing lookups and the per-step top_k shrink.

Usage: python tools/gn_probe.py [WIDTH HEIGHT]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpe_mvs_tpu.utils import jaxconfig

jaxconfig.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0]))


def timed(name, fn, *args, reps=2):
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    sync(out)
    t_c = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jfn(*args)
        sync(out)
        ts.append(time.time() - t0)
    print(f"  {name:32s} compile+1 {t_c:7.2f}s   steady {min(ts):7.3f}s",
          flush=True)
    return out


def main() -> int:
    import tempfile

    from dpe_mvs_tpu.config import PatchMatchParams, schedule_params
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.ops import anchors as anchors_mod
    from dpe_mvs_tpu.ops import support as sup_ops
    from dpe_mvs_tpu.pipeline import schedule as sched
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 800
    height = int(args[1]) if len(args) > 1 else 600

    folder = tempfile.mkdtemp(prefix="dpe_gn_")
    sc = make_plane_scene(folder, width=width, height=height, num_views=4,
                          seed=3)
    problems = scene_mod.generate_sample_list(sc.folder)
    base = PatchMatchParams()
    sched.get_problem_edges(problems[0], 1, base)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    edge, edge_low, label = sched.load_support_maps(
        problems[0], 1, 0, base, inputs.width, inputs.height)
    data = st_mod.build_sweep_data(inputs, 3, edge, edge_low, label)
    st = st_mod.init_pm_state(inputs, 3, jax.random.key(0), True)
    # Synthetic weak/strong split + a world-layout plane prior.
    rng = np.random.default_rng(0)
    weak = np.full((height, width), 2, np.uint8)
    weak[rng.random((height, width)) < 0.3] = 0
    st = st._replace(
        weak=jnp.asarray(weak),
        plane=jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray([0., 0., -1.]),
                              (height, width, 3)),
             jnp.full((height, width, 1),
                      0.5 * (inputs.depth_min + inputs.depth_max))], -1))

    params = schedule_params(base, 1, 0)
    H, W = height, width
    max_steps = 1 << int(np.ceil(np.log2(max(H, W))))

    es = sup_ops.edge_steps(data.edge, max_steps)
    cx = sup_ops.complexity_map(data.edge, data.label,
                                params.strong_radius, params.use_label)
    lr = sup_ops.label_run_length(data.label, max_steps)
    los = sup_ops.build_line_of_sight(data.edge_low, W, H,
                                      params.high_res_img)
    ns, _ = sup_ops.jfa_nearest(st.weak == 2, 100.0)
    jax.block_until_ready(ns)

    key = jax.random.key(1)

    def gn(los_arg):
        def f(key, data, st, es, cxm, lr, ns):
            return anchors_mod.gen_neighbours(
                key, data, st, params, edge_steps=es, complexity=cxm,
                label_runs=lr, los=los_arg, nearest_strong=ns)
        return f

    timed("gen_neighbours (with los)", gn(los), key, data, st, es, cx, lr,
          ns)
    timed("gen_neighbours (los=None)", gn(None), key, data, st, es, cx, lr,
          ns)

    # Isolated crossing lookup at (H, W)-shaped scattered endpoints.
    bx = jnp.asarray(rng.integers(0, W, (H, W)), jnp.float32)
    by = jnp.asarray(rng.integers(0, H, (H, W)), jnp.float32)
    xg = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    timed("los.crossing (1 call)",
          lambda a, b, c, d, e: los.crossing(a, b, c, d, e),
          xg, yg, bx, by, data.edge)

    # Per-step top_k shrink in isolation (64 steps in the real scan).
    resid = jnp.asarray(rng.random((H, W, 64)), jnp.float32)
    timed("top_k(-x, 10) on (H, W, 64)",
          lambda r: jax.lax.top_k(-r, 10)[0][..., 9], resid)

    # pick_last chain (25 picks/step in the real scan).
    idx = jnp.asarray(rng.integers(0, 64, (H, W)), jnp.int32)
    from dpe_mvs_tpu.ops import sampling
    timed("pick_last x9 on (H, W, 64)",
          lambda r, i: sum(sampling.pick_last(r[..., :64], i + j)
                           for j in range(9)), resid, idx)
    return 0


if __name__ == "__main__":
    sys.exit(main())
