"""Internals probe for the support + weak stages (the pass-B dominants).

Times each sub-piece of build_support and propagate_weak_rect separately on
the chip at a given size, with hard host-readback syncs, to localize the
sink inside the 26 s support / 12 s weak-iter slices (round-4 profile).

Usage: python tools/weak_probe.py [WIDTH HEIGHT VIEWS]
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


def timed(name, fn, *args, reps=2, **kw):
    jfn = jax.jit(fn) if not hasattr(fn, "lower") else fn
    t0 = time.time()
    out = jfn(*args, **kw)
    sync(out)
    t_c = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jfn(*args, **kw)
        sync(out)
        ts.append(time.time() - t0)
    print(f"  {name:28s} compile+1 {t_c:7.2f}s   steady {min(ts):7.3f}s",
          flush=True)
    return out


def main() -> int:
    import tempfile
    from functools import partial

    from dpe_mvs_tpu.config import PatchMatchParams, schedule_params
    from dpe_mvs_tpu.engine import rectcost, weak_rect
    from dpe_mvs_tpu.engine import patchmatch as pm
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.engine.stages import run_sweep_staged, _support_j, \
        _weakprep_j
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.ops import support as sup_ops
    from dpe_mvs_tpu.ops import anchors as anchors_mod
    from dpe_mvs_tpu.ops import weak as weak_ops
    from dpe_mvs_tpu.pipeline import schedule as sched
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 800
    height = int(args[1]) if len(args) > 1 else 600
    views = int(args[2]) if len(args) > 2 else 6

    folder = tempfile.mkdtemp(prefix="dpe_wprobe_")
    sc = make_plane_scene(folder, width=width, height=height,
                          num_views=views, seed=3)
    problems = scene_mod.generate_sample_list(sc.folder)
    base = PatchMatchParams()
    sched.get_problem_edges(problems[0], 1, base)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    v_pad = views - 1
    edge, edge_low, label = sched.load_support_maps(
        problems[0], 1, 0, base, inputs.width, inputs.height)
    data = st_mod.build_sweep_data(inputs, v_pad, edge, edge_low, label)
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    rviews = rectcost.build_rect_views(rh, inputs.images, None,
                                       cameras=inputs.cameras)
    data = data._replace(rect=rviews)
    rstat = rh.statics
    mid = 0.5 * (inputs.depth_min + inputs.depth_max)
    data = data._replace(src_depths=jnp.asarray(
        np.full((v_pad, height, width), mid, np.float32)))

    # Warm state via a FIRST_INIT sweep (same as tpu_probe apd).
    p0 = schedule_params(base, 0, None)
    st0 = st_mod.init_pm_state(inputs, v_pad, jax.random.key(99), False)
    t0 = time.time()
    st0 = run_sweep_staged(data, st0, p0, rstat=rstat)
    sync(st0.plane)
    print(f"warmup sweep {time.time() - t0:.1f}s  weak frac "
          f"{float(jnp.mean((st0.weak == 0).astype(jnp.float32))):.3f}",
          flush=True)

    params = schedule_params(base, 1, 0)   # REFINE_ITER APD edge geom
    H, W = height, width
    max_steps = 1 << int(np.ceil(np.log2(max(H, W))))
    key = jax.random.key(1)

    print("--- support pieces", flush=True)
    es = timed("edge_steps", partial(sup_ops.edge_steps,
                                     max_steps=max_steps), data.edge)
    cx = timed("complexity_map",
               lambda e, l: sup_ops.complexity_map(
                   e, l, params.strong_radius, params.use_label),
               data.edge, data.label)
    lr = timed("label_run_length",
               partial(sup_ops.label_run_length, max_steps=max_steps),
               data.label)
    los = timed("build_line_of_sight",
                lambda e: sup_ops.build_line_of_sight(
                    e, W, H, params.high_res_img), data.edge_low)
    ns, _ = timed("jfa_nearest",
                  lambda m: sup_ops.jfa_nearest(m, 100.0),
                  st0.weak == 2)

    # gen_neighbours wants the pre-init (world, depth) plane layout: st0 is
    # post-finish, already in that layout.
    def gn(key, data, st, es, cxm, lr, los, ns):
        return anchors_mod.gen_neighbours(
            key, data, st, params, edge_steps=es, complexity=cxm,
            label_runs=lr, los=los, nearest_strong=ns)

    neighbours, reliable, weak2, cx2 = timed(
        "gen_neighbours", gn, key, data, st0, es, cx, lr, los, ns)

    # The fused stage for comparison (the pipeline's actual executable).
    def support_fused(d, s, k):
        from dpe_mvs_tpu.engine import sweep as sweep_mod
        return sweep_mod.build_support(d, s, params, k)

    timed("FUSED _support stage", support_fused, data, st0,
          jax.random.key(7))

    print("--- weak-iter pieces", flush=True)
    sup = pm.Support(edge_steps=es, complexity=cx2, label_runs=lr, los=los,
                     nearest_strong=ns, neighbours=neighbours, radius=None,
                     fit_plane=None)

    # Mid-sweep state layout (plane in cam frame): run init (donates its
    # state input — hand it a copy).
    from dpe_mvs_tpu.engine.stages import _init_j
    st_in = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                         st0._replace(weak=weak2, key=jax.random.key(5)))
    st1 = _init_j(data, st_in, params, rstat)
    sync(st1.plane)

    fp = timed("fit_plane_ransac",
               lambda k, d, s: weak_ops.fit_plane_ransac(k, d, sup, s,
                                                         params),
               jax.random.key(2), data, st1)
    sup_it = sup._replace(**fp)

    bundle = _weakprep_j(data, sup, st1, params, rstat)
    sync(bundle.d0)

    sites = timed("build_weak_sites",
                  lambda d, s, b: weak_rect.build_weak_sites(d, sup_it, s,
                                                             b, 0),
                  data, st1, bundle)

    cand = sites.anchor_plane
    carr = timed("cost_array (8 cands)",
                 lambda d, s, c: jax.lax.map(
                     lambda pl_: weak_rect.deformable_cost_rect(
                         d, s, pl_, params), c),
                 data, sites, cand)

    timed("geom rows (8 cands)",
          lambda d, s, c: jax.lax.map(
              lambda pl_: weak_rect.geom_term_rect(d, s, pl_), c),
          data, sites, cand)

    one = cand[0]
    timed("eval one cand",
          lambda d, s, c: weak_rect.deformable_cost_rect(d, s, c, params),
          data, sites, one)

    from dpe_mvs_tpu.ops import checker
    plane_full = st1.plane
    timed("final rect_cost_vector",
          lambda d, p: rectcost.rect_cost_vector(
              d.rect, rstat, p, d.view_valid, params,
              pm.strong_offsets(params), geom=False),
          data, plane_full)

    timed("full weak_iter", lambda d, s: __import__(
        "dpe_mvs_tpu.engine.stages", fromlist=["x"])._weak_iter(
            d, sup, s, jnp.int32(0), jax.random.key(3), params, rstat,
            bundle),
        data, st1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
