"""Ablation probe for the fused weak iteration (the pass-B dominant).

Compiles `_weak_iter` variants with individual sub-computations stubbed
out and measures steady-state — piece-wise timings of separately-jitted
parts did not reproduce the fused 12.5 s (round-4), so the sink must be
located inside the fused program.

Usage: python tools/weak_ablate.py [WIDTH HEIGHT VIEWS]
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


def main() -> int:
    import tempfile
    from contextlib import contextmanager

    from dpe_mvs_tpu.config import COST_MAX, PatchMatchParams, \
        schedule_params
    from dpe_mvs_tpu.engine import rectcost, stages, weak_rect
    from dpe_mvs_tpu.engine import patchmatch as pm
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.ops import sampling
    from dpe_mvs_tpu.ops import weak as weak_ops
    from dpe_mvs_tpu.pipeline import schedule as sched
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 800
    height = int(args[1]) if len(args) > 1 else 600
    views = int(args[2]) if len(args) > 2 else 6

    folder = tempfile.mkdtemp(prefix="dpe_abl_")
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

    p0 = schedule_params(base, 0, None)
    st0 = st_mod.init_pm_state(inputs, v_pad, jax.random.key(99), False)
    t0 = time.time()
    st0 = stages.run_sweep_staged(data, st0, p0, rstat=rstat)
    sync(st0.plane)
    print(f"warmup sweep {time.time() - t0:.1f}s", flush=True)

    params = schedule_params(base, 1, 0)

    # ---- support A/B: fused jit vs per-piece jits, full-tree sync -------
    from dpe_mvs_tpu.engine import sweep as sweep_mod

    def sync_tree(t):
        outs = []
        for leaf in jax.tree.leaves(t):
            if not hasattr(leaf, "dtype"):
                continue
            try:
                outs.append(jnp.sum(leaf.astype(jnp.float32)
                                    if leaf.dtype == jnp.bool_ else leaf))
            except TypeError:
                pass  # PRNG key leaves etc.
        for x in outs:
            np.asarray(jax.device_get(x))

    fused = jax.jit(lambda d, s, k: sweep_mod.build_support(d, s, params, k))

    def pieces(d, s, k):
        return sweep_mod.build_support(d, s, params, k, jit_pieces=True)

    for name, fn in (("support FUSED", fused), ("support PIECES", pieces)):
        t0 = time.time()
        out = fn(data, st0, jax.random.key(7))
        sync_tree(out)
        tc = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            out = fn(data, st0, jax.random.key(7))
            sync_tree(out)
            ts.append(time.time() - t0)
        print(f"  {name:28s} compile+1 {tc:7.2f}s  steady {min(ts):7.3f}s",
              flush=True)

    # jit_pieces: eager build_support would pay hundreds of per-op axon
    # compiles.
    sup, st1 = sweep_mod.build_support(data, st0, params, jax.random.key(7),
                                       jit_pieces=True)
    sync_tree(sup)
    st1 = stages._init_j(
        data, jax.tree.map(lambda x: x.copy(), st1), params, rstat)
    bundle = stages._weakprep_j(data, sup, st1, params, rstat)
    sync(bundle.d0)

    H, W = height, width
    V = v_pad

    @contextmanager
    def patched(obj, name, val):
        old = getattr(obj, name)
        setattr(obj, name, val)
        try:
            yield
        finally:
            setattr(obj, name, old)

    def run_variant(name, ctx=None):
        # sup/bundle MUST be jit arguments: closing over them embeds ~900 MB
        # of constants in the module and the remote compile service rejects
        # the upload (HTTP 413).
        def f(d, sup_, s, b):
            return stages._weak_iter(d, sup_, s, jnp.int32(0),
                                     jax.random.key(3), params, rstat, b)
        if ctx is None:
            from contextlib import nullcontext
            ctx = nullcontext()
        with ctx:
            jf = jax.jit(f)
            t0 = time.time()
            out = jf(data, sup, st1, bundle)
            sync(out)
            tc = time.time() - t0
            ts = []
            for _ in range(2):
                t0 = time.time()
                out = jf(data, sup, st1, bundle)
                sync(out)
                ts.append(time.time() - t0)
        print(f"  {name:28s} compile+1 {tc:7.2f}s  steady {min(ts):7.3f}s",
              flush=True)

    run_variant("full")

    zero_deform = lambda data, sites, plane, params: \
        jnp.zeros((V, H, W), jnp.float32)
    run_variant("no deformable_cost",
                patched(weak_rect, "deformable_cost_rect", zero_deform))

    zero_geom = lambda data, sites, plane: jnp.zeros((V, H, W), jnp.float32)
    run_variant("no geom_term",
                patched(weak_rect, "geom_term_rect", zero_geom))

    def no_final(views_, statics, plane, view_valid, params_, offsets,
                 geom=False, interpret=None):
        return jnp.zeros((V, H, W), jnp.float32)
    run_variant("no final rect_cost_vector",
                patched(weak_rect.rectcost, "rect_cost_vector", no_final))

    def no_fit(key, data_, sup_, state_, params_):
        return dict(fit_plane=jnp.zeros((H, W, 4), jnp.float32),
                    radius=None)
    run_variant("no fit_plane_ransac",
                patched(weak_ops, "fit_plane_ransac", no_fit))

    def no_gather(arr, iy, ix):
        iy = jnp.broadcast_to(iy, jnp.broadcast_shapes(iy.shape, ix.shape))
        return jnp.zeros(iy.shape + arr.shape[2:], arr.dtype)
    run_variant("no gather_map (sites+ransac)",
                patched(sampling, "gather_map", no_gather))

    def no_refine(key, data_, plane, depth, px=None, py=None):
        z = jnp.zeros((0,) + plane.shape[:-1], jnp.float32)
        zn = jnp.zeros((0,) + plane.shape[:-1] + (3,), jnp.float32)
        return z, zn
    run_variant("no refine combos",
                patched(pm, "refine_combos", no_refine))

    return 0


if __name__ == "__main__":
    sys.exit(main())
