"""Break one rect cost evaluation into its pieces and time each on the chip.

Usage: python tools/rect_eval_bench.py [W H V]

Times, per source view at bench shapes: the forward plane transport, the
rect-frame NCC (ncc_rect_one), the backward cost transport, and the full
rect_cost_vector — so optimization effort lands where the time is.
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
    np.asarray(jax.device_get(
        jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    import tempfile
    from dpe_mvs_tpu.config import PatchMatchParams, schedule_params
    from dpe_mvs_tpu.engine import patchmatch as pm
    from dpe_mvs_tpu.engine import rectcost
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.ops import warp as warp_ops
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene
    from dpe_mvs_tpu.geometry import cameras as geo

    args = sys.argv[1:]
    width = int(args[0]) if len(args) > 0 else 800
    height = int(args[1]) if len(args) > 1 else 600
    views = int(args[2]) if len(args) > 2 else 6

    folder = tempfile.mkdtemp(prefix="dpe_evalbench_")
    sc = make_plane_scene(folder, width=width, height=height,
                          num_views=views, seed=3)
    problems = scene_mod.generate_sample_list(sc.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    v_pad = views - 1
    data = st_mod.build_sweep_data(inputs, v_pad)
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    rviews = rectcost.build_rect_views(rh, inputs.images, None,
                                       cameras=inputs.cameras)
    data = data._replace(rect=rviews)
    params = schedule_params(PatchMatchParams(), 0, None)
    offs = pm.strong_offsets(params)
    st = rh.statics
    print(f"rect frame {st.hp}x{st.wp}, offsets {offs.shape[0]}", flush=True)

    H, W = height, width
    px, py = geo.pixel_grid(H, W)
    mid = 0.5 * (inputs.depth_min + inputs.depth_max)
    plane_np = np.zeros((H, W, 4), np.float32)
    plane_np[..., 2] = -1.0
    plane_np[..., 3] = mid
    n_cam = jnp.asarray(plane_np[..., :3])
    plane = geo.plane_from_depth_normal(
        geo.Camera(K=jnp.asarray(inputs.cameras[0].K),
                   R=jnp.asarray(inputs.cameras[0].R),
                   t=jnp.asarray(inputs.cameras[0].t)),
        px, py, jnp.asarray(plane_np[..., 3]), n_cam)
    plane = jax.device_put(plane)
    rv = rviews[0]

    fwd = jax.jit(lambda p: warp_ops.warp_channels(
        jnp.moveaxis(rectcost.plane_to_rect(p, rv.R2r), -1, 0),
        rv.f_vy, rv.f_hx, transposed_input=st.f_transposed[0], nearest=True))
    prw = fwd(plane)

    ncc = jax.jit(lambda pr: rectcost.ncc_rect_one(
        rv, jnp.moveaxis(pr, 0, -1), offs, 5.0, 3.0))
    cost_r = ncc(prw)

    bwd = jax.jit(lambda c: warp_ops.warp_separable(
        c, rv.b_vy, rv.b_hx, transposed_input=st.b_transposed[0],
        nearest=True))

    full = jax.jit(lambda p: rectcost.rect_cost_vector(
        rviews, st, p, data.view_valid, params, offs))

    for name, fn, a in [
        ("fwd_warp(4ch, 1 view)", fwd, (plane,)),
        ("ncc_rect_one(1 view)", ncc, (prw,)),
        ("bwd_warp(1ch, 1 view)", bwd, (cost_r,)),
        (f"rect_cost_vector({v_pad} views)", full, (plane,)),
    ]:
        t = timeit(fn, *a)
        print(f"{name:<28s} {t*1e3:9.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
