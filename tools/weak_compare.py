"""Rect-engine vs XLA-engine weak-path comparison at a realistic size.

The rect weak path deliberately approximates (probe lattice, initial-plane
slope, own-center bilateral anchor, no adaptive radius —
engine/weak_rect.py docstring); the XLA engine (ops/weak.py) keeps the
exact reference semantics. This tool quantifies the envelope at a
realistic size: it runs ONE problem through a FIRST_INIT sweep + a full
APD+edge REFINE_INIT sweep on a given engine and dumps depth/weak maps;
run it once per engine and once with --compare.

Usage:
  python tools/weak_compare.py --engine rect --out /tmp/wc_rect.npz
  python tools/weak_compare.py --engine xla  --cpu --out /tmp/wc_xla.npz
  python tools/weak_compare.py --compare /tmp/wc_rect.npz /tmp/wc_xla.npz
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def run(args) -> int:
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from dpe_mvs_tpu.utils import jaxconfig
    jaxconfig.setup()
    import jax
    import jax.numpy as jnp
    from dpe_mvs_tpu.config import PatchMatchParams, schedule_params
    from dpe_mvs_tpu.engine import state as st_mod
    from dpe_mvs_tpu.io import scene as scene_mod
    from dpe_mvs_tpu.pipeline import schedule as sched
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    sc = make_plane_scene(tempfile.mkdtemp(prefix="dpe_wc_"),
                          width=args.width, height=args.height,
                          num_views=args.views, seed=17, weak_patch=True)
    problems = scene_mod.generate_sample_list(sc.folder)
    base = PatchMatchParams()
    sched.get_problem_edges(problems[0], 1, base)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    v_pad = args.views - 1
    edge, edge_low, label = sched.load_support_maps(
        problems[0], 1, 0, base, inputs.width, inputs.height)
    data = st_mod.build_sweep_data(inputs, v_pad, edge, edge_low, label)

    rstat = None
    if args.engine == "rect":
        from dpe_mvs_tpu.engine import rectcost
        rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                      inputs.height, v_pad)
        data = data._replace(rect=rectcost.build_rect_views(
            rh, inputs.images, None, cameras=inputs.cameras))
        rstat = rh.statics

    st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(42), False)
    t0 = time.time()
    if rstat is not None:
        from dpe_mvs_tpu.engine.stages import run_sweep_staged
        st = run_sweep_staged(data, st, schedule_params(base, 0, None),
                              rstat=rstat)
        st = st._replace(key=jax.random.key(43))
        st = run_sweep_staged(data, st, schedule_params(base, 1, None),
                              rstat=rstat)
    else:
        from dpe_mvs_tpu.engine.sweep import run_sweep_jit
        st = run_sweep_jit(data, st, schedule_params(base, 0, None))
        st = st._replace(key=jax.random.key(43))
        st = run_sweep_jit(data, st, schedule_params(base, 1, None))
    depth = np.asarray(jax.device_get(st.plane[..., 3]))
    weak = np.asarray(jax.device_get(st.weak))
    wall = time.time() - t0
    np.savez(args.out, depth=depth, weak=weak, gt=sc.gt_depths[0],
             dmin=inputs.depth_min, dmax=inputs.depth_max, wall=wall,
             engine=args.engine)
    print(json.dumps({"engine": args.engine, "wall_s": round(wall, 1),
                      "out": args.out}))
    return 0


def report(d, gt, dmin, dmax):
    valid = (d >= dmin) & (d <= dmax)
    rel = np.abs(d[valid] - gt[valid]) / gt[valid]
    return dict(valid=round(float(valid.mean()), 4),
                median_rel=round(float(np.median(rel)), 6),
                inlier_1pct=round(float((rel < 0.01).mean()), 4))


def compare(a_path, b_path) -> int:
    a = np.load(a_path, allow_pickle=True)
    b = np.load(b_path, allow_pickle=True)
    out = {
        str(a["engine"]): report(a["depth"], a["gt"], float(a["dmin"]),
                                 float(a["dmax"])),
        str(b["engine"]): report(b["depth"], b["gt"], float(b["dmin"]),
                                 float(b["dmax"])),
    }
    # Weak-map agreement (interior; DepthToWeak blanks a 6 px border).
    wa, wb = a["weak"], b["weak"]
    inner = np.zeros(wa.shape, bool)
    inner[6:-6, 6:-6] = True
    out["weak_label_agreement"] = round(
        float((wa == wb)[inner].mean()), 4)
    out["weak_frac"] = {str(a["engine"]): round(float((wa == 0)[inner].mean()), 4),
                        str(b["engine"]): round(float((wb == 0)[inner].mean()), 4)}
    print(json.dumps(out, indent=2))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=["rect", "xla"], default="rect")
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=304)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/wc.npz")
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()
    if args.compare:
        return compare(*args.compare)
    return run(args)


if __name__ == "__main__":
    sys.exit(main())
