"""Accuracy harness: depth-map stats + point-cloud F-score on ground truth.

The reference's evaluation surface is the ETH3D / Tanks-and-Temples
benchmark submission (csrc/DPE-MVS/README.md:33-39): fused point clouds
scored by distance-threshold precision / recall / F-score against laser
ground truth. No datasets are reachable here, so this harness runs the full
pipeline on rendered scenes with analytic ground truth and reports the same
metric family:

  - per-view depth report: completeness (valid fraction), median/mean
    absolute relative error, inlier rates at 0.5% / 1% / 2% relative error;
  - fused-cloud F-score at tau (default 2cm-equivalent = 0.005 x scene
    depth): precision (cloud -> GT surface distance), recall (GT sample ->
    cloud distance), F = 2PR / (P + R).

Usage:
  python tools/eval.py [--scene rich|plane|step] [--width W --height H]
      [--views N] [--tau T] [--parallel] [--engine rect|xla|auto] [--json]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def depth_report(d: np.ndarray, gt: np.ndarray) -> dict:
    valid = d > 0
    rel = np.abs(d[valid] - gt[valid]) / np.maximum(gt[valid], 1e-9)
    return {
        "completeness": round(float(valid.mean()), 4),
        "median_rel_err": round(float(np.median(rel)) if rel.size else 1.0, 6),
        "mean_rel_err": round(float(rel.mean()) if rel.size else 1.0, 6),
        "inlier_0.5pct": round(float((rel < 0.005).mean()) if rel.size else 0.0, 4),
        "inlier_1pct": round(float((rel < 0.01).mean()) if rel.size else 0.0, 4),
        "inlier_2pct": round(float((rel < 0.02).mean()) if rel.size else 0.0, 4),
    }


def backproject_gt(sc, stride: int = 2) -> np.ndarray:
    """Ground-truth surface samples: back-project every view's analytic
    depth map (strided) to world points."""
    pts = []
    for v, d in enumerate(sc.gt_depths):
        K, R, t = sc.Ks[v], sc.Rs[v], sc.ts[v]
        H, W = d.shape
        ys, xs = np.mgrid[0:H:stride, 0:W:stride].astype(np.float32)
        dd = d[::stride, ::stride]
        pc = np.stack([(xs - K[0, 2]) / K[0, 0] * dd,
                       (ys - K[1, 2]) / K[1, 1] * dd, dd], axis=-1)
        pts.append(((pc - t) @ R).reshape(-1, 3))
    return np.concatenate(pts)


def fscore(cloud: np.ndarray, gt_pts: np.ndarray, tau: float) -> dict:
    """Distance-threshold precision / recall / F-score (the ETH3D metric
    family) via KD-trees."""
    from scipy.spatial import cKDTree

    if cloud.shape[0] == 0:
        return {"precision": 0.0, "recall": 0.0, "fscore": 0.0,
                "tau": tau, "cloud_points": 0}
    gt_tree = cKDTree(gt_pts)
    d_prec, _ = gt_tree.query(cloud, k=1, distance_upper_bound=tau * 8)
    precision = float((d_prec <= tau).mean())
    cl_tree = cKDTree(cloud)
    d_rec, _ = cl_tree.query(gt_pts, k=1, distance_upper_bound=tau * 8)
    recall = float((d_rec <= tau).mean())
    f = 2 * precision * recall / max(precision + recall, 1e-9)
    return {"precision": round(precision, 4), "recall": round(recall, 4),
            "fscore": round(f, 4), "tau": tau,
            "cloud_points": int(cloud.shape[0])}


def evaluate_scene(sc, *, tau: float | None = None,
                   gt_stride: int = 2) -> dict:
    """Depth + cloud metrics for an already-run pipeline output tree."""
    from dpe_mvs_tpu.io import formats

    report: dict = {"views": {}}
    for v, gt in enumerate(sc.gt_depths):
        p = sc.folder / "DPE" / f"{v:08d}" / "depth.npy"
        if p.exists():
            report["views"][v] = depth_report(np.load(p), gt)
    meds = [r["median_rel_err"] for r in report["views"].values()]
    comps = [r["completeness"] for r in report["views"].values()]
    report["depth_median_rel_err"] = round(float(np.median(meds)), 6) if meds else None
    report["depth_completeness"] = round(float(np.mean(comps)), 4) if comps else None

    ply = sc.folder / "DPE" / "DPE.ply"
    if ply.exists():
        cloud, _ = formats.read_ply(ply)
        gt_pts = backproject_gt(sc, gt_stride)
        depth_scale = float(np.median([d[d > 0].mean()
                                       for d in sc.gt_depths]))
        tau = tau if tau is not None else 0.005 * depth_scale
        report["cloud"] = fscore(cloud, gt_pts, tau)
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rich",
                    choices=["rich", "plane", "step"])
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--views", type=int, default=10)
    ap.add_argument("--tau", type=float, default=None)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--parallel", action="store_true")
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "rect", "xla"])
    ap.add_argument("--json", action="store_true",
                    help="print the report as one JSON line")
    ap.add_argument("--folder", default=None,
                    help="reuse/keep the scene folder")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU alone)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    # After platform selection: setup() reads the backend for the
    # persistent-cache policy, which initializes it.
    from dpe_mvs_tpu.utils import jaxconfig
    jaxconfig.setup()
    from dpe_mvs_tpu.api import dpe_mvs
    from dpe_mvs_tpu.config import EngineConfig
    from dpe_mvs_tpu.utils import synthetic

    folder = args.folder or tempfile.mkdtemp(prefix="dpe_eval_")
    if args.scene == "rich":
        sc = synthetic.make_rich_scene(
            folder, width=args.width, height=args.height,
            num_views=args.views, seed=args.seed)
    else:
        sc = synthetic.make_plane_scene(
            folder, width=args.width, height=args.height,
            num_views=args.views, step=args.scene == "step",
            weak_patch=args.scene == "step", seed=args.seed)

    use_rect = {"auto": None, "rect": True, "xla": False}[args.engine]
    cfg = EngineConfig(use_rect=use_rect)
    t0 = time.time()
    dpe_mvs(sc.folder, verbose=not args.json, fusion=True, depth=True,
            normal=True, weak=True, cfg=cfg, parallel=args.parallel)
    wall = time.time() - t0

    report = evaluate_scene(sc, tau=args.tau)
    report["pipeline_seconds"] = round(wall, 2)
    report["scene"] = {"kind": args.scene, "width": args.width,
                       "height": args.height, "views": args.views}
    if args.json:
        print(json.dumps(report))
    else:
        print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
