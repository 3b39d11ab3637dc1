"""End-to-end pipeline test on a rendered ground-truth scene.

Exercises the full coarse-to-fine schedule (FIRST_INIT, REFINE_INIT,
REFINE_ITER with geometric consistency and the weak-texture machinery),
npy export, fusion, and cleanup — the reference's 99% path
(``RunDPEPipeline``). Statistical acceptance per SURVEY.md §4.
"""
import numpy as np
import pytest

from dpe_mvs_tpu.config import EngineConfig
from dpe_mvs_tpu.io import formats
from dpe_mvs_tpu.pipeline.schedule import run_pipeline
from dpe_mvs_tpu.utils.synthetic import make_plane_scene


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    folder = tmp_path_factory.mktemp("e2e")
    sc = make_plane_scene(folder, width=64, height=48, num_views=3, seed=4,
                          step=True, weak_patch=True)
    ret = run_pipeline(sc.folder, verbose=False, fusion=True, depth=True,
                       normal=True, weak=True, edge=True,
                       keep_intermediates=True)
    return sc, ret


def test_pipeline_returns_ok(pipeline_run):
    _, ret = pipeline_run
    assert ret == 0


def test_depth_output_accuracy(pipeline_run):
    sc, _ = pipeline_run
    d = np.load(sc.folder / "DPE" / "00000000" / "depth.npy")
    gt = sc.gt_depths[0]
    assert d.shape == gt.shape
    assert d.dtype == np.float32
    valid = d > 0
    assert valid.mean() > 0.5
    err = np.abs(d[valid] - gt[valid]) / gt[valid]
    assert np.median(err) < 0.02, np.median(err)


def test_normal_weak_edge_outputs(pipeline_run):
    sc, _ = pipeline_run
    rf = sc.folder / "DPE" / "00000000"
    n = np.load(rf / "normal.npy")
    assert n.shape == (*sc.gt_depths[0].shape, 3)
    w = np.load(rf / "weak.npy")
    assert w.dtype == np.int8
    assert set(np.unique(w)) <= {0, 1, 2}
    e = np.load(rf / "edge.npy")
    assert e.dtype == np.int8
    assert set(np.unique(e)) <= {0, 1}


def test_fusion_pointcloud(pipeline_run):
    sc, _ = pipeline_run
    pts, cols = formats.read_ply(sc.folder / "DPE" / "DPE.ply")
    # Tiny 3-view scene: the used-source-pixel masking consumes most
    # candidates after the first reference view (DPE.cpp:1299,1353), so the
    # cloud is sparse but must be non-trivial.
    assert pts.shape[0] > 150
    # Points lie near the ground-truth planes: check z spread is sane.
    assert np.isfinite(pts).all()
    z = pts[:, 2]
    assert (z > 1.0).mean() > 0.95 and (z < 8.0).mean() > 0.95


def test_fscore_floor(pipeline_run):
    """Point-cloud F-score floor (the reference's benchmark metric family).

    Regression guard for the accuracy harness: the on-chip rich-scene run
    recorded F=0.957 / P=0.979 / R=0.936 at tau = 0.005 x depth scale
    (BASELINE.md round-4); this tiny CPU scene pins a loose floor on the
    same metric so accuracy can't silently collapse."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.eval import evaluate_scene

    sc, _ = pipeline_run
    # tau scaled to the 64-px-wide scene (the default 0.005 x depth is
    # sub-pixel here; measured at tau=0.05 x depth: P=0.996, F=0.71).
    ds = float(np.median([d[d > 0].mean() for d in sc.gt_depths]))
    rep = evaluate_scene(sc, tau=0.05 * ds)
    assert rep["cloud"]["cloud_points"] > 150
    assert rep["cloud"]["precision"] > 0.8, rep["cloud"]
    assert rep["cloud"]["fscore"] > 0.4, rep["cloud"]


def test_pipeline_rect_engine(tmp_path):
    """The rect-engine routing (the TPU execution path, use_rect=True) runs
    the same schedule end-to-end and recovers the scene."""
    sc = make_plane_scene(tmp_path, width=48, height=36, num_views=3, seed=5)
    cfg = EngineConfig(use_rect=True, min_rounds=1)
    ret = run_pipeline(sc.folder, verbose=False, fusion=False, depth=True,
                       normal=False, weak=False, edge=False, cfg=cfg)
    assert ret == 0
    d = np.load(sc.folder / "DPE" / "00000000" / "depth.npy")
    gt = sc.gt_depths[0]
    valid = d > 0
    assert valid.mean() > 0.4
    err = np.abs(d[valid] - gt[valid]) / gt[valid]
    assert np.median(err) < 0.03, np.median(err)
