"""Multi-chip logic on the virtual 8-device CPU mesh (SURVEY.md §2.3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpe_mvs_tpu.config import PatchMatchParams, RunState
from dpe_mvs_tpu.engine import state as st_mod
from dpe_mvs_tpu.io import scene as scene_mod
from dpe_mvs_tpu.parallel import mesh as mesh_mod
from dpe_mvs_tpu.utils.synthetic import make_plane_scene


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_build_src_index():
    idx = mesh_mod.build_src_index([10, 20, 30], [[20, 30], [10], [99]], 4)
    np.testing.assert_array_equal(
        idx, [[1, 2, -1, -1], [0, -1, -1, -1], [-1, -1, -1, -1]])


def test_sharded_sweep_matches_local(eight_devices, tmp_path):
    """The mesh-sharded sweep must produce the same depths as per-problem
    local sweeps (it is the same program, just partitioned)."""
    mesh = mesh_mod.make_mesh(eight_devices[:4])
    params = PatchMatchParams(state=RunState.FIRST_INIT, use_APD=False,
                              use_edge=False, geom_consistency=False,
                              max_iterations=1)
    datas, states = [], []
    v_pad = 2
    for b in range(4):
        sc = make_plane_scene(tmp_path / f"s{b}", width=48, height=40,
                              num_views=3, seed=b)
        p = scene_mod.generate_sample_list(sc.folder)[0]
        inputs = scene_mod.load_problem_inputs(
            p, 1, need_prior=False, need_weak=False, need_src_depths=False)
        datas.append(st_mod.build_sweep_data(inputs, v_pad))
        states.append(st_mod.init_pm_state(inputs, v_pad, jax.random.key(b),
                                           False))

    stacked_d = mesh_mod.stack_pytrees(datas)
    stacked_s = mesh_mod.stack_pytrees(states)
    out = mesh_mod.sharded_sweep(mesh, stacked_d, stacked_s, params)
    assert out.plane.shape[0] == 4

    from dpe_mvs_tpu.engine.sweep import run_sweep
    ref0 = jax.jit(run_sweep, static_argnames=("params",))(
        datas[0], states[0], params)
    np.testing.assert_allclose(np.asarray(out.plane[0]),
                               np.asarray(ref0.plane), rtol=1e-5, atol=1e-5)


def test_exchange_depths(eight_devices, tmp_path):
    mesh = mesh_mod.make_mesh(eight_devices[:4])
    H, W = 16, 20
    B, V = 4, 2
    depth = jnp.arange(B * H * W, dtype=jnp.float32).reshape(B, H, W)

    src_index = jnp.asarray(
        mesh_mod.build_src_index(list(range(B)),
                                 [[(b + 1) % B] for b in range(B)], V))
    out = mesh_mod.exchange_depths(mesh, depth, src_index)
    assert out.shape == (B, V, H, W)
    # Problem 0's first source is problem 1's depth map.
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(depth[1]))
    # Padded slots are zero.
    np.testing.assert_array_equal(np.asarray(out[0, 1]), 0.0)


def test_parallel_pipeline_e2e(eight_devices, tmp_path):
    """The device-resident parallel pipeline (stacked problems, in-ICI depth
    exchange between geometric passes) recovers the scene end-to-end."""
    from dpe_mvs_tpu.config import EngineConfig
    from dpe_mvs_tpu.pipeline.parallel_schedule import run_pipeline_parallel

    sc = make_plane_scene(tmp_path, width=48, height=36, num_views=4, seed=6)
    mesh = mesh_mod.make_mesh(eight_devices)
    cfg = EngineConfig(min_rounds=1)
    ret = run_pipeline_parallel(sc.folder, mesh=mesh, verbose=False,
                                fusion=False, cfg=cfg,
                                keep_intermediates=True)
    assert ret == 0
    for v in range(4):
        d = np.load(sc.folder / "DPE" / f"{v:08d}" / "depth.npy")
        gt = sc.gt_depths[v]
        valid = d > 0
        assert valid.mean() > 0.4, (v, valid.mean())
        err = np.abs(d[valid] - gt[valid]) / gt[valid]
        assert np.median(err) < 0.03, (v, np.median(err))

    # Round-granular resume (api.py resume flag): every round is already
    # checkpointed, so a resumed run must skip all sweeps and reproduce
    # the outputs byte-for-byte.
    import time as _time
    d0 = np.load(sc.folder / "DPE" / "00000000" / "depth.npy")
    t0 = _time.time()
    ret = run_pipeline_parallel(sc.folder, mesh=mesh, verbose=False,
                                fusion=False, cfg=cfg, resume=True)
    assert ret == 0
    assert _time.time() - t0 < 30.0          # no sweeps re-ran
    d1 = np.load(sc.folder / "DPE" / "00000000" / "depth.npy")
    np.testing.assert_array_equal(d0, d1)


def test_parallel_pipeline_rect_2rounds(eight_devices, tmp_path):
    """The sharded executor on the RECT engine (stacked RectViews with
    runtime warp flags), over a 2-round schedule: exercises the
    device-resident REFINE_INIT prior resample, the weak machinery and the
    geometric passes across a round boundary (VERDICT r2 weak #5)."""
    from dpe_mvs_tpu.config import EngineConfig
    from dpe_mvs_tpu.pipeline.parallel_schedule import run_pipeline_parallel

    sc = make_plane_scene(tmp_path, width=32, height=24, num_views=3, seed=9)
    mesh = mesh_mod.make_mesh(eight_devices[:4])
    cfg = EngineConfig(min_rounds=2, coarse_target=16, use_rect=True)
    ret = run_pipeline_parallel(sc.folder, mesh=mesh, verbose=False,
                                fusion=False, cfg=cfg)
    assert ret == 0
    for v in range(3):
        d = np.load(sc.folder / "DPE" / f"{v:08d}" / "depth.npy")
        gt = sc.gt_depths[v]
        # DepthToWeak blanks a 6-px border (min_margin, DPE.cu:2603-2607) —
        # at 32x24 that is most of the image; judge the interior.
        interior = np.zeros(d.shape, bool)
        interior[6:-6, 6:-6] = True
        valid = (d > 0) & interior
        assert valid.sum() > 0.5 * interior.sum(), (v, valid.sum())
        err = np.abs(d[valid] - gt[valid]) / gt[valid]
        assert np.median(err) < 0.05, (v, np.median(err))


def test_parallel_runner_retries_transient_fault(eight_devices, tmp_path,
                                                 monkeypatch):
    """One transient device fault must not kill a parallel round: the
    runner retries with backoff (parity with the sequential path's
    with_retry — VERDICT r3 weak #7)."""
    from dpe_mvs_tpu.config import EngineConfig
    from dpe_mvs_tpu.pipeline.parallel_schedule import run_pipeline_parallel
    from dpe_mvs_tpu.utils import retry as retry_mod

    monkeypatch.setattr(retry_mod.time, "sleep", lambda s: None)

    calls = {"n": 0}
    real = mesh_mod.sharded_sweep

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("UNAVAILABLE: injected transient fault")
        return real(*args, **kwargs)

    monkeypatch.setattr(mesh_mod, "sharded_sweep", flaky)

    sc = make_plane_scene(tmp_path, width=32, height=24, num_views=3, seed=2)
    mesh = mesh_mod.make_mesh(eight_devices[:4])
    cfg = EngineConfig(min_rounds=1, coarse_target=32)
    ret = run_pipeline_parallel(sc.folder, mesh=mesh, verbose=False,
                                fusion=False, cfg=cfg)
    assert ret == 0
    assert calls["n"] >= 2          # first call faulted, retry succeeded
    d = np.load(sc.folder / "DPE" / "00000000" / "depth.npy")
    assert (d > 0).any()


def test_with_retry_unit(monkeypatch):
    from dpe_mvs_tpu.utils.retry import with_retry

    seen = []
    out = with_retry(lambda: (seen.append(1), "ok")[1], sleep=lambda s: None)
    assert out == "ok" and len(seen) == 1

    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("UNAVAILABLE: tunnel hiccup")
        return 42

    assert with_retry(flaky, sleep=lambda s: None) == 42
    assert attempts["n"] == 3

    def oom():
        raise RuntimeError("RESOURCE_EXHAUSTED: hbm")

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        with_retry(oom, sleep=lambda s: None)

    # Deterministic errors propagate on the FIRST attempt (no retries of
    # shape errors / NaN asserts — round-4 advisor finding).
    det = {"n": 0}

    def always():
        det["n"] += 1
        raise ValueError("persistent shape mismatch")

    with pytest.raises(ValueError, match="persistent"):
        with_retry(always, sleep=lambda s: None)
    assert det["n"] == 1


def test_exchange_depths_pruned_ring(eight_devices):
    """Ring pair graphs exchange via per-shift ppermute rounds (traffic
    scales with device degree, SURVEY §2.3 #2) and match the all-gather
    semantics exactly."""
    import jax.numpy as jnp

    mesh = mesh_mod.make_mesh(eight_devices)
    H, W = 16, 20
    B, V = 8, 3
    depth = jnp.arange(B * H * W, dtype=jnp.float32).reshape(B, H, W)
    depth = mesh_mod.shard_put(mesh, depth)
    src = [[(b + 1) % B, (b + 2) % B, (b - 1) % B] for b in range(B)]
    src_index = jnp.asarray(
        mesh_mod.build_src_index(list(range(B)), src, V))
    out = np.asarray(mesh_mod.exchange_depths(mesh, depth, src_index))
    ref = np.asarray(depth)
    for b in range(B):
        for v in range(V):
            np.testing.assert_array_equal(out[b, v], ref[src[b][v]])


def test_mesh_fusion_point_count_parity(eight_devices, tmp_path):
    """Mesh-distributed fusion (SURVEY §2.3 #4) must reproduce the
    sequential fusion's point cloud up to its documented second-order
    used-mask divergence: point counts within ~1%."""
    from dpe_mvs_tpu.config import EngineConfig
    from dpe_mvs_tpu.io import formats
    from dpe_mvs_tpu.pipeline import fusion as fusion_mod
    from dpe_mvs_tpu.pipeline.schedule import run_pipeline

    sc = make_plane_scene(tmp_path, width=48, height=36, num_views=6,
                          seed=11)
    cfg = EngineConfig(min_rounds=1, coarse_target=48)
    ret = run_pipeline(sc.folder, verbose=False, fusion=True, cfg=cfg,
                       keep_intermediates=True)
    assert ret == 0
    problems = scene_mod.generate_sample_list(sc.folder)
    pts_seq, _ = formats.read_ply(sc.folder / "DPE" / "DPE.ply")

    mesh = mesh_mod.make_mesh(eight_devices)
    fusion_mod.run_fusion_mesh(sc.folder, problems, mesh)
    pts_mesh, _ = formats.read_ply(sc.folder / "DPE" / "DPE.ply")

    assert pts_seq.shape[0] > 100
    rel = abs(pts_mesh.shape[0] - pts_seq.shape[0]) / pts_seq.shape[0]
    assert rel <= 0.01, (pts_seq.shape[0], pts_mesh.shape[0])
