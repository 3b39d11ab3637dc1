"""NCC cost semantics tests."""
import numpy as np
import jax.numpy as jnp

from dpe_mvs_tpu.geometry import cameras as geo
from dpe_mvs_tpu.ops import ncc


def _setup(H=40, W=50, shift=0.0, rng=None):
    rng = rng or np.random.default_rng(0)
    img = rng.uniform(0, 255, (H, W + 8)).astype(np.float32)
    ref = img[:, :W]
    src = img[:, int(shift):W + int(shift)]
    K = np.array([[45.0, 0, W / 2], [0, 45.0, H / 2], [0, 0, 1]], np.float32)
    cam = geo.Camera(K=jnp.asarray(K), R=jnp.eye(3), t=jnp.zeros(3))
    px, py = geo.pixel_grid(H, W)
    return ref, src, cam, px, py


def test_identity_warp_zero_cost(rng):
    """Same image + identity homography -> NCC cost ~ 0 everywhere textured."""
    ref, src, cam, px, py = _setup(rng=rng)
    plane = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (*px.shape, 3)),
         jnp.full((*px.shape, 1), 4.0)], -1)
    hom = ncc.homography_field(cam, cam.K, jnp.eye(3), jnp.zeros(3),
                               plane, px, py)
    offs = ncc.window_offsets(5, 2)
    cost = np.asarray(ncc.bilateral_ncc(
        jnp.asarray(ref), jnp.asarray(ref), hom, px, py, offs, 5.0, 3.0,
        jnp.asarray(ref)))
    assert np.median(cost) < 0.01


def test_flat_patch_cost_max(rng):
    """Zero-variance windows -> COST_MAX (kMinVar guard, DPE.cu:766-769)."""
    H, W = 30, 30
    ref = jnp.full((H, W), 128.0)
    cam = geo.Camera(
        K=jnp.asarray(np.array([[30.0, 0, 15], [0, 30, 15], [0, 0, 1]],
                               np.float32)),
        R=jnp.eye(3), t=jnp.zeros(3))
    px, py = geo.pixel_grid(H, W)
    plane = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (H, W, 3)),
         jnp.full((H, W, 1), 2.0)], -1)
    hom = ncc.homography_field(cam, cam.K, jnp.eye(3), jnp.zeros(3),
                               plane, px, py)
    cost = np.asarray(ncc.bilateral_ncc(
        ref, ref, hom, px, py, ncc.window_offsets(5, 2), 5.0, 3.0, ref))
    np.testing.assert_allclose(cost, 2.0)


def test_oob_center_cost_max(rng):
    """Warp landing outside the source image -> COST_MAX (DPE.cu:577-580)."""
    ref, src, cam, px, py = _setup(rng=rng)
    # Huge translation pushes everything out of frame.
    t_rel = jnp.asarray([100.0, 0.0, 0.0])
    plane = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (*px.shape, 3)),
         jnp.full((*px.shape, 1), 0.5)], -1)
    hom = ncc.homography_field(cam, cam.K, jnp.eye(3), t_rel, plane, px, py)
    cost = np.asarray(ncc.bilateral_ncc(
        jnp.asarray(ref), jnp.asarray(src), hom, px, py,
        ncc.window_offsets(5, 2), 5.0, 3.0, jnp.asarray(ref)))
    assert (cost == 2.0).mean() > 0.9


def test_adaptive_scale_matches_explicit_offsets(rng):
    """scale=2 with the base stencil == radius-10/increment-4 window."""
    ref, src, cam, px, py = _setup(rng=rng)
    plane = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (*px.shape, 3)),
         jnp.full((*px.shape, 1), 4.0)], -1)
    hom = ncc.homography_field(cam, cam.K, jnp.eye(3),
                               jnp.asarray([0.05, 0.0, 0.0]), plane, px, py)
    ref_j = jnp.asarray(ref)
    src_j = jnp.asarray(src)
    c_scaled = np.asarray(ncc.bilateral_ncc(
        ref_j, src_j, hom, px, py, ncc.window_offsets(5, 2), 5.0, 3.0, ref_j,
        scale=jnp.full(px.shape, 2.0)))
    c_explicit = np.asarray(ncc.bilateral_ncc(
        ref_j, src_j, hom, px, py, ncc.window_offsets(10, 4), 5.0, 3.0, ref_j))
    np.testing.assert_allclose(c_scaled, c_explicit, rtol=1e-4, atol=1e-4)


def test_geom_consistency_perfect_depths(rng):
    """Consistent depth maps -> near-zero geometric cost."""
    H, W = 24, 32
    K = np.array([[30.0, 0, 16], [0, 30, 12], [0, 0, 1]], np.float32)
    ref = geo.Camera(K=jnp.asarray(K), R=jnp.eye(3), t=jnp.zeros(3))
    src = geo.Camera(K=jnp.asarray(K), R=jnp.eye(3),
                     t=jnp.asarray([0.2, 0.0, 0.0]))
    px, py = geo.pixel_grid(H, W)
    depth0 = 3.0
    n = jnp.asarray([0.0, 0.0, -1.0])
    plane = geo.plane_from_depth_normal(ref, px, py, jnp.full((H, W), depth0), n)
    # Source view of the fronto-parallel plane: depth is depth0 everywhere.
    src_depth = jnp.full((H, W), depth0)
    cost = np.asarray(ncc.geom_consistency_cost(ref, src, src_depth, plane,
                                                px, py))
    assert np.median(cost) < 0.05


def test_ref_cache_equivalence(rng):
    """bilateral_ncc with a ref-side cache must match the uncached path."""
    import jax.numpy as jnp2
    ref, src, cam, px, py = _setup(rng=rng)
    plane = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray([0.1, -0.05, -0.99]), (*px.shape, 3)),
         jnp.full((*px.shape, 1), 3.5)], -1)
    hom = ncc.homography_field(cam, cam.K, jnp.eye(3),
                               jnp.asarray([0.07, 0.01, 0.0]), plane, px, py)
    offs = ncc.window_offsets(5, 2)
    ref_j = jnp.asarray(ref)
    src_j = jnp.asarray(src)
    base = np.asarray(ncc.bilateral_ncc(
        ref_j, src_j, hom, px, py, offs, 5.0, 3.0, ref_j))
    cache = ncc.make_ref_cache(ref_j, px, py, offs, 5.0, 3.0, ref_j)
    cached = np.asarray(ncc.bilateral_ncc(
        ref_j, src_j, hom, px, py, offs, 5.0, 3.0, ref_j, ref_cache=cache))
    np.testing.assert_allclose(cached, base, rtol=1e-5, atol=1e-5)

    # Scaled (adaptive radius) variant.
    scale = jnp.full(px.shape, 2.0)
    base_s = np.asarray(ncc.bilateral_ncc(
        ref_j, src_j, hom, px, py, offs, 5.0, 3.0, ref_j, scale=scale))
    cache_s = ncc.make_ref_cache(ref_j, px, py, offs, 5.0, 3.0, ref_j,
                                 scale=scale)
    cached_s = np.asarray(ncc.bilateral_ncc(
        ref_j, src_j, hom, px, py, offs, 5.0, 3.0, ref_j, scale=scale,
        ref_cache=cache_s))
    # f32 accumulation-order differences can flip isolated pixels across the
    # kMinVar / clip thresholds; require element-wise match on 99.5%.
    close = np.isclose(cached_s, base_s, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, close.mean()
