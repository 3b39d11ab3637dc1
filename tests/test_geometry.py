"""Golden tests for the projective geometry library.

Strategy (SURVEY.md §4): each jnp function is checked against an independent
NumPy formulation of the same math — plane-induced homographies are verified
by transferring actual 3D plane points between cameras.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dpe_mvs_tpu.geometry import cameras as geo


def make_camera(rng, fx=700.0, fy=710.0, cx=320.0, cy=240.0, seed_t=None):
    # Random small rotation.
    w = rng.normal(size=3) * 0.2
    theta = np.linalg.norm(w)
    k = w / (theta + 1e-12)
    K_ = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(theta) * K_ + (1 - np.cos(theta)) * K_ @ K_
    t = rng.normal(size=3) if seed_t is None else np.asarray(seed_t, float)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    return geo.Camera(K=jnp.asarray(K, jnp.float32),
                      R=jnp.asarray(R, jnp.float32),
                      t=jnp.asarray(t, jnp.float32))


def test_center_roundtrip(rng):
    cam = make_camera(rng)
    c = np.asarray(cam.center)
    # R @ c + t == 0
    res = np.asarray(cam.R) @ c + np.asarray(cam.t)
    np.testing.assert_allclose(res, 0.0, atol=1e-5)


def test_backproject_project_roundtrip(rng):
    cam = make_camera(rng)
    x = jnp.asarray([10.0, 300.5, 639.0])
    y = jnp.asarray([5.0, 200.25, 479.0])
    depth = jnp.asarray([2.0, 5.0, 9.0])
    Xw = geo.backproject_to_world(cam, x, y, depth)
    px, py, d = geo.project_to_camera(cam, Xw)
    np.testing.assert_allclose(np.asarray(px), np.asarray(x), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(py), np.asarray(y), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d), np.asarray(depth), rtol=1e-5)


def test_depth_from_plane_consistency(rng):
    """plane built from (depth, normal) at p must give the same depth back."""
    cam = make_camera(rng)
    x = jnp.asarray([100.0, 320.0, 50.0])
    y = jnp.asarray([80.0, 240.0, 400.0])
    depth = jnp.asarray([3.0, 6.0, 1.5])
    n = jnp.asarray([[0.1, 0.2, -0.97], [0.0, 0.0, -1.0], [-0.3, 0.1, -0.94]])
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    plane = geo.plane_from_depth_normal(cam, x, y, depth, n)
    d2 = geo.depth_from_plane(cam, plane, x, y)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(depth), rtol=1e-4)


def test_homography_transfers_plane_points(rng):
    """H maps ref pixels of 3D points ON the plane to their src projections."""
    ref = make_camera(rng)
    src = make_camera(rng, fx=650.0, fy=655.0, seed_t=[0.3, -0.1, 0.05])

    # A plane in ref-camera coordinates.
    n = np.array([0.2, -0.1, -0.97])
    n = n / np.linalg.norm(n)
    # Pick a pixel and depth; build the plane through that 3D point.
    px0, py0, d0 = 250.0, 180.0, 4.0
    plane = geo.plane_from_depth_normal(
        ref, jnp.float32(px0), jnp.float32(py0), jnp.float32(d0),
        jnp.asarray(n, jnp.float32))

    H = geo.homography_from_plane(ref, src, plane)

    # Sample other pixels; find their depth on the plane; verify transfer.
    for px, py in [(100.0, 90.0), (400.5, 300.25), (250.0, 180.0)]:
        dd = geo.depth_from_plane(ref, plane, jnp.float32(px), jnp.float32(py))
        X_ref_cam = np.asarray(
            geo.backproject(ref, jnp.float32(px), jnp.float32(py), dd))
        # Ref-cam -> world -> src projection.
        Xw = np.asarray(geo.cam_point_to_world(ref, jnp.asarray(X_ref_cam)))
        sx, sy, _sd = geo.project_to_camera(src, jnp.asarray(Xw, jnp.float32))
        # Homography transfer.
        hx, hy = geo.apply_homography(H, jnp.float32(px), jnp.float32(py))
        np.testing.assert_allclose(float(hx), float(sx), rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(float(hy), float(sy), rtol=2e-3, atol=2e-2)


def test_normal_transforms_are_inverse(rng):
    cam = make_camera(rng)
    n = jnp.asarray([0.3, -0.4, -0.866], jnp.float32)
    n = n / jnp.linalg.norm(n)
    nw = geo.normal_cam_to_world(cam, n)
    nc = geo.normal_world_to_cam(cam, nw)
    np.testing.assert_allclose(np.asarray(nc), np.asarray(n), atol=1e-5)


def test_relative_transform(rng):
    ref = make_camera(rng)
    src = make_camera(rng, seed_t=[1.0, 0.0, 0.0])
    R_rel, t_rel = geo.relative_transform(ref, src)
    # A world point: transfer via both paths.
    Xw = np.array([0.4, -0.2, 5.0], np.float32)
    X_ref = np.asarray(ref.R) @ Xw + np.asarray(ref.t)
    X_src_direct = np.asarray(src.R) @ Xw + np.asarray(src.t)
    X_src_rel = np.asarray(R_rel) @ X_ref + np.asarray(t_rel)
    np.testing.assert_allclose(X_src_rel, X_src_direct, rtol=1e-4, atol=1e-4)
