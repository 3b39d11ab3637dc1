"""Rectification invariants: row alignment, affine disparity, warp fields."""
import numpy as np
import pytest

from dpe_mvs_tpu.geometry import cameras as geo
from dpe_mvs_tpu.geometry import rectify


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _pair(seed=0, width=160, height=120):
    rng = np.random.default_rng(seed)
    K = np.array([[140.0, 0, width / 2], [0, 140.0, height / 2], [0, 0, 1]])
    R_ref = _rot(rng.standard_normal(3), 0.05 * rng.standard_normal())
    c_ref = np.array([0.0, 0.0, 0.0])
    # Mostly-lateral baseline with some jitter.
    c_src = np.array([1.0, 0.15, 0.08]) + 0.05 * rng.standard_normal(3)
    R_src = _rot(rng.standard_normal(3), 0.08 * rng.standard_normal())
    t_ref = -R_ref @ c_ref
    t_src = -R_src @ c_src
    return K, R_ref, t_ref, K.copy(), R_src, t_src, width, height


def _random_plane(rng, K, width, height):
    """A plane hypothesis (n, d) in ref-cam frame with positive depth at a
    random pixel."""
    n = rng.standard_normal(3)
    n[2] = -abs(n[2]) - 1.0   # facing the camera
    n = n / np.linalg.norm(n)
    x = rng.uniform(10, width - 10)
    y = rng.uniform(10, height - 10)
    depth = rng.uniform(3.0, 8.0)
    X = depth * np.array([(x - K[0, 2]) / K[0, 0],
                          (y - K[1, 2]) / K[1, 1], 1.0])
    d = -n @ X
    return np.array([*n, d]), x, y, depth


def test_rows_align_and_disparity_affine():
    rng = np.random.default_rng(1)
    for seed in range(5):
        args = _pair(seed)
        K, R_ref, t_ref, Ks, R_src, t_src, W, H = args
        rp = rectify.build_rect_pair(K, R_ref, t_ref, Ks, R_src, t_src, W, H)
        assert rp.b > 0 and rp.quality > 0.1

        ref_cam = geo.Camera(K=K, R=R_ref, t=t_ref)
        src_cam = geo.Camera(K=Ks, R=R_src, t=t_src)
        for _ in range(10):
            plane, x, y, depth = _random_plane(rng, K, W, H)
            Hm = np.asarray(geo.homography_from_plane(
                ref_cam, src_cam, plane.astype(np.float32)))
            sx, sy = rectify._apply_h(Hm.astype(np.float64),
                                      np.array([[x, y]]))[0]

            # Same 3-D point through the rectified frames.
            rx, ry = rectify._apply_h(rp.H_ref, np.array([[x, y]]))[0]
            rsx, rsy = rectify._apply_h(rp.H_src, np.array([[sx, sy]]))[0]
            assert abs(ry - rsy) < 1e-3, "rows must align for any plane"

            # Affine disparity formula reproduces the rectified src x.
            nr = rp.R2r @ plane[:3]
            gx, gy, g0 = rectify.disparity_coeffs(
                nr[None], plane[3:4], rp.f, rp.b)
            x_pred = rx + gx[0] * (rx - rp.cx) + gy[0] * (ry - rp.cy) + g0[0]
            assert abs(x_pred - rsx) < 1e-3 * max(1.0, abs(rsx))


def test_rect_depth_sign_and_value():
    """z = -d / (nr . p~) in the rectified frame equals the true rect depth."""
    rng = np.random.default_rng(3)
    K, R_ref, t_ref, Ks, R_src, t_src, W, H = _pair(2)
    rp = rectify.build_rect_pair(K, R_ref, t_ref, Ks, R_src, t_src, W, H)
    for _ in range(10):
        plane, x, y, depth = _random_plane(rng, K, W, H)
        X_ref = depth * np.array([(x - K[0, 2]) / K[0, 0],
                                  (y - K[1, 2]) / K[1, 1], 1.0])
        X_rect = rp.R2r @ X_ref
        rx, ry = rectify._apply_h(rp.H_ref, np.array([[x, y]]))[0]
        nr = rp.R2r @ plane[:3]
        p = np.array([(rx - rp.cx) / rp.f, (ry - rp.cy) / rp.f, 1.0])
        z = -plane[3] / (nr @ p)
        assert z > 0
        np.testing.assert_allclose(z, X_rect[2], rtol=1e-6)
        # And the projection of X_rect lands at (rx, ry).
        np.testing.assert_allclose(rp.f * X_rect[0] / X_rect[2] + rp.cx, rx,
                                   rtol=0, atol=1e-5)


def _np_bilinear_ref(img, x, y):
    H, W = img.shape
    x = np.clip(x, 0, W - 1)
    y = np.clip(y, 0, H - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, H - 2)
    fx, fy = x - x0, y - y0
    top = img[y0, x0] * (1 - fx) + img[y0, x0 + 1] * fx
    bot = img[y0 + 1, x0] * (1 - fx) + img[y0 + 1, x0 + 1] * fx
    return top * (1 - fy) + bot * fy


def test_warp_fields_match_direct_warp():
    """Two-pass vertical+horizontal resampling == direct inverse-map warp."""
    rng = np.random.default_rng(0)
    H_in, W_in = 96, 128
    yy, xx = np.meshgrid(np.arange(H_in), np.arange(W_in), indexing="ij")
    img = (np.sin(0.11 * xx) + np.cos(0.07 * yy)
           + 0.01 * xx * yy / 100).astype(np.float64)

    for seed in range(4):
        K, R_ref, t_ref, Ks, R_src, t_src, W, Hh = _pair(seed, W_in, H_in)
        rp = rectify.build_rect_pair(K, R_ref, t_ref, Ks, R_src, t_src,
                                     W_in, H_in)
        wf = rectify.build_warp_fields(rp.H_ref, W_in, H_in,
                                       rp.width, rp.height)
        src = img.T if wf.transposed_input else img
        # Pass 1: vertical (column) resample.
        tmp = np.empty((rp.height, src.shape[1]))
        for c in range(src.shape[1]):
            tmp[:, c] = _np_bilinear_ref(src, np.full(rp.height, c),
                                         wf.vpass_y[:, c])
        # Pass 2: horizontal (row) resample.
        out = np.empty((rp.height, rp.width))
        for r in range(rp.height):
            out[r] = _np_bilinear_ref(tmp[r:r + 1].repeat(2, 0),
                                      wf.hpass_x[r], np.zeros(rp.width))

        # Direct warp.
        x, y, _ = rectify._inverse_map(rp.H_ref, rp.width, rp.height)
        direct = _np_bilinear_ref(img.T if wf.transposed_input else img,
                                  np.clip(x, 0, src.shape[1] - 1),
                                  np.clip(y, 0, src.shape[0] - 1))

        m = wf.valid
        # Away from borders the separable warp matches the direct warp.
        interior = m.copy()
        interior[:2] = interior[-2:] = False
        interior[:, :2] = interior[:, -2:] = False
        err = np.abs(out - direct)[interior]
        assert err.max() < 0.05, (seed, err.max())
        assert m.mean() > 0.2  # a healthy chunk of the frame is valid
