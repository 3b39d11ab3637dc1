"""Separable warp ops vs direct inverse-map warps (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from dpe_mvs_tpu.geometry import rectify
from dpe_mvs_tpu.ops import warp as warp_ops

from test_rectify import _pair, _np_bilinear_ref


def _setup(seed, H_in=64, W_in=96):
    K, R_ref, t_ref, Ks, R_src, t_src, W, Hh = _pair(seed, W_in, H_in)
    rp = rectify.build_rect_pair(K, R_ref, t_ref, Ks, R_src, t_src,
                                 W_in, H_in)
    wf = rectify.build_warp_fields(rp.H_ref, W_in, H_in, rp.width, rp.height)
    yy, xx = np.meshgrid(np.arange(H_in), np.arange(W_in), indexing="ij")
    img = (np.sin(0.13 * xx) * np.cos(0.09 * yy) + 0.002 * xx).astype(
        np.float32)
    x, y, _ = rectify._inverse_map(rp.H_ref, rp.width, rp.height)
    if wf.transposed_input:
        x, y = y, x
        direct_src = img.T
    else:
        direct_src = img
    return rp, wf, img, direct_src, x, y


def test_warp_separable_bilinear_matches_direct():
    for seed in range(3):
        rp, wf, img, dsrc, x, y = _setup(seed)
        out = np.asarray(warp_ops.warp_separable(
            jnp.asarray(img), jnp.asarray(wf.vpass_y),
            jnp.asarray(wf.hpass_x),
            transposed_input=wf.transposed_input, interpret=True))
        direct = _np_bilinear_ref(dsrc.astype(np.float64), x, y)
        interior = wf.valid.copy()
        interior[:2] = interior[-2:] = False
        interior[:, :2] = interior[:, -2:] = False
        err = np.abs(out - direct)[interior]
        assert err.max() < 0.05, (seed, float(err.max()))


def test_warp_channels_nearest_matches_direct():
    for seed in range(2):
        rp, wf, img, dsrc, x, y = _setup(seed)
        # A field whose values encode position, to catch index errors.
        field = np.stack([
            np.arange(img.shape[0], dtype=np.float32)[:, None].repeat(
                img.shape[1], 1),
            np.arange(img.shape[1], dtype=np.float32)[None, :].repeat(
                img.shape[0], 0),
        ])
        fsrc = np.stack([f.T for f in field]) if wf.transposed_input else field
        out = np.asarray(warp_ops.warp_channels(
            jnp.asarray(fsrc), jnp.asarray(wf.vpass_y),
            jnp.asarray(wf.hpass_x),
            transposed_input=wf.transposed_input, nearest=True,
            interpret=True))
        direct = np.stack([
            fsrc[c][np.clip(np.round(y).astype(int), 0, fsrc.shape[1] - 1),
                    np.clip(np.round(x).astype(int), 0, fsrc.shape[2] - 1)]
            for c in range(2)])
        interior = wf.valid.copy()
        interior[:2] = interior[-2:] = False
        interior[:, :2] = interior[:, -2:] = False
        # Composition of two nearest passes may land one pixel off the
        # direct nearest warp; positions must agree within 1.1 px and be
        # mostly identical.
        derr = np.abs(out - direct)[:, interior]
        assert derr.max() <= 1.1, float(derr.max())
        assert (derr <= 0.01).mean() > 0.8
