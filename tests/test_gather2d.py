"""Banded 2-D gather kernel (ops/gather2d.py).

The Pallas kernel path is exercised in interpret mode at tiny sizes (it is
the TPU execution path of every anchor gather); the CPU fast path
(vectorized XLA gather) is checked for equality with it.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dpe_mvs_tpu.ops.gather2d import gather2d
from dpe_mvs_tpu.ops import sampling


def _ref(imgs, iy, ix):
    H, W = imgs.shape[-2:]
    return imgs[..., np.clip(iy, 0, H - 1), np.clip(ix, 0, W - 1)]


def test_kernel_matches_reference_local():
    rng = np.random.default_rng(0)
    C, H, W = 2, 40, 64
    imgs = rng.standard_normal((C, H, W)).astype(np.float32)
    Qh, Qw = 8, 24
    yy, xx = np.meshgrid(np.arange(Qh), np.arange(Qw), indexing="ij")
    iy = (yy * 3 + rng.integers(-6, 6, (Qh, Qw))).astype(np.int32)
    ix = (xx * 2 + rng.integers(-10, 10, (Qh, Qw))).astype(np.int32)
    out = np.asarray(gather2d(jnp.asarray(imgs), jnp.asarray(iy),
                              jnp.asarray(ix), interpret=True))
    np.testing.assert_array_equal(out, _ref(imgs, iy, ix))


def test_kernel_matches_reference_scattered():
    rng = np.random.default_rng(1)
    C, H, W = 1, 32, 48
    imgs = rng.standard_normal((C, H, W)).astype(np.float32)
    iy = rng.integers(-4, H + 4, (4, 12)).astype(np.int32)
    ix = rng.integers(-4, W + 4, (4, 12)).astype(np.int32)
    out = np.asarray(gather2d(jnp.asarray(imgs), jnp.asarray(iy),
                              jnp.asarray(ix), interpret=True))
    np.testing.assert_array_equal(out, _ref(imgs, iy, ix))


def test_cpu_fast_path_matches_kernel():
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((1, 32, 40)).astype(np.float32)
    iy = rng.integers(0, 32, (6, 10)).astype(np.int32)
    ix = rng.integers(0, 40, (6, 10)).astype(np.int32)
    fast = np.asarray(gather2d(jnp.asarray(imgs), jnp.asarray(iy),
                               jnp.asarray(ix)))          # CPU fallback
    kern = np.asarray(gather2d(jnp.asarray(imgs), jnp.asarray(iy),
                               jnp.asarray(ix), interpret=True))
    np.testing.assert_array_equal(fast, kern)


def test_2d_image_and_int_dtype():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 1000, (24, 32)).astype(np.int32)
    iy = rng.integers(0, 24, (4, 8)).astype(np.int32)
    ix = rng.integers(0, 32, (4, 8)).astype(np.int32)
    out = np.asarray(gather2d(jnp.asarray(img), jnp.asarray(iy),
                              jnp.asarray(ix), interpret=True))
    np.testing.assert_array_equal(out, _ref(img, iy, ix))


def test_hbm_kernel_misaligned_band():
    """The windowed-DMA (HBM) path with a query band whose min row/col is
    tile-misaligned and whose extent crosses a BR/BC window boundary —
    regression test for the band-origin alignment bug (queries in the first
    partial tile of the band silently read 0)."""
    from dpe_mvs_tpu.ops import gather2d as g2d
    rng = np.random.default_rng(5)
    C, H, W = 1, 96, 160
    imgs = rng.standard_normal((C, H, W)).astype(np.float32)
    Qh, Qw = g2d.QROWS, g2d.LANES
    # band rows 7..(7+BR) crosses the first BR window; cols 5..(5+BC_span)
    iy = rng.integers(7, min(H, 7 + g2d.BR + 8), (Qh, Qw)).astype(np.int32)
    ix = rng.integers(5, W, (Qh, Qw)).astype(np.int32)
    out = np.asarray(g2d._gather2d_hbm(
        jnp.asarray(imgs), jnp.asarray(iy), jnp.asarray(ix),
        interpret=True))[:C, :Qh, :Qw]
    np.testing.assert_array_equal(out, _ref(imgs, iy, ix))


def test_take_last_and_pick_last():
    rng = np.random.default_rng(4)
    arr = rng.standard_normal((5, 6, 9)).astype(np.float32)
    idx = rng.integers(0, 9, (5, 6, 4)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(sampling.take_last(jnp.asarray(arr), jnp.asarray(idx))),
        np.take_along_axis(arr, idx, axis=-1))
    idx1 = rng.integers(0, 9, (5, 6)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(sampling.pick_last(jnp.asarray(arr), jnp.asarray(idx1))),
        np.take_along_axis(arr, idx1[..., None], axis=-1)[..., 0])
