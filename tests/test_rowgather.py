"""Pallas row-gather primitive vs NumPy reference (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from dpe_mvs_tpu.ops import rowgather


def test_row_gather_exact():
    rng = np.random.default_rng(0)
    H, W, L = 37, 300, 200      # deliberately unaligned
    img = rng.random((H, W)).astype(np.float32)
    ix = rng.integers(-5, W + 5, (H, L)).astype(np.int32)
    out = np.asarray(rowgather.row_gather(jnp.asarray(img), jnp.asarray(ix)))
    ref = np.take_along_axis(img, np.clip(ix, 0, W - 1), axis=1)
    np.testing.assert_array_equal(out, ref)


def test_row_gather_int_dtype():
    rng = np.random.default_rng(1)
    H, W = 16, 128
    img = rng.integers(0, 1000, (H, W)).astype(np.int32)
    ix = rng.integers(0, W, (H, W)).astype(np.int32)
    out = np.asarray(rowgather.row_gather(jnp.asarray(img), jnp.asarray(ix)))
    ref = np.take_along_axis(img, ix, axis=1)
    np.testing.assert_array_equal(out, ref)


def test_bilinear_x_matches_lerp():
    rng = np.random.default_rng(2)
    H, W, L = 24, 250, 140
    img = rng.random((H, W)).astype(np.float32)
    x = (rng.random((H, L)) * (W + 6) - 3).astype(np.float32)
    out = np.asarray(rowgather.bilinear_x(jnp.asarray(img), jnp.asarray(x)))

    xc = np.clip(x, 0.0, W - 1.0)
    x0 = np.clip(np.floor(xc), 0, W - 2)
    f = xc - x0
    g0 = np.take_along_axis(img, x0.astype(np.int64), axis=1)
    g1 = np.take_along_axis(img, x0.astype(np.int64) + 1, axis=1)
    ref = g0 * (1 - f) + g1 * f
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_bilinear_x_integer_coords_hit_texels():
    rng = np.random.default_rng(3)
    H, W = 9, 130
    img = rng.random((H, W)).astype(np.float32)
    x = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    out = np.asarray(rowgather.bilinear_x(jnp.asarray(img), jnp.asarray(x)))
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_kernel_interpret_matches_fallback():
    """The Pallas kernels (interpret mode) agree with the CPU fast path —
    covers the banded q-loop logic that runs on TPU."""
    import jax.numpy as jnp
    import numpy as np
    from dpe_mvs_tpu.ops import rowgather

    rng = np.random.default_rng(5)
    img = rng.standard_normal((16, 96)).astype(np.float32)
    ix = rng.integers(-3, 99, (16, 40)).astype(np.int32)
    k = np.asarray(rowgather.row_gather(jnp.asarray(img), jnp.asarray(ix),
                                        interpret=True))
    f = np.asarray(rowgather.row_gather(jnp.asarray(img), jnp.asarray(ix)))
    np.testing.assert_array_equal(k, f)

    x = rng.uniform(-2, 98, (16, 40)).astype(np.float32)
    kb = np.asarray(rowgather.bilinear_x(jnp.asarray(img), jnp.asarray(x),
                                         interpret=True))
    fb = np.asarray(rowgather.bilinear_x(jnp.asarray(img), jnp.asarray(x)))
    np.testing.assert_allclose(kb, fb, rtol=1e-6, atol=1e-6)
