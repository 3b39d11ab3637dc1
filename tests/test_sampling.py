"""Bilinear/nearest sampling vs an independent NumPy implementation."""
import numpy as np
import jax.numpy as jnp

from dpe_mvs_tpu.ops import sampling


def np_bilinear_clamp(img, x, y):
    H, W = img.shape
    x = np.clip(x, 0.0, W - 1.0)
    y = np.clip(y, 0.0, H - 1.0)
    x0 = np.clip(np.floor(x), 0, W - 2).astype(int)
    y0 = np.clip(np.floor(y), 0, H - 2).astype(int)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


def test_bilinear_matches_numpy(rng):
    img = rng.uniform(0, 255, size=(37, 53)).astype(np.float32)
    x = rng.uniform(-5, 60, size=(11, 13)).astype(np.float32)
    y = rng.uniform(-5, 45, size=(11, 13)).astype(np.float32)
    got = np.asarray(sampling.bilinear(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))
    want = np_bilinear_clamp(img, x, y)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_bilinear_integer_coords_exact(rng):
    img = rng.uniform(0, 255, size=(20, 30)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(20), np.arange(30), indexing="ij")
    got = np.asarray(sampling.bilinear(jnp.asarray(img),
                                       jnp.asarray(xs, jnp.float32),
                                       jnp.asarray(ys, jnp.float32)))
    np.testing.assert_allclose(got, img, rtol=1e-6)


def test_nearest_floor_semantics(rng):
    img = rng.uniform(0, 10, size=(16, 16)).astype(np.float32)
    # reference: tex2D(depth, (int)x + 0.5, ...) -> texel floor(x)
    x = jnp.asarray([3.9, 7.2, 15.99, -2.0])
    y = jnp.asarray([0.1, 7.9, 15.01, 20.0])
    got = np.asarray(sampling.nearest(jnp.asarray(img), x, y))
    want = img[[0, 7, 15, 15], [3, 7, 15, 0]]
    np.testing.assert_allclose(got, want)


def test_shift_clamps_edges(rng):
    img = rng.uniform(size=(8, 9)).astype(np.float32)
    for dy, dx in [(0, 0), (1, 0), (-1, 0), (0, 3), (-2, -2), (3, -1)]:
        got = np.asarray(sampling.shift(jnp.asarray(img), dy, dx))
        yy = np.clip(np.arange(8) + dy, 0, 7)
        xx = np.clip(np.arange(9) + dx, 0, 8)
        want = img[np.ix_(yy, xx)]
        np.testing.assert_allclose(got, want)


def test_lookup_int(rng):
    img = rng.integers(0, 100, size=(10, 12)).astype(np.int32)
    ix = jnp.asarray([0, 11, 13, -1])
    iy = jnp.asarray([0, 9, -3, 12])
    got = np.asarray(sampling.lookup_int(jnp.asarray(img), ix, iy))
    want = img[[0, 9, 0, 9], [0, 11, 11, 0]]
    np.testing.assert_allclose(got, want)
