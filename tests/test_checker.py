"""Checkerboard compaction: compact/scatter/sites roundtrip invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpe_mvs_tpu.ops import checker


def _site_x(y, j, color, W):
    return min(2 * j + ((y + color) % 2), W - 1)


@pytest.mark.parametrize("H,W", [(6, 8), (5, 7), (7, 8), (4, 9)])
@pytest.mark.parametrize("color", [0, 1])
def test_roundtrip(rng, H, W, color):
    full = rng.normal(size=(H, W, 3)).astype(np.float32)
    base = rng.normal(size=(H, W, 3)).astype(np.float32)
    W2 = checker.width2(W)

    comp = np.asarray(checker.compact(jnp.asarray(full), color))
    ccx, ccy = map(np.asarray, checker.sites(H, W, color))
    assert comp.shape == (H, W2, 3)

    exp_x = np.array([[_site_x(y, j, color, W) for j in range(W2)]
                      for y in range(H)])
    np.testing.assert_array_equal(ccx, exp_x)
    np.testing.assert_array_equal(ccy, np.arange(H)[:, None] + 0 * exp_x)
    np.testing.assert_allclose(comp, full[np.arange(H)[:, None], exp_x])

    out = np.asarray(checker.scatter(jnp.asarray(base), jnp.asarray(comp),
                                     color))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    site = ((xs + ys) % 2) == color
    np.testing.assert_allclose(out[site], full[site])     # sites written
    np.testing.assert_allclose(out[~site], base[~site])   # others untouched


def test_traced_color():
    """color may be a traced value (the sweep scans over colors)."""
    rng = np.random.default_rng(1)
    full = rng.normal(size=(5, 6)).astype(np.float32)
    base = rng.normal(size=(5, 6)).astype(np.float32)

    f = jax.jit(lambda a, b, c: checker.scatter(b, checker.compact(a, c), c))
    for color in (0, 1):
        got = np.asarray(f(full, base, color))
        want = np.asarray(checker.scatter(
            jnp.asarray(base), checker.compact(jnp.asarray(full), color),
            color))
        np.testing.assert_allclose(got, want)


def test_both_colors_cover_image():
    rng = np.random.default_rng(2)
    full = rng.normal(size=(6, 9, 2)).astype(np.float32)
    zero = np.zeros_like(full)
    out = zero
    for color in (0, 1):
        comp = checker.compact(jnp.asarray(full), color)
        out = np.asarray(checker.scatter(jnp.asarray(out), comp, color))
    np.testing.assert_allclose(out, full)
