"""Unit tests for the pointer-doubling support maps vs brute-force NumPy."""
import numpy as np
import jax.numpy as jnp

from dpe_mvs_tpu.ops import support


def brute_ray_first_hit(mask, dx, dy, max_steps):
    H, W = mask.shape
    out = np.full((H, W), np.inf, np.float32)
    for y in range(H):
        for x in range(W):
            for t in range(1, max_steps + 1):
                yy, xx = y + dy * t, x + dx * t
                if not (0 <= yy < H and 0 <= xx < W):
                    break
                if mask[yy, xx]:
                    out[y, x] = t
                    break
    return out


def test_ray_first_hit_matches_brute(rng):
    mask = rng.random((18, 23)) < 0.07
    for dx, dy in [(1, 0), (0, 1), (-1, -1), (2, 1)]:
        got = np.asarray(support.ray_first_hit(jnp.asarray(mask), dx, dy, 32))
        want = brute_ray_first_hit(mask, dx, dy, 32)
        got = np.where(got >= support.INF, np.inf, got)
        np.testing.assert_array_equal(got, want)


def test_edge_steps_shape(rng):
    mask = rng.random((16, 16)) < 0.1
    es = np.asarray(support.edge_steps(jnp.asarray(mask), 16))
    assert es.shape == (8, 16, 16)


def test_label_run_length(rng):
    label = np.zeros((10, 12), np.int32)
    label[2:8, 3:9] = 5
    runs = np.asarray(support.label_run_length(jnp.asarray(label), 16))
    # Right-direction run at (row 4, col 3): cols 3..8 share label 5 -> run 5.
    d_right = list(map(tuple, support.DIR8)).index((1, 0))
    assert runs[d_right, 4, 3] == 5
    assert runs[d_right, 4, 8] == 0  # next col is background


def test_jfa_nearest_matches_brute(rng):
    mask = rng.random((20, 25)) < 0.05
    mask[7, 11] = True  # ensure at least one seed
    coords, valid = support.jfa_nearest(jnp.asarray(mask), 1e9)
    coords = np.asarray(coords)
    ys, xs = np.nonzero(mask)
    seeds = np.stack([xs, ys], -1)
    for y in range(20):
        for x in range(25):
            d = np.hypot(seeds[:, 0] - x, seeds[:, 1] - y)
            best = d.min()
            got = coords[y, x]
            gd = np.hypot(got[0] - x, got[1] - y)
            assert gd <= best + 1e-3, (x, y, got, best)


def test_box_density_uniform():
    mask = jnp.ones((12, 15), bool)
    d = np.asarray(support.box_density(mask, 2))
    np.testing.assert_allclose(d, 1.0)


def test_box_density_counts(rng):
    mask = rng.random((14, 17)) < 0.3
    d = np.asarray(support.box_density(jnp.asarray(mask), 1))
    # Check one interior pixel against the brute-force 3x3 box.
    y, x = 5, 6
    want = mask[y - 1:y + 2, x - 1:x + 2].mean()
    np.testing.assert_allclose(d[y, x], want, rtol=1e-6)


def test_line_of_sight_blocks_across_edge():
    H, W = 32, 32
    edge_low = np.zeros((16, 16), bool)
    edge_low[:, 8] = True  # vertical wall in low-res coords
    los = support.build_line_of_sight(jnp.asarray(edge_low), W, H,
                                      high_res_img=False)
    edge_full = jnp.zeros((H, W), bool)
    ax = jnp.asarray([2.0, 2.0])
    ay = jnp.asarray([16.0, 2.0])
    bx = jnp.asarray([29.0, 6.0])   # first crosses the wall, second doesn't
    by = jnp.asarray([16.0, 2.0])
    crossing = np.asarray(los.crossing(ax, ay, bx, by, edge_full))
    assert crossing[0]
    assert not crossing[1]
