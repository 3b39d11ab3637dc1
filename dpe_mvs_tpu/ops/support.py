"""Per-sweep support maps: edge distances, nearest-strong, line-of-sight.

TPU-native replacements for the reference's per-pixel walking kernels — all
data-dependent while-loops become O(log N) *pointer-doubling* passes:

  - ``GenEdgeInform`` (DPE.cu:2483-2591): per-direction walk to the nearest
    edge pixel  -> :func:`ray_first_hit_multi` doubling;
    edge-density "complexity" map -> integral-image box filter;
    label-region boundary walk -> :func:`label_run_length` doubling
    (contiguous-run semantics; the reference walks through *other* regions
    and remembers the last same-label pixel, which only differs on
    non-convex comb-shaped regions).
  - ``FindNearestStrongPoint`` (DPE.cu:2855-2889): ring search to radius 100
    -> jump-flooding (exact Euclidean nearest vs. the reference's
    first-in-Chebyshev-ring, a strictly better neighbour).
  - ``BresenhamLine`` (DPE.cu:158-250): per-call low-res line walk ->
    precomputed free-path distances along 16 quantized directions; a
    line-of-sight query becomes two table lookups.

All doubling passes are vectorized over the direction axis and run their
log-N levels in a single ``fori_loop`` body (dynamic shift distances become
clamped gathers), keeping the traced program tiny — compile time was the
bottleneck with unrolled static-shift chains.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = float(1e9)  # python float: stays an HLO literal, never a hoisted const arg

# 8 walk directions in the reference's order (DPE.cu:2498) as (dx, dy).
DIR8 = np.array(
    [[0, -1], [0, 1], [-1, 0], [1, 0], [-1, -1], [1, 1], [-1, 1], [1, -1]],
    np.int32,
)

# 16 quantized directions for line-of-sight tests (integer lattice steps).
DIR16 = np.array(
    [
        [1, 0], [2, 1], [1, 1], [1, 2],
        [0, 1], [-1, 2], [-1, 1], [-2, 1],
        [-1, 0], [-2, -1], [-1, -1], [-1, -2],
        [0, -1], [1, -2], [1, -1], [2, -1],
    ],
    np.int32,
)
DIR16_LEN = np.linalg.norm(DIR16, axis=1).astype(np.float32)
DIR16_ANGLE = np.arctan2(DIR16[:, 1].astype(np.float64),
                         DIR16[:, 0].astype(np.float64))


def shift_fill(arr: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """result[y, x] = arr[y+dy, x+dx], out-of-bounds -> fill. Static offsets."""
    H, W = arr.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(arr, ((py1, py0), (px1, px0)), mode="constant",
                     constant_values=fill)
    return jax.lax.dynamic_slice(padded, (py1 + dy, px1 + dx), (H, W))


def _grids(H: int, W: int):
    xg = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    yg = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    return xg, yg


def _gather_planes(field: jnp.ndarray, ty: jnp.ndarray, tx: jnp.ndarray,
                   oob_fill) -> jnp.ndarray:
    """field (D, H, W); per-plane *uniform* dynamic offsets. ty/tx (D, H, W)
    absolute indices of the form grid + per-plane constant; out-of-bounds ->
    oob_fill.

    Every caller shifts each plane by one (possibly traced) offset, so this
    is a dynamic roll + edge mask per plane — XLA TPU would serialize the
    equivalent flat ``jnp.take`` into a per-index loop (BASELINE.md)."""
    D, H, W = field.shape
    xg = jnp.arange(W, dtype=jnp.int32)[None, :]
    yg = jnp.arange(H, dtype=jnp.int32)[:, None]
    # ty = grid + per-plane offset and grid[0, 0] == 0, so the offsets are
    # the corner values.
    off_y = ty[:, 0, 0]
    off_x = tx[:, 0, 0]

    def one(img, oy, ox):
        rolled = jnp.roll(img, (-oy, -ox), axis=(0, 1))
        ok = (yg + oy >= 0) & (yg + oy < H) & \
            (xg + ox >= 0) & (xg + ox < W)
        return jnp.where(ok, rolled, oob_fill)

    return jax.vmap(one)(field, off_y, off_x)


def ray_first_hit_multi(mask: jnp.ndarray, vecs: np.ndarray, max_steps: int
                        ) -> jnp.ndarray:
    """(D, H, W) distance in steps of vecs[d] to the first True of ``mask``
    strictly along each ray; INF if none within ``max_steps`` (rounded up to
    a power of two). Pointer doubling, one fori_loop level per power of two.
    """
    H, W = mask.shape
    D = vecs.shape[0]
    vx = jnp.asarray(vecs[:, 0], jnp.int32)[:, None, None]
    vy = jnp.asarray(vecs[:, 1], jnp.int32)[:, None, None]
    xg, yg = _grids(H, W)

    m = jnp.broadcast_to(mask, (D, H, W)).astype(jnp.float32)
    hit1 = _gather_planes(
        jnp.where(m > 0, 1.0, 0.0), yg + vy, xg + vx, 0.0)
    d = jnp.where(hit1 > 0, jnp.float32(1.0), INF)

    levels = max(1, int(np.ceil(np.log2(max(2, max_steps)))))

    def body(i, d):
        k = (jnp.int32(1) << i).astype(jnp.int32)
        d_shift = _gather_planes(d, yg + vy * k, xg + vx * k, INF)
        return jnp.where(d <= k.astype(jnp.float32), d,
                         k.astype(jnp.float32) + d_shift)

    d = jax.lax.fori_loop(0, levels, body, d)
    return jnp.where(d > max_steps, INF, d)


def ray_first_hit(mask: jnp.ndarray, dx: int, dy: int, max_steps: int
                  ) -> jnp.ndarray:
    """Single-direction convenience wrapper around ray_first_hit_multi."""
    return ray_first_hit_multi(mask, np.array([[dx, dy]], np.int32),
                               max_steps)[0]


def edge_steps(edge: jnp.ndarray, max_steps: int) -> jnp.ndarray:
    """(8, H, W) distances in steps along DIR8 to the nearest edge pixel
    (``GenEdgeInform`` edge_neigh, DPE.cu:2499-2520). INF when no hit."""
    return ray_first_hit_multi(edge, DIR8, max_steps)


def label_run_length(label: jnp.ndarray, max_steps: int) -> jnp.ndarray:
    """(8, H, W) contiguous same-label run length along DIR8
    (label-region boundary, ``GenEdgeInform``, DPE.cu:2557-2590)."""
    H, W = label.shape
    D = DIR8.shape[0]
    vx = jnp.asarray(DIR8[:, 0], jnp.int32)[:, None, None]
    vy = jnp.asarray(DIR8[:, 1], jnp.int32)[:, None, None]
    xg, yg = _grids(H, W)

    lab = jnp.broadcast_to(label, (D, H, W)).astype(jnp.float32)
    nb = _gather_planes(lab, yg + vy, xg + vx, -2.0)
    r = jnp.where(nb == lab, jnp.float32(1.0), 0.0)

    levels = max(1, int(np.ceil(np.log2(max(2, max_steps)))))

    def body(i, r):
        k = (jnp.int32(1) << i).astype(jnp.float32)
        ki = (jnp.int32(1) << i)
        r_shift = _gather_planes(r, yg + vy * ki, xg + vx * ki, 0.0)
        return jnp.where(r < k, r, k + r_shift)

    return jax.lax.fori_loop(0, levels, body, r)


def box_density(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Fraction of True pixels in the clipped (2r+1)^2 box around each pixel
    (edge-density term of ``GenEdgeInform``, DPE.cu:2523-2536)."""
    H, W = mask.shape
    m = mask.astype(jnp.float32)
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(m, axis=0), axis=1), ((1, 0), (1, 0)))

    y = jnp.arange(H)[:, None]
    x = jnp.arange(W)[None, :]
    y0 = jnp.clip(y - radius, 0, H)
    y1 = jnp.clip(y + radius + 1, 0, H)
    x0 = jnp.clip(x - radius, 0, W)
    x1 = jnp.clip(x + radius + 1, 0, W)

    flat = ii.reshape(-1)
    w1 = W + 1

    def at(yy, xx):
        return flat[(yy * w1 + xx).reshape(-1)].reshape(H, W)

    total = at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0)
    count = ((y1 - y0) * (x1 - x0)).astype(jnp.float32)
    return total / count


def complexity_map(edge: jnp.ndarray, label: jnp.ndarray, radius: int,
                   use_label: bool) -> jnp.ndarray:
    """Texture-complexity probability sigmoid(25 * (density - 0.35))
    (DPE.cu:2522-2555)."""
    density = box_density(edge, radius)
    if use_label:
        density = jnp.maximum(density, box_density(label == 0, radius))
    return jax.nn.sigmoid(25.0 * (density - 0.35))


_JFA_OFFS = np.array([[dy, dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                      if not (dy == 0 and dx == 0)], np.int32)


def jfa_nearest(mask: jnp.ndarray, max_dist: float
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jump-flooding nearest-True-pixel.

    Returns (coords (H, W, 2) int32 as (x, y), valid (H, W) bool). Replaces
    the reference's O(r^2) ring search (``FindNearestStrongPoint``,
    DPE.cu:2855-2889) with an O(log N) pass; distances are Euclidean and
    capped at ``max_dist``.
    """
    H, W = mask.shape
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    best_x = jnp.where(mask, xg, -1)
    best_y = jnp.where(mask, yg, -1)

    offs_y = jnp.asarray(_JFA_OFFS[:, 0])[:, None, None]
    offs_x = jnp.asarray(_JFA_OFFS[:, 1])[:, None, None]

    levels = max(1, int(np.ceil(np.log2(max(H, W)))))

    def dist2(bx, by):
        dx = (bx - xg).astype(jnp.float32)
        dy = (by - yg).astype(jnp.float32)
        return jnp.where(bx < 0, INF, dx * dx + dy * dy)

    def body(i, carry):
        bx, by = carry
        k = jnp.int32(1) << (levels - 1 - i)
        ty = yg[None] + offs_y * k
        tx = xg[None] + offs_x * k
        cx = _gather_planes(jnp.broadcast_to(bx, (8, H, W)).astype(jnp.float32),
                            ty, tx, -1.0).astype(jnp.int32)
        cy = _gather_planes(jnp.broadcast_to(by, (8, H, W)).astype(jnp.float32),
                            ty, tx, -1.0).astype(jnp.int32)
        cand_d = jax.vmap(dist2)(cx, cy)              # (8, H, W)
        best_o = jnp.argmin(cand_d, axis=0)
        cand_best_d = jnp.min(cand_d, axis=0)
        # One-hot pick along the small leading axis (XLA TPU serializes
        # take_along_axis).
        cbx, cby = cx[0], cy[0]
        for o in range(1, 8):
            m = best_o == o
            cbx = jnp.where(m, cx[o], cbx)
            cby = jnp.where(m, cy[o], cby)
        better = cand_best_d < dist2(bx, by)
        return (jnp.where(better, cbx, bx), jnp.where(better, cby, by))

    best_x, best_y = jax.lax.fori_loop(0, levels, body, (best_x, best_y))
    # One refinement round at step 1 tightens JFA's rare misses.
    best_x, best_y = body(levels - 1, (best_x, best_y))

    d = jnp.sqrt(dist2(best_x, best_y))
    valid = (best_x >= 0) & (d <= max_dist)
    coords = jnp.stack([jnp.where(valid, best_x, -1),
                        jnp.where(valid, best_y, -1)], axis=-1)
    return coords, valid


class LineOfSight(NamedTuple):
    """Precomputed low-res free-path field for Bresenham-style edge tests."""

    free_dist: jnp.ndarray   # (16, Hl, Wl) free path length in *pixels*
    scale_x: float           # low-res / full-res
    scale_y: float
    max_len: jnp.ndarray     # () cap in low-res pixels (reference max_step)

    def crossing(self, ax, ay, bx, by, edge_full: jnp.ndarray) -> jnp.ndarray:
        """True if the segment A->B crosses an edge on the low-res map
        (``BresenhamLine``, DPE.cu:158-250). a*/b* are full-res float coords.

        The reference walks at most ``max_step`` cells from each endpoint, so
        the test is: an edge lies within min(len, cap) along the quantized
        direction from either endpoint. Endpoints on a full-res edge pass
        (DPE.cu:162-163)."""
        lx_a = ax * self.scale_x
        ly_a = ay * self.scale_y
        lx_b = bx * self.scale_x
        ly_b = by * self.scale_y
        dx = lx_b - lx_a
        dy = ly_b - ly_a
        seg = jnp.sqrt(dx * dx + dy * dy)
        limit = jnp.minimum(seg, self.max_len)

        angles = jnp.asarray(DIR16_ANGLE, jnp.float32)
        ang = jnp.arctan2(dy, dx)

        def bin_of(a):
            diff = jnp.abs(
                jnp.mod(a[..., None] - angles + np.pi, 2 * np.pi) - np.pi
            )
            return jnp.argmin(diff, axis=-1)

        bin_ab = bin_of(ang)
        bin_ba = (bin_ab + 8) % 16

        Hl, Wl = self.free_dist.shape[1:]
        # Gather ALL 16 direction planes as channels at the (spatially
        # local) endpoint coordinates, then one-hot-pick the segment's bin.
        # Folding the bin into the gather ROW (bin*Hl + iy) mixed arbitrary
        # bins inside every (8, 128) query tile and blew the banded
        # kernel's row band up to the whole stacked image; channels share
        # the band computation and masks, so 16 channels cost far less
        # than a 16x-taller band.
        chan = jnp.moveaxis(self.free_dist, 0, -1)           # (Hl, Wl, 16)

        def free_at(b, x, y):
            from . import sampling
            ix = jnp.clip(jnp.round(x).astype(jnp.int32), 0, Wl - 1)
            iy = jnp.clip(jnp.round(y).astype(jnp.int32), 0, Hl - 1)
            f16 = sampling.gather_map(chan, iy, ix)          # (..., 16)
            return sampling.pick_last(f16, b.astype(jnp.int32))

        fa = free_at(bin_ab, lx_a, ly_a)
        fb = free_at(bin_ba, lx_b, ly_b)
        hit = (fa < limit) | (fb < limit)

        # Endpoints on a full-res edge -> treated as same surface.
        Hf, Wf = edge_full.shape

        def edge_at(x, y):
            from . import sampling
            ix = jnp.round(x).astype(jnp.int32)
            iy = jnp.round(y).astype(jnp.int32)
            return sampling.gather_map(edge_full, iy, ix)

        on_edge = edge_at(ax, ay) | edge_at(bx, by)
        return jnp.where(on_edge, False, hit)


def build_line_of_sight(edge_low: jnp.ndarray, full_w: int, full_h: int,
                        high_res_img: bool) -> LineOfSight:
    """Free-path distances along DIR16 on the low-res edge map."""
    Hl, Wl = edge_low.shape
    max_dim = max(Hl, Wl)
    steps = ray_first_hit_multi(edge_low, DIR16, max_dim)      # (16, Hl, Wl)
    lens = jnp.asarray(DIR16_LEN)[:, None, None]
    fields = steps * lens
    # Reference cap: high-res walks max(h,w)/60 Bresenham cells; otherwise
    # unbounded (DPE.cu:171).
    cap = round(max_dim / 60.0) if high_res_img else float(max_dim * 2)
    return LineOfSight(
        free_dist=fields,
        scale_x=Wl / float(full_w),
        scale_y=Hl / float(full_h),
        max_len=jnp.float32(cap),
    )
