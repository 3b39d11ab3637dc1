"""Checkerboard compaction: evaluate one red-black color on (H, ceil(W/2)).

The reference's red-black kernels launch over a W x (H/2) half grid
(DPE.cu:3141-3148) so each sweep color only pays for its own pixels. The
naive TPU translation — full-(H, W) proposals masked to one color — does 2x
the NCC work of the reference. This module restores the half-grid economy
with three data movements that are pure reshapes/selects (no gathers):

  - :func:`sites`   — the (x, y) pixel coordinates of color ``c``'s sites,
    laid out as a dense (H, W2) array: row y holds x = 2*j + ((y + c) % 2);
  - :func:`compact` — read a full-res array at those sites -> (H, W2, ...);
  - :func:`scatter` — write a compacted result back into a full-res array
    (non-site pixels keep their previous values).

``color`` may be a traced value (the sweep scans over colors), so all parity
arithmetic is jnp. Odd widths are handled by edge-padding: the padded site
column computes garbage that :func:`scatter` never reads back.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def width2(W: int) -> int:
    return (W + 1) // 2


def sites(H: int, W: int, color, dtype=jnp.float32):
    """(ccx, ccy) of shape (H, W2): full-res coordinates of color's sites.

    x is clamped to W - 1 (odd-W padding sites compute throwaway values).
    """
    W2 = width2(W)
    y = jnp.arange(H, dtype=jnp.int32)[:, None]
    j = jnp.arange(W2, dtype=jnp.int32)[None, :]
    par = (y + jnp.asarray(color, jnp.int32)) % 2
    x = jnp.minimum(2 * j + par, W - 1)
    ccx = jnp.broadcast_to(x, (H, W2)).astype(dtype)
    ccy = jnp.broadcast_to(y, (H, W2)).astype(dtype)
    return ccx, ccy


def compact(full: jnp.ndarray, color) -> jnp.ndarray:
    """Gather color's sites from ``full`` (H, W, *C) -> (H, W2, *C).

    Pure reshape + select: full[y, 2j + par(y)] with par(y) = (y+color) % 2.
    """
    H, W = full.shape[:2]
    if W % 2:
        pad = [(0, 0), (0, 1)] + [(0, 0)] * (full.ndim - 2)
        full = jnp.pad(full, pad, mode="edge")
    W2 = full.shape[1] // 2
    fp = full.reshape(H, W2, 2, *full.shape[2:])
    par = (jnp.arange(H, dtype=jnp.int32) + jnp.asarray(color, jnp.int32)) % 2
    parb = par.reshape(H, *([1] * (full.ndim - 1)))
    return jnp.where(parb == 0, fp[:, :, 0], fp[:, :, 1])


def compact_stack(arr: jnp.ndarray, color) -> jnp.ndarray:
    """compact() over a leading batch axis: (B, H, W, *C) -> (B, H, W2, *C)."""
    return jax.vmap(compact, in_axes=(0, None))(arr, color)


def scatter(full: jnp.ndarray, comp: jnp.ndarray, color) -> jnp.ndarray:
    """Write ``comp`` (H, W2, *C) into ``full`` (H, W, *C) at color's sites.

    full[y, x] = comp[y, x // 2] where (x + y) % 2 == color, else unchanged.
    """
    H, W = full.shape[:2]
    rep = jnp.repeat(comp, 2, axis=1)[:, :W]
    y = jnp.arange(H, dtype=jnp.int32)[:, None]
    x = jnp.arange(W, dtype=jnp.int32)[None, :]
    mask = ((x + y) % 2) == jnp.asarray(color, jnp.int32)
    mask = mask.reshape(H, W, *([1] * (full.ndim - 2)))
    return jnp.where(mask, rep, full)
