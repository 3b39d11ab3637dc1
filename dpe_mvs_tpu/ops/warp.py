"""Separable projective warps built on the Pallas row-gather kernels.

A projective warp is a 2-D gather — the one operation XLA TPU cannot do fast
(serial per-index loop, tools/gather_bench.py). The Catmull–Smith two-pass
decomposition turns it into two 1-D row-local resamplings, each of which
ops/rowgather.py executes at ~9-11 G samples/s:

    pass 1 (vertical):   tmp[v, c] = in[vpass_y[v, c], c]
    pass 2 (horizontal): out[v, u] = tmp[v, hpass_x[v, u]]

The index fields are precomputed on the host per (camera pair, scale) by
:func:`..geometry.rectify.build_warp_fields` — at runtime a warp is exactly
two kernel launches plus two XLA transposes.

Used for: rectifying images once per (pair, round); transporting plane
fields into rectified frames and cost fields back, every propagation step
(SURVEY §3.3's cost-model note: restructure texture reads as blocked
row-local ops).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from . import rowgather


def _column_gather_bilinear(img: jnp.ndarray, vy: jnp.ndarray,
                            interpret=None) -> jnp.ndarray:
    """tmp[v, c] = img[vy[v, c], c] with linear interpolation along rows.

    img: (H_in, C); vy: (H_out, C) float. Implemented as a row gather of the
    transposed image (the transpose is an XLA layout op, not a gather)."""
    return rowgather.bilinear_x(img.T, vy.T, interpret=interpret).T


def _column_gather_nearest(img: jnp.ndarray, vy: jnp.ndarray,
                           interpret=None) -> jnp.ndarray:
    iy = jnp.round(vy).astype(jnp.int32)
    return rowgather.row_gather(img.T, iy.T, interpret=interpret).T


def warp_separable(
    img: jnp.ndarray,          # (H_in, W_in) float32
    vpass_y: jnp.ndarray,      # (H_out, W_in') float32 — W_in' = W_in or H_in
    hpass_x: jnp.ndarray,      # (H_out, W_out) float32
    *,
    transposed_input: bool,    # static: feed img.T to pass 1
    nearest: bool = False,     # nearest (fields/masks) vs bilinear (images)
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Apply a precomputed two-pass projective warp. Returns (H_out, W_out).

    ``nearest=True`` rounds both passes' indices — the composition is a
    nearest-neighbour warp with at most one extra pixel of index error
    (exactly the tolerance the PatchMatch candidate machinery absorbs; see
    docs/DESIGN.md on rectified transport)."""
    src = img.T if transposed_input else img
    if nearest:
        tmp = _column_gather_nearest(src, vpass_y, interpret=interpret)
        ix = jnp.round(hpass_x).astype(jnp.int32)
        return rowgather.row_gather(tmp, ix, interpret=interpret)
    tmp = _column_gather_bilinear(src, vpass_y, interpret=interpret)
    return rowgather.bilinear_x(tmp, hpass_x, interpret=interpret)


def _square_pad(img: jnp.ndarray, d: int) -> jnp.ndarray:
    h, w = img.shape[-2:]
    pad = [(0, 0)] * (img.ndim - 2) + [(0, d - h), (0, d - w)]
    if d != h or d != w:
        img = jnp.pad(img, pad, mode="edge")
    return img


def warp_separable_dyn(
    img: jnp.ndarray,          # (H_in, W_in)
    vpass_y: jnp.ndarray,      # (H_out, d)
    hpass_x: jnp.ndarray,      # (H_out, W_out)
    transposed: jnp.ndarray,   # () f32 runtime flag (rectify stacked fields)
    *,
    nearest: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """:func:`warp_separable` with the transpose decision as a runtime
    value: the input is square-padded to (d, d) so both layouts share one
    shape and problems with different warp orientations stack under one jit
    (parallel executor)."""
    d = vpass_y.shape[1]
    imgp = _square_pad(img, d)
    src = jnp.where(transposed > 0.5, imgp.T, imgp)
    if nearest:
        tmp = _column_gather_nearest(src, vpass_y, interpret=interpret)
        ix = jnp.round(hpass_x).astype(jnp.int32)
        return rowgather.row_gather(tmp, ix, interpret=interpret)
    tmp = _column_gather_bilinear(src, vpass_y, interpret=interpret)
    return rowgather.bilinear_x(tmp, hpass_x, interpret=interpret)


def warp_channels_dyn(
    img: jnp.ndarray,          # (C, H_in, W_in)
    vpass_y: jnp.ndarray,      # (H_out, d)
    hpass_x: jnp.ndarray,      # (H_out, W_out)
    transposed: jnp.ndarray,   # () f32 runtime flag
    *,
    nearest: bool = True,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Channel-batched :func:`warp_separable_dyn` (one kernel launch pair)."""
    C = img.shape[0]
    d = vpass_y.shape[1]
    h_out, w_out = hpass_x.shape
    imgp = _square_pad(img, d)
    src = jnp.where(transposed > 0.5, jnp.swapaxes(imgp, 1, 2), imgp)

    imgT = jnp.swapaxes(src, 1, 2).reshape(C * d, d)         # rows: (c, col)
    vyT = jnp.broadcast_to(vpass_y.T[None], (C, d, h_out)).reshape(
        C * d, h_out)
    if nearest:
        tmpT = rowgather.row_gather(
            imgT, jnp.round(vyT).astype(jnp.int32), interpret=interpret)
    else:
        tmpT = rowgather.bilinear_x(imgT, vyT, interpret=interpret)
    tmp = jnp.swapaxes(tmpT.reshape(C, d, h_out), 1, 2).reshape(C * h_out, d)

    hx = jnp.broadcast_to(hpass_x[None], (C, h_out, w_out)).reshape(
        C * h_out, w_out)
    if nearest:
        out = rowgather.row_gather(
            tmp, jnp.round(hx).astype(jnp.int32), interpret=interpret)
    else:
        out = rowgather.bilinear_x(tmp, hx, interpret=interpret)
    return out.reshape(C, h_out, w_out)


def warp_channels(
    img: jnp.ndarray,          # (C, H_in, W_in)
    vpass_y: jnp.ndarray,
    hpass_x: jnp.ndarray,
    *,
    transposed_input: bool,
    nearest: bool = True,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Warp a multi-channel field; channels ride the row axis of one kernel
    launch (rows are independent in the row-gather kernels)."""
    C = img.shape[0]
    src = jnp.swapaxes(img, 1, 2) if transposed_input else img
    h_in, w_in = src.shape[1], src.shape[2]
    h_out = vpass_y.shape[0]

    # Pass 1 on the transposed layout: gather along the (C*h_in) axis per
    # column — do it channel-batched on the transposed image instead.
    imgT = jnp.swapaxes(src, 1, 2).reshape(C * w_in, h_in)   # rows: (c, col)
    vyT = jnp.broadcast_to(vpass_y.T[None], (C, w_in, h_out)) \
        .reshape(C * w_in, h_out)
    if nearest:
        tmpT = rowgather.row_gather(
            imgT, jnp.round(vyT).astype(jnp.int32), interpret=interpret)
    else:
        tmpT = rowgather.bilinear_x(imgT, vyT, interpret=interpret)
    tmp = jnp.swapaxes(tmpT.reshape(C, w_in, h_out), 1, 2) \
        .reshape(C * h_out, w_in)

    hx = jnp.broadcast_to(hpass_x[None], (C, *hpass_x.shape)) \
        .reshape(C * h_out, hpass_x.shape[1])
    if nearest:
        out = rowgather.row_gather(
            tmp, jnp.round(hx).astype(jnp.int32), interpret=interpret)
    else:
        out = rowgather.bilinear_x(tmp, hx, interpret=interpret)
    return out.reshape(C, h_out, hpass_x.shape[1])
