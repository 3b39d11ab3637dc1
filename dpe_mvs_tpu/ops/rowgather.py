"""Per-lane row gather: the TPU-native texture unit of this framework.

The reference reads source images through CUDA texture objects — random 2-D
bilinear fetches are free on an SM (DPE.cu:692-778 does ~10^4 of them per
pixel per sweep). A TPU has no texture unit and XLA lowers general gathers to
a *serial* per-index loop (~140M takes/s measured on v5e — three orders of
magnitude short of the sweep's sample budget).

What the hardware *does* have is an intra-vreg shuffle: Mosaic's
``tpu.dynamic_gather`` (``jnp.take_along_axis`` with index shape == operand
shape inside a Pallas kernel) gathers along the lane axis of a (S, 128) tile
at VPU rate. This module builds an exact arbitrary-index **row gather** on
top of it:

    out[h, l] = img[h, ix[h, l]]      ix in [0, W), arbitrary per element

by looping over the W/128 lane blocks of the source row and selecting the
block each index lands in (q-expansion). Cost: W/128 shuffles + selects per
output vreg — ~10-50G gathered elements/s, vs 0.14G for the XLA gather.

This primitive only moves data *along rows*. The engine arranges for that to
be the only data-dependent axis by evaluating matching costs in epipolar-
rectified frames (see geometry/rectify.py): after rectification every NCC
sample lands on a static row offset, and only the column index is
data-dependent (the plane-induced disparity).

On non-TPU backends the kernels run in Pallas interpret mode (slow, for
tests) — select with ``interpret=None`` (auto) or force via the argument.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _auto_interpret(interpret) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _pad_rows_cols(img: jnp.ndarray, bh: int):
    """Pad (H, W) to (ceil(H/bh)*bh, ceil(W/128)*128) with edge values."""
    H, W = img.shape
    Hp = -(-H // bh) * bh
    Wp = -(-W // LANES) * LANES
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    return img


def _row_gather_kernel(img_ref, ix_ref, out_ref, *, nq: int):
    """Banded q-loop: only the lane blocks the tile's indices actually touch
    are visited. PatchMatch index fields are disparity-local (a (bh, 128)
    tile's samples span a few hundred columns, not the whole row), so the
    dynamic band usually covers 2-3 of the W/128 blocks."""
    ix = ix_ref[:]
    qlo = jnp.min(ix) // LANES
    qnum = jnp.max(ix) // LANES - qlo + 1

    def body(i, acc):
        q = qlo + i
        blk = img_ref[:, pl.ds(pl.multiple_of(q * LANES, LANES), LANES)]
        m = ix - q * LANES
        hit = (m >= 0) & (m < LANES)
        g = jnp.take_along_axis(blk, jnp.clip(m, 0, LANES - 1), axis=1)
        return jnp.where(hit, g, acc)

    out_ref[:] = jax.lax.fori_loop(
        0, qnum, body, jnp.zeros(ix.shape, img_ref.dtype))


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def row_gather(img: jnp.ndarray, ix: jnp.ndarray, *, bh: int = 256,
               interpret=None) -> jnp.ndarray:
    """out[h, l] = img[h, ix[h, l]] with ix clamped to [0, W).

    img: (H, W) float32/int32; ix: (H, L) int32, arbitrary values (clamped).
    Returns (H, L) of img.dtype. H is padded to a multiple of ``bh``; W and L
    to multiples of 128 internally.
    """
    H, L = ix.shape
    assert img.shape[0] == H, (img.shape, ix.shape)
    W = img.shape[1]
    ix = jnp.clip(ix, 0, W - 1)
    if interpret is None and jax.default_backend() != "tpu":
        # CPU/GPU: XLA's per-row gather is vectorized there; the banded
        # kernel exists because XLA *TPU* serializes it. Interpret mode
        # (kernel-logic tests) is reachable via interpret=True.
        return jnp.take_along_axis(img, ix, axis=1)
    bh = min(bh, -(-H // 8) * 8)
    imgp = _pad_rows_cols(img, bh)
    ixp = _pad_rows_cols(ix, bh)
    Hp, Wp = imgp.shape
    Lp = ixp.shape[1]
    nq = Wp // LANES

    out = pl.pallas_call(
        functools.partial(_row_gather_kernel, nq=nq),
        grid=(Hp // bh, Lp // LANES),
        in_specs=[
            pl.BlockSpec((bh, Wp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, LANES), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Lp), img.dtype),
        interpret=_auto_interpret(interpret),
    )(imgp, ixp)
    return out[:H, :L]


def _bilinear_x_kernel(img_ref, x_ref, out_ref, *, nq: int, W: int):
    """Banded like :func:`_row_gather_kernel` (two taps per block visit)."""
    x = x_ref[:]
    x = jnp.clip(x, 0.0, W - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0.0, W - 2.0) if W > 1 else jnp.zeros_like(x)
    f = x - x0
    ix0 = x0.astype(jnp.int32)
    qlo = jnp.min(ix0) // LANES
    qnum = (jnp.max(ix0) + 1) // LANES - qlo + 1

    def body(i, carry):
        a0, a1 = carry
        q = qlo + i
        blk = img_ref[:, pl.ds(pl.multiple_of(q * LANES, LANES), LANES)]
        m0 = ix0 - q * LANES
        m1 = m0 + 1
        h0 = (m0 >= 0) & (m0 < LANES)
        h1 = (m1 >= 0) & (m1 < LANES)
        g0 = jnp.take_along_axis(blk, jnp.clip(m0, 0, LANES - 1), axis=1)
        g1 = jnp.take_along_axis(blk, jnp.clip(m1, 0, LANES - 1), axis=1)
        return jnp.where(h0, g0, a0), jnp.where(h1, g1, a1)

    zero = jnp.zeros(x.shape, img_ref.dtype)
    a0, a1 = jax.lax.fori_loop(0, qnum, body, (zero, zero))
    out_ref[:] = a0 * (1.0 - f) + a1 * f


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def bilinear_x(img: jnp.ndarray, x: jnp.ndarray, *, bh: int = 256,
               interpret=None) -> jnp.ndarray:
    """Linear interpolation along rows at float columns, clamp addressing:
    out[h, l] = lerp(img[h, floor(x)], img[h, floor(x)+1], frac(x)).

    img: (H, W) f32; x: (H, L) f32. The row axis is NOT interpolated — the
    rectified engine arranges for all sampling rows to be integral.
    """
    H, L = x.shape
    assert img.shape[0] == H, (img.shape, x.shape)
    W = img.shape[1]
    if interpret is None and jax.default_backend() != "tpu":
        # CPU/GPU fast path (see row_gather); bit-identical math to the
        # kernel: clamp, floor to W-2, lerp.
        xc = jnp.clip(x, 0.0, W - 1.0)
        x0 = (jnp.clip(jnp.floor(xc), 0.0, W - 2.0) if W > 1
              else jnp.zeros_like(xc))
        f = xc - x0
        ix0 = x0.astype(jnp.int32)
        g0 = jnp.take_along_axis(img, ix0, axis=1)
        g1 = jnp.take_along_axis(img, jnp.minimum(ix0 + 1, W - 1), axis=1)
        return g0 * (1.0 - f) + g1 * f
    bh = min(bh, -(-H // 8) * 8)
    imgp = _pad_rows_cols(img, bh)
    xp = _pad_rows_cols(x, bh)
    Hp, Wp = imgp.shape
    Lp = xp.shape[1]
    nq = Wp // LANES

    out = pl.pallas_call(
        functools.partial(_bilinear_x_kernel, nq=nq, W=W),
        grid=(Hp // bh, Lp // LANES),
        in_specs=[
            pl.BlockSpec((bh, Wp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, LANES), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Lp), jnp.float32),
        interpret=_auto_interpret(interpret),
    )(imgp, xp)
    return out[:H, :L]
