"""Banded 2-D gather: scattered point reads for the weak-texture machinery.

The reference reads anchor-local data (planes, selected-view masks, cost
profiles) with random 2-D accesses through the GPU memory system
(``GetNeighbourPoint`` + per-anchor loads, DPE.cu:544-548, 2928-2945).
XLA TPU lowers general gathers to a serial per-index loop (~0.09 G takes/s
measured, BASELINE.md) — orders of magnitude short of the anchor machinery's
budget.

This kernel exploits the *banded locality* of anchor queries: the 8
deformable anchors of a tile of weak pixels cluster in a rectangular
neighbourhood of that tile (GenNeighbours searches outward from the pixel,
DPE.cu:2103-2463). Strategy per (8, 128) query tile:

  1. compute the dynamic row/column band spanned by the tile's indices;
  2. DMA (BR, BC) windows of the band from HBM into VMEM;
  3. for each 8-row block of the window that the tile's queries touch:
     per static row, one lane ``take_along_axis`` (Mosaic
     ``dynamic_gather``, VPU rate) + select, skipping blocks with no hits.

Channels (the C axis) share the band computation, DMA descriptors and hit
masks — gathering a C-vector per point costs barely more than a scalar,
which is what makes per-anchor *cost profiles* affordable
(engine/weak_rect.py). Channels are chunked over the grid so the VMEM
window stays small.

On non-TPU backends the kernel runs in Pallas interpret mode (slow, tests
only), selected via ``interpret=None`` (auto).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
QROWS = 16         # query tile rows
BR = 64            # DMA window rows (multiple of 8)
BC = 512           # DMA window cols (multiple of 128)
CCHUNK = 8         # channels per grid step


def pack_bf16_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(C, ...) float -> (C//2, ...) f32, each word holding two bf16
    channels (2k, 2k+1). Halves the element count through the gather —
    its rate is per-element, not per-byte."""
    assert x.shape[0] % 2 == 0
    xb = x.astype(jnp.bfloat16)
    pairs = jnp.stack([xb[0::2], xb[1::2]], axis=-1)
    u16 = jax.lax.bitcast_convert_type(pairs, jnp.uint16)
    u32 = jax.lax.bitcast_convert_type(u16, jnp.uint32)
    return jax.lax.bitcast_convert_type(u32, jnp.float32)


def unpack_bf16_pairs(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_bf16_pairs`: (C2, ...) f32 -> (2*C2, ...)
    bf16."""
    u32 = jax.lax.bitcast_convert_type(p, jnp.uint32)
    u16 = jax.lax.bitcast_convert_type(u32, jnp.uint16)      # (..., 2)
    b = jax.lax.bitcast_convert_type(u16, jnp.bfloat16)
    C2 = p.shape[0]
    out = jnp.stack([b[..., 0], b[..., 1]], axis=1)          # (C2, 2, ...)
    return out.reshape((2 * C2,) + p.shape[1:])


def _auto_interpret(interpret) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _pad_to(x: jnp.ndarray, mults, mode="edge"):
    pads = []
    for dim, m in zip(x.shape, mults):
        t = -(-dim // m) * m - dim
        pads.append((0, t))
    if any(p[1] for p in pads):
        x = jnp.pad(x, pads, mode=mode)
    return x


def _gather2d_vmem_kernel(iy_ref, ix_ref, img_ref, out_ref, *, cc: int):
    """One (QROWS, LANES) query tile against ``cc`` VMEM-resident image
    channels. The channel block's index map is constant over the query grid
    axes, so Pallas keeps it loaded across all query tiles of a chunk — no
    per-tile DMA. The banded walk visits every 8-row x 128-col block of the
    tile's bounding box *unconditionally* (per-block occupancy tests would
    be scalar reductions of vector data — scalar-unit stalls cost more than
    the spared vector work), and all ``cc`` channels share the per-block
    masks and addressing."""
    iy = iy_ref[:]
    ix = ix_ref[:]
    rlo8 = (jnp.min(iy) // 8) * 8
    nrb = (jnp.max(iy) - rlo8) // 8 + 1
    qlo = jnp.min(ix) // LANES
    qnum = jnp.max(ix) // LANES - qlo + 1
    ml = ix % LANES
    mq = ix // LANES

    def body(t, accs):
        rbi = t // qnum
        qi = t - rbi * qnum
        r0 = pl.multiple_of(rlo8 + rbi * 8, 8)
        c0 = pl.multiple_of((qlo + qi) * LANES, LANES)
        mr = iy - r0
        hit_q = (mq == qlo + qi) & (mr >= 0) & (mr < 8)
        blk = img_ref[:, pl.ds(r0, 8), pl.ds(c0, LANES)]    # (cc, 8, 128)
        accs = list(accs)
        for r8 in range(8):
            sel = hit_q & (mr == r8)
            for c in range(cc):
                rowb = jnp.broadcast_to(blk[c, r8][None, :], (QROWS, LANES))
                g = jnp.take_along_axis(rowb, ml, axis=1)
                accs[c] = jnp.where(sel, g, accs[c])
        return tuple(accs)

    zero = jnp.zeros((QROWS, LANES), out_ref.dtype)
    accs = jax.lax.fori_loop(0, nrb * qnum, body, (zero,) * cc)
    for c in range(cc):
        out_ref[c] = accs[c]


def _gather2d_kernel(iy_ref, ix_ref, img_ref, out_ref, scratch, sem,
                     *, cc: int, h: int, w: int):
    """One (QROWS, LANES) query tile x one channel chunk; img_ref is the
    full (C, H, W) array in HBM/ANY; out_ref is (cc, QROWS, LANES) VMEM."""
    k = pl.program_id(2)
    iy = iy_ref[:]
    ix = ix_ref[:]
    # Align the band origin to the 8-row / 128-lane tile grid BEFORE sizing
    # the window walk: windows step from the aligned origin, so an unaligned
    # origin would leave the first partial tile of the band uncovered
    # (queries there would silently read 0).
    rlo = (jnp.min(iy) // 8) * 8
    rhi = jnp.max(iy)
    clo = (jnp.min(ix) // LANES) * LANES
    chi = jnp.max(ix)

    n_rwin = (rhi - rlo) // BR + 1
    n_cwin = (chi - clo) // BC + 1

    for c in range(cc):
        out_ref[c] = jnp.zeros((QROWS, LANES), out_ref.dtype)

    def rwin_body(rw, _):
        # rlo is 8-aligned and h is a multiple of BR, so both operands of
        # the clamp are aligned — no re-flooring (which would skip the top
        # of the band when the origin was unaligned).
        r0 = pl.multiple_of(jnp.minimum(rlo + rw * BR, h - BR), 8)

        def cwin_body(cw, _):
            c0 = pl.multiple_of(jnp.minimum(clo + cw * BC, w - BC), LANES)
            dma = pltpu.make_async_copy(
                img_ref.at[pl.ds(k * cc, cc), pl.ds(r0, BR), pl.ds(c0, BC)],
                scratch, sem)
            dma.start()

            mr = iy - r0
            mc = ix - c0
            in_win = (mc >= 0) & (mc < BC) & (mr >= 0) & (mr < BR)
            mq = jnp.clip(mc, 0, BC - 1) // LANES
            ml = jnp.clip(mc, 0, BC - 1) % LANES
            dma.wait()

            for rb in range(BR // 8):          # 8-row blocks of the window
                hit_rb = in_win & (mr >= rb * 8) & (mr < rb * 8 + 8)

                @pl.when(jnp.any(hit_rb))
                def _():
                    for q in range(BC // LANES):
                        hit_q = hit_rb & (mq == q)

                        @pl.when(jnp.any(hit_q))
                        def _():
                            for c in range(cc):
                                blk = scratch[c, pl.ds(rb * 8, 8),
                                              pl.ds(q * LANES, LANES)]
                                acc = out_ref[c]
                                for r8 in range(8):
                                    sel = hit_q & (mr == rb * 8 + r8)
                                    rowb = jnp.broadcast_to(
                                        blk[r8][None, :], (QROWS, LANES))
                                    g = jnp.take_along_axis(rowb, ml, axis=1)
                                    acc = jnp.where(sel, g, acc)
                                out_ref[c] = acc
            return 0

        jax.lax.fori_loop(0, n_cwin, cwin_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, n_rwin, rwin_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather2d(imgs: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
             interpret=None) -> jnp.ndarray:
    """out[c, i, j] = imgs[c, iy[i, j], ix[i, j]] (indices clamped in range).

    imgs: (C, H, W) or (H, W) float32/int32/uint32; iy/ix: (Qh, Qw) int32.
    Returns (C, Qh, Qw) (or (Qh, Qw) for 2-D imgs) of imgs.dtype.

    Fast when the queries of each (8, 128) tile cluster spatially (anchor
    maps do); degrades gracefully — never worse than scanning the band — for
    scattered ones.
    """
    squeeze = imgs.ndim == 2
    if squeeze:
        imgs = imgs[None]
    C, H, W = imgs.shape
    Qh, Qw = iy.shape
    assert ix.shape == (Qh, Qw)

    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)

    if interpret is None and jax.default_backend() != "tpu":
        # CPU/GPU: XLA's native gather is vectorized there; the banded
        # kernel exists because XLA *TPU* serializes gathers. Running the
        # kernel in interpret mode would be orders of magnitude slower.
        out = imgs[:, iy, ix]
        return out[0] if squeeze else out

    # Pad image so BR/BC windows always fit; queries to tile multiples;
    # channels to the chunk size.
    iyp = _pad_to(iy, (QROWS, LANES), mode="edge")
    ixp = _pad_to(ix, (QROWS, LANES), mode="edge")
    Qhp, Qwp = iyp.shape

    # Fast path: a chunk of channels fits comfortably in VMEM -> keep it
    # resident across the whole query grid (the chunk axis is the
    # outermost, slowest-varying grid dimension, so Pallas re-fetches the
    # block only when the chunk changes).
    ch_bytes = (-(-H // 8) * 8) * (-(-W // LANES) * LANES) * imgs.dtype.itemsize
    if ch_bytes <= 6 * 1024 * 1024:
        cc = max(1, min(C, int(6 * 1024 * 1024 // ch_bytes), 8))
        imgp = _pad_to(imgs, (cc, 8, LANES))
        Cp, Hp, Wp = imgp.shape
        out = pl.pallas_call(
            functools.partial(_gather2d_vmem_kernel, cc=cc),
            grid=(Cp // cc, Qhp // QROWS, Qwp // LANES),
            in_specs=[
                pl.BlockSpec((QROWS, LANES), lambda k, i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QROWS, LANES), lambda k, i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cc, Hp, Wp), lambda k, i, j: (k, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cc, QROWS, LANES),
                                   lambda k, i, j: (k, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Cp, Qhp, Qwp), imgs.dtype),
            interpret=_auto_interpret(interpret),
        )(iyp, ixp, imgp)
        out = out[:C, :Qh, :Qw]
        return out[0] if squeeze else out

    out = _gather2d_hbm(imgs, iyp, ixp, interpret)
    out = out[:C, :Qh, :Qw]
    return out[0] if squeeze else out


def _gather2d_hbm(imgs, iyp, ixp, interpret=None):
    """HBM-resident (windowed-DMA) gather path; split out so tests can
    exercise it below the VMEM-residency threshold. iyp/ixp must already be
    padded to (QROWS, LANES) multiples and clamped in range."""
    Qhp, Qwp = iyp.shape
    imgp = _pad_to(imgs, (CCHUNK, max(BR, 8), max(BC, LANES)))
    Cp, Hp, Wp = imgp.shape
    cc = min(CCHUNK, Cp)

    out = pl.pallas_call(
        functools.partial(_gather2d_kernel, cc=cc, h=Hp, w=Wp),
        grid=(Qhp // QROWS, Qwp // LANES, Cp // cc),
        in_specs=[
            pl.BlockSpec((QROWS, LANES), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QROWS, LANES), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((cc, QROWS, LANES), lambda i, j, k: (k, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp, Qhp, Qwp), imgs.dtype),
        scratch_shapes=[
            pltpu.VMEM((cc, BR, BC), imgs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_auto_interpret(interpret),
    )(iyp, ixp, imgp)
    return out
