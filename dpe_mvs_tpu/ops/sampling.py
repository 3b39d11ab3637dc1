"""Image sampling primitives.

The reference reads images through CUDA texture objects with bilinear
filtering and clamp addressing (``tex2D(img, x + 0.5, y + 0.5)``,
DPE.cpp:927-933). TPUs have no texture units, so sampling is the central
performance problem of this framework. This module provides:

  - :func:`bilinear` — exact clamp-to-edge bilinear sampling built on a single
    ``lax.gather`` of 2x2 patches per sample point (half the gather traffic of
    the naive 4-tap formulation);
  - :func:`nearest` — the integer lookup used for source depth maps
    (``ComputeGeomConsistencyCost`` samples depth at ``(int)x + 0.5``,
    DPE.cu:936);
  - :func:`shift` — clamp-padded static shifts for window reads of the
    *reference* image, which are free on TPU (no gather at all).

All functions operate on a single-channel ``(H, W)`` float image and
arbitrarily-shaped coordinate arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gather_2x2(img: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray):
    """Gather the 2x2 patch corners ``img[y0:y0+2, x0:x0+2]`` per index pair.

    y0/x0: int32 arrays of identical shape S, already clamped to
    [0, H-2] / [0, W-2]. Returns (p00, p01, p10, p11), each of shape S.

    Formulated as four flat linear-index takes: XLA TPU vectorizes 1-D
    element gathers but lowers multi-dim slice gathers (2x2 ``slice_sizes``)
    to a serial per-index loop — measured ~475k samples/s serial vs
    effectively free vectorized at sweep shapes.
    """
    W = img.shape[1]
    flat = img.reshape(-1)
    lin = y0 * W + x0
    return flat[lin], flat[lin + 1], flat[lin + W], flat[lin + W + 1]


def bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Clamp-to-edge bilinear sample of ``img`` at float coords (x, y).

    Matches CUDA ``tex2D`` linear filtering with unnormalized coordinates and
    clamp addressing, sampled at (x + 0.5, y + 0.5): integer coordinates hit
    texel centers exactly.
    """
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0f = jnp.clip(jnp.floor(x), 0.0, W - 2.0) if W > 1 else jnp.zeros_like(x)
    y0f = jnp.clip(jnp.floor(y), 0.0, H - 2.0) if H > 1 else jnp.zeros_like(y)
    fx = x - x0f
    fy = y - y0f
    p00, p01, p10, p11 = gather_2x2(
        img, y0f.astype(jnp.int32), x0f.astype(jnp.int32))
    top = p00 * (1.0 - fx) + p01 * fx
    bot = p10 * (1.0 - fx) + p11 * fx
    return top * (1.0 - fy) + bot * fy


def nearest(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Nearest (floor) lookup with clamp, as the reference's integer depth-map
    reads: ``tex2D(depth, (int)x + 0.5, (int)y + 0.5)`` (DPE.cu:936)."""
    H, W = img.shape
    ix = jnp.clip(x.astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(y.astype(jnp.int32), 0, H - 1)
    return img.reshape(-1)[iy * W + ix]


def lookup_int(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Integer lookup with clamp for any dtype array (cost maps, masks)."""
    H, W = img.shape
    ix = jnp.clip(ix, 0, W - 1)
    iy = jnp.clip(iy, 0, H - 1)
    return img.reshape(-1)[iy * W + ix]


def gather_map(arr: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """arr[(iy, ix)] with clamp; arr (H, W, ...) and integer index arrays of a
    common shape S -> (*S, ...).

    On TPU, large gathers route through the banded Pallas kernel
    (:mod:`.gather2d`) — XLA TPU lowers general gathers to a serial
    per-index loop (BASELINE.md). Elsewhere (and for small gathers) XLA's
    native vectorized gather is used."""
    H, W = arr.shape[:2]
    iy = jnp.broadcast_to(iy, jnp.broadcast_shapes(iy.shape, ix.shape))
    ix = jnp.broadcast_to(ix, iy.shape)
    n = int(np.prod(iy.shape)) if iy.shape else 1
    if jax.default_backend() == "tpu" and n >= 65536:
        from . import gather2d as g2d
        S = iy.shape
        q2 = (int(np.prod(S[:-1])), S[-1]) if len(S) >= 2 else (1, n)
        iy2 = iy.reshape(q2).astype(jnp.int32)
        ix2 = ix.reshape(q2).astype(jnp.int32)
        trail = arr.shape[2:]
        C = int(np.prod(trail)) if trail else 1
        flat = jnp.moveaxis(arr.reshape(H, W, C), -1, 0)       # (C, H, W)
        dt = flat.dtype
        if dt == jnp.uint8 or dt == jnp.int8 or dt == jnp.bool_:
            flat = flat.astype(jnp.int32)
        out = g2d.gather2d(flat, iy2, ix2)                     # (C, *q2)
        out = jnp.moveaxis(out, 0, -1).astype(arr.dtype)
        return out.reshape(*S, *trail) if trail else out.reshape(S)
    lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    flat = arr.reshape(H * W, *arr.shape[2:])
    return jnp.take(flat, lin, axis=0)


def take_last(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``jnp.take_along_axis(arr, idx, axis=-1)`` for small static last
    axes. On TPU the gather is replaced by a one-hot select chain — XLA TPU
    serializes even tiny axis gathers (BASELINE.md), and the RANSAC loops
    (DPE.cu:2302-2435, 2947-3046 analogues) pick from <=64-slot pools every
    iteration. arr (..., P); idx (..., K) int -> (..., K)."""
    P = arr.shape[-1]
    if jax.default_backend() != "tpu" or P > 64:
        return jnp.take_along_axis(arr, idx, axis=-1)
    out = jnp.broadcast_to(
        arr[..., 0:1], jnp.broadcast_shapes(arr.shape[:-1] + (1,), idx.shape)
    ).astype(arr.dtype)
    for p in range(1, P):
        out = jnp.where(idx == p, arr[..., p:p + 1], out)
    return out


def pick_last(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """One pick per element along a small last axis: arr (..., P),
    idx (...) int -> (...). TPU-safe (see :func:`take_last`)."""
    return take_last(arr, idx[..., None])[..., 0]


def shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Static clamp-padded shift: result[y, x] = img[clamp(y+dy), clamp(x+dx)].

    Pure slicing/padding — no gather. Used for reference-image window reads and
    cost-map neighbourhood scans where offsets are compile-time constants.
    """
    H, W = img.shape
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(img, ((py1, py0), (px1, px0)), mode="edge")
    return jax.lax.dynamic_slice(padded, (py1 + dy, px1 + dx), (H, W))
