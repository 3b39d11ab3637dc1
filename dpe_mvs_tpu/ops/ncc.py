"""Bilateral-weighted NCC matching costs and geometric-consistency cost.

TPU-native reformulation of the reference cost functions
(``ComputeBilateralNCCOld`` DPE.cu:692-778, ``ComputeBilateralNCCNew``
:557-690, ``ComputeGeomConsistencyCost`` :915-953):

  - instead of one CUDA thread walking a window with texture reads, the whole
    image evaluates one window *sample offset* at a time as fused vector ops
    over (H, W) arrays, with a single 2x2-patch gather per sample point;
  - the plane-induced homography is evaluated per pixel once per
    (candidate, view) and applied to sample offsets incrementally
    (H @ (p + o) = H @ p + ox * H[:,0] + oy * H[:,1]);
  - the reference's adaptive weak-pixel radius always yields 6 samples per
    axis with spacing 2r/5 (RANSACToGetFitPlane forces r % 5 == 0,
    DPE.cu:3104), so the adaptive window is a *static* 36-sample stencil with
    a per-pixel scale factor — exactly what a TPU wants.

Costs are in [0, 2] with 2.0 == COST_MAX meaning invalid (DPE.cu:573).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COST_MAX, GEOM_COST_MAX
from ..geometry import cameras as geo
from . import sampling

K_MIN_VAR = 1e-5


def window_offsets(radius: int, increment: int) -> np.ndarray:
    """Static window offsets (S, 2) as the reference's
    ``for i in -r..r step inc`` double loop."""
    r = np.arange(-radius, radius + 1, increment, dtype=np.float32)
    ox, oy = np.meshgrid(r, r, indexing="ij")  # i == x offset, j == y offset
    return np.stack([ox.ravel(), oy.ravel()], axis=-1)


class HomographyField(NamedTuple):
    """Per-pixel plane homography, decomposed for incremental application."""

    q0: jnp.ndarray  # (..., 3)  H @ [cx, cy, 1]
    hx: jnp.ndarray  # (..., 3)  H[:, 0]
    hy: jnp.ndarray  # (..., 3)  H[:, 1]

    def at_offset(self, ox, oy):
        """ox/oy: python scalars or arrays broadcastable to the pixel grid."""
        ox = jnp.asarray(ox)[..., None]
        oy = jnp.asarray(oy)[..., None]
        q = self.q0 + self.hx * ox + self.hy * oy
        return q[..., 0] / q[..., 2], q[..., 1] / q[..., 2]


def homography_field(ref_cam: geo.Camera, src_K, R_rel, t_rel, plane, cx, cy
                     ) -> HomographyField:
    """Build the per-pixel homography for a plane field, pre-applied at the
    window centers (cx, cy)."""
    src_cam = geo.Camera(K=src_K, R=jnp.eye(3), t=jnp.zeros(3))
    Hm = geo.homography_from_plane(ref_cam, src_cam, plane, R_rel=R_rel,
                                   t_rel=t_rel)
    hx = Hm[..., :, 0]
    hy = Hm[..., :, 1]
    hz = Hm[..., :, 2]
    q0 = hx * cx[..., None] + hy * cy[..., None] + hz
    return HomographyField(q0=q0, hx=hx, hy=hy)


def _chunking(S: int, batch_shape) -> Tuple[int, int]:
    """(chunk, n_chunks): bound transient gather buffers to ~4M elements."""
    batch_elems = 1
    for d in batch_shape:
        batch_elems *= d
    chunk = max(1, min(S, int(4_000_000 // max(batch_elems, 1)) or 1))
    return chunk, (S + chunk - 1) // chunk


def _chunked_offsets(offsets: np.ndarray, chunk: int, n_chunks: int):
    pad = n_chunks * chunk - offsets.shape[0]
    offs = np.concatenate([offsets.astype(np.float32),
                           np.zeros((pad, 2), np.float32)])
    smask = np.concatenate([np.ones(offsets.shape[0], np.float32),
                            np.zeros(pad, np.float32)])
    return offs.reshape(n_chunks, chunk, 2), smask.reshape(n_chunks, chunk)


class RefWindowCache(NamedTuple):
    """Precomputed reference-image side of an NCC window set.

    The ref samples and bilateral weights depend only on the reference image
    and the window geometry — NOT on the candidate plane, the source view, or
    the disparity step — so one cache serves every cost evaluation of a sweep
    stage (the reference re-reads ref texels in every one of its ~30k window
    evaluations per pixel per sweep)."""

    ref_pix: jnp.ndarray    # (n_chunks, chunk, *B)
    w: jnp.ndarray          # (n_chunks, chunk, *B) masked bilateral weights
    sum_w: jnp.ndarray      # (*B)
    sum_ref: jnp.ndarray
    sum_ref_ref: jnp.ndarray


def make_ref_cache(
    ref_img: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    offsets: np.ndarray,
    sigma_spatial: float,
    sigma_color: float,
    ref_center_pix: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    max_bytes: int = 2_000_000_000,
) -> Optional[RefWindowCache]:
    """Build the ref-side cache, or None if it would exceed ``max_bytes``."""
    S = offsets.shape[0]
    batch_elems = 1
    for d in cx.shape:
        batch_elems *= d
    if 2 * 4 * S * batch_elems > max_bytes:
        return None
    chunk, n_chunks = _chunking(S, cx.shape)
    offs, smask = _chunked_offsets(offsets, chunk, n_chunks)
    oshape = (chunk,) + (1,) * cx.ndim

    def one(off_c, m_c):
        ox = off_c[:, 0].reshape(oshape)
        oy = off_c[:, 1].reshape(oshape)
        if scale is not None:
            ox = ox * scale[None]
            oy = oy * scale[None]
        ref_pix = sampling.bilinear(ref_img, cx[None] + ox, cy[None] + oy)
        spatial = jnp.sqrt(ox * ox + oy * oy)
        w = jnp.exp(
            -spatial / (2.0 * sigma_spatial * sigma_spatial)
            - jnp.abs(ref_pix - ref_center_pix[None])
            / (2.0 * sigma_color * sigma_color)
        ) * m_c.reshape(oshape)
        return ref_pix, w

    ref_pix, w = jax.lax.map(
        lambda xs: one(*xs), (jnp.asarray(offs), jnp.asarray(smask)))
    return RefWindowCache(
        ref_pix=ref_pix,
        w=w,
        sum_w=jnp.sum(w, axis=(0, 1)),
        sum_ref=jnp.sum(w * ref_pix, axis=(0, 1)),
        sum_ref_ref=jnp.sum(w * ref_pix * ref_pix, axis=(0, 1)),
    )


def bilateral_ncc(
    ref_img: jnp.ndarray,          # (H, W)
    src_img: jnp.ndarray,          # (H, W)
    hom: HomographyField,          # per-pixel, pre-applied at (cx, cy)
    cx: jnp.ndarray,               # (H, W) window center x (float)
    cy: jnp.ndarray,               # (H, W) window center y
    offsets: np.ndarray,           # (S, 2) static
    sigma_spatial: float,
    sigma_color: float,
    ref_center_pix: jnp.ndarray,   # (H, W) color anchor for bilateral weight
    scale: Optional[jnp.ndarray] = None,   # per-pixel offset scale (adaptive r)
    grid_centered: bool = False,           # (cx, cy) == the pixel grid itself
    ref_cache: Optional[RefWindowCache] = None,
) -> jnp.ndarray:
    """Bilateral-weighted NCC cost of one window per pixel against one source
    view. Returns (H, W) cost in [0, COST_MAX].

    Sample-chunked: window samples are evaluated in batched gather chunks
    sized to bound transient memory, with the six NCC sums accumulated in a
    scan — compact HLO, high gather throughput, O(chunk * pixels) transients.
    With ``ref_cache`` the reference-image half of the work is skipped.
    """
    del grid_centered  # gathers are uniformly fast on TPU; single code path
    height, width = src_img.shape

    S = offsets.shape[0]
    chunk, n_chunks = _chunking(S, cx.shape)
    offs, smask = _chunked_offsets(offsets, chunk, n_chunks)
    oshape = (chunk,) + (1,) * cx.ndim
    zeros = jnp.zeros(cx.shape, jnp.float32)

    def body(carry, xs):
        if ref_cache is None:
            off_c, m_c = xs
        else:
            off_c, m_c, ref_pix, w = xs
        ox = off_c[:, 0].reshape(oshape)
        oy = off_c[:, 1].reshape(oshape)
        if scale is not None:
            ox = ox * scale[None]
            oy = oy * scale[None]
        if ref_cache is None:
            ref_pix = sampling.bilinear(ref_img, cx[None] + ox, cy[None] + oy)
            # ComputeBilateralWeight (DPE.cu:550-555): NON-squared spatial
            # distance over 2*sigma^2 (a reference quirk; keep it).
            spatial = jnp.sqrt(ox * ox + oy * oy)
            w = jnp.exp(
                -spatial / (2.0 * sigma_spatial * sigma_spatial)
                - jnp.abs(ref_pix - ref_center_pix[None])
                / (2.0 * sigma_color * sigma_color)
            ) * m_c.reshape(oshape)
        sx, sy = hom.at_offset(ox, oy)
        src_pix = sampling.bilinear(src_img, sx, sy)
        acc = carry
        if ref_cache is None:
            acc = (
                acc[0] + jnp.sum(w, 0),
                acc[1] + jnp.sum(w * ref_pix, 0),
                acc[2] + jnp.sum(w * ref_pix * ref_pix, 0),
                acc[3] + jnp.sum(w * src_pix, 0),
                acc[4] + jnp.sum(w * src_pix * src_pix, 0),
                acc[5] + jnp.sum(w * ref_pix * src_pix, 0),
            )
        else:
            acc = (
                acc[0],
                acc[1],
                acc[2],
                acc[3] + jnp.sum(w * src_pix, 0),
                acc[4] + jnp.sum(w * src_pix * src_pix, 0),
                acc[5] + jnp.sum(w * ref_pix * src_pix, 0),
            )
        return acc, None

    if ref_cache is None:
        init = (zeros, zeros, zeros, zeros, zeros, zeros)
        xs = (jnp.asarray(offs), jnp.asarray(smask))
    else:
        init = (ref_cache.sum_w, ref_cache.sum_ref, ref_cache.sum_ref_ref,
                zeros, zeros, zeros)
        xs = (jnp.asarray(offs), jnp.asarray(smask), ref_cache.ref_pix,
              ref_cache.w)
    if n_chunks == 1:
        sums, _ = body(init, jax.tree.map(lambda a: a[0], xs))
    else:
        sums, _ = jax.lax.scan(body, init, xs)
    sum_w, sum_ref, sum_ref_ref, sum_src, sum_src_src, sum_ref_src = sums

    inv_w = 1.0 / sum_w
    m_ref = sum_ref * inv_w
    m_src = sum_src * inv_w
    var_ref = sum_ref_ref * inv_w - m_ref * m_ref
    var_src = sum_src_src * inv_w - m_src * m_src
    covar = sum_ref_src * inv_w - m_ref * m_src
    denom = jnp.sqrt(jnp.maximum(var_ref * var_src, K_MIN_VAR * K_MIN_VAR))
    ncc = jnp.clip(1.0 - covar / denom, 0.0, COST_MAX)
    cost = jnp.where(
        (var_ref < K_MIN_VAR) | (var_src < K_MIN_VAR), COST_MAX, ncc
    )

    # Window-center out-of-source-image -> COST_MAX (DPE.cu:577-580).
    ctr_x, ctr_y = hom.at_offset(jnp.zeros_like(cx), jnp.zeros_like(cy))
    oob = (ctr_x < 0.0) | (ctr_x >= width) | (ctr_y < 0.0) | (ctr_y >= height)
    return jnp.where(oob, COST_MAX, cost)


def geom_consistency_cost(
    ref_cam: geo.Camera,
    src_cam: geo.Camera,
    src_depth: jnp.ndarray,   # (H, W) of the source view
    plane: jnp.ndarray,       # (H, W, 4) ref-cam frame
    px: jnp.ndarray,
    py: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-backward reprojection error capped at 3.0
    (``ComputeGeomConsistencyCost``, DPE.cu:915-953)."""
    depth = geo.depth_from_plane(ref_cam, plane, px, py)
    Xw = geo.backproject_to_world(ref_cam, px, py, depth)
    sx, sy, _sd = geo.project_to_camera(src_cam, Xw)
    d_src = sampling.nearest(src_depth, sx, sy)
    Xs = geo.backproject_to_world(src_cam, sx, sy, d_src)
    bx, by, _rd = geo.project_to_camera(ref_cam, Xs)
    err = jnp.sqrt((px - bx) ** 2 + (py - by) ** 2)
    err = jnp.minimum(GEOM_COST_MAX, err)
    return jnp.where(d_src == 0.0, GEOM_COST_MAX, err)
