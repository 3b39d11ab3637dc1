"""The rectified cost engine: every NCC sample as a row-local Pallas gather.

This is the framework's texture unit (round-2 redesign). The reference
evaluates bilateral NCC windows with per-pixel plane homographies through
the GPU texture cache (``ComputeBilateralNCCOld``, DPE.cu:692-778). XLA TPU
gathers serialize (BASELINE.md), so here every cost evaluation runs in the
pairwise-rectified frames of :mod:`..geometry.rectify`, where

  * a window sample of the source image lies on the *same row* as its
    reference sample for any plane hypothesis, and
  * its column is an affine function of the rectified pixel.

One cost evaluation of a plane field against one source view is then:

  1. rotate plane normals into the rect frame (elementwise) and transport
     the (n, d) field original->rect with a nearest two-pass warp;
  2. for each static window offset: one row-local bilinear gather of the
     source image (ops/rowgather.bilinear_x) + static shifts of the
     rectified reference image, accumulated into the six NCC sums;
  3. transport the cost field rect->original with a nearest two-pass warp.

Costs keep the reference semantics: in [0, 2], COST_MAX for invalid centers
(source out of frame, non-positive depth, padding views).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COST_MAX, GEOM_COST_MAX, PatchMatchParams
from ..geometry import cameras as geo
from ..geometry import rectify
from ..io.scene import ProblemInputs
from ..ops import ncc
from ..ops import rowgather
from ..ops import sampling
from ..ops import warp as warp_ops

K_MIN_VAR = 1e-5
BIG = float(1e30)


class RectView(NamedTuple):
    """Device-side rectification data for one (ref, src) pair."""

    ref_rect: jnp.ndarray     # (Hp, Wp) f32 rectified reference image
    src_rect: jnp.ndarray     # (Hp, Wp) f32 rectified source image
    ref_ok: jnp.ndarray       # (Hp, Wp) f32 1 where rect px has ref content
    src_ok: jnp.ndarray       # (Hp, Wp) f32 1 where rect px has src content
    src_depth_rect: jnp.ndarray  # (Hp, Wp) f32 src depth in ITS rect frame
                                 # (zeros unless geom pass)
    R2r: jnp.ndarray          # (3, 3) ref-cam -> rect rotation
    f: jnp.ndarray            # () rect focal
    cx: jnp.ndarray           # () rect principal point
    cy: jnp.ndarray
    b: jnp.ndarray            # () baseline (src at +x)
    # orig -> rect transport (homography H_ref):
    f_vy: jnp.ndarray         # (Hp, Win') f32 vertical-pass rows
    f_hx: jnp.ndarray         # (Hp, Wp) f32 horizontal-pass cols
    # rect -> orig transport (homography H_ref^{-1}):
    b_vy: jnp.ndarray         # (H, Win'') f32
    b_hx: jnp.ndarray         # (H, W) f32
    orig_ok: jnp.ndarray      # (H, W) f32 1 where the orig px maps into the
                              # rect frame (clamped frames leave a border out)
    H_ref: jnp.ndarray        # (3, 3) f32 orig ref pixel -> rect pixel
                              # homography (point transforms, weak_rect)
    # Stacked mode only (statics.stacked, parallel executor): the warp
    # transpose decisions as runtime flags + the src-depth warp fields so
    # device-resident exchanged depths can be rectified inside the jit.
    f_flag: Optional[jnp.ndarray] = None   # () f32
    b_flag: Optional[jnp.ndarray] = None   # () f32
    s_vy: Optional[jnp.ndarray] = None     # (Hp, d) src orig -> rect
    s_hx: Optional[jnp.ndarray] = None     # (Hp, Wp)
    s_flag: Optional[jnp.ndarray] = None   # () f32
    s_valid: Optional[jnp.ndarray] = None  # (Hp, Wp) f32
    s_zfac: Optional[jnp.ndarray] = None   # (H, W) f32 src z -> rect z


class RectStatics(NamedTuple):
    """Hashable per-problem constants (static under jit)."""

    f_transposed: Tuple[bool, ...]   # per view, forward warp
    b_transposed: Tuple[bool, ...]   # per view, backward warp
    hp: int
    wp: int
    # Stacked mode (parallel executor): warp-field shapes are square-padded
    # and the transpose flags live in RectView as runtime values, so one
    # statics (and one compiled program) serves every problem.
    stacked: bool = False


class RectHost(NamedTuple):
    """Host-side product of :func:`build_rect_host`."""

    pairs: tuple                     # per-view rectify.RectPair
    fwd: tuple                       # per-view WarpFields (orig -> rect)
    bwd: tuple                       # per-view WarpFields (rect -> orig)
    sfwd: tuple                      # per-view WarpFields (src orig -> rect)
    statics: RectStatics


def build_rect_host(
    cameras: Sequence, width: int, height: int, v_pad: int,
    max_scale: float = 1.6,
    force_size: Optional[Tuple[int, int]] = None,
    stacked: bool = False,
) -> RectHost:
    """Rectify every (ref, src) pair of a problem on the host.

    ``cameras``: [ref, src...] objects with .K/.R/.t NumPy arrays (as in
    ProblemInputs). Padding views replicate the last real pair (masked out
    at cost time by ``view_valid``).

    ``force_size=(wp, hp)`` forces a common rect frame (must dominate every
    pair's natural frame — the parallel executor passes the max over all
    problems so RectView pytrees stack). ``stacked=True`` additionally emits
    shape-uniform warp fields with runtime transpose flags
    (rectify.StackedWarpFields) so one compiled program serves problems
    with different warp orientations."""
    ref = cameras[0]
    pairs = []
    for src in cameras[1:]:
        pairs.append(rectify.build_rect_pair(
            ref.K, ref.R, ref.t, src.K, src.R, src.t, width, height,
            max_scale=max_scale))
    if not pairs:
        raise ValueError("problem has no source views")
    while len(pairs) < v_pad:
        pairs.append(pairs[-1])
    pairs = pairs[:v_pad]

    if force_size is not None:
        wp, hp = force_size
    else:
        hp = max(p.height for p in pairs)
        wp = max(p.width for p in pairs)
    # Rebuild with the common frame so views stack.
    rebuilt = []
    for p, src in zip(pairs, (list(cameras[1:]) + [cameras[-1]] * v_pad)):
        rebuilt.append(rectify.build_rect_pair(
            ref.K, ref.R, ref.t, src.K, src.R, src.t, width, height,
            max_scale=max_scale, force_size=(wp, hp)))
    pairs = rebuilt

    fwd, bwd, sfwd = [], [], []
    for p in pairs:
        if stacked:
            d_f = max(width, height)
            d_b = max(wp, hp)
            fwd.append(rectify.build_warp_fields_stacked(
                p.H_ref, width, height, wp, hp, d_f))
            bwd.append(rectify.build_warp_fields_stacked(
                np.linalg.inv(p.H_ref), wp, hp, width, height, d_b))
            sfwd.append(rectify.build_warp_fields_stacked(
                p.H_src, width, height, wp, hp, d_f))
        else:
            fwd.append(rectify.build_warp_fields(
                p.H_ref, width, height, wp, hp))
            bwd.append(rectify.build_warp_fields(
                np.linalg.inv(p.H_ref), wp, hp, width, height))
            sfwd.append(_src_warp_fields(p, width, height))
    statics = RectStatics(
        f_transposed=(tuple(False for _ in fwd) if stacked else
                      tuple(w.transposed_input for w in fwd)),
        b_transposed=(tuple(False for _ in bwd) if stacked else
                      tuple(w.transposed_input for w in bwd)),
        hp=hp, wp=wp, stacked=stacked,
    )
    return RectHost(pairs=tuple(pairs), fwd=tuple(fwd), bwd=tuple(bwd),
                    sfwd=tuple(sfwd), statics=statics)


# ---------------------------------------------------------------------------
# Warp dispatch: static per-problem layout vs stacked runtime-flag layout
# ---------------------------------------------------------------------------

def warp_fwd_channels(rv: "RectView", statics: RectStatics, i: int,
                      chans: jnp.ndarray, nearest: bool = True,
                      interpret=None) -> jnp.ndarray:
    """(C, H, W) orig-grid channels -> (C, Hp, Wp) in rv's rect frame."""
    if statics.stacked:
        return warp_ops.warp_channels_dyn(
            chans, rv.f_vy, rv.f_hx, rv.f_flag, nearest=nearest,
            interpret=interpret)
    return warp_ops.warp_channels(
        chans, rv.f_vy, rv.f_hx, transposed_input=statics.f_transposed[i],
        nearest=nearest, interpret=interpret)


def warp_bwd(rv: "RectView", statics: RectStatics, i: int,
             img: jnp.ndarray, nearest: bool = True,
             interpret=None) -> jnp.ndarray:
    """(Hp, Wp) rect field -> (H, W) orig grid."""
    if statics.stacked:
        return warp_ops.warp_separable_dyn(
            img, rv.b_vy, rv.b_hx, rv.b_flag, nearest=nearest,
            interpret=interpret)
    return warp_ops.warp_separable(
        img, rv.b_vy, rv.b_hx, transposed_input=statics.b_transposed[i],
        nearest=nearest, interpret=interpret)


def warp_bwd_channels(rv: "RectView", statics: RectStatics, i: int,
                      chans: jnp.ndarray, nearest: bool = True,
                      interpret=None) -> jnp.ndarray:
    """(C, Hp, Wp) rect channels -> (C, H, W) orig grid."""
    if statics.stacked:
        return warp_ops.warp_channels_dyn(
            chans, rv.b_vy, rv.b_hx, rv.b_flag, nearest=nearest,
            interpret=interpret)
    return warp_ops.warp_channels(
        chans, rv.b_vy, rv.b_hx, transposed_input=statics.b_transposed[i],
        nearest=nearest, interpret=interpret)


def warp_bwd_channels_strided(rv: "RectView", statics: RectStatics, i: int,
                              chans: jnp.ndarray, stride: int,
                              interpret=None) -> jnp.ndarray:
    """(C, Hp//stride, Wp//stride) rect-subgrid channels -> (C, H, W) orig
    grid, nearest. The backward warp fields index the full-res rect frame;
    a subgrid source just means subsampled vertical-pass columns and
    stride-scaled index values (consumed by the strided classify volume)."""
    if stride == 1:
        return warp_bwd_channels(rv, statics, i, chans, interpret=interpret)
    s = 1.0 / stride
    if statics.stacked:
        return warp_ops.warp_channels_dyn(
            chans, rv.b_vy[:, ::stride] * s, rv.b_hx * s, rv.b_flag,
            nearest=True, interpret=interpret)
    return warp_ops.warp_channels(
        chans, rv.b_vy[:, ::stride] * s, rv.b_hx * s,
        transposed_input=statics.b_transposed[i], nearest=True,
        interpret=interpret)


def _src_warp_fields(pair: rectify.RectPair, width: int, height: int):
    return rectify.build_warp_fields(pair.H_src, width, height,
                                     pair.width, pair.height)


@functools.partial(jax.jit, static_argnames=("ft", "st", "interpret"))
def _prep_pair(ref_img, src_img, f_vy, f_hx, s_vy, s_hx, ft, st, interpret):
    ref_r = warp_ops.warp_separable(
        ref_img, f_vy, f_hx, transposed_input=ft, interpret=interpret)
    src_r = warp_ops.warp_separable(
        src_img, s_vy, s_hx, transposed_input=st, interpret=interpret)
    return ref_r, src_r


@functools.partial(jax.jit, static_argnames=("st", "interpret"))
def _prep_depth(dep_scaled, s_vy, s_hx, s_valid, st, interpret):
    dep_r = warp_ops.warp_separable(
        dep_scaled, s_vy, s_hx, transposed_input=st, nearest=True,
        interpret=interpret)
    return jnp.where(s_valid, dep_r, 0.0)


def build_rect_views(
    rh: RectHost,
    images: np.ndarray,          # (1 + n_src, H, W) f32 host images
    src_depths: Optional[np.ndarray],  # (n_src, H, W) or None
    cameras: Optional[Sequence] = None,  # [ref, src...]; needed for depths
    interpret: Optional[bool] = None,
) -> Tuple[RectView, ...]:
    """Warp images (and src depths for geom passes) into the rect frames and
    assemble the device RectView tuple. One jit-compiled program per problem
    shape (the warps are rowgather kernels; keep them off the eager path —
    every eager op is a separately compiled module on the axon backend)."""
    H, W = images.shape[1:]
    stacked = rh.statics.stacked
    views = []
    for i, (pair, wf, wb) in enumerate(zip(rh.pairs, rh.fwd, rh.bwd)):
        n_src = images.shape[0] - 1
        src_i = min(i, n_src - 1)
        sf = rh.sfwd[i]

        if stacked:
            ref_r = warp_ops.warp_separable_dyn(
                jnp.asarray(images[0]), jnp.asarray(wf.vpass_y),
                jnp.asarray(wf.hpass_x), jnp.asarray(wf.transposed),
                interpret=interpret)
            src_r = warp_ops.warp_separable_dyn(
                jnp.asarray(images[1 + src_i]), jnp.asarray(sf.vpass_y),
                jnp.asarray(sf.hpass_x), jnp.asarray(sf.transposed),
                interpret=interpret)
        else:
            ref_r, src_r = _prep_pair(
                jnp.asarray(images[0]), jnp.asarray(images[1 + src_i]),
                jnp.asarray(wf.vpass_y), jnp.asarray(wf.hpass_x),
                jnp.asarray(sf.vpass_y), jnp.asarray(sf.hpass_x),
                ft=wf.transposed_input, st=sf.transposed_input,
                interpret=interpret)

        if src_depths is not None or stacked:
            # Source depths live in the SOURCE's pixel grid along the SRC
            # z-axis; the rect frame needs z along the rect z-axis:
            # z_rect = (R2s row 3) . X_src = depth * (r3 . p~_src). The
            # factor field is static per pair — scale, then warp.
            sc = cameras[1 + src_i]
            xg, yg = np.meshgrid(np.arange(W, dtype=np.float64),
                                 np.arange(H, dtype=np.float64))
            Ks = np.asarray(sc.K, np.float64)
            p_s = np.stack([(xg - Ks[0, 2]) / Ks[0, 0],
                            (yg - Ks[1, 2]) / Ks[1, 1],
                            np.ones_like(xg)])
            r3 = pair.R2s[2]
            factor = (r3[0] * p_s[0] + r3[1] * p_s[1] + r3[2] * p_s[2]) \
                .astype(np.float32)
            if src_depths is not None and not stacked:
                dep_r = _prep_depth(
                    jnp.asarray(src_depths[src_i] * factor),
                    jnp.asarray(sf.vpass_y), jnp.asarray(sf.hpass_x),
                    jnp.asarray(sf.valid), st=sf.transposed_input,
                    interpret=interpret)
            elif src_depths is not None:
                dep_r = warp_ops.warp_separable_dyn(
                    jnp.asarray(src_depths[src_i] * factor),
                    jnp.asarray(sf.vpass_y), jnp.asarray(sf.hpass_x),
                    jnp.asarray(sf.transposed), nearest=True,
                    interpret=interpret)
                dep_r = jnp.where(jnp.asarray(sf.valid), dep_r, 0.0)
            else:
                dep_r = jnp.zeros((rh.statics.hp, rh.statics.wp),
                                  jnp.float32)
        else:
            dep_r = jnp.zeros((rh.statics.hp, rh.statics.wp), jnp.float32)

        extra = {}
        if stacked:
            extra = dict(
                f_flag=jnp.asarray(wf.transposed),
                b_flag=jnp.asarray(wb.transposed),
                s_vy=jnp.asarray(sf.vpass_y),
                s_hx=jnp.asarray(sf.hpass_x),
                s_flag=jnp.asarray(sf.transposed),
                s_valid=jnp.asarray(sf.valid.astype(np.float32)),
                s_zfac=jnp.asarray(factor),
            )

        views.append(RectView(
            ref_rect=ref_r,
            src_rect=src_r,
            ref_ok=jnp.asarray(wf.valid.astype(np.float32)),
            src_ok=jnp.asarray(sf.valid.astype(np.float32)),
            src_depth_rect=dep_r,
            R2r=jnp.asarray(pair.R2r.astype(np.float32)),
            f=jnp.float32(pair.f),
            cx=jnp.float32(pair.cx),
            cy=jnp.float32(pair.cy),
            b=jnp.float32(pair.b),
            f_vy=jnp.asarray(wf.vpass_y),
            f_hx=jnp.asarray(wf.hpass_x),
            b_vy=jnp.asarray(wb.vpass_y),
            b_hx=jnp.asarray(wb.hpass_x),
            orig_ok=jnp.asarray(wb.valid.astype(np.float32)),
            H_ref=jnp.asarray(pair.H_ref.astype(np.float32)),
            **extra,
        ))
    return tuple(views)


def rectify_src_depths(rect: Tuple[RectView, ...], statics: RectStatics,
                       src_depths: jnp.ndarray,       # (V, H, W) orig grid
                       interpret=None) -> Tuple[RectView, ...]:
    """Device-side counterpart of the host src-depth rectification in
    :func:`build_rect_views` for stacked mode: warp exchanged depth maps
    (parallel.mesh.exchange_depths) into each view's rect frame inside the
    jit — zero host staging (SURVEY §2.3 #2)."""
    assert statics.stacked
    out = []
    for i, rv in enumerate(rect):
        dep_r = warp_ops.warp_separable_dyn(
            src_depths[i] * rv.s_zfac, rv.s_vy, rv.s_hx, rv.s_flag,
            nearest=True, interpret=interpret)
        dep_r = jnp.where(rv.s_valid > 0.5, dep_r, 0.0)
        out.append(rv._replace(src_depth_rect=dep_r))
    return tuple(out)


# ---------------------------------------------------------------------------
# The cost evaluation proper
# ---------------------------------------------------------------------------

def plane_to_rect(plane: jnp.ndarray, R2r: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 4) plane hypotheses into the rect frame (d invariant)."""
    nr = geo.mat3_vec(jnp.broadcast_to(R2r, (*plane.shape[:-1], 3, 3)),
                      plane[..., :3])
    return jnp.concatenate([nr, plane[..., 3:4]], axis=-1)


def _shift2(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    return sampling.shift(img, dy, dx)


def ncc_rect_one(
    rv: RectView,
    plane_rect: jnp.ndarray,      # (Hp, Wp, 4) rect-frame plane field
    offsets: np.ndarray,          # (S, 2) static window offsets
    sigma_spatial: float,
    sigma_color: float,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Bilateral NCC cost field of one plane field against one source view,
    on the rectified grid. (Hp, Wp) in [0, COST_MAX]."""
    Hp, Wp = rv.ref_rect.shape
    u = jnp.arange(Wp, dtype=jnp.float32)[None, :]
    v = jnp.arange(Hp, dtype=jnp.float32)[:, None]

    nr = plane_rect[..., :3]
    d = plane_rect[..., 3]
    gx, gy, g0 = rectify.disparity_coeffs(nr, d, rv.f, rv.b)

    # Depth sign (cheirality) at the window center.
    denom = (nr[..., 0] * (u - rv.cx) + nr[..., 1] * (v - rv.cy)) / rv.f \
        + nr[..., 2]
    z = -d / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)

    xs_c = u + gx * (u - rv.cx) + gy * (v - rv.cy) + g0
    xs_c = jnp.where(jnp.isfinite(xs_c), xs_c, -1.0)

    # Center validity (reference: src center outside image -> COST_MAX,
    # DPE.cu:577-580; plus rect-frame content masks).
    src_ok_c = rowgather.row_gather(
        rv.src_ok, jnp.clip(xs_c, 0.0, Wp - 1).astype(jnp.int32),
        interpret=interpret)
    valid = (rv.ref_ok > 0.5) & (src_ok_c > 0.5) & (z > 0) & \
        (xs_c >= 0.0) & (xs_c <= Wp - 1.0)

    oys = sorted(set(float(o[1]) for o in offsets))
    ref_c = rv.ref_rect
    sum_w = jnp.zeros((Hp, Wp), jnp.float32)
    sum_ref = jnp.zeros((Hp, Wp), jnp.float32)
    sum_ref2 = jnp.zeros((Hp, Wp), jnp.float32)
    sum_src = jnp.zeros((Hp, Wp), jnp.float32)
    sum_src2 = jnp.zeros((Hp, Wp), jnp.float32)
    sum_rs = jnp.zeros((Hp, Wp), jnp.float32)

    inv_2ss = 1.0 / (2.0 * sigma_spatial * sigma_spatial)
    inv_2sc = 1.0 / (2.0 * sigma_color * sigma_color)

    for oy in oys:
        oxs = [float(o[0]) for o in offsets if float(o[1]) == oy]
        src_row = _shift2(rv.src_rect, int(oy), 0)
        # Batch this row's samples into one row-gather launch along L.
        xs_list, ref_list, w_list = [], [], []
        for ox in oxs:
            us = u + ox
            vs = v + oy
            xs = us + gx * (us - rv.cx) + gy * (vs - rv.cy) + g0
            xs_list.append(jnp.where(jnp.isfinite(xs), xs, 0.0))
            ref_s = _shift2(rv.ref_rect, int(oy), int(ox))
            ref_list.append(ref_s)
            spatial = float(np.sqrt(ox * ox + oy * oy))
            w_list.append(jnp.exp(-spatial * inv_2ss
                                  - jnp.abs(ref_s - ref_c) * inv_2sc))
        xs_cat = jnp.concatenate(xs_list, axis=1)            # (Hp, k*Wp)
        src_cat = rowgather.bilinear_x(src_row, xs_cat, interpret=interpret)
        k = len(oxs)
        src_s = src_cat.reshape(Hp, k, Wp)
        for j in range(k):
            w = w_list[j]
            r = ref_list[j]
            s = src_s[:, j]
            sum_w = sum_w + w
            sum_ref = sum_ref + w * r
            sum_ref2 = sum_ref2 + w * r * r
            sum_src = sum_src + w * s
            sum_src2 = sum_src2 + w * s * s
            sum_rs = sum_rs + w * r * s

    inv_w = 1.0 / sum_w
    m_ref = sum_ref * inv_w
    m_src = sum_src * inv_w
    var_ref = sum_ref2 * inv_w - m_ref * m_ref
    var_src = sum_src2 * inv_w - m_src * m_src
    covar = sum_rs * inv_w - m_ref * m_src
    den = jnp.sqrt(jnp.maximum(var_ref * var_src, K_MIN_VAR * K_MIN_VAR))
    ncc = jnp.clip(1.0 - covar / den, 0.0, COST_MAX)
    cost = jnp.where((var_ref < K_MIN_VAR) | (var_src < K_MIN_VAR),
                     COST_MAX, ncc)
    return jnp.where(valid, cost, COST_MAX)


def geom_rect_one(
    rv: RectView,
    plane_rect: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Forward-backward geometric consistency in the rect frame
    (``ComputeGeomConsistencyCost``, DPE.cu:915-953). Row-preserving: the
    back-projected error is purely horizontal, err = |x_back - u| with
    x_back = x_s + f b / z_src."""
    Hp, Wp = rv.ref_rect.shape
    u = jnp.arange(Wp, dtype=jnp.float32)[None, :]
    v = jnp.arange(Hp, dtype=jnp.float32)[:, None]
    nr = plane_rect[..., :3]
    d = plane_rect[..., 3]
    gx, gy, g0 = rectify.disparity_coeffs(nr, d, rv.f, rv.b)
    xs = u + gx * (u - rv.cx) + gy * (v - rv.cy) + g0
    xs = jnp.where(jnp.isfinite(xs), xs, -1.0)
    ok = (xs >= 0.0) & (xs <= Wp - 1.0)
    # Reference samples src depth at integer coords (DPE.cu:936).
    z_src = rowgather.row_gather(
        rv.src_depth_rect, jnp.clip(xs, 0.0, Wp - 1).astype(jnp.int32),
        interpret=interpret)
    x_back = xs + rv.f * rv.b / jnp.where(z_src > 0, z_src, 1e30)
    err = jnp.minimum(jnp.abs(x_back - u), GEOM_COST_MAX)
    return jnp.where(ok & (z_src > 0), err, GEOM_COST_MAX)


def rect_cost_vector(
    views: Tuple[RectView, ...],
    statics: RectStatics,
    plane: jnp.ndarray,              # (H, W, 4) orig-grid ref-cam plane field
    view_valid: jnp.ndarray,         # (V,) bool
    params: PatchMatchParams,
    offsets: np.ndarray,
    geom: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """(V, H, W) bilateral NCC (+ optional geometric) costs of one plane
    field against every source view, on the ORIGINAL pixel grid — the rect
    path's replacement for :func:`..engine.patchmatch.ncc_cost_vector`."""
    H, W = plane.shape[:2]
    out = []
    for i, rv in enumerate(views):
        pr = plane_to_rect(plane, rv.R2r)                    # (H, W, 4)
        prw = warp_fwd_channels(rv, statics, i, jnp.moveaxis(pr, -1, 0),
                                interpret=interpret)
        prw = jnp.moveaxis(prw, 0, -1)                       # (Hp, Wp, 4)
        c = ncc_rect_one(rv, prw, offsets, params.sigma_spatial,
                         params.sigma_color, interpret=interpret)
        if geom:
            g = geom_rect_one(rv, prw, interpret=interpret)
            c = c + params.geom_factor * g
        c_orig = warp_bwd(rv, statics, i, c, interpret=interpret)
        cmax = COST_MAX + (params.geom_factor * GEOM_COST_MAX if geom else 0.0)
        c_orig = jnp.where((rv.orig_ok > 0.5) & view_valid[i], c_orig,
                           cmax)
        out.append(c_orig)
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# Batched volume evaluation: S plane-coefficient fields through one pass
# ---------------------------------------------------------------------------

S_CHUNK = 8        # probes per row-gather launch (bounds transient memory)
VOL_INVALID = 1e4  # marker for invalid volume entries (bf16-exact)
VALID_THRESH = 1e3


def _sweep_ncc_volume(rv, coeff_fn, S: int, offsets: np.ndarray,
                      sigma_spatial: float, sigma_color: float,
                      with_geom: bool, interpret=None, stride: int = 1):
    """(S, Hp, Wp) window-NCC cost of S plane-coefficient fields against
    rv, sharing the probe-independent ref-side sums across all S and
    batching the source gathers (S_CHUNK probes x row offsets per launch).

    ``coeff_fn(c0, sc) -> (gxs, gys, g0s)`` produces the (sc, Hp, Wp)
    affine disparity coefficient fields of probes [c0, c0+sc) — computed
    per chunk so no (S, Hp, Wp) coefficient tensors are ever live (full-res
    images OOM'd the eager form). ``c0`` may be a traced scalar (the chunk
    loop is a lax.scan) and may address up to ceil(S/sc)*sc — callers must
    pad their probe sources (jax.lax.dynamic_slice_in_dim, last probe
    replicated); the overhang is dropped here. Returns (vol, gvol | None, valid) with
    vol VOL_INVALID-marked; geom is the forward-backward error
    (``ComputeGeomConsistencyCost``, DPE.cu:915-953).

    ``stride > 1`` evaluates the volume only on the rect frame's
    stride-subgrid — window samples keep full-resolution texture, only the
    *centers* are subsampled (quarter the work at stride 2); the classify
    stage tolerates neighbouring pixels sharing a profile. coeff_fn must
    then return subgrid-shaped fields; the returned volume is
    (S, Hp//stride, Wp//stride)."""
    Hp, Wp = rv.ref_rect.shape
    Hs, Ws = Hp // stride, Wp // stride
    u = (jnp.arange(Ws, dtype=jnp.float32) * stride)[None, :]
    v = (jnp.arange(Hs, dtype=jnp.float32) * stride)[:, None]

    def sub(a):
        return a[::stride, ::stride] if stride > 1 else a

    oys = sorted(set(float(o[1]) for o in offsets))
    ref_c = sub(rv.ref_rect)
    inv_2ss = 1.0 / (2.0 * sigma_spatial * sigma_spatial)
    inv_2sc = 1.0 / (2.0 * sigma_color * sigma_color)

    # Ref-side sums are probe-independent: one set serves all S probes.
    sum_w = jnp.zeros((Hs, Ws), jnp.float32)
    sum_ref = jnp.zeros((Hs, Ws), jnp.float32)
    sum_ref2 = jnp.zeros((Hs, Ws), jnp.float32)
    refs_by_oy, ws_by_oy, src_by_oy = {}, {}, {}
    for oy in oys:
        oxs = [float(o[0]) for o in offsets if float(o[1]) == oy]
        # Source rows subsampled to the centers''' rows, FULL width (the
        # gathered columns span the full frame).
        src_by_oy[oy] = _shift2(rv.src_rect, int(oy), 0)[::stride]
        refs, ws = [], []
        for ox in oxs:
            ref_s = sub(_shift2(rv.ref_rect, int(oy), int(ox)))
            refs.append(ref_s)
            spatial = float(np.sqrt(ox * ox + oy * oy))
            ws.append(jnp.exp(-spatial * inv_2ss
                              - jnp.abs(ref_s - ref_c) * inv_2sc))
        refs_by_oy[oy], ws_by_oy[oy] = refs, ws
        for w, r in zip(ws, refs):
            sum_w = sum_w + w
            sum_ref = sum_ref + w * r
            sum_ref2 = sum_ref2 + w * r * r

    inv_w = 1.0 / sum_w
    m_ref = sum_ref * inv_w
    var_ref = sum_ref2 * inv_w - m_ref * m_ref

    # Chunk-major over the probe axis, as a lax.scan: one compiled chunk
    # body instead of S/sc unrolled copies (classify at S=61 was a
    # 50-110 s compile as an unrolled loop). Plain accumulators inside the
    # body (no big dynamic slice updates — XLA copies the whole
    # (S, Hp, Wp) buffer per .at[].add). The chunk size adapts to the
    # frame so the (sc, k, Hp, Wp) gather-index transient stays bounded
    # (~256 MB — full-res frames OOM'd at the fixed size).
    k_max = max(len([o for o in offsets if float(o[1]) == oy])
                for oy in oys)
    sc_cap = max(1, min(S_CHUNK, int(256e6 // (k_max * Hs * Ws * 4))))
    n_chunks = -(-S // sc_cap)
    # Balanced chunk size: ceil(S / n_chunks) instead of the cap, so the
    # padded tail stays under one chunk's worth of slots (S=9 at cap 8
    # would evaluate 16 slots — 78% waste; balanced: 2x5 = 10).
    sc = -(-S // n_chunks)

    def chunk_body(_, c0):
        # Everything in this body works in (Hs, sc, [k,] Ws) layout: the
        # gather-index tensor is the largest operand in the engine
        # (sc*k*Hs*Ws f32 per oy) and building it directly in the flattened
        # row layout avoids two full materialization passes (a stack and a
        # 4-D transpose) per (oy, chunk) that the (sc, k, Hs, Ws)
        # formulation paid.
        gxs, gys, g0s = coeff_fn(c0, sc)                     # (sc, Hs, Ws)
        gxs_t = jnp.moveaxis(gxs, 0, 1)                      # (Hs, sc, Ws)
        gys_t = jnp.moveaxis(gys, 0, 1)
        g0s_t = jnp.moveaxis(g0s, 0, 1)
        vq = v.reshape(Hs, 1, 1)
        uq = u.reshape(1, 1, Ws)
        sum_src = jnp.zeros((Hs, sc, Ws), jnp.float32)
        sum_src2 = jnp.zeros((Hs, sc, Ws), jnp.float32)
        sum_rs = jnp.zeros((Hs, sc, Ws), jnp.float32)
        for oy in oys:
            oxs = [float(o[0]) for o in offsets if float(o[1]) == oy]
            k = len(oxs)
            us = u[0][None, :] + jnp.asarray(oxs, jnp.float32)[:, None]
            us4 = us[None, None]                             # (1, 1, k, Ws)
            xs4 = us4 + gxs_t[:, :, None] * (us4 - rv.cx) + \
                (gys_t * (vq + (oy - rv.cy)))[:, :, None] + \
                g0s_t[:, :, None]                            # (Hs, sc, k, Ws)
            xs4 = jnp.where(jnp.isfinite(xs4), xs4, 0.0)
            src = rowgather.bilinear_x(src_by_oy[oy],
                                       xs4.reshape(Hs, sc * k * Ws),
                                       interpret=interpret)
            src = src.reshape(Hs, sc, k, Ws)
            for j in range(k):
                w = ws_by_oy[oy][j]                          # (Hs, Ws)
                r = refs_by_oy[oy][j]
                s_j = src[:, :, j]                           # (Hs, sc, Ws)
                sum_src = sum_src + w[:, None] * s_j
                sum_src2 = sum_src2 + w[:, None] * s_j * s_j
                sum_rs = sum_rs + (w * r)[:, None] * s_j

        iw = inv_w[:, None]
        m_src = sum_src * iw
        var_src = sum_src2 * iw - m_src * m_src
        covar = sum_rs * iw - m_ref[:, None] * m_src
        den = jnp.sqrt(jnp.maximum(var_ref[:, None] * var_src,
                                   K_MIN_VAR ** 2))
        cost_c = jnp.clip(1.0 - covar / den, 0.0, COST_MAX)
        cost_c = jnp.where(
            (var_ref[:, None] < K_MIN_VAR) |
            (var_src < K_MIN_VAR), COST_MAX, cost_c)

        # Center validity per probe (DPE.cu:577-580 + rect content masks).
        d_c = gxs_t * (uq - rv.cx) + gys_t * (vq - rv.cy) + g0s_t
        d_c = jnp.where(jnp.isfinite(d_c), d_c, BIG)         # (Hs, sc, Ws)
        xs_c = uq + d_c
        xs_c_flat = xs_c.reshape(Hs, sc * Ws)
        ok_flat = rowgather.row_gather(
            rv.src_ok[::stride],
            jnp.clip(xs_c_flat, 0.0, Wp - 1).astype(jnp.int32),
            interpret=interpret)
        src_ok_c = ok_flat.reshape(Hs, sc, Ws)
        # Cheirality: with the source at +x (rectify.build_rect_pair, b>0),
        # a point in front of the cameras has disparity -f*b/z < 0.
        valid = (sub(rv.ref_ok)[:, None] > 0.5) & (src_ok_c > 0.5) & \
            (xs_c >= 0.0) & (xs_c <= Wp - 1.0) & (d_c < 0)
        vol_c = jnp.where(valid, cost_c, VOL_INVALID)

        if with_geom:
            z_flat = rowgather.row_gather(
                rv.src_depth_rect[::stride],
                jnp.clip(xs_c_flat, 0.0, Wp - 1).astype(jnp.int32),
                interpret=interpret)
            z_src = z_flat.reshape(Hs, sc, Ws)
            x_back = xs_c + rv.f * rv.b / jnp.where(z_src > 0, z_src, 1e30)
            err = jnp.minimum(jnp.abs(x_back - uq), GEOM_COST_MAX)
            err = jnp.where((z_src > 0) & valid, err, GEOM_COST_MAX)
            gvol_c = jnp.where(valid, err, VOL_INVALID)
        else:
            gvol_c = jnp.zeros((Hs, 0, Ws), jnp.float32)
        # Consumers take (sc, Hs, Ws).
        return None, (jnp.moveaxis(vol_c, 1, 0),
                      jnp.moveaxis(valid, 1, 0),
                      jnp.moveaxis(gvol_c, 1, 0))

    if n_chunks == 1:
        _, (vol, valid, gvol) = chunk_body(None, jnp.int32(0))
        gvol = gvol if with_geom else None
        return vol[:S], (gvol[:S] if gvol is not None else None), valid[:S]

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * sc
    _, (vols, valids, gvols) = jax.lax.scan(chunk_body, None, starts)
    vol = vols.reshape(n_chunks * sc, Hs, Ws)[:S]
    valid = valids.reshape(n_chunks * sc, Hs, Ws)[:S]
    gvol = (gvols.reshape(n_chunks * sc, Hs, Ws)[:S] if with_geom else None)
    return vol, gvol, valid


def batched_cost_fields(data, statics, planes: jnp.ndarray,
                        params: PatchMatchParams, geom: bool,
                        interpret=None) -> jnp.ndarray:
    """(S, V, H, W) NCC (+ geom) costs of S ref-cam plane fields — the
    batched form of S calls to rect_cost_vector. All S fields share one set
    of ref-side window sums per view and their source gathers ride batched
    launches; exact per-center window warps (same formula as ncc_rect_one —
    no probe-lattice approximation).

    planes: (S, H, W, 4). NOT used by the strong propagation: measured
    on-chip (round 4), per-field evaluation runs the strong iteration
    1.6x faster than this volume form at working shapes (see
    strong_rect's module docstring), so this remains the reference
    batched form (exercised by tests/test_weak_rect.py) and the probe
    machinery uses _sweep_ncc_volume directly. (A one-launch oy-stacked
    gather variant was also tried and reverted: the stacked-source and
    stacked-query concats cost more than the 5 saved launches — strong
    0.76 -> 0.96 s/iter, bench r4 try 3.)"""
    S, H, W = planes.shape[:3]
    offs = ncc.window_offsets(params.strong_radius, params.strong_increment)
    out = []
    for i, rv in enumerate(data.rect):
        Hp, Wp = rv.ref_rect.shape
        # Warp all S plane fields into the rect frame in one launch pair.
        pr = jax.vmap(lambda p: plane_to_rect(p, rv.R2r))(planes)
        chans = jnp.moveaxis(pr, -1, 1).reshape(S * 4, H, W)
        prw = warp_fwd_channels(rv, statics, i, chans,
                                interpret=interpret)
        prw = prw.reshape(S, 4, Hp, Wp)
        prw = jnp.concatenate([prw, jnp.broadcast_to(
            prw[-1:], (S_CHUNK, 4, Hp, Wp))])

        def coeff_fn(c0, sc):
            p_c = jax.lax.dynamic_slice_in_dim(prw, c0, sc, axis=0)
            nr = p_c[:, :3]
            d = p_c[:, 3]
            safe = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
            return (rv.b * nr[:, 0] / safe, rv.b * nr[:, 1] / safe,
                    rv.b * rv.f * nr[:, 2] / safe)

        vol, gvol, valid = _sweep_ncc_volume(
            rv, coeff_fn, S, offs, params.sigma_spatial, params.sigma_color,
            with_geom=geom, interpret=interpret)
        cost_i = jnp.where(valid, vol, COST_MAX)
        if geom:
            cost_i = cost_i + params.geom_factor * jnp.where(
                valid, gvol, GEOM_COST_MAX)
        back = warp_bwd_channels(rv, statics, i, cost_i,
                                 interpret=interpret)        # (S, H, W)
        cmax = COST_MAX + (params.geom_factor * GEOM_COST_MAX if geom
                           else 0.0)
        back = jnp.where((rv.orig_ok[None] > 0.5) & data.view_valid[i],
                         back, cmax)
        out.append(back)
    return jnp.moveaxis(jnp.stack(out), 0, 1)                # (S, V, H, W)
