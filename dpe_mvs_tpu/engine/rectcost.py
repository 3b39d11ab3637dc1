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

# Row banding of the stacked cost evaluation (exact — every read is
# row-local in the rect frame): frames whose (V, Hs, Ws) field exceeds
# BAND_FULL_BYTES run the offset-accumulation loop per row band sized to
# BAND_FIELD_BYTES per live field (~20 live at once), bounding HBM
# transients at full-resolution frames (3200x2400 OOMed unbanded).
# Module-level so tests can force the banded path on small frames.
# 96 MB: the strong iteration at 3200x2400 stride-2 holds ~2.5 GB of
# candidate cost fields already — its 143 MB-field screening evals must
# band as well (the 192 MB gate OOMed there).
BAND_FULL_BYTES = 96e6
BAND_FIELD_BYTES = 48e6
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
# View-stacked operands: every view in one kernel launch
# ---------------------------------------------------------------------------
#
# The row-gather kernels treat rows independently, so the V views' rectified
# frames (which share one (Hp, Wp) thanks to build_rect_host's common frame)
# stack along the ROW axis for free: one (V*Hp, Wp) operand turns V
# per-view launches into one. Round 4 measured the per-launch dispatch
# overhead as the strong iteration's dominant cost (VERDICT r4 weak #1 —
# O(10^3) launches/sweep); this section is the round-5 batching.


class _WarpGroup(NamedTuple):
    """Views sharing one (static) warp orientation, stacked for one launch
    pair. ``idx`` is a static tuple of view indices; ``flags`` is used only
    in stacked-dyn mode (runtime transposes) where ``transposed`` is None."""

    idx: Tuple[int, ...]
    transposed: Optional[bool]
    vy: jnp.ndarray               # (g, h_out, w_in)
    hx: jnp.ndarray               # (g, h_out, w_out)
    flags: Optional[jnp.ndarray]  # (g,) f32 runtime transpose flags


class RectStack(NamedTuple):
    """View-stacked device operands of a problem's RectView tuple."""

    ref_rect: jnp.ndarray       # (V, Hp, Wp)
    src_rect: jnp.ndarray       # (V, Hp, Wp)
    ref_ok: jnp.ndarray         # (V, Hp, Wp)
    src_ok: jnp.ndarray         # (V, Hp, Wp)
    src_depth: jnp.ndarray      # (V, Hp, Wp)
    orig_ok: jnp.ndarray        # (V, H, W)
    R2r: jnp.ndarray            # (V, 3, 3)
    f: jnp.ndarray              # (V, 1, 1)
    cx: jnp.ndarray             # (V, 1, 1)
    cy: jnp.ndarray             # (V, 1, 1)
    b: jnp.ndarray              # (V, 1, 1)
    fwd: Tuple[_WarpGroup, ...]
    bwd: Tuple[_WarpGroup, ...]
    # Per-row valid source-column interval of src_ok: a homography-warped
    # rectangle's per-row valid set is convex, so the center-validity
    # row_gather of src_ok collapses to two elementwise compares
    # (DPE.cu:577-580 center check without a gather).
    src_lo: jnp.ndarray = None  # (V, Hp, 1) f32
    src_hi: jnp.ndarray = None  # (V, Hp, 1) f32


def _groups(flag_list, vys, hxs, stacked, flags_arr):
    if stacked:
        return (_WarpGroup(tuple(range(len(vys))), None,
                           jnp.stack(vys), jnp.stack(hxs),
                           jnp.stack(flags_arr)),)
    out = []
    for val in (False, True):
        idx = tuple(i for i, t in enumerate(flag_list) if t == val)
        if idx:
            out.append(_WarpGroup(
                idx, val, jnp.stack([vys[i] for i in idx]),
                jnp.stack([hxs[i] for i in idx]), None))
    return tuple(out)


def build_rect_stack(views: Tuple[RectView, ...],
                     statics: RectStatics) -> RectStack:
    """Assemble the view-stacked operands (traced; pure stacks)."""
    scal = lambda g: jnp.stack([jnp.asarray(g(rv), jnp.float32)
                                for rv in views])[:, None, None]
    fwd = _groups(statics.f_transposed,
                  [rv.f_vy for rv in views], [rv.f_hx for rv in views],
                  statics.stacked,
                  [rv.f_flag for rv in views] if statics.stacked else None)
    bwd = _groups(statics.b_transposed,
                  [rv.b_vy for rv in views], [rv.b_hx for rv in views],
                  statics.stacked,
                  [rv.b_flag for rv in views] if statics.stacked else None)
    src_ok = jnp.stack([rv.src_ok for rv in views])
    okb = src_ok > 0.5
    Wp = src_ok.shape[-1]
    cols = jnp.arange(Wp, dtype=jnp.int32)
    any_ok = jnp.any(okb, axis=-1, keepdims=True)
    lo = jnp.argmax(okb, axis=-1, keepdims=True)
    hi = Wp - 1 - jnp.argmax(okb[..., ::-1], axis=-1, keepdims=True)
    src_lo = jnp.where(any_ok, lo, 1).astype(jnp.float32)
    src_hi = jnp.where(any_ok, hi, 0).astype(jnp.float32)
    return RectStack(
        ref_rect=jnp.stack([rv.ref_rect for rv in views]),
        src_rect=jnp.stack([rv.src_rect for rv in views]),
        ref_ok=jnp.stack([rv.ref_ok for rv in views]),
        src_ok=src_ok,
        src_depth=jnp.stack([rv.src_depth_rect for rv in views]),
        orig_ok=jnp.stack([rv.orig_ok for rv in views]),
        R2r=jnp.stack([rv.R2r for rv in views]),
        f=scal(lambda rv: rv.f), cx=scal(lambda rv: rv.cx),
        cy=scal(lambda rv: rv.cy), b=scal(lambda rv: rv.b),
        fwd=fwd, bwd=bwd, src_lo=src_lo, src_hi=src_hi,
    )


def _stack_warp(imgs, vys, hxs, nearest, interpret):
    """One launch pair warping N images by N separable warp fields.

    imgs (N, H_in, W_in); vys (N, h_out, w_in); hxs (N, h_out, w_out).
    Same two-pass structure as warp.warp_channels, but the fields vary per
    row-stacked image instead of broadcasting one field over channels."""
    N, h_in, w_in = imgs.shape
    h_out, w_out = hxs.shape[1:]
    imgT = jnp.swapaxes(imgs, 1, 2).reshape(N * w_in, h_in)
    vyT = jnp.swapaxes(vys, 1, 2).reshape(N * w_in, h_out)
    if nearest:
        tmpT = rowgather.row_gather(
            imgT, jnp.round(vyT).astype(jnp.int32), interpret=interpret)
    else:
        tmpT = rowgather.bilinear_x(imgT, vyT, interpret=interpret)
    tmp = jnp.swapaxes(tmpT.reshape(N, w_in, h_out), 1, 2) \
        .reshape(N * h_out, w_in)
    hx = hxs.reshape(N * h_out, w_out)
    if nearest:
        out = rowgather.row_gather(
            tmp, jnp.round(hx).astype(jnp.int32), interpret=interpret)
    else:
        out = rowgather.bilinear_x(tmp, hx, interpret=interpret)
    return out.reshape(N, h_out, w_out)


def _warp_groups(groups: Tuple[_WarpGroup, ...], chans: jnp.ndarray,
                 nearest: bool, interpret, stride: int = 1) -> jnp.ndarray:
    """(V, C, H_in, W_in) channels -> (V, C, h_out, w_out) through the
    grouped per-view warp fields (<=2 launch pairs for all V*C channels).

    ``stride > 1``: the inputs live on the warp's stride-subgrid (strided
    screening) — the field columns are subsampled and index values scaled,
    exactly as warp_bwd_channels_strided does for the classify volume."""
    V, C = chans.shape[:2]
    h_out, w_out = groups[0].hx.shape[1:]
    outs = [None] * V
    s = 1.0 / stride
    # Split groups so the repeated per-channel index fields stay under
    # ~512 MB per launch at full-resolution frames.
    split = []
    for grp in groups:
        w_in = -(-grp.vy.shape[2] // stride)
        g_cap = max(1, int(512e6 // max(C * w_in * h_out * 4, 1)))
        for c0 in range(0, len(grp.idx), g_cap):
            split.append(grp._replace(
                idx=grp.idx[c0:c0 + g_cap],
                vy=grp.vy[c0:c0 + g_cap], hx=grp.hx[c0:c0 + g_cap],
                flags=(grp.flags[c0:c0 + g_cap]
                       if grp.flags is not None else None)))
    for grp in split:
        sub = jnp.stack([chans[i] for i in grp.idx])     # (g, C, H, W)
        vy, hx = grp.vy, grp.hx
        if stride > 1:
            vy = vy[:, :, ::stride] * s
            hx = hx * s
        if grp.transposed is None:
            d = -(-grp.vy.shape[2] // stride)
            sub = warp_ops._square_pad(sub, d)
            sub = jnp.where(grp.flags[:, None, None, None] > 0.5,
                            jnp.swapaxes(sub, 2, 3), sub)
        elif grp.transposed:
            sub = jnp.swapaxes(sub, 2, 3)
        g = len(grp.idx)
        imgs = sub.reshape(g * C, *sub.shape[2:])
        vys = jnp.repeat(vy, C, axis=0)
        hxs = jnp.repeat(hx, C, axis=0)
        out = _stack_warp(imgs, vys, hxs, nearest, interpret) \
            .reshape(g, C, h_out, w_out)
        for j, i in enumerate(grp.idx):
            outs[i] = out[j]
    return jnp.stack(outs)


def _shift3(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Clamp-padded static shift on the last two axes of (..., H, W)."""
    H, W = a.shape[-2:]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = [(0, 0)] * (a.ndim - 2) + [(py1, py0), (px1, px0)]
    padded = jnp.pad(a, pad, mode="edge")
    start = (0,) * (a.ndim - 2) + (py1 + dy, px1 + dx)
    return jax.lax.dynamic_slice(padded, start, a.shape)


class EvalCache(NamedTuple):
    """Candidate-independent pieces of the stacked cost evaluation, built
    once per stage trace and shared by every evaluation in it (the strong
    iteration makes ~22 evaluations per color; the ref-side window weights
    — 36 exps per (pixel, view) — and the shifted source rows are
    identical across all of them). For ``stride > 1`` everything is stored
    pre-subsampled, so screening evaluations never pay per-eval
    lane-strided relayouts (the round-5 on-chip regression: per-eval
    ``[..., ::2]`` slices cost more than the gather reduction saved)."""

    stride: int
    fwd: Tuple[_WarpGroup, ...]   # forward groups, output-strided
    ref_ok: jnp.ndarray           # (V, Hs, Ws) f32
    src_lo: jnp.ndarray           # (V, Hs, 1)
    src_hi: jnp.ndarray
    src_rows: Tuple[jnp.ndarray, ...]   # per oy: (V, Hs, Wp) shifted rows
    w: Tuple[jnp.ndarray, ...]          # per (oy, ox): (V, Hs, Ws)
    wr: Tuple[jnp.ndarray, ...]         # per (oy, ox): w * ref_s
    inv_w: jnp.ndarray            # (V, Hs, Ws)
    m_ref: jnp.ndarray
    var_ref: jnp.ndarray
    src_depth: Optional[jnp.ndarray]    # (V, Hs, Wp) row-subsampled


def build_eval_cache(stack: RectStack, params: PatchMatchParams,
                     offsets: np.ndarray, stride: int = 1,
                     geom: bool = False,
                     budget_bytes: float = 2.2e9) -> Optional[EvalCache]:
    """Build the per-stage EvalCache, or None when the cached fields would
    exceed ``budget_bytes`` (full-resolution frames fall back to inline
    recomputation)."""
    V, Hp, Wp = stack.src_rect.shape
    Hs, Ws = -(-Hp // stride), -(-Wp // stride)
    oys = sorted(set(float(o[1]) for o in offsets))
    n_off = len(offsets)
    total = (2 * n_off + 3) * V * Hs * Ws * 4 + len(oys) * V * Hs * Wp * 4
    if total > budget_bytes:
        return None

    def sub(a):
        return a[..., ::stride, ::stride] if stride > 1 else a

    def subr(a):
        return a[..., ::stride, :] if stride > 1 else a

    fwd = stack.fwd
    if stride > 1:
        fwd = tuple(g._replace(vy=g.vy[:, ::stride],
                               hx=g.hx[:, ::stride, ::stride]) for g in fwd)

    inv_2ss = 1.0 / (2.0 * params.sigma_spatial * params.sigma_spatial)
    inv_2sc = 1.0 / (2.0 * params.sigma_color * params.sigma_color)
    ref_c = sub(stack.ref_rect)
    src_rows, ws, wrs = [], [], []
    sum_w = jnp.zeros((V, Hs, Ws), jnp.float32)
    sum_ref = jnp.zeros((V, Hs, Ws), jnp.float32)
    sum_ref2 = jnp.zeros((V, Hs, Ws), jnp.float32)
    for oy in oys:
        src_rows.append(subr(_shift3(stack.src_rect, int(oy), 0)))
        for ox in [float(o[0]) for o in offsets if float(o[1]) == oy]:
            ref_s = sub(_shift3(stack.ref_rect, int(oy), int(ox)))
            spatial = float(np.sqrt(ox * ox + oy * oy))
            w = jnp.exp(-spatial * inv_2ss
                        - jnp.abs(ref_s - ref_c) * inv_2sc)
            ws.append(w)
            wrs.append(w * ref_s)
            sum_w = sum_w + w
            sum_ref = sum_ref + w * ref_s
            sum_ref2 = sum_ref2 + w * ref_s * ref_s
    inv_w = 1.0 / sum_w
    m_ref = sum_ref * inv_w
    var_ref = sum_ref2 * inv_w - m_ref * m_ref
    return EvalCache(
        stride=stride, fwd=fwd, ref_ok=sub(stack.ref_ok),
        src_lo=subr(stack.src_lo), src_hi=subr(stack.src_hi),
        src_rows=tuple(src_rows), w=tuple(ws), wr=tuple(wrs),
        inv_w=inv_w, m_ref=m_ref, var_ref=var_ref,
        src_depth=subr(stack.src_depth) if geom else None,
    )


def rect_cost_vector_stacked(
    stack: RectStack,
    plane: jnp.ndarray,              # (H, W, 4) orig-grid ref-cam plane field
    view_valid: jnp.ndarray,         # (V,) bool
    params: PatchMatchParams,
    offsets: np.ndarray,
    geom: bool = False,
    interpret: Optional[bool] = None,
    stride: int = 1,
    cache: Optional[EvalCache] = None,
) -> jnp.ndarray:
    """View-stacked :func:`rect_cost_vector`: identical math (bilateral NCC
    of ncc_rect_one + geom_rect_one per view), but every kernel launch
    carries all V views — O(row offsets) launches per evaluation instead of
    O(V * row offsets).

    ``stride > 1`` evaluates only the rect frame's stride-subgrid of window
    CENTERS (window samples keep full-resolution texture) and
    nearest-upsamples through the backward warp — the candidate-screening
    approximation (strong_rect.screen_stride): 1/stride^2 of the gather
    work; the winning candidate is re-scored exactly by the caller."""
    V, Hp, Wp = stack.src_rect.shape
    H, W = plane.shape[:2]

    def sub(a):
        return a[..., ::stride, ::stride] if stride > 1 else a

    def subr(a):
        return a[..., ::stride, :] if stride > 1 else a

    if cache is not None:
        assert cache.stride == stride

    # Transport n/d (3 channels — d is never needed separately: the
    # disparity coefficients are linear in n/d and the cheirality sign is
    # sign(-1 / (n/d . dir)); nearest-warp commutes with the pointwise
    # division, so this matches the 4-channel (n, d) transport bitwise
    # while gathering 25% fewer warp samples). Rotation into each rect
    # frame happens after the warp (also pointwise-linear). With a cache
    # and stride > 1, the warp groups are output-strided — the screening
    # transport is 1/stride^2 of the exact one, with no per-eval strided
    # relayout.
    d_o = plane[..., 3]
    q_o = plane[..., :3] / jnp.where(jnp.abs(d_o) < 1e-30, 1e-30,
                                     d_o)[..., None]         # (H, W, 3)
    chans = jnp.broadcast_to(jnp.moveaxis(q_o, -1, 0)[None],
                             (V, 3, H, W))
    # Output-strided fwd warp fields: gather only the stride-subgrid's
    # rows/cols (identical values to warping full-res then subsampling —
    # nearest gathers of the same indices; 1/stride^2 of the gather work).
    if cache is not None:
        fwd_groups = cache.fwd
    elif stride > 1:
        fwd_groups = tuple(g._replace(vy=g.vy[:, ::stride],
                                      hx=g.hx[:, ::stride, ::stride])
                           for g in stack.fwd)
    else:
        fwd_groups = stack.fwd

    Hs, Ws = -(-Hp // stride), -(-Wp // stride)              # == a[::stride]
    u = (jnp.arange(Ws, dtype=jnp.float32) * stride)[None, None, :]

    if cache is not None:
        ref_oks, lo_s, hi_s = cache.ref_ok, cache.src_lo, cache.src_hi
    else:
        ref_oks = sub(stack.ref_ok)
        lo_s, hi_s = subr(stack.src_lo), subr(stack.src_hi)

    oys = sorted(set(float(o[1]) for o in offsets))
    pad_r = int(max(abs(o[1]) for o in offsets)) + (stride - 1)

    # Band height: bound the per-offset accumulation transients (~20 live
    # (V, hb, Ws) f32 fields) at full-resolution frames. Frames whose full
    # field is small run as ONE band — the direct call compiles to exactly
    # the pre-banding program (round-5: 3200x2400 OOMed in _init_stage with
    # ~20 full-field copies; banding is exact because every read is
    # row-local in the rect frame).
    field_bytes = V * Hs * Ws * 4
    if field_bytes <= BAND_FULL_BYTES:
        hb, nb = Hs, 1
    else:
        hb = max(8, int(BAND_FIELD_BYTES // (V * Ws * 4)) // 8 * 8)
        hb = min(hb, Hs)
        nb = -(-Hs // hb)

    if cache is None:
        inv_2ss = 1.0 / (2.0 * params.sigma_spatial * params.sigma_spatial)
        inv_2sc = 1.0 / (2.0 * params.sigma_color * params.sigma_color)
        if nb > 1:
            # Row-padded rect textures: a band's oy-shifted rows become one
            # dynamic row slice (identical values to _shift3's edge
            # clamping). Only materialized when banding — the pads are two
            # extra ~(V, Hp, Wp) residents, which cost 1600x1200 its HBM
            # margin when always-on (round-5 regression).
            ref_pad = jnp.pad(stack.ref_rect,
                              ((0, 0), (pad_r, pad_r), (0, 0)), mode="edge")
            src_pad = jnp.pad(stack.src_rect,
                              ((0, 0), (pad_r, pad_r), (0, 0)), mode="edge")
        dep_sub = subr(stack.src_depth) if geom else None
    else:
        dep_sub = (cache.src_depth if cache.src_depth is not None
                   else subr(stack.src_depth)) if geom else None

    def band_cost(r0):
        """Cost field rows [r0, r0+hb) of (V, Hs, Ws); r0 static 0 when
        nb == 1, traced under lax.map otherwise. The plane TRANSPORT (fwd
        warp + disparity coefficients + center validity) also runs per
        band — full-field transport held ~1.4 GB of (V, Hs, Ws) fields
        live at 3200x2400 (the second round-5 strong-iter OOM)."""
        fwd_b = tuple(g._replace(
            vy=jax.lax.dynamic_slice_in_dim(g.vy, r0, hb, axis=1),
            hx=jax.lax.dynamic_slice_in_dim(g.hx, r0, hb, axis=1))
            for g in fwd_groups)
        qw_b = _warp_groups(fwd_b, chans, nearest=True,
                            interpret=interpret)             # (V, 3, hb, Ws)
        nq_b = jnp.einsum("vij,vjhw->vihw", stack.R2r, qw_b)
        gx_b = stack.b * nq_b[:, 0]
        gy_b = stack.b * nq_b[:, 1]
        g0_b = stack.b * stack.f * nq_b[:, 2]
        v_b = (r0 + jnp.arange(hb, dtype=jnp.float32))[None, :, None] \
            * stride

        # Depth sign (cheirality) at the window center (as ncc_rect_one):
        # z = -1 / (q . dir) with q = n/d in the rect frame.
        denom_q = (nq_b[:, 0] * (u - stack.cx)
                   + nq_b[:, 1] * (v_b - stack.cy)) / stack.f + nq_b[:, 2]
        z_pos = denom_q < 0
        xs_cb = u + gx_b * (u - stack.cx) + gy_b * (v_b - stack.cy) + g0_b
        xs_cb = jnp.where(jnp.isfinite(xs_cb), xs_cb, -1.0)
        ref_ok_b = jax.lax.dynamic_slice_in_dim(ref_oks, r0, hb, axis=1)
        lo_b = jax.lax.dynamic_slice_in_dim(lo_s, r0, hb, axis=1)
        hi_b = jax.lax.dynamic_slice_in_dim(hi_s, r0, hb, axis=1)
        # Center validity via the per-row valid interval of src_ok (exactly
        # ok[floor(xs_c)] for a convex row — no gather).
        valid_b = (ref_ok_b > 0.5) & z_pos & \
            (xs_cb >= jnp.maximum(lo_b, 0.0)) & \
            (xs_cb < hi_b + 1.0) & (xs_cb <= Wp - 1.0)
        zero = jnp.zeros((V, hb, Ws), jnp.float32)
        sum_src = sum_src2 = sum_rs = zero
        if cache is None:
            sum_w = sum_ref = sum_ref2 = zero
            if nb == 1:
                ref_c = sub(stack.ref_rect)
            else:
                ref_c = jax.lax.dynamic_slice_in_dim(
                    ref_pad, r0 * stride + pad_r, hb * stride,
                    axis=1)[:, ::stride, ::stride]

        # Offsets per gather launch, bounded so the (V, hb, kc, Ws) query/
        # result transients stay under ~256 MB each.
        k_cap = max(1, int(256e6 // (V * hb * Ws * 4)))
        # On large frames, XLA's scheduler hoists every chunk's gather
        # above the accumulation that consumes it (~20 simultaneous
        # (V, hb, k, Ws) copies live — the 3200x2400 strong-iter OOM);
        # an identity optimization_barrier per chunk chains each gather
        # behind the previous chunk's accumulation. Small frames keep
        # the free-scheduling overlap.
        use_barrier = V * hb * Ws * 4 > 24e6
        flat = 0
        for oy_i, oy in enumerate(oys):
            oxs = [float(o[0]) for o in offsets if float(o[1]) == oy]
            # Window rows keep full-res texture; only the center rows are
            # subsampled (gathered columns span the full frame width).
            if cache is not None:
                src_row = jax.lax.dynamic_slice_in_dim(
                    cache.src_rows[oy_i], r0, hb, axis=1)
                ref_rows = None
            elif nb == 1:
                src_row = subr(_shift3(stack.src_rect, int(oy), 0))
                ref_rows = subr(_shift3(stack.ref_rect, int(oy), 0))
            else:
                src_row = jax.lax.dynamic_slice_in_dim(
                    src_pad, r0 * stride + int(oy) + pad_r, hb * stride,
                    axis=1)[:, ::stride]
                ref_rows = jax.lax.dynamic_slice_in_dim(
                    ref_pad, r0 * stride + int(oy) + pad_r, hb * stride,
                    axis=1)[:, ::stride]
            for c0 in range(0, len(oxs), k_cap):
                ox_c = oxs[c0:c0 + k_cap]
                k = len(ox_c)
                xs_list, ref_list, w_list = [], [], []
                for ox in ox_c:
                    us = u + ox
                    vs = v_b + oy
                    xs = us + gx_b * (us - stack.cx) + \
                        gy_b * (vs - stack.cy) + g0_b
                    xs_list.append(jnp.where(jnp.isfinite(xs), xs, 0.0))
                    if cache is None:
                        ref_s = _shift3(ref_rows, 0, int(ox))[..., ::stride]
                        ref_list.append(ref_s)
                        spatial = float(np.sqrt(ox * ox + oy * oy))
                        w_list.append(jnp.exp(-spatial * inv_2ss
                                              - jnp.abs(ref_s - ref_c)
                                              * inv_2sc))
                xs_cat = jnp.stack(xs_list, axis=2)          # (V, hb, k, Ws)
                src_cat = rowgather.bilinear_x(
                    src_row.reshape(V * hb, Wp),
                    xs_cat.reshape(V * hb, k * Ws), interpret=interpret)
                src_s = src_cat.reshape(V, hb, k, Ws)
                for j in range(k):
                    s = src_s[:, :, j]
                    if cache is None:
                        w = w_list[j]
                        r = ref_list[j]
                        sum_w = sum_w + w
                        sum_ref = sum_ref + w * r
                        sum_ref2 = sum_ref2 + w * r * r
                        sum_src = sum_src + w * s
                        sum_src2 = sum_src2 + w * s * s
                        sum_rs = sum_rs + w * r * s
                    else:
                        w = jax.lax.dynamic_slice_in_dim(
                            cache.w[flat + j], r0, hb, axis=1)
                        wr = jax.lax.dynamic_slice_in_dim(
                            cache.wr[flat + j], r0, hb, axis=1)
                        sum_src = sum_src + w * s
                        sum_src2 = sum_src2 + w * s * s
                        sum_rs = sum_rs + wr * s
                if use_barrier:
                    if cache is None:
                        (sum_w, sum_ref, sum_ref2, sum_src, sum_src2,
                         sum_rs, gx_b, gy_b, g0_b) = \
                            jax.lax.optimization_barrier(
                                (sum_w, sum_ref, sum_ref2, sum_src,
                                 sum_src2, sum_rs, gx_b, gy_b, g0_b))
                    else:
                        (sum_src, sum_src2, sum_rs, gx_b, gy_b, g0_b) = \
                            jax.lax.optimization_barrier(
                                (sum_src, sum_src2, sum_rs, gx_b, gy_b,
                                 g0_b))
                flat += k

        if cache is None:
            inv_w = 1.0 / sum_w
            m_ref = sum_ref * inv_w
            var_ref = sum_ref2 * inv_w - m_ref * m_ref
        else:
            inv_w = jax.lax.dynamic_slice_in_dim(cache.inv_w, r0, hb, axis=1)
            m_ref = jax.lax.dynamic_slice_in_dim(cache.m_ref, r0, hb, axis=1)
            var_ref = jax.lax.dynamic_slice_in_dim(cache.var_ref, r0, hb,
                                                   axis=1)
        m_src = sum_src * inv_w
        var_src = sum_src2 * inv_w - m_src * m_src
        covar = sum_rs * inv_w - m_ref * m_src
        den = jnp.sqrt(jnp.maximum(var_ref * var_src, K_MIN_VAR * K_MIN_VAR))
        nccv = jnp.clip(1.0 - covar / den, 0.0, COST_MAX)
        c_b = jnp.where((var_ref < K_MIN_VAR) | (var_src < K_MIN_VAR),
                        COST_MAX, nccv)
        c_b = jnp.where(valid_b, c_b, COST_MAX)

        if geom:
            dep_b = jax.lax.dynamic_slice_in_dim(dep_sub, r0, hb, axis=1)
            z_src = rowgather.row_gather(
                dep_b.reshape(V * hb, Wp),
                jnp.clip(xs_cb, 0.0, Wp - 1).astype(jnp.int32)
                .reshape(V * hb, Ws),
                interpret=interpret).reshape(V, hb, Ws)
            ok_g = (xs_cb >= 0.0) & (xs_cb <= Wp - 1.0)
            x_back = xs_cb + stack.f * stack.b / jnp.where(z_src > 0, z_src,
                                                           1e30)
            err = jnp.minimum(jnp.abs(x_back - u), GEOM_COST_MAX)
            g = jnp.where(ok_g & (z_src > 0), err, GEOM_COST_MAX)
            c_b = c_b + params.geom_factor * g
        return c_b

    if nb == 1:
        c = band_cost(0)
    else:
        # Last band re-covers rows of its neighbour (identical values), so
        # the stitched field is exact.
        starts = jnp.minimum(jnp.arange(nb) * hb, Hs - hb).astype(jnp.int32)
        c_bands = jax.lax.map(band_cost, starts)             # (nb, V, hb, Ws)

        def upd(buf, xs):
            r0, cb = xs
            return jax.lax.dynamic_update_slice_in_dim(buf, cb, r0, axis=1), \
                None

        c, _ = jax.lax.scan(upd, jnp.zeros((V, Hs, Ws), jnp.float32),
                            (starts, c_bands))

    back = _warp_groups(stack.bwd, c[:, None], nearest=True,
                        interpret=interpret, stride=stride)[:, 0]  # (V, H, W)
    cmax = COST_MAX + (params.geom_factor * GEOM_COST_MAX if geom else 0.0)
    return jnp.where((stack.orig_ok > 0.5) &
                     view_valid[:, None, None], back, cmax)


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
    path's replacement for :func:`..engine.patchmatch.ncc_cost_vector`.

    Delegates to :func:`rect_cost_vector_stacked` (round 5): identical math,
    every launch carries all V views. Callers evaluating many fields should
    build the RectStack once (strong_rect.make_cost_fn) and call the stacked
    form directly so the operand stacking is traced once."""
    stack = build_rect_stack(views, statics)
    return rect_cost_vector_stacked(stack, plane, view_valid, params,
                                    offsets, geom=geom, interpret=interpret)


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


# (round 5) batched_cost_fields — the S-plane-field batched form of
# rect_cost_vector — was retired from the production tree (VERDICT r4 weak
# #7): its one production candidate consumer (strong propagation) measured
# faster on the per-field path in round 4, and the per-stage EvalCache now
# provides the ref-side sharing it offered. The reference batched form
# lives on as a test helper (tests/test_weak_rect.py) exercising
# _sweep_ncc_volume — the machinery the classify/weakprep probes use —
# against rect_cost_vector.
