"""Weak-texture machinery on the rectified cost engine (TPU path).

The reference evaluates the deformable NCC (``ComputeBilateralNCCNew``,
DPE.cu:557-690) with ~9 scattered texture windows per (pixel, view, plane
candidate) — random 2-D reads the GPU texture cache makes free and a TPU
cannot do at rate (BASELINE.md). This module restructures the whole weak
pipeline (``CheckerboardPropagationWeak`` DPE.cu:1668-1862 and its callees)
around two per-sweep precomputations so that *every* plane evaluation
afterwards is elementwise VPU work:

  1. **Disparity probe volume** — for each source view, in its rectified
     frame, the bilateral-NCC window cost at every pixel for ``PROBE_S``
     static disparity offsets around the sweep-initial plane's disparity
     (keeping that plane's local slope across the window). Entirely
     row-local: built with the same banded row gathers as the strong path.
     In geometric-consistency passes a parallel volume of forward-backward
     reprojection errors (``ComputeGeomConsistencyCost``, DPE.cu:915-953)
     is built from the same probes.
  2. **Anchor profiles** — the weak-window volume and its probe-center
     disparity, gathered once per sweep at the 8 deformable anchors of
     every pixel (banded 2-D gather, ops/gather2d).

A candidate plane's deformable cost at pixel p for view v is then

    0.25 * lerp(center profile at p,   disparity of the candidate at p)
  + 0.75 * mean_j lerp(anchor profile, disparity of the candidate at a_j)

which matches the reference's 0.25/0.75 blend (DPE.cu:680-686), its
selected-view out-of-bounds accounting (DPE.cu:595-607), and its center
invalidation (DPE.cu:577-580). Deliberate deviations from the reference,
all bounded and chosen for TPU shape:

  * anchor/center windows are sampled on the probe lattice (step
    ``PROBE_STEP`` px, linear interpolation) and with the *initial* plane's
    within-window slope instead of each candidate's; candidates whose
    disparity leaves the probe range score COST_MAX;
  * the bilateral color anchor of an anchor window is that window's own
    center intensity, not the weak pixel's (DPE.cu:585 uses the weak
    pixel's);
  * the adaptive center radius (``radius_cuda``, DPE.cu:620-623) is not
    applied on this path (the center term carries 0.25 weight); the
    CPU/XLA engine (ops/weak.py) keeps the exact semantics and the two are
    cross-checked statistically in tests.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COST_MAX, GEOM_COST_MAX, PatchMatchParams, PixelState, RunState
from ..geometry import cameras as geo
from ..geometry import rectify
from ..ops import checker, ncc, rowgather, sampling
from ..ops import warp as warp_ops
from . import patchmatch as pm
from . import rectcost
from . import strong_rect
from .state import PMState, SweepData

WEAK = int(PixelState.WEAK)
STRONG = int(PixelState.STRONG)
BIG = float(1e30)

PROBE_S = 16           # probes per pixel per view
PROBE_STEP = 2.0       # px between probes
A_D0_STORE_MAX_PX = 1_000_000   # above this, a_d0 is regathered per color
# Above this pixel count the (V, 8, S, H, W) anchor-profile store is never
# materialized (2.5 GB at 1600x1200, ~31 GB at full-res ETH3D — VERDICT r4
# missing #1): the bundle instead keeps the packed rect-frame weak-window
# volumes ((V, S/2+1, Hp, Wp) f32) and every weak iteration gathers its row
# band's anchor profiles on the fly (see _gather_band_profiles). Trades the
# one-time anchor gather for one gather per weak call (6x/sweep) — only
# where the store cannot exist.
# 1.5M: with the round-5 strong-iter EvalCache (~1.5 GB resident in the
# screening programs at 1600x1200), the materialized store no longer fits
# next to it at 1.92M px — 1600x1200 runs in streaming mode now.
AP_STORE_MAX_PX = 1_500_000
# Shared volume machinery lives in rectcost (also used by strong_rect);
# re-exported here for compatibility.
from .rectcost import (S_CHUNK, VALID_THRESH, VOL_INVALID,  # noqa: E402
                       _sweep_ncc_volume)


def probe_offsets() -> np.ndarray:
    """Static disparity offsets, centred on 0 (the initial plane)."""
    return ((np.arange(PROBE_S) - (PROBE_S - 1) / 2.0) * PROBE_STEP
            ).astype(np.float32)


class WeakRectBundle(NamedTuple):
    """Per-sweep device products of :func:`build_weak_bundle`."""

    vol_center: jnp.ndarray        # (V, S, H, W) bf16 strong-window NCC
    vol_geom: Optional[jnp.ndarray]  # (V, S, H, W) bf16 geom err, or None
    d0: jnp.ndarray                # (V, H, W) f32 probe-center disparity
                                   # (BIG where pixel invalid in that view)
    ap: Optional[jnp.ndarray]      # (V, 8, S, H, W) bf16 anchor weak-window
                                   # NCC profiles; None above AP_STORE_MAX_PX
                                   # (streaming mode — see w_chans)
    a_d0: Optional[jnp.ndarray]    # (V, 8, H, W) f32 probe-center disparity
                                   # at the anchors; None above 1M px —
                                   # regathered from d0 per color instead
                                   # (1.23 GB at 1600x1200)
    w_chans: Optional[jnp.ndarray] = None
                                   # streaming mode only: (V, S/2+1, Hp, Wp)
                                   # f32 — bf16-packed weak-window volumes +
                                   # d0 in each view's RECT frame, gathered
                                   # per row band by _gather_band_profiles


# ---------------------------------------------------------------------------
# Volume construction (row-local)
# ---------------------------------------------------------------------------

def _rect_plane_coeffs(rv, plane: jnp.ndarray, statics, i: int,
                       interpret=None):
    """Warp the (H, W, 4) ref-cam plane field into rv's rect frame and
    return its affine disparity coefficient fields (gx, gy, g0), (Hp, Wp)."""
    pr = rectcost.plane_to_rect(plane, rv.R2r)
    prw = rectcost.warp_fwd_channels(rv, statics, i,
                                     jnp.moveaxis(pr, -1, 0),
                                     interpret=interpret)
    prw = jnp.moveaxis(prw, 0, -1)
    return rectify.disparity_coeffs(prw[..., :3], prw[..., 3], rv.f, rv.b)


def _probe_volume_one(rv, gx, gy, g0, offsets: np.ndarray,
                      sigma_spatial: float, sigma_color: float,
                      with_geom: bool, interpret=None):
    """(S, Hp, Wp) probe-window NCC volume (+ optional geom volume) in rv's
    rect frame, probing disparities d0 + ds around the plane field behind
    (gx, gy, g0) while keeping its within-window slope; also returns d0."""
    Hp, Wp = rv.ref_rect.shape
    u = jnp.arange(Wp, dtype=jnp.float32)[None, :]
    v = jnp.arange(Hp, dtype=jnp.float32)[:, None]
    d0 = gx * (u - rv.cx) + gy * (v - rv.cy) + g0
    d0 = jnp.where(jnp.isfinite(d0), d0, BIG)

    ds = jnp.asarray(probe_offsets())[:, None, None]
    ds = jnp.concatenate([ds, jnp.broadcast_to(ds[-1:],
                                               (S_CHUNK, 1, 1))])

    def coeff_fn(c0, sc):
        ds_c = jax.lax.dynamic_slice_in_dim(ds, c0, sc, axis=0)
        return (jnp.broadcast_to(gx[None], (sc, Hp, Wp)),
                jnp.broadcast_to(gy[None], (sc, Hp, Wp)),
                g0[None] + ds_c)

    ok0 = jnp.abs(d0) < BIG
    vol, gvol, _valid = _sweep_ncc_volume(
        rv, coeff_fn, PROBE_S, offsets, sigma_spatial, sigma_color,
        with_geom, interpret=interpret)
    vol = jnp.where(ok0[None], vol, VOL_INVALID)
    if gvol is not None:
        gvol = jnp.where(ok0[None], gvol, VOL_INVALID)
    d0 = jnp.where((rv.ref_ok > 0.5) & ok0, d0, BIG)
    return vol, gvol, d0


def _inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate/det) — avoids the LU custom call
    ``jnp.linalg.inv`` lowers to."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hc = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv = jnp.stack([jnp.stack([A, B, C]), jnp.stack([D, E, F]),
                     jnp.stack([G, Hc, I])])
    return inv / det


def rect_disparity_sweep(data: SweepData, state: PMState,
                         params: PatchMatchParams, statics,
                         disps: np.ndarray, interpret=None,
                         stride: int = 1) -> jnp.ndarray:
    """(S, H, W) selected-view-weighted costs over disparity offsets around
    the current depth — the rect-engine implementation of the probe loops
    of ``DepthToWeak`` (DPE.cu:2593-2747) and ``LocalRefine``
    (DPE.cu:2749-2835).

    All S probes share one set of ref-side window sums and their source
    gathers ride batched row-gather launches (vs. S independent cost-field
    evaluations) — the classify stage was the second-largest slice of the
    round-2 pass-A profile.

    ``stride=2`` evaluates the probe centers on the rect frame's even
    subgrid (windows keep full-res texture) and nearest-upsamples through
    the backward warp — quarter the gather work; used by the classify
    stage, whose margin/peak analysis tolerates neighbouring pixels
    sharing a profile (DepthToWeak labels, not depths)."""
    H, W = data.ref_image.shape
    S = len(disps)
    nview = data.num_src
    cam = data.ref_cam
    n_cam, origin_depth, bl, _cnt = pm._disparity_setup(data, state)
    f = cam.fx
    offs = pm.strong_offsets(params)
    geom = params.geom_consistency

    bits = ((state.selected[None] >> jnp.arange(nview, dtype=jnp.uint32)
             [:, None, None]) & 1) == 1
    w_v = jnp.where(bits, jnp.moveaxis(state.view_weight, -1, 0), 0)
    wsum = jnp.maximum(jnp.sum(w_v, axis=0).astype(jnp.float32), 1e-30)

    dispsj = jnp.asarray(disps, jnp.float32)[:, None, None]
    disp0 = f * bl / jnp.where(origin_depth > 0, origin_depth, 1e30)
    p_depth = f * bl[None] / (disp0[None] + dispsj)
    in_range = (p_depth >= data.depth_min) & (p_depth <= data.depth_max)

    total = jnp.zeros((S, H, W), jnp.float32)
    for i, rv in enumerate(data.rect):
        Hp, Wp = rv.ref_rect.shape
        u = (jnp.arange(Wp // stride, dtype=jnp.float32) * stride)[None, :]
        v = (jnp.arange(Hp // stride, dtype=jnp.float32) * stride)[:, None]
        ch = rectcost.warp_fwd_channels(
            rv, statics, i,
            jnp.stack([n_cam[..., 0], n_cam[..., 1], n_cam[..., 2],
                       origin_depth, bl]),
            interpret=interpret)
        ch = ch[:, ::stride, ::stride]
        ncx, ncy, ncz, od_r, bl_r = (ch[k] for k in range(5))
        # Rect-frame normal (plane distances are frame-invariant).
        R = rv.R2r
        nrx = R[0, 0] * ncx + R[0, 1] * ncy + R[0, 2] * ncz
        nry = R[1, 0] * ncx + R[1, 1] * ncy + R[1, 2] * ncz
        nrz = R[2, 0] * ncx + R[2, 1] * ncy + R[2, 2] * ncz
        # Probed depth per rect pixel; plane distance from the original
        # pixel ray (GetDistance2Origin, DPE.cu:337-342) — original coords
        # via the inverse rect homography, elementwise.
        disp0_r = f * bl_r / jnp.where(od_r > 0, od_r, 1e30)
        Hi = _inv3(rv.H_ref)
        wdiv = Hi[2, 0] * u + Hi[2, 1] * v + Hi[2, 2]
        wdiv = jnp.where(jnp.abs(wdiv) < 1e-20, 1e-20, wdiv)
        pox = (Hi[0, 0] * u + Hi[0, 1] * v + Hi[0, 2]) / wdiv
        poy = (Hi[1, 0] * u + Hi[1, 1] * v + Hi[1, 2]) / wdiv
        ndotp = ncx * (pox - cam.cx) / cam.fx + \
            ncy * (poy - cam.cy) / cam.fy + ncz

        dpad = jnp.concatenate([dispsj, jnp.broadcast_to(
            dispsj[-1:], (S_CHUNK, 1, 1))])

        def coeff_fn(c0, sc):
            # Probe depths -> plane distances -> rect coeffs, per chunk.
            ds_c = jax.lax.dynamic_slice_in_dim(dpad, c0, sc, axis=0)
            pdep = f * bl_r[None] / (disp0_r[None] + ds_c)
            w_s = -pdep * ndotp[None]                        # plane dist
            safe = jnp.where(jnp.abs(w_s) < 1e-30, 1e-30, w_s)
            return (rv.b * nrx[None] / safe, rv.b * nry[None] / safe,
                    rv.b * rv.f * nrz[None] / safe)

        vol, gvol, valid = _sweep_ncc_volume(
            rv, coeff_fn, S, offs, params.sigma_spatial,
            params.sigma_color, with_geom=geom, interpret=interpret,
            stride=stride)
        cost_i = jnp.where(valid, vol, COST_MAX)
        if geom:
            cost_i = cost_i + params.geom_factor * jnp.where(
                valid, gvol, GEOM_COST_MAX)
        back = rectcost.warp_bwd_channels_strided(
            rv, statics, i, cost_i, stride,
            interpret=interpret)                             # (S, H, W)
        cmax = COST_MAX + (params.geom_factor * GEOM_COST_MAX if geom
                           else 0.0)
        back = jnp.where((rv.orig_ok[None] > 0.5) & data.view_valid[i],
                         back, cmax)
        total = total + w_v[i][None] * back

    total = total / wsum[None]
    return jnp.where(in_range, jnp.minimum(total, COST_MAX), COST_MAX)


def _anchor_rect_coords(rv, ax: jnp.ndarray, ay: jnp.ndarray):
    """Orig-grid anchor pixel coords -> rv's rect frame (float)."""
    Hm = rv.H_ref
    axf = ax.astype(jnp.float32)
    ayf = ay.astype(jnp.float32)
    wdiv = Hm[2, 0] * axf + Hm[2, 1] * ayf + Hm[2, 2]
    wdiv = jnp.where(jnp.abs(wdiv) < 1e-20, 1e-20, wdiv)
    xr = (Hm[0, 0] * axf + Hm[0, 1] * ayf + Hm[0, 2]) / wdiv
    yr = (Hm[1, 0] * axf + Hm[1, 1] * ayf + Hm[1, 2]) / wdiv
    return xr, yr


def build_weak_bundle(data: SweepData, sup, state: PMState,
                      params: PatchMatchParams, statics,
                      interpret=None) -> WeakRectBundle:
    """Build the per-sweep probe volumes + anchor profiles.

    ``state`` must be post-init (plane in ref-cam (n, dist) layout,
    DPE.cu:3195 ordering: GenNeighbours' anchors in ``sup.neighbours``)."""
    H, W = data.ref_image.shape
    offs_strong = pm.strong_offsets(params)
    offs_weak = ncc.window_offsets(params.weak_radius, params.weak_increment)
    geom = params.geom_consistency

    anchors = sup.neighbours                    # (8, H, W, 2) int32, -1 pad
    # Invalid anchors (-1) gather from the pixel's OWN position, not from a
    # clamped (0, 0): a stray corner query in every tile would blow the
    # banded gather's row band up to the whole image (anchor_valid masks
    # the values downstream).
    xg8 = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, None, :],
                           (8, H, W))
    yg8 = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :, None],
                           (8, H, W))
    ax = jnp.where(anchors[..., 0] >= 0, anchors[..., 0], xg8)
    ay = jnp.where(anchors[..., 1] >= 0, anchors[..., 1], yg8)

    store_ap = H * W <= AP_STORE_MAX_PX
    vols_c, vols_g, d0s, aps, a_d0s, w_chans = [], [], [], [], [], []
    for i, rv in enumerate(data.rect):
        gx, gy, g0 = _rect_plane_coeffs(rv, state.plane, statics, i,
                                        interpret)
        # Strong-window (center) volume, warped to the orig grid.
        vc, vg, d0r = _probe_volume_one(
            rv, gx, gy, g0, offs_strong, params.sigma_spatial,
            params.sigma_color, with_geom=geom, interpret=interpret)
        def back(chans):
            return rectcost.warp_bwd_channels(rv, statics, i, chans,
                                              interpret=interpret)

        ok_o = rv.orig_ok > 0.5
        vc_o = jnp.where(ok_o[None], back(vc), VOL_INVALID)
        vols_c.append(vc_o.astype(jnp.bfloat16))
        if geom:
            vg_o = jnp.where(ok_o[None], back(vg), VOL_INVALID)
            vols_g.append(vg_o.astype(jnp.bfloat16))
        d0_o = jnp.where(ok_o, back(d0r[None])[0], BIG)
        d0s.append(d0_o)

        # Weak-window (anchor) volume; profiles ride the gathers as packed
        # bf16 pairs (the banded gather is per-element-rate-bound, so this
        # halves its cost).
        vw, _, _ = _probe_volume_one(
            rv, gx, gy, g0, offs_weak, params.sigma_spatial,
            params.sigma_color, with_geom=False, interpret=interpret)
        from ..ops import gather2d as g2d_mod
        chans = jnp.concatenate([g2d_mod.pack_bf16_pairs(vw), d0r[None]],
                                axis=0)                      # (S/2+1, Hp, Wp)
        if not store_ap:
            # Streaming mode: keep the rect-frame volume; weak iterations
            # gather their band's anchor profiles on the fly.
            w_chans.append(chans)
            continue
        # Store mode: gather at the anchors in-rect, once per sweep.
        axr, ayr = _anchor_rect_coords(rv, ax, ay)
        qy = jnp.round(ayr).astype(jnp.int32).reshape(8 * H, W)
        qx = jnp.round(axr).astype(jnp.int32).reshape(8 * H, W)
        g2 = sampling.gather_map(
            jnp.moveaxis(chans, 0, -1), qy, qx)              # (8H, W, S/2+1)
        g2 = jnp.moveaxis(g2, -1, 0)
        prof = g2d_mod.unpack_bf16_pairs(g2[:PROBE_S // 2])
        aps.append(prof.reshape(PROBE_S, 8, H, W))
        a_d0s.append(g2[PROBE_S // 2].reshape(8, H, W))
    store_a_d0 = store_ap and H * W <= A_D0_STORE_MAX_PX

    return WeakRectBundle(
        vol_center=jnp.stack(vols_c),
        vol_geom=jnp.stack(vols_g) if geom else None,
        d0=jnp.stack(d0s),
        ap=(jnp.stack(aps).swapaxes(1, 2)                    # (V, 8, S, H, W)
            if store_ap else None),
        a_d0=jnp.stack(a_d0s) if store_a_d0 else None,
        w_chans=None if store_ap else jnp.stack(w_chans),
    )


def _gather_band_profiles(data: SweepData, bundle: WeakRectBundle,
                          a_x: jnp.ndarray, a_y: jnp.ndarray):
    """Streaming-mode anchor profiles for one row band: gather the packed
    rect-frame weak-window volumes (bundle.w_chans) at the band's anchor
    coords. a_x/a_y: (8, hb, W) orig-grid int32 (invalid anchors already
    substituted with own coords). Returns ((V, 8, S, hb, W) bf16 profiles,
    (V, 8, hb, W) f32 probe-center disparities)."""
    from ..ops import gather2d as g2d_mod
    hb, W = a_x.shape[1:]
    aps, ad0s = [], []
    for i, rv in enumerate(data.rect):
        axr, ayr = _anchor_rect_coords(rv, a_x, a_y)
        qy = jnp.round(ayr).astype(jnp.int32).reshape(8 * hb, W)
        qx = jnp.round(axr).astype(jnp.int32).reshape(8 * hb, W)
        g2 = sampling.gather_map(
            jnp.moveaxis(bundle.w_chans[i], 0, -1), qy, qx)  # (8hb, W, C)
        g2 = jnp.moveaxis(g2, -1, 0)
        prof = g2d_mod.unpack_bf16_pairs(g2[:PROBE_S // 2])
        aps.append(prof.reshape(PROBE_S, 8, hb, W))
        ad0s.append(g2[PROBE_S // 2].reshape(8, hb, W))
    return jnp.stack(aps).swapaxes(1, 2), jnp.stack(ad0s)


# ---------------------------------------------------------------------------
# Elementwise profile interpolation
# ---------------------------------------------------------------------------

def interp_profile(prof: jnp.ndarray, srel: jnp.ndarray):
    """Linear interpolation of (*B, S, H, W) profiles along S at
    ``srel`` px (same (*B, H, W)); returns (value f32, valid bool).

    Implemented as a parallel hat-weight contraction over S: for sf between
    probes s and s+1 the hat weights are exactly (1-f, f) — the lerp —
    and the validity of both taps is recovered from the valid-weight sum
    (== 1 only when every touched tap is sub-threshold). A take_along_axis
    here would serialize on XLA TPU, and the previous 14-deep sequential
    one-hot select chain materialized a full-size intermediate per step
    (~0.25 s per candidate evaluation on-chip, round-4 weak_probe)."""
    sf = srel / PROBE_STEP + (PROBE_S - 1) / 2.0
    in_range = (sf >= 0.0) & (sf <= PROBE_S - 1.0)
    sfc = jnp.clip(sf, 0.0, PROBE_S - 1.0)
    val = jnp.zeros(jnp.broadcast_shapes(sfc.shape, prof.shape[:-3] +
                                         prof.shape[-2:]), jnp.float32)
    wv = jnp.zeros_like(val)
    for s in range(PROBE_S):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(sfc - s))
        p = prof[..., s, :, :].astype(jnp.float32)
        valid_s = p < VALID_THRESH
        val = val + jnp.where(valid_s, w * p, 0.0)
        wv = wv + jnp.where(valid_s, w, 0.0)
    ok = in_range & (wv > 0.9999)
    return val / jnp.maximum(wv, 1e-9), ok


class WeakSites(NamedTuple):
    """Per-(sweep, color) inputs of the deformable cost, at FULL width.

    Full-width (vs the earlier per-color checkerboard compaction): the
    S-profile volumes are the big operand, and their stride-2 lane
    compaction cost more on-chip than the 2x elementwise evaluation it
    saved (round-4 weak_probe: 2.3 s/color in relayouts). The caller masks
    to the active color when writing back."""

    vol_center: jnp.ndarray      # (V, S, H, W)
    vol_geom: Optional[jnp.ndarray]
    d0: jnp.ndarray              # (V, H, W)
    ap: Optional[jnp.ndarray]    # (V, 8, S, H, W); None in streaming mode
                                 # until the band gather fills it
    a_d0: Optional[jnp.ndarray]  # (V, 8, H, W); None likewise
    cx: jnp.ndarray              # (H, W) pixel coords
    cy: jnp.ndarray
    xr: jnp.ndarray              # (V, H, W) pixel coords in each rect frame
    yr: jnp.ndarray
    # Anchor pixel coords (ORIG grid, int32); their per-view rect-frame
    # coords are recomputed on the fly in deformable_cost_rect — storing
    # the (V, 8, H, W) f32 stacks cost 614 MB at 1600x1200 (OOMed the
    # weak iteration there).
    a_x: jnp.ndarray             # (8, H, W) int32
    a_y: jnp.ndarray
    anchor_valid: jnp.ndarray    # (8, H, W)
    anchor_strong: jnp.ndarray   # (8, H, W) anchor is STRONG
    anchor_sel: jnp.ndarray      # (8, H, W) uint32 selected views @ anchor
    anchor_plane: jnp.ndarray    # (8, H, W, 4) current plane @ anchor


def build_weak_sites(data: SweepData, sup, state: PMState, bundle,
                     color) -> WeakSites:
    """Bundle views + fresh anchor state gathers (full width; ``color`` only
    affects the caller's writeback mask).

    Anchor planes/selected-views are re-gathered each iteration — the
    reference reads them live (DPE.cu:1690-1716, 2928-2945) and strong
    iterations update them between colors."""
    H, W = data.ref_image.shape
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    cx = xg.astype(jnp.float32)
    cy = yg.astype(jnp.float32)
    anchors = sup.neighbours                                 # (8, H, W, 2)
    a_valid = anchors[..., 0] >= 0
    # Invalid anchors gather from the pixel's own position (see
    # build_weak_bundle: a clamped (0, 0) per tile wrecks the banded
    # gather's locality).
    a_x = jnp.where(a_valid, anchors[..., 0], xg[None])
    a_y = jnp.where(a_valid, anchors[..., 1], yg[None])

    # Fresh state at anchors: plane (4 ch) + selected (bitcast f32) +
    # weak state, one banded gather.
    packed = jnp.concatenate([
        state.plane,
        jax.lax.bitcast_convert_type(state.selected, jnp.float32)[..., None],
        state.weak.astype(jnp.float32)[..., None],
    ], axis=-1)                                              # (H, W, 6)
    q_y = a_y.reshape(8 * H, -1)
    q_x = a_x.reshape(8 * H, -1)
    g = sampling.gather_map(packed, q_y, q_x)                # (8H, W, 6)
    g = g.reshape(8, H, -1, 6)
    anchor_plane = g[..., :4]
    anchor_sel = jax.lax.bitcast_convert_type(g[..., 4], jnp.uint32)
    anchor_strong = g[..., 5].astype(jnp.int32) == STRONG

    xr_l, yr_l = [], []
    for i, rv in enumerate(data.rect):
        xr, yr = _anchor_rect_coords(rv, cx, cy)
        xr_l.append(xr)
        yr_l.append(yr)

    a_d0 = bundle.a_d0
    if a_d0 is None and bundle.ap is not None:
        # Full-resolution path: gather the anchors' probe-center disparity
        # from the orig-grid d0 field per view (one banded gather with V
        # channels) instead of carrying the (V, 8, H, W) f32 store.
        gq = sampling.gather_map(jnp.moveaxis(bundle.d0, 0, -1), q_y, q_x)
        a_d0 = jnp.moveaxis(gq.reshape(8, H, -1, bundle.d0.shape[0]),
                            -1, 0)                           # (V, 8, H, W)
    # Streaming mode (bundle.ap is None): ap and a_d0 stay None here and
    # are gathered per row band in propagate_weak_rect's band body.

    return WeakSites(
        vol_center=bundle.vol_center,
        vol_geom=bundle.vol_geom,
        d0=bundle.d0,
        ap=bundle.ap,
        a_d0=a_d0,
        cx=cx, cy=cy,
        xr=jnp.stack(xr_l), yr=jnp.stack(yr_l),
        a_x=a_x, a_y=a_y,
        anchor_valid=a_valid,
        anchor_strong=anchor_strong,
        anchor_sel=anchor_sel,
        anchor_plane=anchor_plane,
    )


def deformable_cost_rect(data: SweepData, sites: WeakSites,
                         plane: jnp.ndarray, params: PatchMatchParams
                         ) -> jnp.ndarray:
    """(V, H, W) *photometric* deformable NCC of a candidate plane field
    at the sites, through profile interpolation (semantics of
    ``ComputeBilateralNCCNew``, DPE.cu:557-690). The geometric term is
    separate (:func:`geom_term_rect`) — the reference adds it after view
    selection (DPE.cu:1786-1798)."""
    out = []
    for i, rv in enumerate(data.rect):
        pr = rectcost.plane_to_rect(plane, rv.R2r)           # (H, W2, 4)
        gx, gy, g0 = rectify.disparity_coeffs(
            pr[..., :3], pr[..., 3], rv.f, rv.b)
        d_c = gx * (sites.xr[i] - rv.cx) + gy * (sites.yr[i] - rv.cy) + g0
        d_c = jnp.where(jnp.isfinite(d_c), d_c, BIG)
        c0, ok_c = interp_profile(sites.vol_center[i], d_c - sites.d0[i])

        # Anchor windows: candidate's disparity evaluated at each anchor
        # (anchor rect coords recomputed per view — see WeakSites).
        a_xr, a_yr = _anchor_rect_coords(rv, sites.a_x, sites.a_y)
        d_a = gx[None] * (a_xr - rv.cx) + \
            gy[None] * (a_yr - rv.cy) + g0[None]             # (8, H, W)
        d_a = jnp.where(jnp.isfinite(d_a), d_a, BIG)
        val_a, ok_a = interp_profile(sites.ap[i], d_a - sites.a_d0[i])
        sel_here = ((sites.anchor_sel >> jnp.uint32(i)) & 1) == 1
        # Out-of-profile anchor ~ reference's out-of-src-image anchor:
        # counts COST_MAX only if that anchor had selected this view
        # (DPE.cu:595-607).
        contrib = jnp.where(ok_a, jnp.clip(val_a, 0.0, COST_MAX),
                            jnp.where(sel_here, COST_MAX, 0.0))
        counts = jnp.where(ok_a, 1.0, jnp.where(sel_here, 1.0, 0.0))
        strong_sum = jnp.sum(
            jnp.where(sites.anchor_valid, contrib, 0.0), axis=0)
        strong_cnt = jnp.sum(
            jnp.where(sites.anchor_valid, counts, 0.0), axis=0)
        strong_cost = jnp.minimum(
            strong_sum / jnp.maximum(strong_cnt, 1.0), COST_MAX)

        c0 = jnp.clip(c0, 0.0, COST_MAX)
        cost = jnp.where(strong_cnt > 0, 0.25 * c0 + 0.75 * strong_cost, c0)
        cost = jnp.where(ok_c & data.view_valid[i], cost, COST_MAX)
        out.append(cost)
    return jnp.stack(out)


def geom_term_rect(data: SweepData, sites: WeakSites, plane: jnp.ndarray
                   ) -> jnp.ndarray:
    """(V, H, W) forward-backward geometric consistency of a candidate at
    the sites, from the probe volume (``ComputeGeomConsistencyCost``,
    DPE.cu:915-953)."""
    out = []
    for i, rv in enumerate(data.rect):
        pr = rectcost.plane_to_rect(plane, rv.R2r)
        gx, gy, g0 = rectify.disparity_coeffs(
            pr[..., :3], pr[..., 3], rv.f, rv.b)
        d_c = gx * (sites.xr[i] - rv.cx) + gy * (sites.yr[i] - rv.cy) + g0
        d_c = jnp.where(jnp.isfinite(d_c), d_c, BIG)
        gval, ok_g = interp_profile(sites.vol_geom[i], d_c - sites.d0[i])
        out.append(jnp.where(ok_g, jnp.clip(gval, 0.0, GEOM_COST_MAX),
                             GEOM_COST_MAX))
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# Weak checkerboard propagation (CheckerboardPropagationWeak, DPE.cu:1668)
# ---------------------------------------------------------------------------

def _weak_band_count(H: int, W: int) -> int:
    """Row-band count for the weak proposal body: bounds its transients
    (the (8, V, Hb, W) candidate volumes, the sliced anchor-profile band
    — 614 MB per band at 1600x1200 with 4 bands — and the eval trees) —
    the full-width body RESOURCE_EXHAUSTed at 1600x1200 alongside the
    2.5 GB anchor-profile bundle, and 4 bands still did. Working sizes
    (<=500k px) stay unbanded; above 1M px the cap tightens to ~250k
    sites per band. Returns the smallest divisor of H with that cap."""
    px = H * W
    want = -(-px // (500_000 if px <= 1_000_000 else 250_000))
    return max(1, min(want, H))


def _unband(arr: jnp.ndarray, axis: int, H: int) -> jnp.ndarray:
    """Reassemble lax.map band outputs (nb, ..., hb, ...) into the full H
    rows. The last band's slice start is clamped by dynamic_slice (it covers
    rows [H-hb, H)), so its leading rows overlap the previous band — keep
    only its fresh tail. ``axis`` is the row axis of the PER-BAND shape."""
    nb = arr.shape[0]
    hb = arr.shape[1 + axis]
    if nb == 1:
        return arr[0]
    main = jnp.moveaxis(arr[:nb - 1], 0, axis)       # (..., nb-1, hb, ...)
    shp = main.shape[:axis] + ((nb - 1) * hb,) + main.shape[axis + 2:]
    main = main.reshape(shp)
    tail_rows = H - (nb - 1) * hb
    tail = jax.lax.slice_in_dim(arr[nb - 1], hb - tail_rows, hb, axis=axis)
    return jnp.concatenate([main, tail], axis=axis)


def _slice_sites(sites: "WeakSites", b, hb: int) -> "WeakSites":
    """Row band [b*hb, (b+1)*hb) of every per-site field (all the profile
    volumes are site-indexed, so banding is a clean slice)."""
    def sl(a, ax):
        return jax.lax.dynamic_slice_in_dim(a, b * hb, hb, axis=ax)

    return WeakSites(
        vol_center=sl(sites.vol_center, 2),
        vol_geom=(sl(sites.vol_geom, 2)
                  if sites.vol_geom is not None else None),
        d0=sl(sites.d0, 1),
        ap=sl(sites.ap, 3) if sites.ap is not None else None,
        a_d0=sl(sites.a_d0, 2) if sites.a_d0 is not None else None,
        cx=sl(sites.cx, 0), cy=sl(sites.cy, 0),
        xr=sl(sites.xr, 1), yr=sl(sites.yr, 1),
        a_x=sl(sites.a_x, 1), a_y=sl(sites.a_y, 1),
        anchor_valid=sl(sites.anchor_valid, 1),
        anchor_strong=sl(sites.anchor_strong, 1),
        anchor_sel=sl(sites.anchor_sel, 1),
        anchor_plane=sl(sites.anchor_plane, 1),
    )


def propagate_weak_rect(key, data: SweepData, sup, state: PMState,
                        params: PatchMatchParams, it, color, rstat,
                        bundle: WeakRectBundle):
    """One color's weak-pixel proposal on the rect engine; same contract as
    ops/weak.propagate_weak (compacted outputs, caller scatters + masks).

    At working sizes the proposal body runs full-width in one piece; at
    full-resolution sizes it runs as a lax.map over row bands
    (_weak_band_count) so its transients stay bounded."""
    H, W = data.ref_image.shape
    geom = params.geom_consistency

    sites = build_weak_sites(data, sup, state, bundle, color)
    plane_now = state.plane
    selected_now = state.selected

    nb = _weak_band_count(H, W)
    if nb == 1:
        if sites.ap is None:
            ap_f, ad0_f = _gather_band_profiles(data, bundle, sites.a_x,
                                                sites.a_y)
            sites = sites._replace(ap=ap_f, a_d0=ad0_f)
        plane, selected, view_weight, weight_norm = _weak_body(
            key, data, sites, plane_now, selected_now, sup.fit_plane,
            params, it)
    else:
        # Band height chosen directly (ceil) — no divisor search (a prime H
        # degenerated to one-row bands); the last band's dynamic_slice start
        # clamps to H-hb and _unband keeps only its fresh tail rows.
        hb = -(-H // nb)
        nb = -(-H // hb)

        def band(b):
            s_b = _slice_sites(sites, b, hb)
            if s_b.ap is None:
                # Streaming mode: gather this band's anchor profiles from
                # the rect-frame volumes (the full anchor-profile store
                # never exists — VERDICT r4 missing #1).
                ap_b, ad0_b = _gather_band_profiles(data, bundle, s_b.a_x,
                                                    s_b.a_y)
                s_b = s_b._replace(ap=ap_b, a_d0=ad0_b)
            pn = jax.lax.dynamic_slice_in_dim(plane_now, b * hb, hb, 0)
            sn = jax.lax.dynamic_slice_in_dim(selected_now, b * hb, hb, 0)
            fp = jax.lax.dynamic_slice_in_dim(sup.fit_plane, b * hb, hb, 0)
            return _weak_body(jax.random.fold_in(key, b), data, s_b, pn,
                              sn, fp, params, it)

        pl_b, sel_b, vw_b, wn_b = jax.lax.map(band, jnp.arange(nb))
        plane = _unband(pl_b, 0, H)
        selected = _unband(sel_b, 0, H)
        view_weight = _unband(vw_b, 1, H)
        weight_norm = _unband(wn_b, 0, H)

    wsum = jnp.maximum(weight_norm, 1e-30)

    # Re-express the stored cost with the standard strong NCC (full field,
    # masked later) so weak and strong costs are comparable during
    # propagation (DPE.cu:1845-1861). Only the active color's sites will be
    # written back — evaluate the field the writeback would store.
    from ..engine.sweep import checkerboard_mask
    cmask = checkerboard_mask(H, W, color)
    plane_full = jnp.where(cmask[..., None], plane, state.plane)
    offs = pm.strong_offsets(params)
    final_vec = rectcost.rect_cost_vector_stacked(
        rectcost.build_rect_stack(data.rect, rstat), plane_full,
        data.view_valid, params, offs, geom=False)           # (V, H, W)
    final_cost = jnp.sum(view_weight * final_vec, axis=0) / wsum
    final_cost = jnp.where(weight_norm > 0, final_cost, COST_MAX)

    # Contract: compacted per-color outputs (caller scatters + masks).
    return (checker.compact(plane, color),
            checker.compact(final_cost, color),
            checker.compact(selected, color),
            jnp.moveaxis(checker.compact(
                jnp.moveaxis(view_weight, 0, -1), color), -1, 0))


def _weak_body(key, data: SweepData, sites: WeakSites, plane_now,
               selected_now, fit_plane, params: PatchMatchParams, it):
    """Candidate evaluation + view selection + refinement for (a band of)
    the weak sites; returns (plane, selected, view_weight, weight_norm)
    pre-final-cost (CheckerboardPropagationWeak, DPE.cu:1668-1843)."""
    nview = data.num_src
    k_sel, k_ref = jax.random.split(key)
    geom = params.geom_consistency
    px, py = sites.cx, sites.cy

    flags = sites.anchor_valid & sites.anchor_strong         # (8, H, W)
    cand_planes = sites.anchor_plane                         # (8, H, W, 4)

    cost_array = jax.lax.map(
        lambda pl_: deformable_cost_rect(data, sites, pl_, params),
        cand_planes)                                         # (8, V, H, W2)
    cost_array = jnp.where(flags[:, None], cost_array, 0.0)

    # Priors from all valid anchors (DPE.cu:1717-1730).
    bits = ((sites.anchor_sel[:, None] >> jnp.arange(
        nview, dtype=jnp.uint32)[None, :, None, None]) & 1) == 1
    prior = jnp.sum(jnp.where(sites.anchor_valid[:, None],
                              jnp.where(bits, 0.9, 0.1), 0.0), axis=0)

    view_weight, temp_selected, weight_norm = pm.view_selection(
        k_sel, cost_array, prior, data.view_valid, it)
    wsum = jnp.maximum(weight_norm, 1e-30)

    if geom:
        # Geom is excluded from view selection and added to the final
        # weighted costs (DPE.cu:1786-1798). Fold it into the per-candidate
        # weighted reduction instead of materializing a second
        # (8, V, H, W) volume (307 MB at 1600x1200).
        def fin(args):
            c_k, pl_k, fl_k = args
            g_k = jnp.where(fl_k[None],
                            geom_term_rect(data, sites, pl_k),
                            GEOM_COST_MAX)
            return jnp.sum(view_weight * (c_k + params.geom_factor * g_k),
                           axis=0) / wsum

        final_costs = jax.lax.map(fin, (cost_array, cand_planes, flags))
    else:
        final_costs = jnp.sum(view_weight[None] * cost_array,
                              axis=1) / wsum[None]
    min_idx = jnp.argmin(final_costs, axis=0)
    min_flag = strong_rect._select_k(flags, min_idx)
    min_cost = strong_rect._select_k(final_costs, min_idx)
    min_plane = strong_rect._select_k(cand_planes, min_idx)

    def eval_weighted(cand):
        c = deformable_cost_rect(data, sites, cand, params)
        if geom:
            c = c + params.geom_factor * geom_term_rect(data, sites, cand)
        return jnp.sum(view_weight * c, axis=0) / wsum

    cost_now = eval_weighted(plane_now)
    cost_now = jnp.where(weight_norm > 0, cost_now, COST_MAX)
    stored_cost = cost_now

    depth_now = geo.depth_from_plane(data.ref_cam, plane_now, px, py)
    depth_before = geo.depth_from_plane(data.ref_cam, min_plane, px, py)
    accept = min_flag & (depth_before >= data.depth_min) & \
        (depth_before <= data.depth_max) & (min_cost < cost_now)

    plane = jnp.where(accept[..., None], min_plane, plane_now)
    depth = jnp.where(accept, depth_before, depth_now)
    cost = jnp.where(accept, min_cost, cost_now)
    selected = jnp.where(accept, temp_selected, selected_now)

    # Refinement (PlaneHypothesisRefinementWeak, DPE.cu:1120-1212): the
    # RANSAC fit plane first, then the 5 perturbation combos.
    fit = fit_plane
    fit_nonzero = jnp.any(fit[..., :3] != 0.0, axis=-1)
    c_fit = eval_weighted(fit)
    d_fit = geo.depth_from_plane(data.ref_cam, fit, px, py)
    ok = fit_nonzero & (d_fit >= data.depth_min) & \
        (d_fit <= data.depth_max) & (c_fit < cost) & (weight_norm > 0)
    plane = jnp.where(ok[..., None], fit, plane)
    depth = jnp.where(ok, d_fit, depth)
    cost = jnp.where(ok, c_fit, cost)

    depths_c, normals_c = pm.refine_combos(k_ref, data, plane, depth, px, py)

    def refine_body(carry, xs):
        plane, depth, cost = carry
        d_i, n_i = xs
        cand = geo.plane_from_depth_normal(data.ref_cam, px, py, d_i, n_i)
        c = eval_weighted(cand)
        d_chk = geo.depth_from_plane(data.ref_cam, cand, px, py)
        ok = (d_chk >= data.depth_min) & (d_chk <= data.depth_max) & \
            (c < cost) & (weight_norm > 0)
        plane = jnp.where(ok[..., None], cand, plane)
        depth = jnp.where(ok, d_chk, depth)
        cost = jnp.where(ok, c, cost)
        return (plane, depth, cost), None

    (plane, depth, cost), _ = jax.lax.scan(
        refine_body, (plane, depth, cost), (depths_c, normals_c))

    if params.state == RunState.REFINE_INIT:
        accept_final = cost < stored_cost - 0.1
        plane = jnp.where(accept_final[..., None], plane, plane_now)

    return plane, selected, view_weight, weight_norm
