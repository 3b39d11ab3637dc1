"""Weak-texture machinery: deformable NCC, per-iteration plane fit, weak
propagation (reference C8: DPE.cu:557-690, 1668-1862, 2891-3124).

Propagation evaluates one checkerboard color at a time on its compacted
(H, ceil(W/2)) half grid (see :mod:`.checker`), mirroring the reference's
W x H/2 red-black launches; the sweep driver scatters results back and masks
to the weak population. ``sup.neighbours`` holds the 8 deformable strong
anchors per pixel from :mod:`..ops.anchors`.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COST_MAX, GEOM_COST_MAX, PatchMatchParams, PixelState, RunState
from ..geometry import cameras as geo
from ..ops import ncc, planes as planegen, sampling, support
from ..engine.state import PMState, SweepData

WEAK = int(PixelState.WEAK)
STRONG = int(PixelState.STRONG)
UNKNOWN = int(PixelState.UNKNOWN)
BIG = float(1e30)  # python float: stays an HLO literal, never a hoisted const arg
NEIGHBOUR_NUM = 9


def weak_offsets(params: PatchMatchParams) -> np.ndarray:
    return ncc.window_offsets(params.weak_radius, params.weak_increment)


class DeformableSites:
    """Site-local inputs of the deformable NCC for one checkerboard color.

    Everything the cost needs at the compacted (H, W2) weak sites: window
    centers, the ref image value there (the bilateral color anchor,
    DPE.cu:585), the 8 deformable anchors and their selected-view masks, the
    adaptive radius scale, and the two ref-side window caches."""

    def __init__(self, data: SweepData, sup, state: PMState,
                 params: PatchMatchParams, color):
        from . import checker
        H, W = data.ref_image.shape
        self.cx, self.cy = checker.sites(H, W, color)          # (H, W2) f32
        self.ref_center = checker.compact(data.ref_image, color)
        anchors = checker.compact_stack(sup.neighbours, color)  # (8,H,W2,2)
        self.anchor_valid = anchors[..., 0] >= 0               # (8, H, W2)
        self.anchor_x = anchors[..., 0].astype(jnp.float32)
        self.anchor_y = anchors[..., 1].astype(jnp.float32)
        self.anchor_sel = sampling.gather_map(
            state.selected, anchors[..., 1], anchors[..., 0])  # (8, H, W2)
        self.scale = None
        if params.use_radius and sup.radius is not None:
            self.scale = checker.compact(sup.radius, color) / \
                float(params.strong_radius)

        offs_strong = ncc.window_offsets(params.strong_radius,
                                         params.strong_increment)
        offs_weak = weak_offsets(params)
        self.cache_center = ncc.make_ref_cache(
            data.ref_image, self.cx, self.cy, offs_strong, 5.0, 3.0,
            self.ref_center, scale=self.scale)
        self.cache_anchor = ncc.make_ref_cache(
            data.ref_image, self.anchor_x, self.anchor_y, offs_weak, 5.0,
            3.0, self.ref_center)


def deformable_cost_vector(
    data: SweepData,
    sites: DeformableSites,
    plane: jnp.ndarray,
    params: PatchMatchParams,
) -> jnp.ndarray:
    """(V, H, W2) deformable NCC (``ComputeBilateralNCCNew``, DPE.cu:557-690):
    0.25 * center window (adaptive radius) + 0.75 * mean over up-to-8 strong
    anchor windows, all warped by the *candidate's* plane homography.
    ``plane`` is the candidate plane field at the compacted sites."""
    H, W = data.ref_image.shape
    px, py = sites.cx, sites.cy
    offs_strong = ncc.window_offsets(params.strong_radius, params.strong_increment)
    offs_weak = weak_offsets(params)
    nview = data.num_src

    scale = sites.scale
    anchor_valid = sites.anchor_valid
    anchor_x = sites.anchor_x
    anchor_y = sites.anchor_y
    anchor_sel = sites.anchor_sel
    cache_center = sites.cache_center
    cache_anchor = sites.cache_anchor

    def body(_, xs):
        img, K, R_rel, t_rel, valid, v_idx = xs
        # Center window (k == 0) with adaptive radius.
        hom_c = ncc.homography_field(data.ref_cam, K, R_rel, t_rel, plane,
                                     px, py)
        c0 = ncc.bilateral_ncc(
            data.ref_image, img, hom_c, px, py, offs_strong, 5.0, 3.0,
            sites.ref_center, scale=scale, ref_cache=cache_center,
        )
        # Center warp out of source image -> whole cost is COST_MAX
        # (DPE.cu:577-580); bilateral_ncc already returns COST_MAX then.

        # All 8 anchor windows batched: cx/cy carry a leading (8,) dim.
        hom_k = ncc.homography_field(data.ref_cam, K, R_rel, t_rel, plane,
                                     anchor_x, anchor_y)
        ck = ncc.bilateral_ncc(
            data.ref_image, img, hom_k, anchor_x, anchor_y,
            offs_weak, 5.0, 3.0, sites.ref_center,
            ref_cache=cache_anchor)                          # (8, H, W2)
        wx, wy = hom_k.at_offset(jnp.zeros(()), jnp.zeros(()))
        oob = (wx < 0) | (wy < 0) | (wx >= W) | (wy >= H)
        sel_here = ((anchor_sel >> v_idx.astype(jnp.uint32)) & 1) == 1
        # In-bounds anchor -> its window cost; OOB anchor counts COST_MAX
        # only if it had selected this view (DPE.cu:595-607).
        contrib = jnp.where(oob, jnp.where(sel_here, COST_MAX, 0.0), ck)
        counts = jnp.where(oob, jnp.where(sel_here, 1.0, 0.0), 1.0)
        strong_sum = jnp.sum(jnp.where(anchor_valid, contrib, 0.0), axis=0)
        strong_cnt = jnp.sum(jnp.where(anchor_valid, counts, 0.0), axis=0)

        strong_cost = jnp.minimum(
            strong_sum / jnp.maximum(strong_cnt, 1.0), COST_MAX)
        cost = jnp.where(strong_cnt > 0,
                         0.25 * c0 + 0.75 * strong_cost, c0)
        return None, jnp.where(valid, cost, COST_MAX)

    _, costs = jax.lax.scan(
        body, None,
        (data.src_images, data.src_cams.K, data.R_rel, data.t_rel,
         data.view_valid, jnp.arange(nview)),
    )
    return costs


def _geom_vec(data, plane, px=None, py=None):
    from ..engine import patchmatch as pm
    return pm.geom_cost_vector(data, plane, px, py)


def fit_plane_ransac(key, data: SweepData, sup, state: PMState,
                     params: PatchMatchParams) -> dict:
    """Per-weak-pixel plane fit over the 8 anchors + adaptive NCC radius
    (``RANSACToGetFitPlane``, DPE.cu:2891-3124). Returns dict(fit_plane,
    radius) for Support._replace. ``state.plane`` is in (n_cam, dist)
    layout (mid-sweep)."""
    H, W = data.ref_image.shape
    px, py = geo.pixel_grid(H, W)
    k_lim, k_iter = jax.random.split(key)
    cam = data.ref_cam

    anchors = sup.neighbours                      # (8, H, W, 2)
    ax = jnp.moveaxis(anchors[..., 0], 0, -1)     # (H, W, 8)
    ay = jnp.moveaxis(anchors[..., 1], 0, -1)
    valid = ax >= 0
    strong_count = jnp.sum(valid, axis=-1)
    # Invalid anchors gather from the pixel's own position: a clamped
    # (0, 0) in every tile destroys the banded TPU gather's locality
    # (validity masks every consumer below).
    ax = jnp.where(valid, ax, px.astype(jnp.int32)[..., None])
    ay = jnp.where(valid, ay, py.astype(jnp.int32)[..., None])

    # Anchor cam-frame 3D data from their current planes (DPE.cu:2928-2945).
    a_plane = sampling.gather_map(state.plane, ay, ax)     # (H, W, 8, 4)
    a_depth = geo.depth_from_plane(
        cam, a_plane, ax.astype(jnp.float32), ay.astype(jnp.float32))
    fx_ = (ax.astype(jnp.float32) - cam.cx) / cam.fx
    fy_ = (ay.astype(jnp.float32) - cam.cy) / cam.fy
    a_n = a_plane[..., :3]

    # Per-pixel edge limit; after GenNeighbours bumped complexity to >=0.99
    # for limited pixels, the redraw here almost always disables the limit
    # (DPE.cu:2912-2920 + 2162).
    if params.use_limit and params.use_edge:
        u = jax.random.uniform(k_lim, (H, W))
        edge_limit = u >= sup.complexity
    else:
        edge_limit = jnp.full((H, W), bool(params.use_limit))

    must_tri0 = ~(jnp.full((H, W), params.use_label, bool)
                  & (data.label > 0) & edge_limit)

    pick = sampling.pick_last

    def step(carry, k):
        best_plane, min_cost, has_best, has_strong, must_tri, tri = carry
        ka, kb, kc = jax.random.split(k, 3)
        ia = jax.random.randint(ka, (H, W), 0, 8)
        ib = jax.random.randint(kb, (H, W), 0, 8)
        ic = jax.random.randint(kc, (H, W), 0, 8)
        # Reference indexes modulo the *valid* count; emulate by clamping to
        # valid slots (anchors are packed first by construction).
        cnt = jnp.maximum(strong_count, 1)
        ia = ia % cnt
        ib = ib % cnt
        ic = ic % cnt
        ok = (ia != ib) & (ib != ic) & (ia != ic) & (strong_count >= 3)

        pax, pay = pick(ax, ia).astype(jnp.float32), pick(ay, ia).astype(jnp.float32)
        pbx, pby = pick(ax, ib).astype(jnp.float32), pick(ay, ib).astype(jnp.float32)
        pcx, pcy = pick(ax, ic).astype(jnp.float32), pick(ay, ic).astype(jnp.float32)

        if params.geom_consistency:
            def pick3(idx):
                return jnp.stack(
                    [pick(a_n[..., k], idx) for k in range(3)], -1)
            na = pick3(ia)
            nb = pick3(ib)
            nc = pick3(ic)
            consist = (jnp.sum(na * nb, -1) >= 0.8660254) & \
                (jnp.sum(na * nc, -1) >= 0.8660254) & \
                (jnp.sum(nb * nc, -1) >= 0.8660254)
            consist = consist & edge_limit
            ok = ok & ~(has_strong & ~consist)
        else:
            consist = jnp.zeros((H, W), bool)

        # In-triangle constraint (DPE.cu:2982-2984).
        def edge_len(x0, y0, x1, y1):
            return jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
        ab = edge_len(pax, pay, pbx, pby)
        bc = edge_len(pbx, pby, pcx, pcy)
        ca = edge_len(pcx, pcy, pax, pay)
        good_tri = (ab > 2) & (bc > 2) & (ca > 2) & \
            (ab + bc > ca) & (bc + ca > ab) & (ab + ca > bc)
        t1 = (pax - px) * (pby - py) - (pay - py) * (pbx - px)
        t2 = (pbx - px) * (pcy - py) - (pby - py) * (pcx - px)
        t3 = (pcx - px) * (pay - py) - (pcy - py) * (pax - px)
        in_tri = good_tri & (t1 * t2 >= 0) & (t1 * t3 >= 0)
        ok = ok & (in_tri | ~must_tri)

        if sup.los is not None:
            cr = sup.los.crossing(pax, pay, pbx, pby, data.edge) | \
                sup.los.crossing(pbx, pby, pcx, pcy, data.edge) | \
                sup.los.crossing(pcx, pcy, pax, pay, data.edge)
            ok = ok & ~(edge_limit & cr)

        za = pick(a_depth, ia)
        zb = pick(a_depth, ib)
        zc = pick(a_depth, ic)
        A = jnp.stack([pick(fx_, ia) * za, pick(fy_, ia) * za, za], -1)
        B = jnp.stack([pick(fx_, ib) * zb, pick(fy_, ib) * zb, zb], -1)
        C = jnp.stack([pick(fx_, ic) * zc, pick(fy_, ic) * zc, zc], -1)
        cr3 = jnp.cross(A - C, B - C)
        nrm2 = jnp.sum(cr3 * cr3, -1)
        ok = ok & (nrm2 > 0) & jnp.isfinite(nrm2)
        nrm = cr3 / jnp.sqrt(jnp.maximum(nrm2, 1e-30))[..., None]
        dpl = -jnp.sum(nrm * A, -1)

        fit_all = -dpl[..., None] / (
            nrm[..., None, 0] * fx_ + nrm[..., None, 1] * fy_
            + nrm[..., None, 2])
        resid = jnp.abs(fit_all - a_depth)
        not_in_triple = (jnp.arange(8)[None, None] != ia[..., None]) & \
            (jnp.arange(8)[None, None] != ib[..., None]) & \
            (jnp.arange(8)[None, None] != ic[..., None])
        cost = jnp.sum(jnp.where(valid & not_in_triple, resid, 0.0), axis=-1)

        take = ok & (cost < min_cost)
        plane4 = jnp.concatenate([nrm, dpl[..., None]], -1)
        best_plane = jnp.where(take[..., None], plane4, best_plane)
        min_cost = jnp.where(take, cost, min_cost)
        has_best = has_best | take
        has_strong = has_strong | (ok & consist)
        must_tri = must_tri | (take & in_tri)
        tri = jnp.where(
            take[..., None],
            jnp.stack([pax, pay, pbx, pby, pcx, pcy], -1), tri)
        return (best_plane, min_cost, has_best, has_strong, must_tri, tri), None

    init = (
        jnp.zeros((H, W, 4)),
        jnp.full((H, W), BIG),
        jnp.zeros((H, W), bool),
        jnp.zeros((H, W), bool),
        must_tri0,
        jnp.zeros((H, W, 6)),
    )
    ks = jax.random.split(k_iter, 50)
    (best_plane, _mc, has_best, _hs, must_tri, tri), _ = jax.lax.scan(
        step, init, ks)

    # Orient toward the viewer (DPE.cu:3048-3057).
    depth_now = geo.depth_from_plane(cam, state.plane, px, py)
    view = geo.view_direction(cam, px, py)
    flip = jnp.sum(best_plane[..., :3] * view, -1) > 0
    best_plane = jnp.where(flip[..., None], -best_plane, best_plane)

    is_weak = state.weak == WEAK
    fit_plane = jnp.where(
        (is_weak & has_best)[..., None], best_plane,
        jnp.where(is_weak[..., None], jnp.zeros(4), state.plane))

    radius = jnp.full((H, W), float(params.strong_radius))
    if params.use_radius:
        pax, pay, pbx, pby, pcx, pcy = [tri[..., i] for i in range(6)]
        a = jnp.sqrt((pax - pbx) ** 2 + (pay - pby) ** 2)
        b = jnp.sqrt((pbx - pcx) ** 2 + (pby - pcy) ** 2)
        c = jnp.sqrt((pcx - pax) ** 2 + (pcy - pay) ** 2)
        s = (a + b + c) / 2.0
        area = jnp.sqrt(jnp.maximum(s * (s - a) * (s - b) * (s - c), 0.0))
        r = jnp.floor(jnp.sqrt(area) / 2.0)
        d_a = jnp.sqrt((pax - px) ** 2 + (pay - py) ** 2)
        d_b = jnp.sqrt((pbx - px) ** 2 + (pby - py) ** 2)
        d_c = jnp.sqrt((pcx - px) ** 2 + (pcy - py) ** 2)
        min_d = jnp.minimum(jnp.minimum(d_a, d_b), d_c)
        r = jnp.where(2.5 * min_d < r, jnp.floor(min_d), r)
        if sup.edge_steps is not None and params.use_edge:
            lens = np.linalg.norm(support.DIR8, axis=1)
            e_d = jnp.min(jnp.stack(
                [sup.edge_steps[d] * float(lens[d]) for d in range(8)]), 0)
            r = jnp.where(edge_limit & (e_d < r), jnp.floor(e_d), r)
        if sup.label_runs is not None and params.use_label:
            lens = np.linalg.norm(support.DIR8, axis=1)
            runs = jnp.stack(
                [jnp.where(sup.label_runs[d] > 0,
                           sup.label_runs[d] * float(lens[d]), BIG)
                 for d in range(8)])
            b_d = jnp.min(runs, 0)
            r = jnp.where(edge_limit & (data.label > 0) & (b_d < r),
                          jnp.floor(b_d), r)
        # Round down to a multiple of 5 (DPE.cu:3104).
        r = 5.0 * jnp.floor(r / 5.0)
        r_lim = jnp.where(
            edge_limit,
            jnp.maximum(r, float(params.strong_radius)),
            jnp.where(r > params.strong_radius, 0.0,
                      float(params.strong_radius)),
        )
        radius = jnp.where(is_weak & has_best & must_tri, r_lim, radius)

    return {"fit_plane": fit_plane, "radius": radius}


def propagate_weak(key, data: SweepData, sup, state: PMState,
                   params: PatchMatchParams, it: int, color):
    """Weak-pixel checkerboard propagation (``CheckerboardPropagationWeak``,
    DPE.cu:1668-1862) for one color, evaluated on its compacted (H, W2) half
    grid. Returns compacted proposals; the caller scatters + masks."""
    from ..engine import patchmatch as pm
    from . import checker

    H, W = data.ref_image.shape
    nview = data.num_src
    k_sel, k_ref = jax.random.split(key)
    geom = params.geom_consistency

    sites = DeformableSites(data, sup, state, params, color)
    px, py = sites.cx, sites.cy                              # (H, W2)
    plane_now = checker.compact(state.plane, color)
    selected_now = checker.compact(state.selected, color)

    a_x = sites.anchor_x.astype(jnp.int32)                   # (8, H, W2)
    a_y = sites.anchor_y.astype(jnp.int32)
    a_valid = sites.anchor_valid
    a_weak = sampling.gather_map(state.weak, a_y, a_x)
    flags = a_valid & (a_weak == STRONG)                     # (8, H, W2)
    cand_planes = sampling.gather_map(state.plane, a_y, a_x)  # (8,H,W2,4)
    cost_array = jax.lax.map(
        lambda pl: deformable_cost_vector(data, sites, pl, params),
        cand_planes)                                          # (8, V, H, W2)
    cost_array = jnp.where(flags[:, None], cost_array, 0.0)

    # Priors from all non-(-1) anchors (DPE.cu:1717-1730).
    a_sel = sites.anchor_sel                                  # (8, H, W2)
    bits = ((a_sel[:, None] >> jnp.arange(nview, dtype=jnp.uint32)
             [None, :, None, None]) & 1) == 1                 # (8, V, H, W2)
    prior = jnp.sum(jnp.where(a_valid[:, None],
                              jnp.where(bits, 0.9, 0.1), 0.0), axis=0)

    view_weight, temp_selected, weight_norm = pm.view_selection(
        k_sel, cost_array, prior, data.view_valid, it)
    wsum = jnp.maximum(weight_norm, 1e-30)

    if geom:
        geom_rows = jax.lax.map(lambda pl: _geom_vec(data, pl, px, py),
                                cand_planes)
        geom_rows = jnp.where(flags[:, None], geom_rows, GEOM_COST_MAX)
        cost_array = cost_array + params.geom_factor * geom_rows

    final_costs = jnp.sum(view_weight[None] * cost_array, axis=1) / wsum[None]

    min_idx = jnp.argmin(final_costs, axis=0)
    min_flag = jnp.take_along_axis(flags, min_idx[None], 0)[0]
    min_cost = jnp.take_along_axis(final_costs, min_idx[None], 0)[0]
    min_plane = jnp.take_along_axis(cand_planes, min_idx[None, ..., None],
                                    0)[0]

    cost_now_vec = deformable_cost_vector(data, sites, plane_now, params)
    if geom:
        cost_now_vec = cost_now_vec + params.geom_factor * _geom_vec(
            data, plane_now, px, py)
    cost_now = jnp.sum(view_weight * cost_now_vec, axis=0) / wsum
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

    # Refinement (PlaneHypothesisRefinementWeak, DPE.cu:1120-1212).
    def eval_weighted(cand):
        c = deformable_cost_vector(data, sites, cand, params)
        if geom:
            c = c + params.geom_factor * _geom_vec(data, cand, px, py)
        return jnp.sum(view_weight * c, axis=0) / wsum

    fit = checker.compact(sup.fit_plane, color)
    fit_nonzero = jnp.any(fit[..., :3] != 0.0, axis=-1)
    c_fit = eval_weighted(fit)
    d_fit = geo.depth_from_plane(data.ref_cam, fit, px, py)
    ok = fit_nonzero & (d_fit >= data.depth_min) & (d_fit <= data.depth_max) & \
        (c_fit < cost) & (weight_norm > 0)
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

    # Re-express the stored cost with the standard strong NCC so weak and
    # strong costs are comparable during propagation (DPE.cu:1845-1861).
    offs = ncc.window_offsets(params.strong_radius, params.strong_increment)
    final_vec = pm.ncc_cost_vector(
        data, plane, offs, cx=px, cy=py, ref_center=sites.ref_center,
        ref_cache=pm.strong_ref_cache(data, params, px, py, sites.ref_center))
    final_cost = jnp.sum(view_weight * final_vec, axis=0) / wsum
    final_cost = jnp.where(weight_norm > 0, final_cost, COST_MAX)

    return plane, final_cost, selected, view_weight
