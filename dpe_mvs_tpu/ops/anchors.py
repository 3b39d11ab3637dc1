"""Deformable strong-anchor search for weak pixels (``GenNeighbours``,
DPE.cu:2103-2463).

The reference walks each of 8*rotate_time jittered directions through an
exponentially growing radius schedule (up to 4096 px) with data-dependent
early exit, redirecting failed probes to the nearest strong pixel, then
RANSAC-fits a plane over <=64 candidates to keep the 8 most coplanar anchors.
That control flow is the least TPU-shaped kernel in the codebase
(SURVEY.md §7.3 #1).

TPU-native redesign:
  - per angular sector, the first strong pixel *along a lattice ray* is found
    by pointer doubling over static shifts (O(log max-radius), zero gathers),
    on a slightly dilated strong mask so rays cannot step over 1-px-wide
    strong structures; the hit is then snapped to an exact strong pixel via
    the jump-flood nearest-strong field (same redirect the reference applies
    to its jittered probes, DPE.cu:2191-2197);
  - the reference's Monte-Carlo cone sampling becomes a deterministic
    per-sector ray: anchors are inherently spread across sectors, and the
    reference's cone-angle acceptance test (DPE.cu:2198-2201) is applied to
    the snapped anchor;
  - Bresenham edge tests use the precomputed line-of-sight field
    (ops.support.LineOfSight);
  - the plane RANSAC is a fixed-trip-count lax.scan with masked validity,
    keeping the reference's inlier>=6 rule, adaptive threshold shrink to the
    9th residual, and in-triangle/normal-consistency gating.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PatchMatchParams, PixelState
from ..geometry import cameras as geo
from ..ops import sampling, support
from ..engine.state import PMState, SweepData

WEAK = int(PixelState.WEAK)
STRONG = int(PixelState.STRONG)
UNKNOWN = int(PixelState.UNKNOWN)

MAX_SEARCH_RADIUS = 4096
MIN_MARGIN = 6
NEIGHBOUR_NUM = 9
BIG = float(1e30)  # python float: stays an HLO literal, never a hoisted const arg


def sector_rays(rotate_time: int) -> np.ndarray:
    """Integer lattice step vectors for 8*rotate_time evenly spaced sectors."""
    n = 8 * rotate_time
    vecs = []
    for i in range(n):
        theta = 2.0 * math.pi * i / n
        R = 5.0
        v = np.array([round(R * math.cos(theta)), round(R * math.sin(theta))],
                     np.int32)
        g = math.gcd(int(abs(v[0])), int(abs(v[1]))) or 1
        vecs.append(v // g)
    return np.stack(vecs)


def _dilate(mask: jnp.ndarray, r: int) -> jnp.ndarray:
    out = mask
    for dy in range(-r, r + 1):
        row = mask
        acc = None
        for dx in range(-r, r + 1):
            s = support.shift_fill(mask, dy, dx, False)
            acc = s if acc is None else (acc | s)
        out = out | acc
    return out


def gen_neighbours(
    key,
    data: SweepData,
    state: PMState,
    params: PatchMatchParams,
    *,
    edge_steps,
    complexity,
    label_runs,
    los: support.LineOfSight,
    nearest_strong,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (neighbours (8, H, W, 2) int32 (x, y) or -1,
    reliable (H, W) bool, new weak map with unreliable weak -> UNKNOWN
    (``NeigbourUpdate``, DPE.cu:2465-2481)).

    ``state.plane`` must still hold the (world normal, depth) prior layout —
    the reference runs this before RandomInitialization (DPE.cu:3168).
    """
    H, W = data.ref_image.shape
    px, py = geo.pixel_grid(H, W)
    xg = px.astype(jnp.int32)
    yg = py.astype(jnp.int32)
    k_lim, k_ransac = jax.random.split(key)

    depth_diff = data.depth_max - data.depth_min
    ransac_threshold = params.ransac_threshold * depth_diff
    rt = params.rotate_time
    n_dirs = 8 * rt
    half_angle = (45.0 / rt) / 2.0
    cos_thresh = math.cos(math.radians(half_angle))

    strong = state.weak == STRONG
    strong_d = _dilate(strong, 1)

    # Per-pixel edge_limit (DPE.cu:2155-2164). Pixels that keep the limit
    # bump their complexity to >= 0.99 (DPE.cu:2162), which effectively
    # disables the limit for them in the later fit-plane RANSAC redraw.
    new_complexity = complexity
    if params.use_limit and params.use_edge:
        u = jax.random.uniform(k_lim, (H, W))
        edge_limit = u >= complexity
        is_weak_px = state.weak == WEAK
        new_complexity = jnp.where(
            is_weak_px & edge_limit, jnp.maximum(0.99, complexity), complexity)
    else:
        edge_limit = jnp.full((H, W), bool(params.use_limit))

    rays = sector_rays(rt)                                    # (D, 2)
    max_steps_pow2 = 1 << int(math.ceil(math.log2(
        min(MAX_SEARCH_RADIUS, max(H, W)))))

    # --- Sector rays, all directions at once ---------------------------------
    vlen = np.hypot(rays[:, 0], rays[:, 1]).astype(np.float32)  # (D,)
    t_hit = support.ray_first_hit_multi(strong_d, rays, max_steps_pow2)
    hit = t_hit < support.INF                                   # (D, H, W)
    vxj = jnp.asarray(rays[:, 0], jnp.int32)[:, None, None]
    vyj = jnp.asarray(rays[:, 1], jnp.int32)[:, None, None]
    t = jnp.where(hit, t_hit, 1.0).astype(jnp.int32)
    hx = xg[None] + t * vxj
    hy = yg[None] + t * vyj
    anc = sampling.gather_map(nearest_strong, hy, hx)           # (D, H, W, 2)
    ax = anc[..., 0]
    ay = anc[..., 1]
    ok = hit & (ax >= 0)
    # Margin (DPE.cu:2187).
    ok = ok & (ax >= MIN_MARGIN) & (ay >= MIN_MARGIN) & \
        (ax < W - MIN_MARGIN) & (ay < H - MIN_MARGIN)
    # Cone-angle acceptance (DPE.cu:2198-2201).
    dxf = (ax - xg[None]).astype(jnp.float32)
    dyf = (ay - yg[None]).astype(jnp.float32)
    norm = jnp.sqrt(dxf * dxf + dyf * dyf)
    cosang = (dxf * vxj + dyf * vyj) / (
        jnp.maximum(norm, 1e-6) * jnp.asarray(vlen)[:, None, None])
    ok = ok & (cosang > cos_thresh)
    # Edge limit: line of sight must not cross an edge (DPE.cu:2201).
    if los is not None:
        cross = los.crossing(px[None], py[None], ax.astype(jnp.float32),
                             ay.astype(jnp.float32), data.edge)
        ok = ok & (~(edge_limit[None] & cross))
    pool_x = [ax]
    pool_y = [ay]
    pool_valid = [ok]

    # --- Label-region extension, all points at once (DPE.cu:2224-2272) ------
    if params.use_label:
        # Effective reference behaviour of the MIN/MAX'd step split
        # (DPE.cu:2239-2245): even dirs get 2*rt-1 points, odd get 1.
        pt_dir, pt_s = [], []
        for d in range(8):
            n_pts = (2 * rt - 1) if d % 2 == 0 else 1
            for s in range(1, n_pts + 1):
                pt_dir.append(d)
                pt_s.append(s)
        pt_dir = np.array(pt_dir, np.int32)                     # (P2,)
        pt_s = np.array(pt_s, np.int32)
        n_pts_per_dir = np.array([(2 * rt - 1) if d % 2 == 0 else 1
                                  for d in range(8)], np.int32)

        dist = label_runs                                       # (8, H, W)
        gap = jnp.asarray(n_pts_per_dir + 1, jnp.float32)[:, None, None]
        step_len = jnp.maximum(1, (dist / gap).astype(jnp.int32))

        sl = step_len[pt_dir]                                   # (P2, H, W)
        ddx = jnp.asarray(support.DIR8[pt_dir, 0], jnp.int32)[:, None, None]
        ddy = jnp.asarray(support.DIR8[pt_dir, 1], jnp.int32)[:, None, None]
        sj = jnp.asarray(pt_s, jnp.int32)[:, None, None]
        tx = xg[None] + sj * sl * ddx
        ty = yg[None] + sj * sl * ddy
        anc2 = sampling.gather_map(nearest_strong, ty, tx)      # (P2, H, W, 2)
        ax2 = anc2[..., 0]
        ay2 = anc2[..., 1]
        label_pos = data.label > 0
        ok2 = label_pos[None] & (dist[pt_dir] > 0) & (ax2 >= 0)
        ok2 = ok2 & (ax2 >= MIN_MARGIN) & (ay2 >= MIN_MARGIN) & \
            (ax2 < W - MIN_MARGIN) & (ay2 < H - MIN_MARGIN)
        lab_at = sampling.gather_map(data.label, ay2, ax2)
        ok2 = ok2 & ((lab_at == 0) | (lab_at == data.label[None]))
        pool_x.append(ax2)
        pool_y.append(ay2)
        pool_valid.append(ok2)

    pool_x = jnp.moveaxis(jnp.concatenate(pool_x, axis=0), 0, -1)  # (H, W, P)
    pool_y = jnp.moveaxis(jnp.concatenate(pool_y, axis=0), 0, -1)
    pool_valid = jnp.moveaxis(jnp.concatenate(pool_valid, axis=0), 0, -1)
    # Invalid pool entries gather from the pixel's own position instead of
    # a clamped (0, 0) — one stray corner query per tile blows the banded
    # TPU gather's row band up to the whole image (pool_valid masks all
    # downstream uses).
    pool_x = jnp.where(pool_valid, pool_x, xg[..., None])
    pool_y = jnp.where(pool_valid, pool_y, yg[..., None])
    P = pool_x.shape[-1]

    pool_size = jnp.sum(pool_valid, axis=-1)

    # 3D data of each anchor under the *prior* planes (DPE.cu:2286-2300).
    anchor_depth = sampling.gather_map(state.plane[..., 3], pool_y, pool_x)
    fx_ = (pool_x.astype(jnp.float32) - data.ref_cam.cx) / data.ref_cam.fx
    fy_ = (pool_y.astype(jnp.float32) - data.ref_cam.cy) / data.ref_cam.fy
    pool_z = anchor_depth                                      # cam-frame z

    need_normals = params.geom_consistency
    if need_normals:
        n_world = sampling.gather_map(state.plane[..., :3], pool_y, pool_x)
        pool_n = geo.normal_world_to_cam(data.ref_cam, n_world)  # (H, W, P, 3)
    else:
        pool_n = None

    center_z = state.plane[..., 3]

    # ---------------- RANSAC over the pool (DPE.cu:2302-2435) --------------
    T = 64
    limit = 0.05 if params.high_res_img else 0.005
    must_in_tri0 = ~(jnp.full((H, W), params.use_label, bool)
                     & (data.label > 0) & edge_limit)

    def tri_contains(ax, ay, bx, by, cx_, cy_):
        """PointinTriangle (DPE.cu:135-156) at the pixel itself."""
        def edge_len(x0, y0, x1, y1):
            return jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
        ab = edge_len(ax, ay, bx, by)
        bc = edge_len(bx, by, cx_, cy_)
        ca = edge_len(cx_, cy_, ax, ay)
        degenerate = (ab <= 2) | (bc <= 2) | (ca <= 2) | \
            ~((ab + bc > ca) & (bc + ca > ab) & (ab + ca > bc))
        pax, pay = ax - px, ay - py
        pbx, pby = bx - px, by - py
        pcx, pcy = cx_ - px, cy_ - py
        t1 = pax * pby - pay * pbx
        t2 = pbx * pcy - pby * pcx
        t3 = pcx * pay - pcy * pax
        inside = (t1 * t2 >= 0) & (t1 * t3 >= 0)
        return inside & ~degenerate

    def fit_depth_at(nrm, d, fxx, fyy):
        return -d / (nrm[..., 0] * fxx + nrm[..., 1] * fyy + nrm[..., 2])

    pick = sampling.pick_last

    def step(carry, k):
        (best_plane, best_count, best_dist, thr, must_tri, has_norm,
         has_valid) = carry
        ka, kb, kc = jax.random.split(k, 3)
        ia = jax.random.randint(ka, (H, W), 0, P)
        ib = jax.random.randint(kb, (H, W), 0, P)
        ic = jax.random.randint(kc, (H, W), 0, P)
        distinct = (ia != ib) & (ib != ic) & (ia != ic)

        ax, ay = pick(pool_x, ia).astype(jnp.float32), pick(pool_y, ia).astype(jnp.float32)
        bx, by = pick(pool_x, ib).astype(jnp.float32), pick(pool_y, ib).astype(jnp.float32)
        cx_, cy_ = pick(pool_x, ic).astype(jnp.float32), pick(pool_y, ic).astype(jnp.float32)
        va = pick(pool_valid, ia) & pick(pool_valid, ib) & pick(pool_valid, ic)

        in_tri = tri_contains(ax, ay, bx, by, cx_, cy_)
        ok = distinct & va & (in_tri | ~must_tri)

        if need_normals:
            def pick3(idx):
                return jnp.stack(
                    [pick(pool_n[..., k], idx) for k in range(3)], -1)
            na = pick3(ia)
            nb = pick3(ib)
            nc = pick3(ic)
            dotab = jnp.sum(na * nb, -1)
            dotac = jnp.sum(na * nc, -1)
            dotbc = jnp.sum(nb * nc, -1)
            consist = (dotab >= 0.8660254) & (dotac >= 0.8660254) & \
                (dotbc >= 0.8660254)
            consist = consist & edge_limit
            ok = ok & ~(has_norm & ~consist)
        else:
            consist = jnp.zeros((H, W), bool)

        # Edge tests on triangle sides (DPE.cu:2323-2339).
        if los is not None:
            cr_ab = los.crossing(ax, ay, bx, by, data.edge)
            cr_bc = los.crossing(bx, by, cx_, cy_, data.edge)
            cr_ca = los.crossing(cx_, cy_, ax, ay, data.edge)
            ok = ok & ~(edge_limit & (cr_ab | cr_bc | cr_ca))

        # Plane through the three cam-frame 3D points.
        za = pick(pool_z, ia)
        zb = pick(pool_z, ib)
        zc = pick(pool_z, ic)
        A = jnp.stack([pick(fx_, ia) * za, pick(fy_, ia) * za, za], -1)
        B = jnp.stack([pick(fx_, ib) * zb, pick(fy_, ib) * zb, zb], -1)
        C = jnp.stack([pick(fx_, ic) * zc, pick(fy_, ic) * zc, zc], -1)
        cr = jnp.cross(A - C, B - C)
        nrm2 = jnp.sum(cr * cr, -1)
        ok = ok & (nrm2 > 0) & jnp.isfinite(nrm2)
        nrm = cr / jnp.sqrt(jnp.maximum(nrm2, 1e-30))[..., None]
        dpl = -jnp.sum(nrm * A, -1)

        fit_all = fit_depth_at(nrm[..., None, :], dpl[..., None],
                               fx_, fy_)                      # (H, W, P)
        resid = jnp.abs(fit_all - pool_z)
        resid = jnp.where(pool_valid, resid, BIG)
        count = jnp.sum(resid < thr[..., None], axis=-1)
        ok = ok & (count >= 6)

        fit_c = fit_depth_at(
            nrm, dpl,
            (px - data.ref_cam.cx) / data.ref_cam.fx,
            (py - data.ref_cam.cy) / data.ref_cam.fy)
        center_dist = jnp.abs(fit_c - center_z)

        improved = ok & (count > best_count)
        tied = ok & (count == best_count) & (center_dist < best_dist)
        take = improved | tied

        plane4 = jnp.concatenate([nrm, dpl[..., None]], -1)
        best_plane = jnp.where(take[..., None], plane4, best_plane)
        best_dist = jnp.where(take, center_dist, best_dist)
        has_valid = has_valid | ok
        must_tri = must_tri | (take & in_tri)
        has_norm = has_norm | (take & consist) if need_normals else has_norm

        # Adaptive threshold shrink (DPE.cu:2403-2416).
        want_shrink = improved & (thr > limit)
        r9 = -jax.lax.top_k(-resid, NEIGHBOUR_NUM + 1)[0][..., NEIGHBOUR_NUM]
        new_thr = jnp.where(want_shrink & (thr >= r9),
                            jnp.maximum(r9 - 1e-6, limit), thr)
        new_count = jnp.sum(resid < new_thr[..., None], axis=-1)
        best_count = jnp.where(improved, jnp.where(
            want_shrink & (thr >= r9), new_count, count), best_count)
        thr = new_thr

        return (best_plane, best_count, best_dist, thr, must_tri, has_norm,
                has_valid), None

    init = (
        jnp.zeros((H, W, 4)),
        jnp.full((H, W), 3, jnp.int32),      # max_count starts at 3
        jnp.full((H, W), BIG),
        jnp.full((H, W), ransac_threshold),
        must_in_tri0,
        jnp.zeros((H, W), bool),
        jnp.zeros((H, W), bool),
    )
    ks = jax.random.split(k_ransac, T)
    (best_plane, _bc, _bd, _thr, _mt, _hn, has_valid), _ = jax.lax.scan(
        step, init, ks)

    # Final anchor ranking by residual vs the best plane (DPE.cu:2437-2462).
    fit_all = fit_depth_at(best_plane[..., None, :3], best_plane[..., None, 3],
                           fx_, fy_)
    resid = jnp.abs(fit_all - pool_z)
    w = jnp.where(pool_valid & (resid < ransac_threshold), resid, BIG)
    neg_top, top_idx = jax.lax.top_k(-w, 8)                   # (H, W, 8)
    sel_valid = (-neg_top) < BIG
    nb_x = jnp.where(sel_valid, sampling.take_last(pool_x, top_idx), -1)
    nb_y = jnp.where(sel_valid, sampling.take_last(pool_y, top_idx), -1)

    reliable = has_valid & (pool_size > 3)
    is_weak = state.weak == WEAK
    nb_x = jnp.where((is_weak & reliable)[..., None], nb_x, -1)
    nb_y = jnp.where((is_weak & reliable)[..., None], nb_y, -1)
    neighbours = jnp.stack(
        [jnp.moveaxis(nb_x, -1, 0), jnp.moveaxis(nb_y, -1, 0)], axis=-1
    )                                                          # (8, H, W, 2)

    new_weak = jnp.where(is_weak & ~reliable, jnp.uint8(UNKNOWN), state.weak)
    return neighbours, reliable, new_weak, new_complexity
