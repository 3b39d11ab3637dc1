"""The PatchMatch sweep: one jit-compiled state -> state transformation.

TPU-native restructuring of ``DPE::RunPatchMatch`` (DPE.cu:3126-3249). The
reference launches 15 CUDA kernels with a device sync after each; here the
whole sweep is one traced program — XLA fuses stages and overlaps HBM traffic.
Red-black Gauss-Seidel propagation becomes two masked full-image updates per
iteration (the read-after-write ordering of the checkerboard is preserved
because each half-update consumes the previous half's output arrays).

Every stage cites the kernel it re-derives. Parameters are static (a frozen
dataclass), so each (scene, round-kind) pair compiles exactly once.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COST_MAX, GEOM_COST_MAX, PatchMatchParams, PixelState, RunState
from ..geometry import cameras as geo
from ..ops import checker, ncc, planes as planegen, sampling, support
from .state import PMState, SweepData

WEAK = int(PixelState.WEAK)
STRONG = int(PixelState.STRONG)
UNKNOWN = int(PixelState.UNKNOWN)

BIG = float(1e30)  # python float: stays an HLO literal, never a hoisted const arg


class Support(NamedTuple):
    """Per-sweep precomputed support maps (GenEdgeInform + friends)."""

    edge_steps: Optional[jnp.ndarray]      # (8, H, W) f32 steps to edge, INF none
    complexity: Optional[jnp.ndarray]      # (H, W) f32
    label_runs: Optional[jnp.ndarray]      # (8, H, W) f32 same-label run length
    los: Optional[support.LineOfSight]
    nearest_strong: Optional[jnp.ndarray]  # (H, W, 2) i32 (x, y) or -1
    neighbours: Optional[jnp.ndarray]      # (8, H, W, 2) i32 anchors (x, y)/-1
    radius: Optional[jnp.ndarray]          # (H, W) f32 adaptive NCC radius
    fit_plane: Optional[jnp.ndarray]       # (H, W, 4)


# ---------------------------------------------------------------------------
# Cost vectors
# ---------------------------------------------------------------------------

def _view_xs(data: SweepData):
    return (
        data.src_images,
        data.src_cams.K,
        data.R_rel,
        data.t_rel,
        data.view_valid,
    )


def ncc_cost_vector(
    data: SweepData,
    plane: jnp.ndarray,
    offsets: np.ndarray,
    *,
    cx: Optional[jnp.ndarray] = None,
    cy: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    ref_cache: Optional[ncc.RefWindowCache] = None,
    ref_center: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(V, *B) bilateral NCC of one plane field against every source view
    (``ComputeMultiViewCostVectorOld``, DPE.cu:870-879). Invalid (padding)
    views get COST_MAX. Window centers default to the full pixel grid; pass
    ``cx``/``cy`` (+ matching ``ref_center`` image values) to evaluate at
    arbitrary sites (e.g. one checkerboard color's compacted half grid)."""
    H, W = data.ref_image.shape
    if cx is None:
        cx, cy = geo.pixel_grid(H, W)
    if ref_center is None:
        ref_center = data.ref_image  # image value at the pixel itself

    def body(_, xs):
        img, K, R_rel, t_rel, valid = xs
        hom = ncc.homography_field(data.ref_cam, K, R_rel, t_rel, plane, cx, cy)
        c = ncc.bilateral_ncc(
            data.ref_image, img, hom, cx, cy, offsets,
            5.0, 3.0, ref_center, scale=scale, ref_cache=ref_cache,
        )
        return None, jnp.where(valid, c, COST_MAX)

    _, costs = jax.lax.scan(body, None, _view_xs(data))
    return costs


def strong_ref_cache(data: SweepData, params: PatchMatchParams,
                     cx=None, cy=None, ref_center=None):
    """Ref-side window cache for the standard strong NCC geometry — shared
    by every strong cost evaluation at the given window centers (defaults to
    the full pixel grid)."""
    H, W = data.ref_image.shape
    if cx is None:
        cx, cy = geo.pixel_grid(H, W)
    if ref_center is None:
        ref_center = data.ref_image
    return ncc.make_ref_cache(
        data.ref_image, cx, cy, strong_offsets(params), 5.0, 3.0,
        ref_center)


def geom_cost_vector(data: SweepData, plane: jnp.ndarray,
                     px=None, py=None) -> jnp.ndarray:
    """(V, *B) forward-backward geometric cost (DPE.cu:915-953)."""
    H, W = data.ref_image.shape
    if px is None:
        px, py = geo.pixel_grid(H, W)

    def body(_, xs):
        depth_map, K, R, t, valid = xs
        cam = geo.Camera(K=K, R=R, t=t)
        c = ncc.geom_consistency_cost(data.ref_cam, cam, depth_map, plane, px, py)
        return None, jnp.where(valid, c, GEOM_COST_MAX)

    _, costs = jax.lax.scan(
        body, None,
        (data.src_depths, data.src_cams.K, data.src_cams.R, data.src_cams.t,
         data.view_valid),
    )
    return costs


def strong_offsets(params: PatchMatchParams) -> np.ndarray:
    return ncc.window_offsets(params.strong_radius, params.strong_increment)


# ---------------------------------------------------------------------------
# Initialization (RandomInitialization, DPE.cu:1035-1063)
# ---------------------------------------------------------------------------

def initialize(data: SweepData, state: PMState, params: PatchMatchParams
               ) -> PMState:
    H, W = data.ref_image.shape
    px, py = geo.pixel_grid(H, W)
    offs = strong_offsets(params)
    key, sub = jax.random.split(state.key)
    cache = strong_ref_cache(data, params)

    if params.state == RunState.FIRST_INIT:
        plane = planegen.random_plane(sub, data.ref_cam, px, py,
                                      data.depth_min, data.depth_max)
        costs = ncc_cost_vector(data, plane, offs, ref_cache=cache)
        # Top-k init cost + selected views (DPE.cu:780-826).
        v = costs.shape[0]
        num_valid = jnp.sum(costs < COST_MAX, axis=0)       # (H, W)
        top_k = jnp.minimum(num_valid, params.top_k)
        sorted_c = jnp.sort(costs, axis=0)
        ks = jnp.clip(top_k - 1, 0, v - 1)
        kth = jnp.take_along_axis(sorted_c, ks[None], axis=0)[0]
        mask_steps = jnp.arange(v)[:, None, None] < top_k[None]
        mean_cost = jnp.sum(jnp.where(mask_steps, sorted_c, 0.0), axis=0) / \
            jnp.maximum(top_k, 1)
        cost = jnp.where(top_k > 0, mean_cost, COST_MAX)
        sel_bits = (costs <= kth[None]) & (top_k[None] > 0)
        selected = jnp.sum(
            sel_bits.astype(jnp.uint32)
            << jnp.arange(v, dtype=jnp.uint32)[:, None, None],
            axis=0,
        )
        return state._replace(plane=plane, cost=cost, selected=selected, key=key)

    # REFINE path: prior plane is (world normal, depth); re-frame to ref cam.
    n_world = state.plane[..., :3]
    depth = state.plane[..., 3]
    n_cam = geo.normal_world_to_cam(data.ref_cam, n_world)
    plane = geo.plane_from_depth_normal(data.ref_cam, px, py, depth, n_cam)
    costs = ncc_cost_vector(data, plane, offs, ref_cache=cache)
    v = costs.shape[0]
    bit = (state.selected[None] >> jnp.arange(v, dtype=jnp.uint32)[:, None, None]) & 1
    use = (bit == 1) & (costs < COST_MAX)
    cnt = jnp.sum(use, axis=0)
    cost = jnp.where(cnt > 0, jnp.sum(jnp.where(use, costs, 0.0), axis=0)
                     / jnp.maximum(cnt, 1), COST_MAX)
    # Deselect views whose cost saturated (intended single-bit semantics of
    # ``unSetBit``; the reference's bit trick clears bits 0..n, DPE.cu:77-80).
    keep = ~((bit == 1) & (costs >= COST_MAX))
    selected = jnp.sum(
        ((bit == 1) & keep).astype(jnp.uint32)
        << jnp.arange(v, dtype=jnp.uint32)[:, None, None],
        axis=0,
    )
    return state._replace(plane=plane, cost=cost, selected=selected, key=key)


# ---------------------------------------------------------------------------
# Candidate search
# ---------------------------------------------------------------------------

def _gather2d(arr: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """arr[(iy, ix)] with clamp; arr (H, W, ...) -> (H, W, ...)."""
    H, W = arr.shape[:2]
    lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    flat = arr.reshape(H * W, *arr.shape[2:])
    return jnp.take(flat, lin, axis=0)


def classic_probe_sets():
    """Probe offset tables of the ACMM near/far checkerboard sampling
    (DPE.cu:1345-1545), in reference direction order 0..7 = up_near, up_far,
    down_near, down_far, left_near, left_far, right_near, right_far.

    Each probe: (dx, dy, guard) where guard(x, y, W, H) is the reference's
    bound condition."""
    dirs = []
    # up_near
    probes = [(0, -1, lambda x, y, W, H: y > 0)]
    for i in range(3):
        probes.append((-(1 + i), -(2 + i),
                       lambda x, y, W, H, i=i: (y > 1 + i) & (x > i)))
        probes.append((1 + i, -(2 + i),
                       lambda x, y, W, H, i=i: (y > 1 + i) & (x < W - 1 - i)))
    dirs.append(probes)
    # up_far
    probes = [(0, -3, lambda x, y, W, H: y > 2)]
    for i in range(1, 11):
        probes.append((0, -3 - 2 * i, lambda x, y, W, H, i=i: y > 2 + 2 * i))
    dirs.append(probes)
    # down_near
    probes = [(0, 1, lambda x, y, W, H: y < H - 1)]
    for i in range(3):
        probes.append((-(1 + i), 2 + i,
                       lambda x, y, W, H, i=i: (y < H - 2 - i) & (x > i)))
        probes.append((1 + i, 2 + i,
                       lambda x, y, W, H, i=i: (y < H - 2 - i) & (x < W - 1 - i)))
    dirs.append(probes)
    # down_far
    probes = [(0, 3, lambda x, y, W, H: y < H - 3)]
    for i in range(1, 11):
        probes.append((0, 3 + 2 * i, lambda x, y, W, H, i=i: y < H - 3 - 2 * i))
    dirs.append(probes)
    # left_near
    probes = [(-1, 0, lambda x, y, W, H: x > 0)]
    for i in range(3):
        probes.append((-(2 + i), -(1 + i),
                       lambda x, y, W, H, i=i: (x > 1 + i) & (y > i)))
        probes.append((-(2 + i), 1 + i,
                       lambda x, y, W, H, i=i: (x > 1 + i) & (y < H - 1 - i)))
    dirs.append(probes)
    # left_far
    probes = [(-3, 0, lambda x, y, W, H: x > 2)]
    for i in range(1, 11):
        probes.append((-3 - 2 * i, 0, lambda x, y, W, H, i=i: x > 2 + 2 * i))
    dirs.append(probes)
    # right_near
    probes = [(1, 0, lambda x, y, W, H: x < W - 1)]
    for i in range(3):
        probes.append((2 + i, -(1 + i),
                       lambda x, y, W, H, i=i: (x < W - 2 - i) & (y > i)))
        probes.append((2 + i, 1 + i,
                       lambda x, y, W, H, i=i: (x < W - 2 - i) & (y < H - 1 - i)))
    dirs.append(probes)
    # right_far
    probes = [(3, 0, lambda x, y, W, H: x < W - 3)]
    for i in range(1, 11):
        probes.append((3 + 2 * i, 0, lambda x, y, W, H, i=i: x < W - 3 - 2 * i))
    dirs.append(probes)
    return dirs


_CLASSIC_PROBES = classic_probe_sets()

# Reference direction vectors for edge-bounded sampling (DPE.cu:1243).
_EDGE_DIRS = [(0, -1), (0, 1), (-1, 0), (1, 0), (-1, -1), (1, 1), (-1, 1), (1, -1)]
# Map from edge-dir index to the matching DIR8 row of ops.support
# (same table, identical order).


def classic_candidates(cost_map: jnp.ndarray):
    """For each of the 8 reference directions: (flag, best_dx, best_dy) of the
    min-cost probe (classic ACMM mode, DPE.cu:1345-1545)."""
    H, W = cost_map.shape
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    flags, dxs, dys = [], [], []
    for probes in _CLASSIC_PROBES:
        best_c = jnp.full((H, W), BIG)
        best_dx = jnp.zeros((H, W), jnp.int32)
        best_dy = jnp.zeros((H, W), jnp.int32)
        base_guard = probes[0][2](xg, yg, W, H)
        for dx, dy, guard in probes:
            ok = base_guard & guard(xg, yg, W, H)
            c = jnp.where(ok, sampling.shift(cost_map, dy, dx), BIG)
            better = c < best_c
            best_c = jnp.where(better, c, best_c)
            best_dx = jnp.where(better, dx, best_dx)
            best_dy = jnp.where(better, dy, best_dy)
        flags.append(base_guard)
        dxs.append(best_dx)
        dys.append(best_dy)
    return flags, dxs, dys


def edge_candidates(cost_map: jnp.ndarray, edge: jnp.ndarray,
                    edge_steps: jnp.ndarray, it):
    """Edge-bounded directional sampling, first pass (DPE.cu:1242-1292):
    per direction, probe along the ray with a reach bounded by the distance
    to the nearest edge. Returns (flags, dxs, dys). ``it`` may be traced."""
    H, W = cost_map.shape
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    max_edge_dist = max(H, W) / 30.0
    min_step = 2
    s_mag = jnp.maximum(1, 5 - 2 * jnp.asarray(it, jnp.int32))

    flags, dxs, dys = [], [], []
    for d in range(8):
        dx_u, dy_u = _EDGE_DIRS[d]
        steps_t = edge_steps[d]                      # f32 steps, INF if none
        invalid = steps_t >= support.INF
        dist = steps_t
        cap = max_edge_dist / (np.sqrt(2.0) if d >= 4 else 1.0)
        dist = jnp.where(invalid | (dist > max_edge_dist), cap, dist)
        dist = jnp.where(edge, 11.0 * min_step, dist)
        step_num = jnp.clip((dist / min_step).astype(jnp.int32), 11, 22)
        step_len = jnp.maximum((dist / step_num.astype(jnp.float32))
                               .astype(jnp.int32), min_step)
        if d < 4:
            step_len = jnp.where(step_len % 2 == 1, step_len - 1, step_len)
        fx, fy = 0, 0
        if d > 4:
            if d % 2 == 1:
                fx = dx_u
            else:
                fy = dy_u

        t = jnp.arange(22, dtype=jnp.int32)[:, None, None]     # (22, 1, 1)
        pdx = s_mag * dx_u + t * step_len[None] * dx_u + fx    # (22, H, W)
        pdy = s_mag * dy_u + t * step_len[None] * dy_u + fy
        tx = xg[None] + pdx
        ty = yg[None] + pdy
        ok = (t < step_num[None]) & (tx >= 0) & (ty >= 0) & \
            (tx < W) & (ty < H)
        c = jnp.where(ok, _gather2d(cost_map, ty, tx), BIG)
        best_t = jnp.argmin(c, axis=0)                         # (H, W)
        best_c = jnp.min(c, axis=0)
        best_dx = jnp.take_along_axis(pdx, best_t[None], 0)[0]
        best_dy = jnp.take_along_axis(pdy, best_t[None], 0)[0]
        flags.append(best_c < BIG)
        dxs.append(best_dx)
        dys.append(best_dy)
    return flags, dxs, dys


def edge_second_pass_candidates(cost_map: jnp.ndarray, it):
    """Short-range non-local pass for non-edge pixels (DPE.cu:1293-1343):
    11 probes at fixed step 2."""
    H, W = cost_map.shape
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    s_mag = jnp.maximum(1, 5 - 2 * jnp.asarray(it, jnp.int32))
    flags, dxs, dys = [], [], []
    for d in range(8):
        dx_u, dy_u = _EDGE_DIRS[d]
        fx, fy = 0, 0
        if d > 4:
            if d % 2 == 1:
                fx = dx_u
            else:
                fy = dy_u
        t = jnp.arange(11, dtype=jnp.int32)[:, None, None]
        pdx = (s_mag * dx_u + t * 2 * dx_u + fx) * jnp.ones(
            (1, H, W), jnp.int32)
        pdy = (s_mag * dy_u + t * 2 * dy_u + fy) * jnp.ones(
            (1, H, W), jnp.int32)
        tx = xg[None] + pdx
        ty = yg[None] + pdy
        ok = (tx >= 0) & (ty >= 0) & (tx < W) & (ty < H)
        c = jnp.where(ok, _gather2d(cost_map, ty, tx), BIG)
        best_t = jnp.argmin(c, axis=0)
        best_c = jnp.min(c, axis=0)
        best_dx = jnp.take_along_axis(pdx, best_t[None], 0)[0]
        best_dy = jnp.take_along_axis(pdy, best_t[None], 0)[0]
        flags.append(best_c < BIG)
        dxs.append(best_dx)
        dys.append(best_dy)
    return flags, dxs, dys


# ---------------------------------------------------------------------------
# Multi-hypothesis joint view selection (DPE.cu:1547-1615 / 1710-1779)
# ---------------------------------------------------------------------------

def view_selection(key, cost_array: jnp.ndarray, prior: jnp.ndarray,
                   valid_view: jnp.ndarray, it):
    """cost_array: (8, V, H, W); prior: (V, H, W); ``it`` may be traced.
    Returns (view_weight (V, H, W) i32, selected bitmask (H, W) u32,
    weight_norm (H, W) f32)."""
    nview = cost_array.shape[1]
    itf = jnp.asarray(it, jnp.float32)
    cost_threshold = 0.8 * jnp.exp(itf * itf / -90.0)
    good = cost_array < cost_threshold                       # (8, V, H, W)
    bad = cost_array > 1.2
    count = jnp.sum(good, axis=0).astype(jnp.float32)        # (V, H, W)
    count_false = jnp.sum(bad, axis=0)
    tmpw = jnp.sum(jnp.where(good, jnp.exp(cost_array * cost_array / -0.18), 0.0),
                   axis=0)
    probs = jnp.where(
        (count > 2) & (count_false < 3), tmpw / jnp.maximum(count, 1.0),
        jnp.where(count_false < 3,
                  jnp.exp(cost_threshold * cost_threshold / -0.32), 0.0),
    )
    probs = probs * prior * valid_view[:, None, None]

    psum = jnp.sum(probs, axis=0, keepdims=True)
    cdf = jnp.cumsum(probs, axis=0) / jnp.maximum(psum, 1e-30)
    cdf = jnp.where(psum > 0, cdf, 0.0)  # zero-prob -> no draws hit

    H, W = cost_array.shape[2:]
    if H * W > 4_000_000:
        # Full-resolution frames: the vectorized draw materializes
        # (15, V, H, W) hit masks (~1 GB at 24 MP, a top OOM allocation at
        # 3200x2400) — accumulate the 15 Monte-Carlo draws in a scan
        # instead (per-draw keys; the stream differs from the small-frame
        # path, which is fine — draws are i.i.d. uniforms either way).
        def draw(acc, key_i):
            ui = jax.random.uniform(key_i, (H, W))
            hits = cdf > ui[None]                             # (V, H, W)
            first = jnp.argmax(hits, axis=0)
            any_hit = jnp.any(hits, axis=0)
            one_hot = (first[None] == jnp.arange(nview)[:, None, None]) \
                & any_hit[None]
            return acc + one_hot.astype(jnp.int32), None

        view_weight, _ = jax.lax.scan(
            draw, jnp.zeros((nview, H, W), jnp.int32),
            jax.random.split(key, 15))
    else:
        u = jax.random.uniform(key, (15, H, W))               # (15, H, W)
        hits = cdf[None, :] > u[:, None]                      # (15, V, H, W)
        first = jnp.argmax(hits, axis=1)                      # (15, H, W)
        any_hit = jnp.any(hits, axis=1)                       # (15, H, W)
        one_hot = (
            (first[:, None] == jnp.arange(nview)[None, :, None, None])
            & any_hit[:, None]
        )
        view_weight = jnp.sum(one_hot, axis=0).astype(jnp.int32)

    w_pos = view_weight > 0
    selected = jnp.sum(
        w_pos.astype(jnp.uint32)
        << jnp.arange(nview, dtype=jnp.uint32)[:, None, None],
        axis=0,
    )
    weight_norm = jnp.sum(view_weight, axis=0).astype(jnp.float32)
    return view_weight, selected, weight_norm


def neighbour_prior(selected: jnp.ndarray, flags, nview: int,
                    icx=None, icy=None) -> jnp.ndarray:
    """View-selection prior from the 4 fixed neighbours (DPE.cu:1552-1566):
    +0.9 if the neighbour selected the view, else +0.1, for each neighbour
    whose direction flag (index 0, 2, 4, 6) holds. ``selected`` is full-res;
    with ``icx``/``icy`` the prior is evaluated at those sites (flags must
    share the site shape). Borders are safe either way: the direction flags
    are False exactly where the neighbour would fall outside."""
    shifts = [(0, -1), (0, 1), (-1, 0), (1, 0)]  # up, down, left, right (dx,dy)
    shape = flags.shape[1:]
    prior = jnp.zeros((nview, *shape), jnp.float32)
    for i, (dx, dy) in enumerate(shifts):
        if icx is None:
            nb = support.shift_fill(selected, dy, dx, 0)
        else:
            nb = _gather2d(selected, icy + dy, icx + dx)
        bits = ((nb[None] >> jnp.arange(nview, dtype=jnp.uint32)[:, None, None])
                & 1) == 1
        contrib = jnp.where(bits, 0.9, 0.1)
        prior = prior + jnp.where(flags[2 * i][None], contrib, 0.0)
    return prior


# ---------------------------------------------------------------------------
# Plane refinement (PlaneHypothesisRefinementStrong, DPE.cu:1065-1118)
# ---------------------------------------------------------------------------

def refine_combos(key, data: SweepData, plane, depth, px=None, py=None):
    """The 5 {depth, normal} refinement combinations (DPE.cu:1093-1095),
    stacked for a scan. Returns (depths (5, *B), normals (5, *B, 3))."""
    if px is None:
        px, py = geo.pixel_grid(*data.ref_image.shape)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    depth_rand = jax.random.uniform(k1, px.shape, minval=data.depth_min,
                                    maxval=data.depth_max)
    n_rand = planegen.random_normal_facing(k2, data.ref_cam, px, py, depth)
    depth_pert = jax.random.uniform(k3, px.shape, minval=0.98 * depth,
                                    maxval=1.02 * depth)
    n_pert = planegen.perturbed_normal(k4, data.ref_cam, px, py,
                                       plane[..., :3], 0.02 * np.pi)
    n_cur = plane[..., :3]
    depths = jnp.stack([depth_rand, depth, depth_rand, depth, depth_pert])
    normals = jnp.stack([n_cur, n_rand, n_rand, n_pert, n_cur])
    return depths, normals


def refine_strong(key, data: SweepData, params: PatchMatchParams,
                  plane, depth, cost, view_weight, weight_norm,
                  ref_cache=None, px=None, py=None, ref_center=None):
    if px is None:
        px, py = geo.pixel_grid(*data.ref_image.shape)
    offs = strong_offsets(params)
    depths, normals = refine_combos(key, data, plane, depth, px, py)
    wsum = jnp.maximum(weight_norm, 1e-30)

    def body(carry, xs):
        plane, depth, cost = carry
        d_i, n_i = xs
        cand = geo.plane_from_depth_normal(data.ref_cam, px, py, d_i, n_i)
        costs = ncc_cost_vector(data, cand, offs, ref_cache=ref_cache,
                                cx=px, cy=py, ref_center=ref_center)
        c = jnp.sum(view_weight * costs, axis=0) / wsum
        d_chk = geo.depth_from_plane(data.ref_cam, cand, px, py)
        ok = (d_chk >= data.depth_min) & (d_chk <= data.depth_max) & \
            (c < cost) & (weight_norm > 0)
        plane = jnp.where(ok[..., None], cand, plane)
        depth = jnp.where(ok, d_chk, depth)
        cost = jnp.where(ok, c, cost)
        return (plane, depth, cost), None

    (plane, depth, cost), _ = jax.lax.scan(body, (plane, depth, cost),
                                           (depths, normals))
    return plane, depth, cost


# ---------------------------------------------------------------------------
# Strong propagation (CheckerboardPropagationStrong, DPE.cu:1214-1666)
# ---------------------------------------------------------------------------

def propagate_strong(key, data: SweepData, sup: Support, state: PMState,
                     params: PatchMatchParams, it: int, color):
    """Strong-pixel proposal for one checkerboard color, evaluated on the
    color's compacted (H, W2) half grid (the reference's W x H/2 launch
    economy, DPE.cu:3141-3148). Candidate *search* runs full-res (cheap
    shifts/gathers over the cost map); every NCC evaluation runs at the
    compacted sites only. Returns compacted (plane, cost, selected,
    view_weight); the caller scatters back and applies the weak mask."""
    H, W = data.ref_image.shape
    offs = strong_offsets(params)
    nview = data.num_src
    k_sel, k_ref = jax.random.split(key)

    # Compacted site coordinates + site-local inputs.
    ccx, ccy = checker.sites(H, W, color)                    # (H, W2) f32
    icx = ccx.astype(jnp.int32)
    icy = ccy.astype(jnp.int32)
    ref_center_c = checker.compact(data.ref_image, color)
    plane_now = checker.compact(state.plane, color)          # (H, W2, 4)
    selected_now = checker.compact(state.selected, color)
    cache = strong_ref_cache(data, params, ccx, ccy, ref_center_c)

    if params.use_edge:
        flags, dxs, dys = edge_candidates(state.cost, data.edge,
                                          sup.edge_steps, it)
    else:
        flags, dxs, dys = classic_candidates(state.cost)
    flags = checker.compact_stack(jnp.stack(flags), color)   # (8, H, W2)
    dxs = checker.compact_stack(jnp.stack(dxs), color)
    dys = checker.compact_stack(jnp.stack(dys), color)

    cand_planes = _gather2d(state.plane, icy[None] + dys, icx[None] + dxs)

    def cost_vec(pl):
        return ncc_cost_vector(data, pl, offs, ref_cache=cache,
                               cx=ccx, cy=ccy, ref_center=ref_center_c)

    cost_array = jax.lax.map(cost_vec, cand_planes)          # (8, V, H, W2)
    # Uncomputed directions keep zeroed rows, as the reference's
    # uninitialized cost_array does (DPE.cu:1236; border-only effect).
    cost_array = jnp.where(flags[:, None], cost_array, 0.0)

    if params.use_edge:
        # Second non-local pass for non-edge pixels (DPE.cu:1293-1343).
        itf = jnp.asarray(it, jnp.float32)
        good_thr = 0.8 * jnp.exp(itf * itf / -90.0)
        f2, dx2, dy2 = edge_second_pass_candidates(state.cost, it)
        f2 = checker.compact_stack(jnp.stack(f2), color)
        dx2 = checker.compact_stack(jnp.stack(dx2), color)
        dy2 = checker.compact_stack(jnp.stack(dy2), color)
        p2 = _gather2d(state.plane, icy[None] + dy2, icx[None] + dx2)
        c2 = jax.lax.map(cost_vec, p2)
        edge_c = checker.compact(data.edge, color)
        good1 = jnp.sum(cost_array < good_thr, axis=1)        # (8, H, W2)
        bad1 = jnp.sum(cost_array > 1.2, axis=1)
        c2m = jnp.where(f2[:, None], c2, COST_MAX)
        good2 = jnp.sum(c2m < good_thr, axis=1)
        bad2 = jnp.sum(c2m > 1.2, axis=1)
        replace = f2 & (~edge_c)[None] & (
            (~flags) | (good2 > good1) | ((good2 == good1) & (bad2 < bad1)))
        cost_array = jnp.where(replace[:, None], c2, cost_array)
        cand_planes = jnp.where(replace[..., None], p2, cand_planes)
        flags = flags | (f2 & (~edge_c)[None])

    prior = neighbour_prior(state.selected, flags, nview, icx=icx, icy=icy)
    view_weight, temp_selected, weight_norm = view_selection(
        k_sel, cost_array, prior, data.view_valid, it)
    wsum = jnp.maximum(weight_norm, 1e-30)

    final_costs = jnp.sum(view_weight[None] * cost_array, axis=1) / wsum[None]

    min_idx = jnp.argmin(final_costs, axis=0)                # (H, W2)
    min_flag = jnp.take_along_axis(flags, min_idx[None], axis=0)[0]
    min_cost = jnp.take_along_axis(final_costs, min_idx[None], axis=0)[0]
    min_plane = jnp.take_along_axis(
        cand_planes, min_idx[None, ..., None], axis=0)[0]

    cost_now_vec = cost_vec(plane_now)
    cost_now = jnp.sum(view_weight * cost_now_vec, axis=0) / wsum
    cost_now = jnp.where(weight_norm > 0, cost_now, COST_MAX)
    stored_cost = cost_now

    depth_now = geo.depth_from_plane(data.ref_cam, plane_now, ccx, ccy)
    depth_before = geo.depth_from_plane(data.ref_cam, min_plane, ccx, ccy)
    accept = min_flag & (depth_before >= data.depth_min) & \
        (depth_before <= data.depth_max) & (min_cost < cost_now)

    plane = jnp.where(accept[..., None], min_plane, plane_now)
    depth = jnp.where(accept, depth_before, depth_now)
    cost = jnp.where(accept, min_cost, cost_now)
    selected = jnp.where(accept, temp_selected, selected_now)

    plane, depth, cost = refine_strong(
        k_ref, data, params, plane, depth, cost, view_weight, weight_norm,
        ref_cache=cache, px=ccx, py=ccy, ref_center=ref_center_c)

    if params.state == RunState.REFINE_INIT:
        # Hysteresis: protect the upsampled prior (DPE.cu:1656-1665).
        accept_final = cost < stored_cost - 0.1
        plane = jnp.where(accept_final[..., None], plane, plane_now)
        cost = jnp.where(accept_final, cost, stored_cost)

    return plane, cost, selected, view_weight


# ---------------------------------------------------------------------------
# Depth extraction / filtering (GetDepthandNormal + CheckerboardFilterStrong)
# ---------------------------------------------------------------------------

def to_world_depth(data: SweepData, plane: jnp.ndarray) -> jnp.ndarray:
    """(n_cam, dist) -> (n_world, depth) (``GetDepthandNormal``,
    DPE.cu:1940-1955)."""
    H, W = data.ref_image.shape
    px, py = geo.pixel_grid(H, W)
    depth = geo.depth_from_plane(data.ref_cam, plane, px, py)
    n_world = geo.normal_cam_to_world(data.ref_cam, plane[..., :3])
    return jnp.concatenate([n_world, depth[..., None]], axis=-1)


_FILTER_OFFSETS = [
    # (dx, dy, guard) from CheckerboardFilterStrong (DPE.cu:1995-2057).
    (0, -1, lambda x, y, W, H: y > 0),
    (0, -3, lambda x, y, W, H: y > 2),
    (0, -5, lambda x, y, W, H: y > 4),
    (0, 1, lambda x, y, W, H: y < H - 1),
    (0, 3, lambda x, y, W, H: y < H - 3),
    (0, 5, lambda x, y, W, H: y < H - 5),
    (-1, 0, lambda x, y, W, H: x > 0),
    (-3, 0, lambda x, y, W, H: x > 2),
    (-5, 0, lambda x, y, W, H: x > 4),
    (1, 0, lambda x, y, W, H: x < W - 1),
    (3, 0, lambda x, y, W, H: x < W - 3),
    (5, 0, lambda x, y, W, H: x < W - 5),
    (2, -1, lambda x, y, W, H: (y > 0) & (x < W - 2)),
    (2, 1, lambda x, y, W, H: (y < H - 1) & (x < W - 2)),
    (-2, -1, lambda x, y, W, H: (y > 0) & (x > 1)),
    (-2, 1, lambda x, y, W, H: (y < H - 1) & (x > 1)),
    (-1, -2, lambda x, y, W, H: (x > 0) & (y > 2)),
    (1, -2, lambda x, y, W, H: (x < W - 1) & (y > 2)),
    (-1, 2, lambda x, y, W, H: (x > 0) & (y < H - 2)),
    (1, 2, lambda x, y, W, H: (x < W - 1) & (y < H - 2)),
]


def median_filter_depth(data: SweepData, plane: jnp.ndarray, cost: jnp.ndarray,
                        weak: jnp.ndarray) -> jnp.ndarray:
    """Median of the center depth + up-to-20 STRONG neighbour depths
    (``CheckerboardFilterStrong``, DPE.cu:1957-2067). Returns new depth
    channel (w); caller applies the red/black + non-weak mask."""
    H, W = data.ref_image.shape
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    depth = plane[..., 3]
    vals = [depth]
    valids = [jnp.ones((H, W), bool)]
    for dx, dy, guard in _FILTER_OFFSETS:
        ok = guard(xg, yg, W, H) & \
            (support.shift_fill(weak, dy, dx, UNKNOWN) == STRONG)
        vals.append(sampling.shift(depth, dy, dx))
        valids.append(ok)
    stack = jnp.stack(vals)                                  # (21, H, W)
    valid = jnp.stack(valids)
    n = jnp.sum(valid, axis=0)                               # (H, W) >= 1
    sorted_vals = jnp.sort(jnp.where(valid, stack, BIG), axis=0)
    mid = n // 2
    take = lambda idx: jnp.take_along_axis(sorted_vals, idx[None], axis=0)[0]
    med_odd = take(mid)
    med_even = 0.5 * (take(jnp.maximum(mid - 1, 0)) + take(mid))
    med = jnp.where(n % 2 == 0, med_even, med_odd)
    return jnp.where(cost < 0.001, depth, med)


# ---------------------------------------------------------------------------
# Disparity sweeps: DepthToWeak (DPE.cu:2593-2747) + LocalRefine (:2749-2835)
# ---------------------------------------------------------------------------

def _selected_weighted_cost(data: SweepData, state: PMState,
                            params: PatchMatchParams, plane: jnp.ndarray,
                            offs: np.ndarray, ref_cache=None,
                            cost_fn=None) -> jnp.ndarray:
    """Weighted NCC (+ geom) over the pixel's selected views; (H, W).

    ``cost_fn`` (plane -> (V, H, W) costs incl. geom) overrides the
    XLA-gather path — the rectified engine injects itself here."""
    nview = data.num_src
    if cost_fn is not None:
        costs = cost_fn(plane)
    else:
        costs = ncc_cost_vector(data, plane, offs, ref_cache=ref_cache)
        if params.geom_consistency:
            costs = costs + params.geom_factor * geom_cost_vector(data, plane)
    bits = ((state.selected[None] >> jnp.arange(nview, dtype=jnp.uint32)
             [:, None, None]) & 1) == 1
    w = jnp.where(bits, jnp.moveaxis(state.view_weight, -1, 0), 0)
    wsum = jnp.sum(w, axis=0).astype(jnp.float32)
    total = jnp.sum(w * costs, axis=0) / jnp.maximum(wsum, 1e-30)
    return total, wsum


def _disparity_setup(data: SweepData, state: PMState):
    """Per-pixel mean baseline over selected views + cam-frame plane/depth."""
    nview = data.num_src
    n_world = state.plane[..., :3]
    origin_depth = state.plane[..., 3]
    n_cam = geo.normal_world_to_cam(data.ref_cam, n_world)
    bits = ((state.selected[None] >> jnp.arange(nview, dtype=jnp.uint32)
             [:, None, None]) & 1) == 1
    bits = bits & data.view_valid[:, None, None]
    cnt = jnp.sum(bits, axis=0)
    bl = jnp.sum(jnp.where(bits, data.baseline[:, None, None], 0.0), axis=0) / \
        jnp.maximum(cnt, 1)
    return n_cam, origin_depth, bl, cnt


def disparity_sweep(data: SweepData, state: PMState, params: PatchMatchParams,
                    disps: np.ndarray, cost_fn=None,
                    rstat=None, stride: int = 1) -> jnp.ndarray:
    """(S, H, W) weighted costs over disparity offsets around the current
    depth, shared by DepthToWeak and LocalRefine. With ``rstat`` the whole
    sweep runs batched on the rect engine (engine/weak_rect.py) — ref-side
    sums shared across probes (``stride`` subsamples the probe centers
    there; ignored on the XLA path)."""
    if rstat is not None:
        from . import weak_rect
        return weak_rect.rect_disparity_sweep(data, state, params, rstat,
                                              disps, stride=stride)
    H, W = data.ref_image.shape
    px, py = geo.pixel_grid(H, W)
    offs = strong_offsets(params)
    cache = strong_ref_cache(data, params) if cost_fn is None else None
    n_cam, origin_depth, bl, _cnt = _disparity_setup(data, state)
    f = data.ref_cam.fx
    disp0 = f * bl / jnp.where(origin_depth > 0, origin_depth, 1e30)

    def step(_, p_disp):
        p_depth = f * bl / (disp0 + p_disp)
        cand = geo.plane_from_depth_normal(data.ref_cam, px, py, p_depth, n_cam)
        c, _ = _selected_weighted_cost(data, state, params, cand, offs,
                                       ref_cache=cache, cost_fn=cost_fn)
        in_range = (p_depth >= data.depth_min) & (p_depth <= data.depth_max)
        return None, jnp.where(in_range, jnp.minimum(c, COST_MAX), COST_MAX)

    _, costs = jax.lax.scan(step, None, jnp.asarray(disps, jnp.float32))
    return costs


def depth_to_weak(data: SweepData, state: PMState, params: PatchMatchParams,
                  cost_fn=None, rstat=None) -> jnp.ndarray:
    """Reclassify pixels from the 61-sample disparity cost profile
    (``DepthToWeak``, DPE.cu:2593-2747). Returns new weak map."""
    H, W = data.ref_image.shape
    radius = 30
    disps = np.arange(-radius, radius + 1, dtype=np.float32)
    # At working resolutions the 61-probe sweep is the largest single
    # stage slice; stride-2 probe centers quarter it (labels only — the
    # margin/peak analysis tolerates profile sharing). Tiny test frames
    # keep the exact path; params.classify_stride overrides the auto
    # gate in either direction (round-4 advisor: the production stride-2
    # path needs an opt-out and small-frame test coverage).
    if params.classify_stride is not None and rstat is not None:
        stride = params.classify_stride
    else:
        stride = 2 if (rstat is not None
                       and rstat.hp * rstat.wp >= 384 * 512) else 1
    costs = disparity_sweep(data, state, params, disps, cost_fn,
                            rstat=rstat, stride=stride)       # (61, H, W)

    S = costs.shape[0]
    interior = jnp.zeros((S,), bool).at[2:S - 2].set(True)[:, None, None]
    is_peak = interior & \
        (jnp.roll(costs, 1, 0) > costs) & (jnp.roll(costs, -1, 0) > costs)
    peak_count = jnp.sum(is_peak, axis=0)
    peak_costs = jnp.where(is_peak, costs, BIG)
    # min_peak: lowest peak with cost < 2.0, else index 0 (DPE.cu:2701-2712).
    min_peak = jnp.argmin(peak_costs, axis=0)
    min_cost = jnp.min(peak_costs, axis=0)
    has_min = min_cost < COST_MAX
    min_peak = jnp.where(has_min, min_peak, 0)
    min_cost_eff = jnp.where(has_min, min_cost, 2.0)

    # costs[min_peak] == min_cost when a sub-ceiling peak exists (min_peak is
    # argmin over peak-masked costs); the no-peak fallback reads index 0.
    # Expressed without take_along_axis: XLA TPU serializes small gathers.
    cost_at_minpeak = jnp.where(has_min, min_cost, costs[0])

    # Variance of other peaks around the minimum (DPE.cu:2730-2739).
    others = is_peak & (jnp.arange(S)[:, None, None] != min_peak[None])
    var = jnp.sqrt(jnp.sum(
        jnp.where(others, (costs - min_cost_eff) ** 2, 0.0), axis=0))
    var = var / jnp.maximum(peak_count - 1, 1)

    off_center = jnp.abs(min_peak - radius) > params.weak_peak_radius
    weak_out = jnp.where(
        off_center | (cost_at_minpeak > 0.5),
        WEAK,
        jnp.where(
            peak_count == 1,
            jnp.where(cost_at_minpeak <= 0.15, STRONG, WEAK),
            jnp.where(var > 0.2, STRONG, WEAK),
        ),
    ).astype(jnp.uint8)

    # Invalid pixels -> UNKNOWN (DPE.cu:2604-2652).
    _n_cam, origin_depth, _bl, cnt = _disparity_setup(data, state)
    xg = jnp.arange(W)[None, :].repeat(H, 0)
    yg = jnp.arange(H)[:, None].repeat(W, 1)
    margin = 6
    border = (xg < margin) | (yg < margin) | (xg >= W - margin) | \
        (yg >= H - margin)
    unknown = border | (origin_depth == 0) | (cnt == 0)
    return jnp.where(unknown, jnp.uint8(UNKNOWN), weak_out)


def local_refine(data: SweepData, state: PMState, params: PatchMatchParams,
                 cost_fn=None, rstat=None) -> jnp.ndarray:
    """±5-disparity depth polish; accept on >=0.1 improvement
    (``LocalRefine``, DPE.cu:2749-2835). Returns new depth channel."""
    disps = np.arange(-5, 6, dtype=np.float32)
    costs = disparity_sweep(data, state, params, disps, cost_fn,
                            rstat=rstat)                      # (11, H, W)
    n_cam, origin_depth, bl, cnt = _disparity_setup(data, state)
    f = data.ref_cam.fx
    disp0 = f * bl / jnp.where(origin_depth > 0, origin_depth, 1e30)

    best_idx = jnp.argmin(costs, axis=0)
    min_cost = jnp.min(costs, axis=0)
    best_depth = f * bl / (disp0 + (best_idx.astype(jnp.float32) - 5.0))
    in_range = (best_depth >= data.depth_min) & (best_depth <= data.depth_max)
    best_depth = jnp.where(in_range & (min_cost < 2.0), best_depth, origin_depth)

    cost_now = costs[5]  # disparity 0 == current depth
    # The weight norm needs no cost evaluation: it is the selected-view
    # weight sum (DPE.cu:2784-2794 accumulates it alongside).
    nview = data.num_src
    bits = ((state.selected[None] >> jnp.arange(nview, dtype=jnp.uint32)
             [:, None, None]) & 1) == 1
    wsum = jnp.sum(
        jnp.where(bits, jnp.moveaxis(state.view_weight, -1, 0), 0),
        axis=0).astype(jnp.float32)
    ok = (cost_now - min_cost > 0.1) & (origin_depth != 0) & (wsum > 0) & \
        (cnt > 0)
    return jnp.where(ok, best_depth, origin_depth)
