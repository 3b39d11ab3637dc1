"""Strong-pixel PatchMatch propagation on the rectified cost engine.

The TPU execution path of ``CheckerboardPropagationStrong``
(DPE.cu:1214-1666). Differences from engine/patchmatch.propagate_strong
(the XLA-gather path, kept for CPU tests and parity):

  * every NCC evaluation goes through :mod:`.rectcost` (row-local Pallas
    sampling) and is computed as a full-resolution cost field — the
    rectified frames cannot express the original checkerboard's compacted
    half grid, so one color's update evaluates all pixels and the caller
    masks (2x sample redundancy traded for zero 2-D gathers);
  * candidate *planes* are carried through the probe argmin as statically
    shifted plane fields instead of being fetched with a data-dependent
    gather afterwards — the probe offsets are a compile-time set
    (classic ACMM mode, DPE.cu:1345-1545), so the whole selection is
    shifts + selects on the VPU;
  * small-axis ``take_along_axis`` picks are replaced by one-hot selects
    (XLA TPU lowers little gathers to serial loops).

Edge-bounded candidate mode (use_edge, DPE.cu:1242-1343) additionally
quantizes the per-pixel step length to the nearest of a small static set so
its probes become static shifts too.

Per-field evaluation (one rect_cost_vector per candidate field) is kept
over the batched volume form (rectcost.batched_cost_fields): measured
on-chip in round 4, per-field runs the FIRST_INIT strong iteration at
3x0.73 s vs 3x1.16 s batched at 800x600x6 — the volume machinery's extra
layout passes cost more than the 14x-shared ref sums save at these
shapes. The volume form remains the right structure for the
many-probe stages (classify, weakprep probe volumes).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COST_MAX, GEOM_COST_MAX, PatchMatchParams, PixelState, RunState
from ..geometry import cameras as geo
from ..ops import planes as planegen
from ..ops import sampling, support
from . import patchmatch as pm
from . import rectcost
from .state import PMState, SweepData

WEAK = int(PixelState.WEAK)
BIG = float(1e30)


def _select_k(stack: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """stack (K, H, W, ...) picked at idx (H, W) without gathers."""
    K = stack.shape[0]
    out = stack[0]
    for k in range(1, K):
        m = idx == k
        if stack.ndim > 3:
            m = m[..., None]
        out = jnp.where(m, stack[k], out)
    return out


def classic_candidate_planes(cost_map: jnp.ndarray, plane: jnp.ndarray):
    """Classic ACMM near/far candidate selection with the winning plane
    carried through the argmin as static shifts (no gathers).

    Returns (flags (8, H, W) bool, cand_planes (8, H, W, 4))."""
    H, W = cost_map.shape
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    flags, cands = [], []
    for probes in pm._CLASSIC_PROBES:
        best_c = jnp.full((H, W), BIG)
        best_p = plane
        base_guard = probes[0][2](xg, yg, W, H)
        for dx, dy, guard in probes:
            ok = base_guard & guard(xg, yg, W, H)
            c = jnp.where(ok, sampling.shift(cost_map, dy, dx), BIG)
            better = c < best_c
            best_c = jnp.where(better, c, best_c)
            p_s = jnp.stack([sampling.shift(plane[..., i], dy, dx)
                             for i in range(4)], axis=-1)
            best_p = jnp.where(better[..., None], p_s, best_p)
        flags.append(base_guard)
        cands.append(best_p)
    return jnp.stack(flags), jnp.stack(cands)


# Static step lengths the edge mode quantizes to (reference computes
# step_len = dist/step_num with min 2, even for axis dirs; the realized
# values at working resolutions are tiny integers).
_EDGE_STEP_SET = (2, 4, 6)


def _roll_mask(stack5: jnp.ndarray, pdy, pdx, xg, yg):
    """Shift the (5, H, W) [cost, plane x4] stack by a traced offset: a
    dynamic roll + out-of-bounds mask. One scan body replaces the unrolled
    per-offset static shifts (compile-time killer: ~1.6k bodies)."""
    H, W = stack5.shape[1:]
    rolled = jnp.roll(stack5, (-pdy, -pdx), axis=(1, 2))
    inb = (xg + pdx >= 0) & (xg + pdx < W) & (yg + pdy >= 0) & (yg + pdy < H)
    return rolled, inb


def edge_candidate_planes(cost_map: jnp.ndarray, plane: jnp.ndarray,
                          edge: jnp.ndarray, edge_steps: jnp.ndarray, it):
    """Edge-bounded directional sampling (DPE.cu:1242-1292) with the
    per-pixel step length quantized to ``_EDGE_STEP_SET``. Probes run as a
    ``lax.scan`` over the static offset table — dynamic rolls instead of
    unrolled shifts, so the program stays small (one body per direction).
    Carries winning planes like the classic mode."""
    H, W = cost_map.shape
    max_edge_dist = max(H, W) / 30.0
    min_step = 2
    s_mag = jnp.maximum(1, 5 - 2 * jnp.asarray(it, jnp.int32))
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    stack5 = jnp.concatenate([cost_map[None], jnp.moveaxis(plane, -1, 0)])

    flags, cands = [], []
    for d in range(8):
        dx_u, dy_u = pm._EDGE_DIRS[d]
        steps_t = edge_steps[d]
        invalid = steps_t >= support.INF
        cap = max_edge_dist / (np.sqrt(2.0) if d >= 4 else 1.0)
        dist = jnp.where(invalid | (steps_t > max_edge_dist), cap, steps_t)
        dist = jnp.where(edge, 11.0 * min_step, dist)
        step_num = jnp.clip((dist / min_step).astype(jnp.int32), 11, 22)
        step_len_f = dist / step_num.astype(jnp.float32)
        fx, fy = 0, 0
        if d > 4:
            if d % 2 == 1:
                fx = dx_u
            else:
                fy = dy_u

        slq = jnp.clip(jnp.round(step_len_f), min_step,
                       _EDGE_STEP_SET[-1]).astype(jnp.int32)
        bucket_masks = jnp.stack(
            [(slq >= sl - 1) & (slq <= sl) for sl in _EDGE_STEP_SET])

        # Offset table: (bucket, s_mag realization, step).
        tab = []
        for bi, sl in enumerate(_EDGE_STEP_SET):
            for smag_v in (1, 3, 5):
                for t in range(22):
                    tab.append((smag_v * dx_u + t * sl * dx_u + fx,
                                smag_v * dy_u + t * sl * dy_u + fy,
                                bi, smag_v, t))
        tab = jnp.asarray(np.asarray(tab, np.int32))

        def body(carry, row):
            best_c, best_p = carry
            pdx, pdy, bi, smag_v, t = (row[k] for k in range(5))
            rolled, inb = _roll_mask(stack5, pdy, pdx, xg, yg)
            in_bucket = jnp.where(bi == 0, bucket_masks[0],
                                  jnp.where(bi == 1, bucket_masks[1],
                                            bucket_masks[2]))
            ok = in_bucket & (s_mag == smag_v) & (t < step_num) & inb
            c = jnp.where(ok, rolled[0], BIG)
            better = c < best_c
            best_c = jnp.where(better, c, best_c)
            best_p = jnp.where(better[..., None],
                               jnp.moveaxis(rolled[1:], 0, -1), best_p)
            return (best_c, best_p), None

        (best_c, best_p), _ = jax.lax.scan(
            body, (jnp.full((H, W), BIG), plane), tab)
        flags.append(best_c < BIG)
        cands.append(best_p)
    return jnp.stack(flags), jnp.stack(cands)


def second_pass_candidate_planes(cost_map: jnp.ndarray, plane: jnp.ndarray,
                                 it):
    """Short-range non-local pass (DPE.cu:1293-1343): 11 probes at step 2,
    scanned like :func:`edge_candidate_planes`."""
    H, W = cost_map.shape
    s_mag = jnp.maximum(1, 5 - 2 * jnp.asarray(it, jnp.int32))
    xg = jnp.arange(W, dtype=jnp.int32)[None, :].repeat(H, 0)
    yg = jnp.arange(H, dtype=jnp.int32)[:, None].repeat(W, 1)
    stack5 = jnp.concatenate([cost_map[None], jnp.moveaxis(plane, -1, 0)])

    flags, cands = [], []
    for d in range(8):
        dx_u, dy_u = pm._EDGE_DIRS[d]
        fx, fy = 0, 0
        if d > 4:
            if d % 2 == 1:
                fx = dx_u
            else:
                fy = dy_u
        tab = []
        for smag_v in (1, 3, 5):
            for t in range(11):
                tab.append((smag_v * dx_u + t * 2 * dx_u + fx,
                            smag_v * dy_u + t * 2 * dy_u + fy, smag_v))
        tab = jnp.asarray(np.asarray(tab, np.int32))

        def body(carry, row):
            best_c, best_p = carry
            pdx, pdy, smag_v = row[0], row[1], row[2]
            rolled, inb = _roll_mask(stack5, pdy, pdx, xg, yg)
            ok = (s_mag == smag_v) & inb
            c = jnp.where(ok, rolled[0], BIG)
            better = c < best_c
            best_c = jnp.where(better, c, best_c)
            best_p = jnp.where(better[..., None],
                               jnp.moveaxis(rolled[1:], 0, -1), best_p)
            return (best_c, best_p), None

        (best_c, best_p), _ = jax.lax.scan(
            body, (jnp.full((H, W), BIG), plane), tab)
        flags.append(best_c < BIG)
        cands.append(best_p)
    return jnp.stack(flags), jnp.stack(cands)


def screen_stride(params: PatchMatchParams, rstat) -> int:
    """Stride of the candidate-SCREENING cost evaluations (strong
    propagation): candidates are scored on the rect frame's stride-subgrid
    (full-res window texture, subsampled centers) and the winner re-scored
    exactly. Auto gate mirrors the classify stride (working resolutions
    only); ``params.propagate_stride`` overrides in either direction.

    Measured ON-CHIP at 800x600x6 (round 5): stride-2 screening is only a
    win WITH the strided EvalCache (strong 1.83 -> 0.96 s/iter); without
    it, per-eval lane-strided subsamples cost more in relayouts than the
    4x gather reduction saves (2.76 s/iter — make_cost_fn builds the
    cache for every strided screen)."""
    if params.propagate_stride is not None and rstat is not None:
        return params.propagate_stride
    return 2 if (rstat is not None
                 and rstat.hp * rstat.wp >= 384 * 512) else 1


def make_cost_fn(data: SweepData, params: PatchMatchParams, rstat,
                 interpret=None, stride: int = 1):
    """plane field (H, W, 4) -> (V, H, W) costs (NCC + geom when enabled),
    through the rectified engine. Builds the view-stacked operands and the
    candidate-independent EvalCache ONCE per trace, so every evaluation
    only pays the source-side gathers + accumulation (round-5: the ref-side
    window weights were ~105M exps per evaluation at 800x600x6, recomputed
    ~44x per strong iteration)."""
    offs = pm.strong_offsets(params)
    stack = rectcost.build_rect_stack(data.rect, rstat)
    # EvalCache only for STRIDED screening: at stride 1 the cached
    # w/wr fields cost more HBM reads per evaluation than the exp/shift
    # recompute they replace (measured on-chip round 5: strong 1.96 vs
    # 1.83 s/iter with a full-res cache). At stride 2 the cached fields
    # are 4x smaller AND pre-subsampled — which removes the per-eval
    # strided-relayout poison that sank plain strided screening.
    cache = (rectcost.build_eval_cache(stack, params, offs, stride=stride,
                                       geom=params.geom_consistency)
             if stride > 1 else None)

    def cost_fn(plane):
        return rectcost.rect_cost_vector_stacked(
            stack, plane, data.view_valid, params, offs,
            geom=params.geom_consistency, interpret=interpret,
            stride=stride, cache=cache)

    return cost_fn


def initialize_rect(data: SweepData, state: PMState,
                    params: PatchMatchParams, rstat) -> PMState:
    """``RandomInitialization`` (DPE.cu:1035-1063) on the rect engine."""
    H, W = data.ref_image.shape
    px, py = geo.pixel_grid(H, W)
    cost_fn = make_cost_fn(data, params, rstat)
    key, sub = jax.random.split(state.key)

    if params.state == RunState.FIRST_INIT:
        plane = planegen.random_plane(sub, data.ref_cam, px, py,
                                      data.depth_min, data.depth_max)
        costs = cost_fn(plane)
        v = costs.shape[0]
        num_valid = jnp.sum(costs < COST_MAX, axis=0)
        top_k = jnp.minimum(num_valid, params.top_k)
        sorted_c = jnp.sort(costs, axis=0)
        ks = jnp.clip(top_k - 1, 0, v - 1)
        kth = _select_k(sorted_c, ks)
        mask_steps = jnp.arange(v)[:, None, None] < top_k[None]
        mean_cost = jnp.sum(jnp.where(mask_steps, sorted_c, 0.0), axis=0) / \
            jnp.maximum(top_k, 1)
        cost = jnp.where(top_k > 0, mean_cost, COST_MAX)
        sel_bits = (costs <= kth[None]) & (top_k[None] > 0)
        selected = jnp.sum(
            sel_bits.astype(jnp.uint32)
            << jnp.arange(v, dtype=jnp.uint32)[:, None, None], axis=0)
        return state._replace(plane=plane, cost=cost, selected=selected,
                              key=key)

    n_world = state.plane[..., :3]
    depth = state.plane[..., 3]
    n_cam = geo.normal_world_to_cam(data.ref_cam, n_world)
    plane = geo.plane_from_depth_normal(data.ref_cam, px, py, depth, n_cam)
    costs = cost_fn(plane)
    v = costs.shape[0]
    bit = (state.selected[None]
           >> jnp.arange(v, dtype=jnp.uint32)[:, None, None]) & 1
    use = (bit == 1) & (costs < COST_MAX)
    cnt = jnp.sum(use, axis=0)
    cost = jnp.where(cnt > 0, jnp.sum(jnp.where(use, costs, 0.0), axis=0)
                     / jnp.maximum(cnt, 1), COST_MAX)
    keep = ~((bit == 1) & (costs >= COST_MAX))
    selected = jnp.sum(
        ((bit == 1) & keep).astype(jnp.uint32)
        << jnp.arange(v, dtype=jnp.uint32)[:, None, None], axis=0)
    return state._replace(plane=plane, cost=cost, selected=selected, key=key)


def refine_strong_rect(key, data: SweepData, params: PatchMatchParams,
                       cost_fn, plane, depth, cost, view_weight,
                       weight_norm, cost_fn_s=None):
    """``PlaneHypothesisRefinementStrong`` (DPE.cu:1065-1118), full-res.

    With ``cost_fn_s`` (strided screening), the 5 perturbation combos are
    scored on the stride-subgrid and only the per-pixel winner is
    re-scored exactly for the acceptance test — the combos are fixed at
    entry, so the exact sequential scan reduces to an argmin anyway."""
    px, py = geo.pixel_grid(*data.ref_image.shape)
    depths, normals = pm.refine_combos(key, data, plane, depth, px, py)
    wsum = jnp.maximum(weight_norm, 1e-30)

    if cost_fn_s is not None:
        def screen(carry, xs):
            best_c, best_d, best_n = carry
            d_i, n_i = xs
            cand = geo.plane_from_depth_normal(data.ref_cam, px, py, d_i,
                                               n_i)
            c = jnp.sum(view_weight * cost_fn_s(cand), axis=0) / wsum
            d_chk = geo.depth_from_plane(data.ref_cam, cand, px, py)
            ok = (d_chk >= data.depth_min) & (d_chk <= data.depth_max) & \
                (c < best_c)
            best_c = jnp.where(ok, c, best_c)
            best_d = jnp.where(ok, d_i, best_d)
            best_n = jnp.where(ok[..., None], n_i, best_n)
            return (best_c, best_d, best_n), None

        (s_c, s_d, s_n), _ = jax.lax.scan(
            screen, (jnp.full(cost.shape, BIG), depth, plane[..., :3]),
            (depths, normals))
        cand = geo.plane_from_depth_normal(data.ref_cam, px, py, s_d, s_n)
        c = jnp.sum(view_weight * cost_fn(cand), axis=0) / wsum
        d_chk = geo.depth_from_plane(data.ref_cam, cand, px, py)
        ok = (s_c < BIG) & (d_chk >= data.depth_min) & \
            (d_chk <= data.depth_max) & (c < cost) & (weight_norm > 0)
        plane = jnp.where(ok[..., None], cand, plane)
        depth = jnp.where(ok, d_chk, depth)
        cost = jnp.where(ok, c, cost)
        return plane, depth, cost

    def body(carry, xs):
        plane, depth, cost = carry
        d_i, n_i = xs
        cand = geo.plane_from_depth_normal(data.ref_cam, px, py, d_i, n_i)
        costs = cost_fn(cand)
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


def propagate_strong_rect(key, data: SweepData, sup, state: PMState,
                          params: PatchMatchParams, it, color, rstat,
                          cost_now_vec=None):
    """One color's strong-pixel proposal, full resolution. Returns
    (plane, cost, selected, view_weight (V,H,W)) full-res fields; the caller
    masks to the color's sites and non-weak pixels. ``cost_now_vec`` lets
    the caller share the (V, H, W) current-plane cost evaluation across
    both colors (see stages._strong_iter)."""
    H, W = data.ref_image.shape
    nview = data.num_src
    k_sel, k_ref = jax.random.split(key)
    cost_fn = make_cost_fn(data, params, rstat)
    # Candidate SCREENING runs at screen_stride (subsampled centers, exact
    # window texture); the winning candidate is re-scored with cost_fn
    # below, so only the argmin/view-selection heuristics see the
    # approximation (classify's stride-2 measured 96% argmin agreement).
    stride = screen_stride(params, rstat)
    cost_fn_s = (make_cost_fn(data, params, rstat, stride=stride)
                 if stride > 1 else cost_fn)

    plane_now = state.plane
    selected_now = state.selected

    if params.use_edge:
        flags, cand_planes = edge_candidate_planes(
            state.cost, state.plane, data.edge, sup.edge_steps, it)
    else:
        flags, cand_planes = classic_candidate_planes(state.cost, state.plane)

    # Above 4 MP the two (8, V, H, W) f32 screening volumes are ~2.5 GB of
    # the strong-iter footprint; store them bf16 — they only feed the
    # candidate argmin and view-selection counts, and the winner is
    # re-scored exactly below (stride > 1 always holds at such sizes).
    cdt = jnp.bfloat16 if H * W > 4_000_000 else jnp.float32
    cost_array = jax.lax.map(lambda p: cost_fn_s(p).astype(cdt),
                             cand_planes)                   # (8, V, H, W)
    cost_array = jnp.where(flags[:, None], cost_array, jnp.asarray(0.0, cdt))

    if params.use_edge:
        itf = jnp.asarray(it, jnp.float32)
        good_thr = 0.8 * jnp.exp(itf * itf / -90.0)
        f2, p2 = second_pass_candidate_planes(state.cost, state.plane, it)
        c2 = jax.lax.map(lambda p: cost_fn_s(p).astype(cdt), p2)
        good1 = jnp.sum(cost_array < good_thr, axis=1)
        bad1 = jnp.sum(cost_array > 1.2, axis=1)
        c2m = jnp.where(f2[:, None], c2, COST_MAX)
        good2 = jnp.sum(c2m < good_thr, axis=1)
        bad2 = jnp.sum(c2m > 1.2, axis=1)
        replace = f2 & (~data.edge)[None] & (
            (~flags) | (good2 > good1) | ((good2 == good1) & (bad2 < bad1)))
        cost_array = jnp.where(replace[:, None], c2, cost_array)
        cand_planes = jnp.where(replace[..., None], p2, cand_planes)
        flags = flags | (f2 & (~data.edge)[None])

    prior = pm.neighbour_prior(state.selected, flags, nview)
    view_weight, temp_selected, weight_norm = pm.view_selection(
        k_sel, cost_array, prior, data.view_valid, it)
    wsum = jnp.maximum(weight_norm, 1e-30)

    final_costs = jnp.sum(view_weight[None] * cost_array, axis=1) / wsum[None]
    min_idx = jnp.argmin(final_costs, axis=0)
    min_flag = _select_k(flags, min_idx)
    min_cost = _select_k(final_costs, min_idx)
    min_plane = _select_k(cand_planes, min_idx)
    if stride > 1:
        # Re-score the winning candidate exactly so the accept test and the
        # stored cost never carry the screening approximation.
        min_cost = jnp.sum(view_weight * cost_fn(min_plane), axis=0) / wsum

    if cost_now_vec is None:
        cost_now_vec = cost_fn(plane_now)
    cost_now = jnp.sum(view_weight * cost_now_vec, axis=0) / wsum
    cost_now = jnp.where(weight_norm > 0, cost_now, COST_MAX)
    stored_cost = cost_now

    px, py = geo.pixel_grid(H, W)
    depth_now = geo.depth_from_plane(data.ref_cam, plane_now, px, py)
    depth_before = geo.depth_from_plane(data.ref_cam, min_plane, px, py)
    accept = min_flag & (depth_before >= data.depth_min) & \
        (depth_before <= data.depth_max) & (min_cost < cost_now)

    plane = jnp.where(accept[..., None], min_plane, plane_now)
    depth = jnp.where(accept, depth_before, depth_now)
    cost = jnp.where(accept, min_cost, cost_now)
    selected = jnp.where(accept, temp_selected, selected_now)

    plane, depth, cost = refine_strong_rect(
        k_ref, data, params, cost_fn, plane, depth, cost, view_weight,
        weight_norm, cost_fn_s=cost_fn_s if stride > 1 else None)

    if params.state == RunState.REFINE_INIT:
        accept_final = cost < stored_cost - 0.1
        plane = jnp.where(accept_final[..., None], plane, plane_now)
        cost = jnp.where(accept_final, cost, stored_cost)

    return plane, cost, selected, view_weight


def apply_strong_full(state: PMState, mask, color, plane, cost, selected,
                      view_weight) -> PMState:
    """Write one color's full-res proposal back into state (masked to the
    color's checkerboard sites and ``mask``)."""
    H, W = state.cost.shape
    from ..engine.sweep import checkerboard_mask
    m = checkerboard_mask(H, W, color) & mask
    return state._replace(
        plane=jnp.where(m[..., None], plane, state.plane),
        cost=jnp.where(m, cost, state.cost),
        selected=jnp.where(m, selected, state.selected),
        view_weight=jnp.where(m[..., None],
                              jnp.moveaxis(view_weight, 0, -1),
                              state.view_weight),
    )
