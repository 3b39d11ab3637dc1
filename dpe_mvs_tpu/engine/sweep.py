"""Sweep composition: ``RunPatchMatch`` as one jitted program.

Stage order mirrors DPE.cu:3126-3249:
  support precompute -> [anchors for weak px] -> init -> 3x (strong black/red
  [-> fit-plane RANSAC -> weak black/red]) -> depth+normal -> median filter
  (black/red) -> DepthToWeak -> LocalRefine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PatchMatchParams, PixelState
from ..ops import checker
from ..ops import support as sup_ops
from . import patchmatch as pm
from .state import PMState, SweepData

WEAK = int(PixelState.WEAK)
STRONG = int(PixelState.STRONG)
UNKNOWN = int(PixelState.UNKNOWN)


def checkerboard_mask(H: int, W: int, color: int) -> jnp.ndarray:
    """color 0 == 'black' ((x + y) even), 1 == 'red' (DPE.cu:1864-1938)."""
    yg = jnp.arange(H)[:, None]
    xg = jnp.arange(W)[None, :]
    return ((xg + yg) % 2) == color


# Separately-jitted support pieces (used when jit_pieces=True): fusing the
# whole of build_support into ONE XLA module runs ~8x slower on TPU than
# the pieces as separate executables (round-4 weak_probe: fused 52 s vs
# 6 s summed at 800x600x6) — the compiler rematerializes the big ray/pool
# intermediates across the RANSAC scan when everything is one computation.
_PIECE_JITS: dict = {}


def _pjit(fn, static=()):
    j = _PIECE_JITS.get((fn, tuple(static)))
    if j is None:
        j = jax.jit(fn, static_argnames=tuple(static))
        _PIECE_JITS[(fn, tuple(static))] = j
    return j


def build_support(data: SweepData, state: PMState, params: PatchMatchParams,
                  key, jit_pieces: bool = False) -> pm.Support:
    """Per-sweep support maps (GenEdgeInform / FindNearestStrongPoint /
    GenNeighbours equivalents). ``jit_pieces`` dispatches each piece as its
    own jitted executable (single-chip staged executor; see _PIECE_JITS) —
    inside an outer trace (run_sweep_traced / shard_map) it must stay
    False."""
    H, W = data.ref_image.shape
    max_steps = 1 << int(np.ceil(np.log2(max(H, W))))

    def run(fn, *args, static=()):
        if jit_pieces:
            return _pjit(fn, static)(*args)
        return fn(*args)

    # Support maps are built only for their actual consumers (the reference
    # similarly gates GenEdgeInform/GenNeighbours on use_edge/use_APD,
    # DPE.cu:3153-3171): edge_steps feeds edge_candidates (use_edge) and the
    # anchor search; label_runs/los feed only the anchor search (use_APD).
    edge_steps = None
    complexity = None
    label_runs = None
    los = None
    if params.use_edge or (params.use_APD and params.use_limit):
        edge_steps = run(sup_ops.edge_steps, data.edge, max_steps,
                         static=("max_steps",))
    if params.use_edge:
        complexity = run(sup_ops.complexity_map, data.edge, data.label,
                         params.strong_radius, params.use_label,
                         static=("radius", "use_label"))
    if params.use_APD and params.use_label:
        label_runs = run(sup_ops.label_run_length, data.label, max_steps,
                         static=("max_steps",))
    if params.use_APD and params.use_limit:
        los = sup_ops.build_line_of_sight(
            data.edge_low, W, H, params.high_res_img) if not jit_pieces \
            else _pjit(sup_ops.build_line_of_sight,
                       ("full_w", "full_h", "high_res_img"))(
                data.edge_low, full_w=W, full_h=H,
                high_res_img=params.high_res_img)

    nearest_strong = None
    neighbours = None
    radius = None
    if params.use_APD:
        from ..ops import anchors
        strong_mask = state.weak == STRONG
        ns_coords, _ns_valid = run(sup_ops.jfa_nearest, strong_mask, 100.0)
        nearest_strong = ns_coords

        def gn(key, data, state, edge_steps, complexity, label_runs, los,
               nearest_strong):
            return anchors.gen_neighbours(
                key, data, state, params,
                edge_steps=edge_steps, complexity=complexity,
                label_runs=label_runs, los=los,
                nearest_strong=nearest_strong)

        if jit_pieces:
            j = _PIECE_JITS.get(("gen_neighbours", params))
            if j is None:
                j = jax.jit(gn)
                _PIECE_JITS[("gen_neighbours", params)] = j
            gn_fn = j
        else:
            gn_fn = gn
        neighbours, reliable, weak2, complexity = gn_fn(
            key, data, state, edge_steps, complexity, label_runs, los,
            ns_coords)
        state = state._replace(weak=weak2)
    return pm.Support(
        edge_steps=edge_steps, complexity=complexity, label_runs=label_runs,
        los=los, nearest_strong=nearest_strong, neighbours=neighbours,
        radius=radius, fit_plane=None,
    ), state


def apply_compacted(state, mask, color, plane_c, cost_c, selected_c,
                    view_weight_c):
    """Scatter one color's compacted proposal back into full-res state;
    ``mask`` (full-res) further restricts to the strong/weak population
    (non-site pixels are untouched by construction of scatter)."""
    plane_n = checker.scatter(state.plane, plane_c, color)
    cost_n = checker.scatter(state.cost, cost_c, color)
    sel_n = checker.scatter(state.selected, selected_c, color)
    vw_n = checker.scatter(
        state.view_weight, jnp.moveaxis(view_weight_c, 0, -1), color)
    return state._replace(
        plane=jnp.where(mask[..., None], plane_n, state.plane),
        cost=jnp.where(mask, cost_n, state.cost),
        selected=jnp.where(mask, sel_n, state.selected),
        view_weight=jnp.where(mask[..., None], vw_n, state.view_weight),
    )


def run_sweep(data: SweepData, state: PMState, params: PatchMatchParams
              ) -> PMState:
    """One full PatchMatch sweep (state -> state). ``params`` must be static
    under jit."""
    H, W = data.ref_image.shape
    key = state.key
    keys = jax.random.split(key, 32)
    kidx = iter(range(32))
    nk = lambda: keys[next(kidx)]

    sup, state = build_support(data, state, params, nk())

    state = pm.initialize(data, state, params)

    base_key = nk()

    def iteration_body(state, it):
        key_it = jax.random.fold_in(base_key, it)

        # Strong pixels: black then red (DPE.cu:3199-3202).
        def strong_color(state, color):
            out = pm.propagate_strong(
                jax.random.fold_in(key_it, color), data, sup, state, params,
                it, color)
            return apply_compacted(state, state.weak != WEAK, color, *out), None

        state, _ = jax.lax.scan(strong_color, state, jnp.arange(2))

        if params.use_APD:
            from ..ops import weak as weak_ops
            sup_it = sup._replace(**weak_ops.fit_plane_ransac(
                jax.random.fold_in(key_it, 2), data, sup, state, params))

            def weak_color(state, color):
                out = weak_ops.propagate_weak(
                    jax.random.fold_in(key_it, 3 + color), data, sup_it,
                    state, params, it, color)
                return apply_compacted(
                    state, state.weak == WEAK, color, *out), None

            state, _ = jax.lax.scan(weak_color, state, jnp.arange(2))
        return state, None

    state, _ = jax.lax.scan(iteration_body, state,
                            jnp.arange(params.max_iterations))

    # Plane -> (world normal, depth) (DPE.cu:3214).
    state = state._replace(plane=pm.to_world_depth(data, state.plane))

    # Median filter, red/black, non-weak pixels only (DPE.cu:3217-3220).
    for color in (0, 1):
        new_depth = pm.median_filter_depth(data, state.plane, state.cost,
                                           state.weak)
        mask = checkerboard_mask(H, W, color) & (state.weak != WEAK)
        state = state._replace(
            plane=state.plane.at[..., 3].set(
                jnp.where(mask, new_depth, state.plane[..., 3])))

    # Reclassify + polish (DPE.cu:3222-3226).
    state = state._replace(weak=pm.depth_to_weak(data, state, params))
    new_depth = pm.local_refine(data, state, params)
    state = state._replace(
        plane=state.plane.at[..., 3].set(new_depth),
        key=keys[-1],
    )
    return state


run_sweep_jit = jax.jit(run_sweep, static_argnames=("params",))
