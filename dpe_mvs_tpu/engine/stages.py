"""Staged sweep executor: ``run_sweep`` split into separately-jitted stages.

The monolithic one-jit sweep (engine/sweep.py) traces the reference's whole
15-kernel pipeline (DPE.cu:3126-3249) into a single XLA module. That is the
fastest dispatch path once compiled, but the compile unit grows with the
stage count and the remote TPU compile service handles many small modules far
better than one huge one; a single module also gives no fault isolation when
one stage miscompiles or faults on device.

This module runs the *same* computation as ``run_sweep`` — bit-identical,
asserted by tests/test_stages.py — as a handful of separately-jitted stages:

  support -> init -> [strong-iter -> weak-iter] x N -> finish -> classify
  -> refine

The iteration index ``it`` and all PRNG keys enter as device values, so one
compiled strong-iter executable serves every iteration of every sweep with
the same (shape, params) signature. Stages do NOT donate their inputs — see
the note above the jit definitions (donation ran ~10x slower on the axon
backend).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import PatchMatchParams, PixelState
from ..ops import checker
from . import patchmatch as pm
from . import strong_rect
from . import sweep as sweep_mod
from .state import PMState, SweepData

WEAK = int(PixelState.WEAK)


def _hard_sync(out) -> None:
    """Force completion with a host readback.

    On the axon remote backend ``jax.block_until_ready`` returns before the
    device work is done, so stage timings must round-trip a value to the
    host. A scalar sum of one float leaf keeps the readback tiny."""
    import numpy as np

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            np.asarray(jax.device_get(jnp.sum(leaf)))
            return
    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


# ---------------------------------------------------------------------------
# Stage bodies (pure functions of (data, [sup,] state, ...); params static)
# ---------------------------------------------------------------------------

def _support_stage(data: SweepData, state: PMState, key,
                   params: PatchMatchParams):
    return sweep_mod.build_support(data, state, params, key)


def _init_stage(data: SweepData, state: PMState, params: PatchMatchParams,
                rstat=None):
    if rstat is not None:
        return strong_rect.initialize_rect(data, state, params, rstat)
    return pm.initialize(data, state, params)


def _strong_iter(data: SweepData, sup: pm.Support, state: PMState,
                 it, key_it, params: PatchMatchParams, rstat=None):
    """One propagation iteration over strong pixels, both checkerboard
    colors (matches the strong_color scan of run_sweep)."""

    if rstat is not None:
        # cost_now of the CURRENT plane is shared by both colors: the cost
        # at a pixel depends only on that pixel's plane, and color 0's
        # write-back touches only color-0 sites, so color 1 consumes the
        # same values at its own sites (one full cost evaluation saved per
        # color; ~1 px of nearest-warp transport error at site boundaries,
        # within the transport tolerance documented in docs/DESIGN.md).
        cost_fn = strong_rect.make_cost_fn(data, params, rstat)
        cnv = cost_fn(state.plane)

        def strong_color_rect(state, color):
            out = strong_rect.propagate_strong_rect(
                jax.random.fold_in(key_it, color), data, sup, state,
                params, it, color, rstat, cost_now_vec=cnv)
            return strong_rect.apply_strong_full(
                state, state.weak != WEAK, color, *out), None

        state, _ = jax.lax.scan(strong_color_rect, state, jnp.arange(2))
        return state

    def strong_color(state, color):
        out = pm.propagate_strong(
            jax.random.fold_in(key_it, color), data, sup, state, params,
            it, color)
        return sweep_mod.apply_compacted(
            state, state.weak != WEAK, color, *out), None

    state, _ = jax.lax.scan(strong_color, state, jnp.arange(2))
    return state


def _weakprep_stage(data: SweepData, sup, state: PMState,
                    params: PatchMatchParams, rstat):
    """Per-sweep probe volumes + anchor profiles for the rect weak path
    (engine/weak_rect.py); runs once after init."""
    from . import weak_rect
    return weak_rect.build_weak_bundle(data, sup, state, params, rstat)


def _weak_iter(data: SweepData, sup: pm.Support, state: PMState,
               it, key_it, params: PatchMatchParams, rstat=None,
               bundle=None):
    """Fit-plane RANSAC + weak propagation for both colors (matches the
    use_APD branch of run_sweep's iteration body)."""
    from ..ops import weak as weak_ops

    sup_it = sup._replace(**weak_ops.fit_plane_ransac(
        jax.random.fold_in(key_it, 2), data, sup, state, params))

    if rstat is not None:
        from . import weak_rect

        def weak_color_rect(state, color):
            out = weak_rect.propagate_weak_rect(
                jax.random.fold_in(key_it, 3 + color), data, sup_it,
                state, params, it, color, rstat, bundle)
            return sweep_mod.apply_compacted(
                state, state.weak == WEAK, color, *out), None

        state, _ = jax.lax.scan(weak_color_rect, state, jnp.arange(2))
        return state

    def weak_color(state, color):
        out = weak_ops.propagate_weak(
            jax.random.fold_in(key_it, 3 + color), data, sup_it,
            state, params, it, color)
        return sweep_mod.apply_compacted(
            state, state.weak == WEAK, color, *out), None

    state, _ = jax.lax.scan(weak_color, state, jnp.arange(2))
    return state


def _finish_stage(data: SweepData, state: PMState, params: PatchMatchParams):
    """Plane -> world frame + red/black strong median filter
    (DPE.cu:3214-3220)."""
    H, W = data.ref_image.shape
    state = state._replace(plane=pm.to_world_depth(data, state.plane))
    for color in (0, 1):
        new_depth = pm.median_filter_depth(data, state.plane, state.cost,
                                           state.weak)
        mask = sweep_mod.checkerboard_mask(H, W, color) & (state.weak != WEAK)
        state = state._replace(
            plane=state.plane.at[..., 3].set(
                jnp.where(mask, new_depth, state.plane[..., 3])))
    return state


def _classify_stage(data: SweepData, state: PMState,
                    params: PatchMatchParams, rstat=None):
    """DepthToWeak reclassification (DPE.cu:3222)."""
    return state._replace(weak=pm.depth_to_weak(data, state, params,
                                                rstat=rstat))


def _refine_stage(data: SweepData, state: PMState, params: PatchMatchParams,
                  rstat=None):
    """LocalRefine depth polish (DPE.cu:3225)."""
    new_depth = pm.local_refine(data, state, params, rstat=rstat)
    return state._replace(plane=state.plane.at[..., 3].set(new_depth))


# ---------------------------------------------------------------------------
# Jitted entry points. jax.jit caches per (shape signature, params), so these
# module-level wrappers are the executable cache.
# ---------------------------------------------------------------------------

# NO donate_argnums on any stage: donating the state input made the axon
# backend run the SAME executables ~10x slower (round-4 ablation: the weak
# iter is 0.99 s as a clean jit vs 12.5 s as the donating _weak_j; support
# 2.35 s vs 26.5 s). The donation saved one ~100 MB state copy per stage —
# negligible next to that. (It also implicates donation in the
# order-dependent XLA:CPU compile abort at test_pipeline_rect_engine.)
_support_j = jax.jit(_support_stage, static_argnames=("params",))
_init_j = jax.jit(_init_stage, static_argnames=("params", "rstat"))
_weakprep_j = jax.jit(_weakprep_stage, static_argnames=("params", "rstat"))
_strong_j = jax.jit(_strong_iter, static_argnames=("params", "rstat"))
_weak_j = jax.jit(_weak_iter, static_argnames=("params", "rstat"))
_finish_j = jax.jit(_finish_stage, static_argnames=("params",))
_classify_j = jax.jit(_classify_stage, static_argnames=("params", "rstat"))
_refine_j = jax.jit(_refine_stage, static_argnames=("params", "rstat"))

STAGES = {
    "support": _support_j,
    "init": _init_j,
    "weakprep": _weakprep_j,
    "strong": _strong_j,
    "weak": _weak_j,
    "finish": _finish_j,
    "classify": _classify_j,
    "refine": _refine_j,
}


def run_sweep_traced(data: SweepData, state: PMState,
                     params: PatchMatchParams, rstat=None) -> PMState:
    """The full sweep as ONE traceable function — the sharded executor
    (parallel/mesh.py) maps this under shard_map, where separately-jitted
    stages cannot be dispatched. Same computation and key schedule as
    :func:`run_sweep_staged`."""
    keys = jax.random.split(state.key, 32)

    if rstat is not None and getattr(rstat, "stacked", False) and \
            params.geom_consistency and data.src_depths is not None:
        # Device-resident exchanged depths -> rect frames, inside the jit.
        from . import rectcost
        data = data._replace(rect=rectcost.rectify_src_depths(
            data.rect, rstat, data.src_depths))

    sup = pm.Support(*([None] * len(pm.Support._fields)))
    if params.use_APD or params.use_edge:
        sup, state = _support_stage(data, state, keys[0], params)

    state = _init_stage(data, state, params, rstat)

    bundle = None
    if params.use_APD and rstat is not None:
        bundle = _weakprep_stage(data, sup, state, params, rstat)

    base_key = keys[1]
    for it in range(params.max_iterations):
        it_dev = jnp.int32(it)
        key_it = jax.random.fold_in(base_key, it_dev)
        state = _strong_iter(data, sup, state, it_dev, key_it, params, rstat)
        if params.use_APD:
            state = _weak_iter(data, sup, state, it_dev, key_it, params,
                               rstat, bundle)

    state = _finish_stage(data, state, params)
    state = _classify_stage(data, state, params, rstat)
    state = _refine_stage(data, state, params, rstat)
    return state._replace(key=keys[-1])


def run_sweep_staged(
    data: SweepData,
    state: PMState,
    params: PatchMatchParams,
    *,
    rstat=None,
    timer=None,
    block: bool = False,
    skip=frozenset(),
) -> PMState:
    """One full PatchMatch sweep as a sequence of jitted stage dispatches.

    Computes exactly what :func:`..engine.sweep.run_sweep` computes (same key
    schedule, same stage order); ``timer`` is an optional
    :class:`..utils.profiling.StageTimer` — when given, each stage is timed
    with a device sync (``block`` is then implied per stage).
    """
    # Key schedule identical to run_sweep: keys[0] -> support, keys[1] ->
    # iteration base, keys[-1] -> next sweep's key.
    keys = jax.random.split(state.key, 32)

    def timed(name, fn, *args):
        if name in skip:  # probe-only escape hatch (tools/tpu_probe.py):
            # identity on the state operand (strong/weak take it 3rd).
            if name == "support":
                return sup, args[1]
            return args[2] if name in ("strong", "weak") else args[1]
        if timer is None:
            return fn(*args)
        with timer.span(name):
            out = fn(*args)
            _hard_sync(out)
        return out

    sup = pm.Support(*([None] * len(pm.Support._fields)))
    if params.use_APD or params.use_edge:
        # jit_pieces: the support pieces dispatch as separate executables —
        # one fused module runs ~8x slower on TPU (see sweep._PIECE_JITS).
        sup, state = timed(
            "support",
            lambda d, s, k, p: sweep_mod.build_support(d, s, p, k,
                                                       jit_pieces=True),
            data, state, keys[0], params)

    state = timed("init", _init_j, data, state, params, rstat)

    bundle = None
    if params.use_APD and rstat is not None and "weak" not in skip:
        bundle = timed("weakprep", _weakprep_j, data, sup, state, params,
                       rstat)

    base_key = keys[1]
    for it in range(params.max_iterations):
        it_dev = jnp.int32(it)
        key_it = jax.random.fold_in(base_key, it_dev)
        state = timed("strong", _strong_j, data, sup, state, it_dev, key_it,
                      params, rstat)
        if params.use_APD:
            state = timed("weak", _weak_j, data, sup, state, it_dev, key_it,
                          params, rstat, bundle)

    state = timed("finish", _finish_j, data, state, params)
    state = timed("classify", _classify_j, data, state, params, rstat)
    state = timed("refine", _refine_j, data, state, params, rstat)
    state = state._replace(key=keys[-1])
    if block:
        jax.block_until_ready(state.plane)
    return state
