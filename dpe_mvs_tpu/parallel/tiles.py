"""Tile-level sharding with halo exchange (SURVEY §2.3 #3).

View-data parallelism (parallel/mesh.py) scales the PROBLEM LIST; this
module scales a SINGLE problem: the image's rows are banded over a mesh
axis, each device sweeps its band, and the propagation stencil's
cross-band reads are satisfied by a halo that is refreshed with
``jax.lax.ppermute`` ring shifts after every propagation iteration — the
TPU-native equivalent of splitting one depth map across chips when it
exceeds per-chip memory (the reference has no analogue; it is single-GPU,
main.cpp:478).

Design (why bands, why this halo):

  * The engine's expensive transients (gather-index tensors, probe
    volumes, NCC accumulators) all scale with the rect-frame pixel count,
    and epipolar rectification makes every data-dependent read ROW-local —
    so banding rows shards every transient with no intra-evaluation
    communication at all.
  * The only cross-band dataflow is the checkerboard propagation stencil
    reading neighbour state: classic ACMM candidates reach <= ~23 rows and
    edge-bounded candidates <= ~45 (11-22 steps x min step 2,
    DPE.cu:1242-1344); one strong iteration updates both colors, so a
    halo of HALO >= 2x reach rows keeps every in-band candidate read
    exact between refreshes.
  * Each band is built host-side as a cropped sub-problem (cameras with
    the principal point shifted by the band origin), so the whole existing
    rect engine runs unchanged per band. Rectification is row-preserving,
    which is what makes cropped-pair costs match full-frame costs away
    from the crop borders; the residual difference (each band's rect
    frame is fitted to its own crop) is statistical, bounded in
    tests/test_tiles.py against the unsharded sweep.

Scope: the photometric strong path (FIRST_INIT / REFINE_INIT). The weak
machinery's anchor search reaches up to MAX_SEARCH_RADIUS=4096 px
(main.h:42) — anchors beyond the halo cannot be represented in a band
decomposition; APD passes therefore stay on the view-parallel axis
(documented limitation, not silently approximated: tile_sharded_sweep
rejects use_APD params).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PatchMatchParams
from ..engine import rectcost
from ..engine import state as st_mod
from ..engine.state import PMState, SweepData
from ..io.scene import ProblemInputs

HALO = 64   # rows; >= 2x the edge-mode candidate reach of ~45/2 per color


def _crop_rows(arr: np.ndarray, o: int, rows: int) -> np.ndarray:
    """Rows [o, o+rows) with edge replication outside the image."""
    H = arr.shape[-2] if arr.ndim >= 2 else arr.shape[0]
    idx = np.clip(np.arange(o, o + rows), 0, H - 1)
    return np.take(arr, idx, axis=arr.ndim - 2)


def build_tile_inputs(inputs: ProblemInputs, n_tiles: int,
                      halo: int = HALO) -> Tuple[List[ProblemInputs], int]:
    """Split one problem into ``n_tiles`` row-band sub-problems of uniform
    height (band + 2*halo, edge-replicated at the image borders). The
    cropped cameras shift the principal point by the band origin — all
    projective relations then hold verbatim on the crop."""
    H = inputs.height
    hb = -(-H // n_tiles)
    rows = hb + 2 * halo
    tiles = []
    for t in range(n_tiles):
        o = t * hb - halo
        cams = []
        for c in inputs.cameras:
            K = c.K.copy()
            K[1, 2] -= o
            cams.append(dataclasses.replace(c, K=K, height=rows))
        tiles.append(ProblemInputs(
            images=_crop_rows(inputs.images, o, rows),
            cameras=cams,
            depth_min=inputs.depth_min, depth_max=inputs.depth_max,
            width=inputs.width, height=rows,
            src_depths=(_crop_rows(inputs.src_depths, o, rows)
                        if inputs.src_depths is not None else None),
        ))
    return tiles, hb


def build_tile_data(inputs: ProblemInputs, n_tiles: int, v_pad: int,
                    halo: int = HALO):
    """Host-side device inputs for a tile-sharded sweep: stacked per-tile
    SweepData with rect views on a common forced frame (one compiled
    program serves every tile), plus (statics, band height)."""
    tiles, hb = build_tile_inputs(inputs, n_tiles, halo)
    # Common rect frame over all tiles (max of natural frames).
    wp = hp = 0
    hosts = []
    for ti in tiles:
        rh = rectcost.build_rect_host(ti.cameras, ti.width, ti.height,
                                      v_pad, stacked=True)
        wp = max(wp, rh.statics.wp)
        hp = max(hp, rh.statics.hp)
        hosts.append(rh)
    datas = []
    for ti in tiles:
        rh = rectcost.build_rect_host(ti.cameras, ti.width, ti.height,
                                      v_pad, force_size=(wp, hp),
                                      stacked=True)
        rviews = rectcost.build_rect_views(rh, ti.images, None,
                                           cameras=ti.cameras)
        d = st_mod.build_sweep_data(ti, v_pad)._replace(rect=rviews)
        datas.append(d)
        rstat = rh.statics
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    return stacked, rstat, hb


def _halo_refresh(state: PMState, halo: int, hb: int, axis: str,
                  n_tiles: int) -> PMState:
    """Refresh both halos of every per-pixel state leaf from the owning
    neighbours' interiors (two ppermute ring shifts). Outermost halos (no
    neighbour) keep their current values."""
    t = jax.lax.axis_index(axis)

    def swap(x):
        if x.ndim < 2 or x.shape[0] != hb + 2 * halo:
            return x
        top_int = jax.lax.slice_in_dim(x, halo, 2 * halo, axis=0)
        bot_int = jax.lax.slice_in_dim(x, hb, hb + halo, axis=0)
        dn = [(i, i + 1) for i in range(n_tiles - 1)]
        up = [(i + 1, i) for i in range(n_tiles - 1)]
        from_above = jax.lax.ppermute(bot_int, axis, dn)
        from_below = jax.lax.ppermute(top_int, axis, up)
        top = jnp.where(t > 0, from_above,
                        jax.lax.slice_in_dim(x, 0, halo, axis=0))
        bot = jnp.where(t < n_tiles - 1, from_below,
                        jax.lax.slice_in_dim(x, hb + halo, hb + 2 * halo,
                                             axis=0))
        return jnp.concatenate(
            [top, jax.lax.slice_in_dim(x, halo, hb + halo, axis=0), bot], 0)

    return PMState(plane=swap(state.plane), cost=swap(state.cost),
                   selected=swap(state.selected),
                   view_weight=swap(state.view_weight),
                   weak=swap(state.weak), key=state.key)


def tile_sharded_sweep(
    mesh: Mesh,
    datas: SweepData,            # stacked (T, ...) per-tile crops
    states: PMState,             # stacked (T, ...) per-tile states
    params: PatchMatchParams,
    rstat,
    hb: int,
    halo: int = HALO,
    axis: str = "tile",
) -> PMState:
    """One photometric PatchMatch sweep of a single problem, rows banded
    over the mesh. Returns the stitched interior state rows, stacked
    (T, hb, W, ...) — concatenate on the caller to (T*hb, W) and trim to H.
    """
    if params.use_APD:
        raise ValueError("tile sharding covers the photometric strong "
                         "path; APD anchors reach past any halo "
                         "(MAX_SEARCH_RADIUS) — shard APD passes over "
                         "views instead")
    from ..engine import patchmatch as pm
    from ..engine import stages as stg
    n_tiles = len(mesh.devices.flat)

    def body(data, state):
        # Each device holds exactly one tile: drop the local leading axis.
        data = jax.tree.map(lambda x: x[0], data)
        state = jax.tree.map(lambda x: x[0], state)
        keys = jax.random.split(state.key, 32)
        sup = pm.Support(*([None] * len(pm.Support._fields)))
        if params.use_edge:
            from ..engine import sweep as sweep_mod
            sup, state = sweep_mod.build_support(data, state, params,
                                                 keys[0])
        state = stg._init_stage(data, state, params, rstat)
        base_key = keys[1]
        for it in range(params.max_iterations):
            it_dev = jnp.int32(it)
            key_it = jax.random.fold_in(base_key, it_dev)
            state = stg._strong_iter(data, sup, state, it_dev, key_it,
                                     params, rstat)
            # The halo exchange: neighbour interiors -> my halo rows.
            state = _halo_refresh(state, halo, hb, axis, n_tiles)
        state = stg._finish_stage(data, state, params)
        state = stg._classify_stage(data, state, params, rstat)
        state = stg._refine_stage(data, state, params, rstat)
        state = state._replace(key=keys[-1])
        # Interior rows only (the caller stitches bands); restore the
        # local leading axis for the out_specs concatenation.
        return jax.tree.map(
            lambda x: (jax.lax.slice_in_dim(x, halo, halo + hb, axis=0)
                       if x.ndim >= 2 and x.shape[0] == hb + 2 * halo
                       else x)[None], state)

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)),
                               out_specs=P(axis), check_vma=False))
    return fn(datas, states)


def stitch_tiles(states: PMState, H: int) -> PMState:
    """(T, hb, W, ...) interior stacks -> single (H, W, ...) state."""
    def cat(x):
        if x.ndim >= 3:
            return x.reshape((-1,) + x.shape[2:])[:H]
        return x[0]
    return jax.tree.map(cat, states)
