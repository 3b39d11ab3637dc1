"""Multi-chip scaling: view-data parallelism over a device mesh.

The reference is strictly single-GPU and processes reference images
sequentially (main.cpp:508-567); its only cross-view coupling is that
geometric-consistency sweeps read *other* views' depth maps from disk
(DPE.cpp:826-844) — a Jacobi iteration with a barrier.

TPU-native design (SURVEY.md §2.3):
  - the problem list (reference views) is the primary scaling axis: problems
    are sharded over the ``views`` mesh axis and swept in parallel, each
    device iterating its local shard with ``lax.map``;
  - the disk round-trip becomes an ``all_gather`` of per-view depth maps over
    ICI between sweeps; each problem then *indexes* its source views' depths
    out of the gathered stack (pair.txt adjacency as a static index matrix);
  - multi-host: :func:`initialize_distributed` wires
    ``jax.distributed.initialize`` behind env vars / arguments — the mesh
    then spans all hosts' devices and the all-gather rides ICI/DCN.

No TP/PP/EP/SP analogue exists for this workload (nothing is a sequence or a
parameter tensor); scaling is data-parallel over views plus the depth
exchange collective (documented design decision, not an omission).
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PatchMatchParams
from ..engine import sweep as sweep_mod
from ..engine.state import PMState, SweepData


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bootstrap: ``jax.distributed.initialize`` behind env vars.

    Reads ``DPE_MVS_COORDINATOR`` (host:port), ``DPE_MVS_NUM_PROCS`` and
    ``DPE_MVS_PROC_ID`` when arguments are not given; on managed TPU pods
    (where JAX can auto-detect all three) setting
    ``DPE_MVS_COORDINATOR=auto`` initializes with no explicit arguments.
    Returns True if distributed mode was initialized. Safe to call twice
    (second call is a no-op returning True)."""
    coordinator = coordinator or os.environ.get("DPE_MVS_COORDINATOR")
    if not coordinator:
        return False
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return True
    if coordinator == "auto":
        jax.distributed.initialize()
        return True
    if num_processes is None:
        num_processes = int(os.environ["DPE_MVS_NUM_PROCS"])
    if process_id is None:
        process_id = int(os.environ["DPE_MVS_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(devices: Optional[List] = None, axis: str = "views") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def pad_problem_count(n: int, n_devices: int) -> int:
    return ((n + n_devices - 1) // n_devices) * n_devices


def stack_pytrees(items):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *items)


def shard_put(mesh: Mesh, tree, axis: str = "views"):
    """Place a stacked pytree on the mesh, sharded over its leading axis —
    each device holds only its problems' slice (one host copy otherwise)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# Compiled executables are cached per (mesh, params): jax.jit keys on
# function identity, so rebuilding the closure every call would recompile
# every sweep (Mesh and the frozen params dataclass are both hashable).
@functools.lru_cache(maxsize=None)
def _sweep_exec(mesh: Mesh, params: PatchMatchParams, axis: str):
    def local(d, s):
        return jax.lax.map(
            lambda args: sweep_mod.run_sweep(args[0], args[1], params), (d, s))

    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                      out_specs=P(axis), check_vma=False))


def sharded_sweep(
    mesh: Mesh,
    datas: SweepData,          # stacked leading axis B (padded to mesh size)
    states: PMState,           # stacked leading axis B
    params: PatchMatchParams,
    axis: str = "views",
) -> PMState:
    """Run one PatchMatch sweep for B problems sharded over the mesh.

    Each device sweeps its local problems sequentially (lax.map), all devices
    in parallel — the TPU replacement for the reference's sequential
    ``for problem: ProcessProblem`` loop (main.cpp:508-567).
    """
    return _sweep_exec(mesh, params, axis)(datas, states)


@functools.lru_cache(maxsize=None)
def _exchange_exec(mesh: Mesh, axis: str):
    def body(d_local, idx_local):
        d_all = jax.lax.all_gather(d_local, axis, tiled=True)  # (B_total,H,W)
        safe = jnp.maximum(idx_local, 0)
        picked = d_all[safe]                               # (b, V, H, W)
        return jnp.where((idx_local >= 0)[..., None, None], picked, 0.0)

    return jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)),
                      out_specs=P(axis), check_vma=False))


def exchange_depths(
    mesh: Mesh,
    depths: jnp.ndarray,        # (B, H, W) sanitized depth maps, sharded
    src_index: jnp.ndarray,     # (B, V) int32: global problem index of each
                                # source view (from pair.txt), -1 = padding
    axis: str = "views",
) -> jnp.ndarray:
    """The depth-exchange collective: all_gather every problem's depth map
    over the mesh, then pick each problem's source-view depths.

    Returns (B, V, H, W) source depth stacks (replaces the reference's
    ``depths.dmb`` disk reads between sweeps, DPE.cpp:826-844)."""
    return _exchange_exec(mesh, axis)(depths, src_index)


def build_src_index(problem_ids: List[int],
                    src_ids: List[List[int]], v_pad: int) -> np.ndarray:
    """(B, V) map from each problem's padded source slots to global problem
    indices (pair.txt adjacency)."""
    id_to_idx = {pid: i for i, pid in enumerate(problem_ids)}
    out = np.full((len(problem_ids), v_pad), -1, np.int32)
    for b, srcs in enumerate(src_ids):
        for v, sid in enumerate(srcs[:v_pad]):
            if sid in id_to_idx:
                out[b, v] = id_to_idx[sid]
    return out
