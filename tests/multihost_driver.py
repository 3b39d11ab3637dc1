"""Subprocess driver for the multi-host bootstrap test (one JAX process).

Launched twice by tests/test_multihost.py with DPE_MVS_COORDINATOR /
DPE_MVS_NUM_PROCS / DPE_MVS_PROC_ID set: initializes ``jax.distributed``
through ``parallel.mesh.initialize_distributed``, builds the global mesh
(2 processes x 4 virtual CPU devices), and runs the depth-exchange
collective across process boundaries.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dpe_mvs_tpu.parallel import mesh as mesh_mod  # noqa: E402


def main() -> int:
    assert mesh_mod.initialize_distributed(), "bootstrap did not engage"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = mesh_mod.make_mesh()

    B, V, H, W = 8, 2, 8, 16
    depth_global = np.arange(B * H * W, dtype=np.float32).reshape(B, H, W)
    idx_global = mesh_mod.build_src_index(
        list(range(B)), [[(b + 1) % B] for b in range(B)], V)

    pid = jax.process_index()
    sl = slice(pid * 4, (pid + 1) * 4)
    sharding = NamedSharding(mesh, P("views"))
    depth = jax.make_array_from_process_local_data(
        sharding, depth_global[sl], (B, H, W))

    # The pair graph stays HOST data (every process has the full pair.txt);
    # exchange_depths builds the sharded shift/slot tables itself.
    out = mesh_mod.exchange_depths(mesh, depth, idx_global)
    assert out.shape == (B, V, H, W)
    # Each locally-addressable shard must hold its source views' depth maps
    # gathered from the OTHER process's problems (b=3 -> src 4, etc.).
    for shard in out.addressable_shards:
        b = shard.index[0].start or 0
        got = np.asarray(shard.data)[0]
        np.testing.assert_array_equal(got[0], depth_global[(b + 1) % B])
        np.testing.assert_array_equal(got[1], 0.0)

    print(f"MULTIHOST OK p{pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
