"""Microbenchmark the Pallas row-gather texture kernels on the real chip.

Measures ops/rowgather.row_gather + bilinear_x at engine-realistic shapes
(image rows x many sample columns), plus the XLA transpose used by the
two-pass warp decomposition. These rates decide the rectified-engine design:
XLA gathers serialize at ~0.1 G/s on TPU (tools/gather_bench.py), so every
image sample in the framework must flow through these kernels.

Usage: python tools/rowgather_bench.py [H W L reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpe_mvs_tpu.utils import jaxconfig

jaxconfig.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dpe_mvs_tpu.ops import rowgather  # noqa: E402


def sync(x):
    np.asarray(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    args = sys.argv[1:]
    H = int(args[0]) if len(args) > 0 else 600
    W = int(args[1]) if len(args) > 1 else 800
    L = int(args[2]) if len(args) > 2 else 800 * 36
    reps = int(args[3]) if len(args) > 3 else 5

    print(f"devices: {jax.devices()}  img {H}x{W}, L={L}", flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
    ix = jnp.asarray(rng.integers(0, W, (H, L)).astype(np.int32))
    xf = jnp.asarray((rng.random((H, L)) * (W - 1)).astype(np.float32))

    n = H * L
    for name, fn, a in [
        ("row_gather", lambda i, x: rowgather.row_gather(i, x), (img, ix)),
        ("bilinear_x", lambda i, x: rowgather.bilinear_x(i, x), (img, xf)),
    ]:
        t = timeit(jax.jit(fn), *a, reps=reps)
        print(f"{name:<14s} {t*1e3:9.2f} ms  {n/t/1e9:8.2f} G samples/s",
              flush=True)

    # Transpose (column-pass building block of the 2-pass warp).
    tr = jax.jit(lambda a: a.T.copy())
    t = timeit(tr, img)
    print(f"transpose {H}x{W}: {t*1e3:.2f} ms "
          f"({H*W/t/1e9:.2f} G elems/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
