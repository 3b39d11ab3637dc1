"""Microbenchmark: which gather formulations does XLA TPU vectorize?

The sweep's NCC inner loop is 4 flat 1-D takes per bilinear sample
(ops/sampling.py:gather_2x2). Round-1 measured 200-535 G samples/s on an
isolated gather, yet the staged probe shows the strong iteration executing at
~100 M takes/s — the serial-loop rate. This tool benchmarks the exact
formulations side by side on the chip to find what triggers serialization:

  a) isolated jnp.take (1-D operand, big flat index array)  [round-1 micro]
  b) gather_2x2 (4 takes sharing one index computation)
  c) bilinear() as used by the sweep
  d) bilinear inside a lax.scan over chunks (the sweep's real structure)
  e) (c) but with f32->int index computation fused in

Usage: python tools/gather_bench.py [H W n_idx reps]
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

from dpe_mvs_tpu.ops import sampling  # noqa: E402


def sync(x):
    np.asarray(jax.device_get(jnp.sum(x)))


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
    n = int(args[2]) if len(args) > 2 else 8 * 600 * 400
    reps = int(args[3]) if len(args) > 3 else 5

    print(f"devices: {jax.devices()}  img {H}x{W}, {n} indices", flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
    flat_idx = jnp.asarray(rng.integers(0, H * W - W - 2, n).astype(np.int32))
    xs = jnp.asarray((rng.random(n) * (W - 1)).astype(np.float32))
    ys = jnp.asarray((rng.random(n) * (H - 1)).astype(np.float32))

    @jax.jit
    def take_flat(img, idx):
        return img.reshape(-1)[idx]

    @jax.jit
    def take4(img, idx):
        f = img.reshape(-1)
        return f[idx] + f[idx + 1] + f[idx + W] + f[idx + W + 1]

    @jax.jit
    def bilin(img, x, y):
        return sampling.bilinear(img, x, y)

    @jax.jit
    def bilin_scan(img, x, y):
        # the sweep's structure: scan over chunks, accumulate sums
        xc = x.reshape(8, -1)
        yc = y.reshape(8, -1)

        def body(acc, xy):
            xi, yi = xy
            s = sampling.bilinear(img, xi, yi)
            return acc + jnp.sum(s), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), (xc, yc))
        return acc

    for name, fn, a in [
        ("take_flat", take_flat, (img, flat_idx)),
        ("take4", take4, (img, flat_idx)),
        ("bilinear", bilin, (img, xs, ys)),
        ("bilinear_scan8", bilin_scan, (img, xs, ys)),
    ]:
        t = timeit(fn, *a, reps=reps)
        rate = n / t / 1e9
        print(f"{name:<18s} {t*1e3:8.2f} ms   {rate:8.2f} G samples/s",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
