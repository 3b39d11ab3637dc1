"""Microbenchmark: banded gather2d throughput on the TPU.

Usage: python tools/gather2d_bench.py [C [SPREAD]]

Measures gathered elements/s for anchor-like queries (local scatter of
+-SPREAD px around each site) and for uniform random queries (worst case).
The anchor-profile gather of engine/weak_rect.py needs >= ~1 G elem/s for
the weak machinery's per-sweep budget (see VERDICT round 2 #1).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpe_mvs_tpu.utils import jaxconfig

jaxconfig.setup()

import jax
import jax.numpy as jnp
import numpy as np

from dpe_mvs_tpu.ops.gather2d import gather2d


def bench(imgs, iy, ix, label, reps=5):
    out = gather2d(imgs, iy, ix)
    np.asarray(jax.device_get(out[..., :1, :1]))  # sync (axon: honest readback)
    t0 = time.time()
    for _ in range(reps):
        out = gather2d(imgs, iy, ix)
    np.asarray(jax.device_get(out[..., :1, :1]))
    dt = (time.time() - t0) / reps
    n = out.size
    print(f"{label}: {n / 1e6:.1f}M elems in {dt * 1e3:.2f} ms "
          f"-> {n / dt / 1e9:.2f} G elem/s")


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    spread = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    H, W = 600, 800
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((C, H, W)).astype(np.float32))

    # Anchor-like: 8 anchor sets stacked on rows, each site's anchor within
    # +-spread of the site.
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    iys, ixs = [], []
    for j in range(8):
        iys.append(yy + rng.integers(-spread, spread + 1, (H, W)))
        ixs.append(xx + rng.integers(-spread, spread + 1, (H, W)))
    iy = jnp.asarray(np.concatenate(iys, 0).astype(np.int32))
    ix = jnp.asarray(np.concatenate(ixs, 0).astype(np.int32))
    print(f"devices: {jax.devices()}  C={C} queries={iy.shape} "
          f"spread=+-{spread}")
    bench(imgs, iy, ix, f"anchor-like C={C}")

    iyr = jnp.asarray(rng.integers(0, H, iy.shape).astype(np.int32))
    ixr = jnp.asarray(rng.integers(0, W, ix.shape).astype(np.int32))
    bench(imgs, iyr, ixr, f"uniform-random C={C}")

    # Small-C case (anchor plane/state gathers).
    bench(imgs[:6], iy, ix, "anchor-like C=6")


if __name__ == "__main__":
    main()
