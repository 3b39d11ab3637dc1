"""Minimal repro of the axon persistent-cache reload failure (VERDICT r4
ask #8; utils/jaxconfig.py documents the symptom since round 1).

Hypothesis under test: executables whose LARGE CONSTANTS were hoisted to
parameters by XLA serialize fine but reload with a "supplied N buffers
but expected M" execution error on the axon backend — the reloaded
executable expects the hoisted-constant parameters the caller never
passes.

The repro compiles a jit whose body closes over a large array (embedded
as a module constant, the hoisting candidate) in process A with the
persistent cache enabled, then re-runs the same program in process B
(same cache dir). Outcomes:

  * B compiles fast and executes -> cache works for this shape (report).
  * B raises the buffer-count error -> the round-1..3 bug, now pinned to
    a minimal program (report + keep cache opt-in).

Usage: python tools/cache_repro.py [MB] — runs both processes itself.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

CHILD = """
import os, sys, time
sys.path.insert(0, %(repo)r)
os.environ["DPE_MVS_TPU_CACHE"] = %(cache)r
from dpe_mvs_tpu.utils import jaxconfig
jaxconfig.setup()
import jax, jax.numpy as jnp
import numpy as np

n = %(n)d
const = jnp.asarray(np.random.default_rng(0).uniform(size=(n, 128)).astype(np.float32))

@jax.jit
def f(x):
    # `const` is a closed-over module constant (the hoisting candidate);
    # enough flops to clear the 1 s persistent-cache threshold.
    y = x
    for _ in range(8):
        y = jnp.tanh(y @ const.T @ const * 1e-4 + x)
    return jnp.sum(y)

x = jnp.ones((256, 128), jnp.float32)
t0 = time.time()
try:
    r = float(jax.device_get(f(x)))
    print("RESULT ok %%.3fs value=%%.4f" %% (time.time() - t0, r), flush=True)
except Exception as e:
    print("RESULT fail %%.3fs %%s: %%s" %% (time.time() - t0,
                                            type(e).__name__,
                                            str(e)[:300]), flush=True)
"""


def main() -> int:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = mb * 1024 * 1024 // (128 * 4)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = tempfile.mkdtemp(prefix="dpe_cache_repro_")
    src = CHILD % {"repo": repo, "cache": cache, "n": n}
    for label in ("A (cold, populates cache)", "B (reload from cache)"):
        t0 = time.time()
        p = subprocess.run([sys.executable, "-c", src],
                           capture_output=True, text=True, timeout=1800)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"process {label}: wall {time.time() - t0:.1f}s "
              f"{line[0] if line else 'NO RESULT'}")
        if not line or "fail" in line[0]:
            tail = (p.stdout + p.stderr).strip().splitlines()[-12:]
            print("  " + "\n  ".join(tail))
    files = sum(len(fs) for _, _, fs in os.walk(cache))
    print(f"cache dir {cache}: {files} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
