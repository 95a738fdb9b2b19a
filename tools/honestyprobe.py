"""Is the axon client's pre-device_get 'fast mode' honest?

tools/poisonprobe.py established: the FIRST jax.device_get in a process
stalls ~3 min, then every subsequent dispatch costs ~25 ms (poisoned mode)
instead of ~0.03 ms (fast mode).  This probe checks whether fast-mode
timings are real: a compute-bound scan (big matmul chain) has a physical
floor; if fast mode reports far below the poisoned-mode time for the SAME
executable with block_until_ready, fast-mode readiness is fake and every
fast-mode measurement is garbage.

Run: python tools/honestyprobe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_cache = os.path.join(_here, ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


N = 2048
STEPS = 64


@jax.jit
def big(x):
    def body(c, _):
        c = jnp.tanh(c @ c * 1e-3)
        return c, c[0, 0]
    c, ys = jax.lax.scan(body, x, None, length=STEPS)
    return ys


def timeit(tag, x):
    ts = []
    for i in range(3):
        xi = jax.block_until_ready(x + i * 1e-6)
        t0 = time.perf_counter()
        jax.block_until_ready(big(xi))
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {['%.3f' % t for t in ts]} s", flush=True)
    return min(ts)


def main():
    x = jnp.ones((N, N), jnp.bfloat16) * 0.01
    # ~2*N^3*STEPS flops = 2*8.6e9*64 = 1.1 TFLOP; ~5-10 ms on v5e at
    # 200-400 TFLOP/s bf16 — small, so also run a second, 8x bigger variant.
    fast = timeit("fast-mode big-scan", x)
    t0 = time.perf_counter()
    _ = jax.device_get(x[:8, :8])
    print(f"device_get stall: {time.perf_counter() - t0:.1f} s", flush=True)
    poisoned = timeit("poisoned-mode big-scan", x)
    print(f"ratio poisoned/fast = {poisoned / max(fast, 1e-9):.1f}",
          flush=True)


if __name__ == "__main__":
    main()
