"""Probe (dev tool): sort-based compaction vs one-hot-matmul compaction.

ops/signal.py's compact/scatter_back run as stable vectorized sorts
(compare-exchange networks).  The alternative is the bracket-matrix idea:
the stable front-compaction permutation is P[j, i] = valid_i &
(cumsum(valid)_i - 1 == j), so compact = P @ v and scatter_back = P^T @ c —
two contractions instead of three sorts per chain method.

Methodology: scan-with-state like bench.py (the axon runtime dedupes
identical executions; inputs must vary per step).  Shapes mirror the
flagship signal stage: [B, N] = [128, 250] f32 with ~8% NaNs.

Usage: python tools/compactprobe.py    (TPU; BENCH_PLATFORM=cpu to smoke)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _enable_compile_cache


def compact_sort(mask, values):
    from bp_from_video_tpu.ops import signal as sig
    c = sig.compact(mask, values)
    return sig.scatter_back(mask, c.values * 2.0, values), c.count


def compact_mm(mask, values):
    n = mask.shape[0]
    pos = jnp.cumsum(mask) - 1
    slot = jnp.arange(n)
    p = (mask[None, :] & (pos[None, :] == slot[:, None])).astype(jnp.float32)
    vals0 = jnp.where(mask, values, 0.0)
    # HIGHEST precision: default TPU matmul truncates the f32 operand to
    # bf16; a one-hot selection must reproduce the values bit-exactly.
    hi = jax.lax.Precision.HIGHEST
    comp = jnp.dot(p, vals0, precision=hi)
    count = jnp.sum(mask).astype(jnp.int32)
    back = jnp.dot(p.T, comp * 2.0, precision=hi)
    return jnp.where(mask, back, values), count


def main():
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    else:
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("tunnel dark", file=sys.stderr)
            sys.exit(3)
    _enable_compile_cache()
    if jax.default_backend() == "tpu":
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()  # honest timings (utils/axon.py)

    b, n = 128, 250
    clip = int(os.environ.get("BENCH_CLIP", "128"))
    key = jax.random.key(0)
    y0 = jax.random.normal(key, (b, n), jnp.float32)
    y0 = jnp.where(jax.random.uniform(key, (b, n)) < 0.08, jnp.nan, y0)

    for name, fn in [("sort", compact_sort), ("matmul", compact_mm)]:
        vfn = jax.vmap(lambda y: fn(jnp.isfinite(y), jnp.nan_to_num(y)))

        @jax.jit
        def run(y, i0):
            def body(y, i):
                out, cnt = vfn(y + 0.001 * i)
                return out, jnp.sum(cnt)
            return jax.lax.scan(body, y, i0 + jnp.arange(clip, dtype=jnp.float32))

        y, _ = run(y0, jnp.float32(0.0))
        jax.block_until_ready(y)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            y, s = run(y, jnp.float32((r + 1) * clip))
            jax.block_until_ready(s)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:8s} {best * 1e6 / clip:9.1f} us/step  "
              f"([{b}, {n}] compact+scatter round trip)", flush=True)

    # Exactness: both paths agree.
    import numpy as np
    m = np.isfinite(np.asarray(y0))
    a, ca = jax.vmap(lambda y: compact_sort(jnp.isfinite(y), jnp.nan_to_num(y)))(y0)
    b2, cb = jax.vmap(lambda y: compact_mm(jnp.isfinite(y), jnp.nan_to_num(y)))(y0)
    np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b2)[m], rtol=0, atol=0)
    assert (np.asarray(ca) == np.asarray(cb)).all()
    print("exactness: OK")


if __name__ == "__main__":
    main()
