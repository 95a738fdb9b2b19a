"""Microbenchmark: int8 vs bf16 conv throughput at this pipeline's exact
shapes (dev tool; scan-based like tools/ablate.py so the axon runtime's
execution dedup and ~45 ms dispatch overhead don't distort the numbers).

Decides whether an int8 quantized path for the landmark nets is worth
building: the v5e MXU runs int8 at 2x the bf16 MAC rate, but only if XLA
actually routes these small-channel convs onto it.

Usage: python tools/convprobe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _enable_compile_cache


CASES = [
    # (label, batch, cin, hw_in, cout, k, stride)
    ("hand stem 5x5/2 224->24ch", 128, 3, 224, 24, 5, 2),
    ("mesh stem 3x3/2 256->16ch", 64, 3, 256, 16, 3, 2),
    ("mesh 1x1 128^2 16->8", 64, 16, 128, 8, 1, 1),
    ("mesh dw-ish 3x3 128^2 8->16", 64, 8, 128, 16, 3, 1),
    ("b1-pw 1x1 56^2 24->48", 128, 24, 56, 48, 1, 1),
]


def conv_fn(dtype, cout, k, stride):
    def f(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                    else jnp.float32))
        return y
    return f


def scan_probe(label, dtype, batch, cin, hw, cout, k, stride, clip=32,
               reps=3):
    f = conv_fn(dtype, cout, k, stride)
    key = jax.random.key(0)
    if dtype == jnp.int8:
        x0 = jax.random.randint(key, (batch, cin, hw, hw), -127, 127,
                                jnp.int8)
        w = jax.random.randint(jax.random.key(1), (k, k, cin, cout),
                               -127, 127, jnp.int8)
    else:
        x0 = jax.random.normal(key, (batch, cin, hw, hw), dtype)
        w = jax.random.normal(jax.random.key(1), (k, k, cin, cout), dtype)

    def body(carry, _):
        x = carry
        y = f(x, w)
        # Perturb the carry from a reduced scalar of y (shape-agnostic in
        # cin/cout) so the runtime cannot dedup repeated executions.
        bump = jnp.sum(y[..., 0, 0], axis=-1, keepdims=True)[..., None, None]
        x2 = x + bump.astype(x.dtype)
        return x2, jnp.sum(y[..., 0, 0], dtype=jnp.float32)

    @jax.jit
    def run(x):
        return jax.lax.scan(body, x, jnp.arange(clip))

    x, out = run(x0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x, out = run(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = best / clip
    hw_out = hw // stride
    macs = batch * hw_out * hw_out * cout * k * k * cin
    eff = macs / per / 1e12
    print(f"{label:32s} {str(np.dtype(dtype)) if dtype != jnp.bfloat16 else 'bf16':6s}"
          f" {per*1e6:9.1f} us  {eff:7.2f} TMAC/s", flush=True)
    return per


def main():
    _enable_compile_cache()
    if jax.default_backend() == "tpu":
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()  # honest timings (utils/axon.py)
    print(f"backend: {jax.default_backend()}", flush=True)
    for label, b, cin, hw, cout, k, s in CASES:
        for dtype in (jnp.bfloat16, jnp.int8):
            try:
                scan_probe(label, dtype, b, cin, hw, cout, k, s)
            except Exception as e:  # pragma: no cover - probe tool
                print(f"{label} {dtype}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
