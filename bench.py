"""Headline benchmark: end-to-end fused rPPG throughput, frames/sec/chip.

Measures the flagship configuration — face + hand landmarkers (real TFLite
weights when available), dual ROI, Butterworth chain, Lomb-Scargle spectrum,
pairwise PTT — i.e. the whole reference hot loop (bp.py:21-30) minus host
video decode, batched over streams and scanned over time on one chip.

Baseline: the reference's achieved live pipeline rate, ~25 frames/sec on an
RTX 3060 Ti desktop (reference README.md:44, hardware README.md:54; see
BASELINE.md).  ``vs_baseline`` is the speedup over that.

Prints ONE JSON line:
  {"metric": "rppg_fused_throughput", "value": N, "unit": "frames/sec/chip",
   "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_BASELINE_FPS = 25.0  # reference README.md:44


def _asset_dir():
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (here, "/root/reference"):
        if os.path.exists(os.path.join(cand, "models", "face_landmarker.task")):
            return cand
    return None


def _enable_compile_cache():
    """Persistent XLA compilation cache: compile once per shape, reuse across
    processes (the remote-TPU tunnel makes fresh compiles minutes-long)."""
    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    quick = "--quick" in sys.argv
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from bp_from_video_tpu.config import EngineConfig, SignalConfig
    from bp_from_video_tpu.parallel import MultiStreamEngine

    streams = int(os.environ.get("BENCH_STREAMS", "4" if quick else "8"))
    clip_len = int(os.environ.get("BENCH_CLIP", "8" if quick else "32"))
    reps = int(os.environ.get("BENCH_REPS", "2" if quick else "5"))
    h, w = (128, 160) if quick else (480, 640)

    cfg = EngineConfig(frame_height=h, frame_width=w, num_streams=streams,
                       compute_dtype="bfloat16")
    ms = MultiStreamEngine(cfg, asset_dir=_asset_dir())
    state = ms.init_states()
    params = ms.params

    # Generate frames on-device: the benchmark measures chip throughput, and
    # this process may sit behind a low-bandwidth tunnel to the TPU host
    # (production feeds frames over local PCIe).
    frames = jax.jit(
        lambda: jax.random.randint(jax.random.key(0),
                                   (clip_len, streams, h, w, 3), 0, 256,
                                   jnp.uint8),
        )()
    dt = 1.0 / 30.0
    base_ts = np.arange(1, clip_len + 1, dtype=np.float32)[:, None] * dt
    timestamps = jnp.asarray(np.broadcast_to(base_ts, (clip_len, streams)))
    jax.block_until_ready(frames)

    # Warmup: compile + settle rings.
    state, _ = ms.run_clip(params, state, frames, timestamps)
    jax.block_until_ready(state)

    t_off = clip_len * dt
    best = 0.0
    for r in range(reps):
        ts_r = timestamps + (r + 1) * t_off
        t0 = time.perf_counter()
        state, outs = ms.run_clip(params, state, frames, ts_r)
        jax.block_until_ready(outs)
        elapsed = time.perf_counter() - t0
        best = max(best, (clip_len * streams) / elapsed)

    print(json.dumps({
        "metric": "rppg_fused_throughput",
        "value": round(best, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best / REF_BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
