"""Per-stage device timing of the fused step (reference profiler.py analog
for development: where does the frame budget go?).

Run on the TPU:  python tools/profile_step.py [--streams N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _asset_dir, _enable_compile_cache


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    _enable_compile_cache()
    if jax.default_backend() == "tpu":
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()  # honest timings (utils/axon.py)
    from bp_from_video_tpu.config import EngineConfig
    from bp_from_video_tpu.parallel import MultiStreamEngine

    streams = 8
    for i, a in enumerate(sys.argv):
        if a == "--streams":
            streams = int(sys.argv[i + 1])

    h, w = 480, 640
    cfg = EngineConfig(frame_height=h, frame_width=w, num_streams=streams,
                       compute_dtype="bfloat16")
    ms = MultiStreamEngine(cfg, asset_dir=_asset_dir())
    eng = ms.engine
    state = ms.init_states()
    frames = jax.jit(lambda: jax.random.randint(
        jax.random.key(0), (streams, h, w, 3), 0, 256, jnp.uint8))()
    ts = jnp.full((streams,), 1 / 30.0)

    # Full fused step.
    full = jax.jit(ms._vstep_local)
    t_full = timeit(full, ms.params, state, frames, ts)

    # Inference only.
    infer = jax.jit(jax.vmap(eng.runner.predict, in_axes=(None, 0, 0)))
    t_inf = timeit(infer, ms.params, state.track, frames)

    # Signal path only (uses inference outputs).
    _, models = infer(ms.params, state.track, frames)
    sig_only = jax.jit(jax.vmap(eng.signal_step, in_axes=(0, 0, 0, 0)))
    t_sig = timeit(sig_only, state.signals, models, frames, ts)

    per_frame = t_full / streams
    print(f"streams={streams}  full step: {t_full*1e3:8.2f} ms "
          f"({per_frame*1e3:.2f} ms/frame, {1/per_frame:,.0f} fps)")
    print(f"  inference: {t_inf*1e3:8.2f} ms")
    print(f"  signal:    {t_sig*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
