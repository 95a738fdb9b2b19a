"""On-HARDWARE end-to-end accuracy: does the optimized TPU path recover
the right heart rate?

Every TPU benchmark runs random frames (content does not change compute
cost), and every accuracy test runs on the CPU suite in f32 with the
Pallas kernels in interpret mode.  This tool closes the remaining gap:
the FULL optimized path — real face weights, Pallas multi-crop + fused
stem + flat-matmul trunks, bf16 compute, natural (ungated) tracking —
runs on the real chip against synthetic pulsing faces with per-stream
known heart rates, and the recovered BPM must match ground truth.

Per stream s: the facial skin's green channel is modulated at
``HR0 + s * HR_STEP`` BPM (the classic rPPG signal model, same shape as
tests/test_vision_loop.py's CPU check but synthesized ON DEVICE inside
the scan — zero per-frame host traffic).  Gate: ±3 BPM, the CPU test's
gate (reference acceptance ±1 BPM + landmark-jitter headroom,
reference README.md:44).

Writes TPUACC_r03.json and prints one JSON line.  CPU smoke:
``BENCH_PLATFORM=cpu python tools/tpu_accuracy.py`` (f32, interpret-mode
kernels skipped — the CPU path is already covered by the suite).
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _asset_dir, _enable_compile_cache  # noqa: E402

HR0_HZ = 1.1        # stream 0: 66 BPM
HR_STEP_HZ = 0.1    # +6 BPM per stream
FS = 30.0
STEPS = 360         # 12 s of signal: ring full + peak ring settled
GATE_BPM = 3.0


def main():
    if not os.environ.get("BENCH_PLATFORM"):
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("tpu_accuracy: tunnel unreachable", file=sys.stderr)
            sys.exit(3)
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    _enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()

    from bp_from_video_tpu.config import (EngineConfig, InferenceConfig,
                                          SignalConfig,
                                          FACE_FOREHEAD_CONFIG)
    from bp_from_video_tpu.parallel import MultiStreamEngine
    from tools.rotsweep import synth_face

    streams = int(os.environ.get("ACC_STREAMS", "8"))
    h = w = 256
    cfg = EngineConfig(
        frame_height=h, frame_width=w, num_streams=streams,
        compute_dtype="bfloat16" if on_tpu else "float32",
        signal=SignalConfig(roi_configs=(FACE_FOREHEAD_CONFIG,),
                            signal_max_samples=250, peak_max_samples=50),
        inference=InferenceConfig(
            hand_landmarker=False,
            use_pallas=on_tpu, fused_stem=on_tpu, fused_trunk=on_tpu))
    ms = MultiStreamEngine(cfg, asset_dir=_asset_dir())

    base = jax.device_put(jnp.asarray(
        synth_face().transpose(2, 0, 1)))               # [3, 256, 256] RGB?
    # synth_face returns HWC in the capture's channel order; the engine
    # takes RGB planar [S, 3, H, W] like the feeder ships.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    skin_np = (((xx - 128) / 60.0) ** 2 + ((yy - 128) / 80.0) ** 2) <= 1.0
    skin = jax.device_put(jnp.asarray(skin_np))         # [h, w] bool
    hr_hz = jnp.asarray(HR0_HZ + HR_STEP_HZ * np.arange(streams),
                        jnp.float32)                    # [S]

    def body(params, base, skin, carry, i):
        st = carry
        t = (i + 1.0) / FS
        amp = 9.0 * jnp.sin(2.0 * jnp.pi * hr_hz * t)   # [S]
        g = (base[1].astype(jnp.int16)[None]
             + jnp.where(skin[None], amp[:, None, None], 0.0
                         ).astype(jnp.int16))           # [S, h, w]
        frames = jnp.broadcast_to(base[None], (streams, 3, h, w))
        frames = frames.at[:, 1].set(
            jnp.clip(g, 0, 255).astype(jnp.uint8))
        ts = t * jnp.ones((streams,), jnp.float32)
        st, out = ms.engine.batch_step(params, st, frames, ts)
        return st, (out.bpm, st.track.face_tracking)

    @jax.jit
    def run(params, base, skin, st):
        return jax.lax.scan(
            functools.partial(body, params, base, skin), st,
            jnp.arange(STEPS, dtype=jnp.float32))

    st, (bpm, tracked) = run(ms.params, base, skin, ms.init_states())
    jax.block_until_ready(bpm)

    bpm_np = np.asarray(bpm, np.float64)        # [T, S, 1]
    tracked_np = np.asarray(tracked)            # [T, S]
    want = 60.0 * np.asarray(hr_hz)
    got = bpm_np[-1, :, 0]
    err = np.abs(got - want)
    track_frac = float(tracked_np[STEPS // 4:].mean())
    ok = bool(np.isfinite(got).all() and (err <= GATE_BPM).all()
              and track_frac > 0.99)

    rec = {
        "metric": "rppg_tpu_accuracy_max_bpm_err",
        "value": round(float(err.max()), 3) if np.isfinite(err).all()
        else None,
        "unit": f"BPM abs err (gate {GATE_BPM}); {streams} streams "
                f"{int(want[0])}-{int(want[-1])} BPM ground truth",
        "ok": ok,
        "backend": jax.default_backend(),
        "compute_dtype": cfg.compute_dtype,
        "fast_paths": {"use_pallas": cfg.inference.use_pallas,
                       "fused_stem": cfg.inference.fused_stem,
                       "fused_trunk": cfg.inference.fused_trunk},
        "per_stream_bpm": [round(float(v), 2) for v in got],
        "ground_truth_bpm": [round(float(v), 2) for v in want],
        "track_frac_steady": round(track_frac, 4),
        "steps": STEPS,
    }
    print(json.dumps(rec), flush=True)
    if on_tpu:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TPUACC_r03.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
