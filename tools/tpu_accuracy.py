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

PTT is verified too — the reference's headline second metric, otherwise
un-verifiable end-to-end here because the hand weights are random
stand-ins.  Dual FACE ROIs (forehead + cheek: real-landmark-anchored
boxes that measure at y<=87 and y>=124 on the synthetic face) sample two
regions whose pulses carry a KNOWN per-stream delay: the cheek half's
modulation lags the forehead half by ``PTT0 + s * PTT_STEP`` ms.  The
engine's FFT cross-correlation peak must recover that delay within one
30 Hz sample (±33.4 ms) — the correlation/peak path on hardware against
ground truth.  (Lag sign: the engine reproduces the reference's
corr(sig_i, sig_j) convention — oracle-locked in tests/test_engine.py —
where signal j delayed by d peaks at lag -d; ground truth is therefore
negative.)

Writes TPUACC_r05.json (full-length TPU runs only) and prints one JSON line.  CPU smoke:
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
STEPS = int(os.environ.get("ACC_STEPS", "360"))  # 12 s: ring + peak ring settle
GATE_BPM = 3.0
PTT0_MS = 66.7      # stream 0: 2 samples at 30 Hz
PTT_STEP_MS = 33.3  # +1 sample per stream
GATE_PTT_MS = 34.0  # one 30 Hz sample: the correlation lag resolution
Y_SPLIT = 105       # forehead ROI ends y<=87; cheek ROI starts y>=124


def pulse(hr, t, hrv):
    """Pulse-like waveform (fundamental + in-band harmonics — real pulses
    are wideband) with optional heart-rate variability.

    ``hrv`` is a traced [2] amplitude vector so periodic and HRV phases
    compile into ONE program:

    * Periodic (hrv = 0): the Lomb-Scargle peak sits exactly on the
      fundamental, so BPM is gated tight — but PTT is NOT stable
      (±1-period correlation lobes flip the per-frame argmax; the
      reference's documented "PTT fluctuates" narrowband failure,
      reference README.md:46).
    * HRV on: the dual-tone phase wobble decorrelates the period lobes
      (true correlation peak leads every lobe by >=6%, scipy-checked) so
      the per-frame PTT peak is stable; the same wobble legitimately
      moves each ring window's average instantaneous rate by a few BPM.
    """
    import jax.numpy as jnp
    ph = (hr * t + hrv[0] * jnp.sin(2.0 * jnp.pi * 0.09 * t + 1.0)
          + hrv[1] * jnp.sin(2.0 * jnp.pi * 0.21 * t))
    x = 2.0 * jnp.pi * ph
    return (jnp.sin(x) + 0.6 * jnp.sin(2.0 * x - 1.2)
            + 0.3 * jnp.sin(3.0 * x - 2.1)) / 1.9


def face_skin_masks(h: int, w: int):
    """(upper, lower) boolean masks of the synthetic face's skin ellipse
    split at Y_SPLIT — the two regions the forehead/cheek ROIs measure."""
    import numpy as np
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    skin = (((xx - 128) / 60.0) ** 2 + ((yy - 128) / 80.0) ** 2) <= 1.0
    return skin & (yy < Y_SPLIT), skin & (yy >= Y_SPLIT)


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
                                          FACE_CHEEK_CONFIG,
                                          FACE_FOREHEAD_CONFIG)
    from bp_from_video_tpu.parallel import MultiStreamEngine
    from tools.rotsweep import synth_face

    streams = int(os.environ.get("ACC_STREAMS", "8"))
    h = w = 256
    cfg = EngineConfig(
        frame_height=h, frame_width=w, num_streams=streams,
        compute_dtype="bfloat16" if on_tpu else "float32",
        signal=SignalConfig(roi_configs=(FACE_FOREHEAD_CONFIG,
                                         FACE_CHEEK_CONFIG),
                            signal_max_samples=250, peak_max_samples=50),
        inference=InferenceConfig(
            hand_landmarker=False,
            use_pallas=on_tpu, fused_stem=on_tpu, fused_trunk=on_tpu))
    ms = MultiStreamEngine(cfg, asset_dir=_asset_dir())

    base = jax.device_put(jnp.asarray(
        synth_face().transpose(2, 0, 1)))               # [3, 256, 256]
    # synth_face returns HWC in the engine's RGB order; the engine takes
    # planar [S, 3, H, W] like the feeder ships.
    upper_np, lower_np = face_skin_masks(h, w)
    upper = jax.device_put(jnp.asarray(upper_np))
    lower = jax.device_put(jnp.asarray(lower_np))
    hr_hz = jnp.asarray(HR0_HZ + HR_STEP_HZ * np.arange(streams),
                        jnp.float32)                    # [S]
    ptt_s = jnp.asarray((PTT0_MS + PTT_STEP_MS * np.arange(streams))
                        / 1000.0, jnp.float32)          # [S] seconds

    def body(params, base, upper, lower, hrv, carry, i):
        st = carry
        t = (i + 1.0) / FS
        # Forehead half pulses at t; cheek half lags by the per-stream
        # ground-truth transit time.
        amp_up = 12.0 * pulse(hr_hz, t, hrv)                        # [S]
        amp_lo = 12.0 * pulse(hr_hz, t - ptt_s, hrv)                # [S]
        g = (base[1].astype(jnp.int16)[None]
             + jnp.where(upper[None], amp_up[:, None, None], 0.0
                         ).astype(jnp.int16)
             + jnp.where(lower[None], amp_lo[:, None, None], 0.0
                         ).astype(jnp.int16))           # [S, h, w]
        frames = jnp.broadcast_to(base[None], (streams, 3, h, w))
        frames = frames.at[:, 1].set(
            jnp.clip(g, 0, 255).astype(jnp.uint8))
        ts = t * jnp.ones((streams,), jnp.float32)
        st, out = ms.engine.batch_step(params, st, frames, ts)
        return st, (out.bpm, out.ptt, st.track.face_tracking)

    @jax.jit
    def run(params, base, upper, lower, hrv, st):
        return jax.lax.scan(
            functools.partial(body, params, base, upper, lower, hrv), st,
            jnp.arange(STEPS, dtype=jnp.float32))

    def measure_phase(hrv):
        st, (bpm, ptt, tracked) = run(
            ms.params, base, upper, lower,
            jnp.asarray(hrv, jnp.float32), ms.init_states())
        jax.block_until_ready(bpm)
        return (np.asarray(bpm, np.float64)[-1],      # [S, 2] both ROIs
                np.asarray(ptt, np.float64)[-1, :, 0],
                float(np.asarray(tracked)[STEPS // 4:].mean()), st)

    # Phase A: strictly periodic -> BPM gated tight, PTT unstable by
    # construction (see pulse docstring).  Phase B: HRV -> PTT gated
    # tight, BPM gated coarse (window-average rate legitimately moves).
    got, _, track_frac, _ = measure_phase((0.0, 0.0))
    got_b, got_ptt, track_frac_b, st_b = measure_phase((0.35, 0.2))

    # --- Phase A': HR through the LAGGED MICRO-BATCH step (round 5) -------
    # The multistream-wall mitigation (engine.batch_step_lagged) trades
    # per-frame rect updates + per-frame analysis for throughput; this
    # phase proves the trade keeps HR EXACT on the same periodic scene:
    # ACC_MB frames per dispatch, pre-window rects, one analysis/window.
    MB = int(os.environ.get("ACC_MB", "4"))
    if MB > 1:
        def body_mb(params, hrv, carry, iw):
            st = carry

            def one_frame(j):
                t = (iw * MB + j + 1.0) / FS
                amp_up = 12.0 * pulse(hr_hz, t, hrv)
                amp_lo = 12.0 * pulse(hr_hz, t - ptt_s, hrv)
                g = (base[1].astype(jnp.int16)[None]
                     + jnp.where(upper[None], amp_up[:, None, None], 0.0
                                 ).astype(jnp.int16)
                     + jnp.where(lower[None], amp_lo[:, None, None], 0.0
                                 ).astype(jnp.int16))
                fr = jnp.broadcast_to(base[None], (streams, 3, h, w))
                return (fr.at[:, 1].set(
                    jnp.clip(g, 0, 255).astype(jnp.uint8)),
                    t * jnp.ones((streams,), jnp.float32))
            frames_w, ts_w = zip(*[one_frame(jnp.float32(j))
                                   for j in range(MB)])
            st, out = ms.engine.batch_step_lagged(
                params, st, jnp.stack(frames_w), jnp.stack(ts_w))
            return st, (out.bpm, st.track.face_tracking)

        @jax.jit
        def run_mb(params, hrv, st):
            return jax.lax.scan(
                functools.partial(body_mb, params, hrv), st,
                jnp.arange(STEPS // MB, dtype=jnp.float32))

        st_mb, (bpm_mb, ftr_mb) = run_mb(
            ms.params, jnp.asarray((0.0, 0.0), jnp.float32),
            ms.init_states())
        jax.block_until_ready(bpm_mb)
        got_mb = np.asarray(bpm_mb, np.float64)[-1]
        mb_track = float(np.asarray(ftr_mb)[STEPS // MB // 4:].mean())
    else:
        got_mb = None
        mb_track = None

    # --- HRV oracle parity (VERDICT r3 Weak #3 / Next #7) -----------------
    # The round-3 artifact excused its loose HRV-phase BPM gate against
    # *instantaneous* synthetic truth without showing the reference would
    # report the same windowed estimate.  Close it exactly: run the SAME
    # final phase-B raw ring through (a) the engine's own chain->spectrum->
    # peak ops on device and (b) the reference's scipy derivation (CPU
    # f64, tests/ref_oracle.py) — the gap must sit inside the north star's
    # ±1 BPM.
    from tests.ref_oracle import ref_signal_processor as rsp
    from bp_from_video_tpu.ops import chain as chain_ops
    from bp_from_video_tpu.ops import signal as sig_ops
    from bp_from_video_tpu.ops import spectrum as spec_ops

    @jax.jit
    def engine_window_bpm(raw_x, raw_y):
        px, py = chain_ops.process_signal(cfg.signal, raw_x, raw_y)
        sx, sy = spec_ops.transform_signal(cfg.signal, px, py)
        return sig_ops.peak_auto(sx, sy)[0] * 60.0

    oracle_deltas = []
    for s_i in range(streams):
        x = np.asarray(st_b.signals.raw_x[s_i], np.float64)
        y = np.asarray(st_b.signals.raw_y[s_i, 0], np.float64)
        eng_bpm = float(engine_window_bpm(jnp.asarray(x, jnp.float32),
                                          jnp.asarray(y, jnp.float32)))
        sp = rsp.SignalProcessor(selected_roi_configs=[None, None])
        proc = sp.process_signal(rsp.signal_data.Signal(list(x), list(y),
                                                        len(x)))
        spec = sp.transform_signal(proc)
        f_peak, _ = spec.get_peak()
        oracle_deltas.append(abs(eng_bpm - 60.0 * float(f_peak)))
    hrv_oracle_delta = float(max(oracle_deltas))

    # --- Phase C: HR + PTT through the HAND path --------------------------
    # The DEFAULT ROI preset (forehead + palm — the flagship semantic,
    # reference roi.py:30) on a composite scene: the synthetic face on the
    # left half, a procedural hand (the trained stand-in's distribution)
    # on the right.  The hand's skin pulses with the per-stream
    # ground-truth transit delay vs the forehead, so the advertised
    # face->hand PTT is validated END-TO-END through the trained hand
    # landmark net's tracking + palm ROI (VERDICT r3 Weak #1: every PTT
    # number used to cross a random-init net).
    from bp_from_video_tpu.config import SELECTED_ROI_CONFIGS
    from bp_from_video_tpu.models import warp
    from tools.train_hand_standin import render_hand

    w_c = 2 * w
    cfg_c = EngineConfig(
        frame_height=h, frame_width=w_c, num_streams=streams,
        compute_dtype=cfg.compute_dtype,
        signal=SignalConfig(roi_configs=SELECTED_ROI_CONFIGS,
                            signal_max_samples=250, peak_max_samples=50),
        inference=InferenceConfig(
            hand_landmarker=True, max_hands=1,
            use_pallas=on_tpu, fused_stem=on_tpu, fused_trunk=on_tpu))
    ms_c = MultiStreamEngine(cfg_c, asset_dir=_asset_dir())
    hand_trained = bool(ms_c.engine.runner.trained_standin.get("hand_lm"))

    himg, hkps, _, hmask = render_hand(
        jax.random.key(5), True, fr=h,
        pose=(jnp.float32(0.5 * h), jnp.float32(0.55 * h),
              jnp.float32(0.35), jnp.float32(0.10 * h)), with_mask=True)
    base_c = jax.device_put(jnp.concatenate(
        [jnp.asarray(synth_face().transpose(2, 0, 1)),
         jnp.clip(himg, 0, 255).astype(jnp.uint8)], axis=2))  # [3,h,2w]
    upper_c = jax.device_put(jnp.concatenate(
        [jnp.asarray(upper_np), np.zeros((h, w), bool)], axis=1))
    hand_c = jax.device_put(jnp.concatenate(
        [jnp.zeros((h, w), bool), hmask], axis=1))
    kps_f = jnp.asarray(np.asarray(hkps)
                        + np.asarray([w, 0.0], np.float32))

    # Phase C runs UNSEEDED by default: the trained palm detector must
    # ACQUIRE the hand on the composite face+hand scene before the
    # landmark net can track it — the artifact covers the full hand
    # lifecycle (ACC_HAND_SEED=1 restores the seeded variant).
    seed_hand = os.environ.get("ACC_HAND_SEED", "0") == "1"

    def seeded_states():
        st = ms_c.init_states()
        if not seed_hand:
            return st
        tr = st.track
        r0 = warp.rect_transform(
            warp.landmarks_to_rect(kps_f, 0, 9, jnp.pi / 2),
            scale=2.0, shift_y=-0.1)
        ra = jnp.asarray([r0.cx, r0.cy, r0.w, r0.h, r0.rotation],
                         jnp.float32)
        return st._replace(track=tr._replace(
            hand_rects=jnp.broadcast_to(ra, tr.hand_rects.shape),
            hand_tracking=jnp.ones_like(tr.hand_tracking)))

    def body_c(params, hrv, carry, i):
        st = carry
        t = (i + 1.0) / FS
        amp_face = 12.0 * pulse(hr_hz, t, hrv)
        amp_hand = 12.0 * pulse(hr_hz, t - ptt_s, hrv)
        g = (base_c[1].astype(jnp.int16)[None]
             + jnp.where(upper_c[None], amp_face[:, None, None], 0.0
                         ).astype(jnp.int16)
             + jnp.where(hand_c[None], amp_hand[:, None, None], 0.0
                         ).astype(jnp.int16))
        frames = jnp.broadcast_to(base_c[None], (streams, 3, h, w_c))
        frames = frames.at[:, 1].set(
            jnp.clip(g, 0, 255).astype(jnp.uint8))
        ts = t * jnp.ones((streams,), jnp.float32)
        st, out = ms_c.engine.batch_step(params, st, frames, ts)
        return st, (out.bpm, out.ptt,
                    st.track.face_tracking,
                    jnp.all(st.track.hand_tracking, axis=-1))

    @jax.jit
    def run_c(params, hrv, st):
        return jax.lax.scan(functools.partial(body_c, params, hrv), st,
                            jnp.arange(STEPS, dtype=jnp.float32))

    def measure_phase_c(hrv):
        st, (bpm, ptt, ftr, htr) = run_c(
            ms_c.params, jnp.asarray(hrv, jnp.float32), seeded_states())
        jax.block_until_ready(bpm)
        q = STEPS // 4
        return (np.asarray(bpm, np.float64)[-1],      # [S, 2] fh + palm
                np.asarray(ptt, np.float64)[-1, :, 0],
                float(np.asarray(ftr)[q:].mean()),
                float(np.asarray(htr)[q:].mean()))

    got_c, _, ftr_c, htr_c = measure_phase_c((0.0, 0.0))
    got_cb, got_cptt, ftr_cb, htr_cb = measure_phase_c((0.35, 0.2))

    # --- Phase D: hand exit/re-entry under motion (VERDICT r4 next #7) ----
    # Same composite scene and engine as phase C, but the hand VANISHES
    # for ~1 s mid-run and returns at a different position AND scale
    # (0.10h -> 0.16h palm radius, opposite corner, different rotation).
    # Gates: the trained palm detector re-acquires within a bounded frame
    # count, tracking actually DROPS while the hand is gone (no ghost
    # rect), and HR + face->palm PTT recover on the NaN-masked rings —
    # the reference's VIDEO-mode re-detection semantics
    # (inference_runner.py:135-151) under stress, on hardware.
    T1 = (5 * STEPS) // 12
    GAP = max(STEPS // 12, 2)
    T2 = T1 + GAP
    REACQ_GATE_FRAMES = 45                        # 1.5 s at 30 Hz
    himg2, hkps2, _, hmask2 = render_hand(
        jax.random.key(5), True, fr=h,
        pose=(jnp.float32(0.30 * h), jnp.float32(0.35 * h),
              jnp.float32(-0.4), jnp.float32(0.16 * h)), with_mask=True)
    bg_img, _, _, _ = render_hand(jax.random.key(5), False, fr=h,
                                  with_mask=True)

    def compose_right(right_img):
        return jnp.concatenate(
            [jnp.asarray(synth_face().transpose(2, 0, 1)),
             jnp.clip(right_img, 0, 255).astype(jnp.uint8)], axis=2)

    bases_d = jax.device_put(jnp.stack(
        [base_c, compose_right(bg_img), compose_right(himg2)]))
    masks_d = jax.device_put(jnp.stack(
        [hand_c,
         jnp.zeros((h, w_c), bool),
         jnp.concatenate([jnp.zeros((h, w), dtype=bool),
                          hmask2], axis=1)]))
    hrv_d = jnp.asarray((0.35, 0.2), jnp.float32)

    def body_d(params, carry, i):
        st = carry
        t = (i + 1.0) / FS
        seg = (i >= T1).astype(jnp.int32) + (i >= T2).astype(jnp.int32)
        base_d = bases_d[seg]
        mask_d = masks_d[seg]
        amp_face = 12.0 * pulse(hr_hz, t, hrv_d)
        amp_hand = 12.0 * pulse(hr_hz, t - ptt_s, hrv_d)
        g = (base_d[1].astype(jnp.int16)[None]
             + jnp.where(upper_c[None], amp_face[:, None, None], 0.0
                         ).astype(jnp.int16)
             + jnp.where(mask_d[None], amp_hand[:, None, None], 0.0
                         ).astype(jnp.int16))
        frames = jnp.broadcast_to(base_d[None], (streams, 3, h, w_c))
        frames = frames.at[:, 1].set(
            jnp.clip(g, 0, 255).astype(jnp.uint8))
        ts = t * jnp.ones((streams,), jnp.float32)
        st, out = ms_c.engine.batch_step(params, st, frames, ts)
        return st, (out.bpm, out.ptt, st.track.face_tracking,
                    jnp.all(st.track.hand_tracking, axis=-1))

    @jax.jit
    def run_d(params, st):
        return jax.lax.scan(functools.partial(body_d, params), st,
                            jnp.arange(STEPS, dtype=jnp.float32))

    _, (bpm_d, ptt_d, ftr_d, htr_d) = run_d(ms_c.params,
                                            ms_c.init_states())
    jax.block_until_ready(bpm_d)
    htr_d = np.asarray(htr_d)                     # [STEPS, S] tracked
    got_d = np.asarray(bpm_d, np.float64)[-1]
    got_dptt = np.asarray(ptt_d, np.float64)[-1, :, 0]
    d_pre = float(htr_d[T1 // 2:T1].mean())       # settled on pose 1
    d_gap = float(htr_d[min(T1 + 10, T2 - 1):T2].mean())  # actually lost
    post = htr_d[T2:]
    d_never = ~post.any(axis=0)
    d_reacq = np.where(d_never, post.shape[0],
                       np.argmax(post, axis=0)).astype(np.float64)
    ftr_d_frac = float(np.asarray(ftr_d)[STEPS // 4:].mean())

    want = 60.0 * np.asarray(hr_hz)
    err = np.abs(got - want[:, None])
    err_b = np.abs(got_b - want[:, None])
    # Negative: signal 1 (cheek) delayed by d peaks at lag -d in the
    # reference's correlate convention (see module docstring).
    want_ptt = -np.asarray(PTT0_MS + PTT_STEP_MS * np.arange(streams))
    err_ptt = np.abs(got_ptt - want_ptt)
    # Phase C (hand path): same truth table, palm ROI on the hand half.
    err_c = np.abs(got_c - want[:, None])
    err_cb = np.abs(got_cb - want[:, None])
    err_cptt = np.abs(got_cptt - want_ptt)
    # Phase D (exit/re-entry stress): HRV-window HR gate on both ROIs,
    # PTT within one sample, plus the lifecycle gates computed above.
    err_d = np.abs(got_d - want[:, None])
    err_dptt = np.abs(got_dptt - want_ptt)
    # Phase A' (lagged micro-batch): the periodic scene's HR must stay
    # exact through the throughput operating point.
    if got_mb is not None:
        err_mb = np.abs(got_mb - want[:, None])
        ok_mb = bool(np.isfinite(got_mb).all()
                     and (err_mb <= GATE_BPM).all() and mb_track > 0.99)
    else:
        err_mb, ok_mb = None, True
    ok_d = bool(d_pre > 0.99 and d_gap <= 0.05
                and not d_never.any()
                and d_reacq.max() <= REACQ_GATE_FRAMES
                and ftr_d_frac > 0.99
                and np.isfinite(got_d).all() and (err_d <= 8.0).all()
                and np.isfinite(got_dptt).all()
                and (err_dptt <= GATE_PTT_MS).all())
    ok = bool(np.isfinite(got).all() and (err <= GATE_BPM).all()
              and np.isfinite(got_ptt).all()
              and (err_ptt <= GATE_PTT_MS).all()
              and np.isfinite(got_b).all() and (err_b <= 8.0).all()
              and track_frac > 0.99 and track_frac_b > 0.99
              and hrv_oracle_delta <= 1.0
              and np.isfinite(got_c).all() and (err_c <= GATE_BPM).all()
              and np.isfinite(got_cptt).all()
              and (err_cptt <= GATE_PTT_MS).all()
              and np.isfinite(got_cb).all() and (err_cb <= 8.0).all()
              and min(ftr_c, ftr_cb) > 0.99
              and min(htr_c, htr_cb) > 0.99
              and ok_d and ok_mb)

    rec = {
        "metric": "rppg_tpu_accuracy_max_bpm_err",
        "value": round(float(err.max()), 3) if np.isfinite(err).all()
        else None,
        "unit": f"BPM abs err (gate {GATE_BPM}); {streams} streams "
                f"{int(want[0])}-{int(want[-1])} BPM ground truth, "
                f"2 face ROIs each",
        "ok": ok,
        "backend": jax.default_backend(),
        "compute_dtype": cfg.compute_dtype,
        "fast_paths": {"use_pallas": cfg.inference.use_pallas,
                       "fused_stem": cfg.inference.fused_stem,
                       "fused_trunk": cfg.inference.fused_trunk},
        "per_stream_bpm": [[round(float(v), 2) for v in row]
                           for row in got],
        "ground_truth_bpm": [round(float(v), 2) for v in want],
        "max_ptt_err_ms": round(float(err_ptt.max()), 2)
        if np.isfinite(got_ptt).all() else None,
        "ptt_gate_ms": GATE_PTT_MS,
        "per_stream_ptt_ms": [round(float(v), 2) for v in got_ptt],
        "ground_truth_ptt_ms": [round(float(v), 2) for v in want_ptt],
        "hrv_phase_max_bpm_err": round(float(err_b.max()), 2)
        if np.isfinite(got_b).all() else None,
        "hrv_phase_bpm_gate": 8.0,
        "hrv_oracle_delta_bpm": round(hrv_oracle_delta, 3),
        "hrv_oracle_gate_bpm": 1.0,
        "track_frac_steady": round(track_frac, 4),
        "hand_phase": {
            "trained_standin": hand_trained,
            "hand_seeded": seed_hand,
            "max_bpm_err": round(float(err_c.max()), 3)
            if np.isfinite(got_c).all() else None,
            "per_stream_bpm_palm": [round(float(v), 2)
                                    for v in got_c[:, 1]],
            "max_ptt_err_ms": round(float(err_cptt.max()), 2)
            if np.isfinite(got_cptt).all() else None,
            "per_stream_ptt_ms": [round(float(v), 2) for v in got_cptt],
            "hrv_phase_max_bpm_err": round(float(err_cb.max()), 2)
            if np.isfinite(got_cb).all() else None,
            "face_track_frac": round(min(ftr_c, ftr_cb), 4),
            "hand_track_frac": round(min(htr_c, htr_cb), 4),
        },
        "hand_stress_phase": {
            "ok": ok_d,
            "timeline_frames": {"pose1": T1, "gap": GAP,
                                "pose2": STEPS - T2},
            "pose_change": "palm radius 0.10h -> 0.16h, opposite corner, "
                           "rotation 0.35 -> -0.4 rad",
            "tracked_frac_pose1_settled": round(d_pre, 4),
            "tracked_frac_while_gone": round(d_gap, 4),
            "reacq_latency_frames_max": round(float(d_reacq.max()), 1),
            "reacq_latency_frames_mean": round(float(d_reacq.mean()), 1),
            "reacq_gate_frames": REACQ_GATE_FRAMES,
            "never_reacquired_streams": int(d_never.sum()),
            "max_bpm_err": round(float(err_d.max()), 2)
            if np.isfinite(got_d).all() else None,
            "max_ptt_err_ms": round(float(err_dptt.max()), 2)
            if np.isfinite(got_dptt).all() else None,
            "face_track_frac": round(ftr_d_frac, 4),
        },
        "micro_batch_phase": None if got_mb is None else {
            "ok": ok_mb,
            "micro_batch": MB,
            "max_bpm_err": round(float(err_mb.max()), 3)
            if np.isfinite(got_mb).all() else None,
            "face_track_frac": round(mb_track, 4),
        },
        "steps": STEPS,
    }
    print(json.dumps(rec), flush=True)
    # The round artifact is only written by a FULL-length hardware run: an
    # ACC_STEPS-shortened smoke (rings not settled) must not masquerade as
    # the round's accuracy claim (advisor r4).
    if on_tpu and STEPS >= 360:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TPUACC_r05.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
    elif on_tpu:
        print(f"tpu_accuracy: ACC_STEPS={STEPS} < 360 — smoke run, round "
              f"artifact NOT written", file=sys.stderr, flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
