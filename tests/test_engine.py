"""Fused engine step vs the full reference SignalProcessor.process loop,
with injected detections (bypassing the neural nets) over a synthetic pulsing
video — the strongest end-to-end DSP parity check, including the ±1 BPM
acceptance gate."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.config import (
    EngineConfig, InferenceConfig, SignalConfig, ModelType,
    SignalSpectrumTransform as T, SignalProcessingMethod as M,
    FACE_FOREHEAD_CONFIG, HAND_PALM_CONFIG)
from bp_from_video_tpu.models.runner import ModelResults
from bp_from_video_tpu.ops.roi import Detections
from bp_from_video_tpu.runtime.engine import Engine

from tests.ref_oracle import ref_signal_processor, ref_roi

H, W = 120, 160
N_FACE, N_HAND = 478, 21
HR_HZ = 1.3          # 78 BPM
HAND_DELAY = 0.04    # seconds (PTT ~40 ms)


def synth_landmarks(rng):
    """Static face + hand landmark layouts inside the frame."""
    face = np.clip(rng.randint(20, 100, size=(N_FACE, 2)), 0, None)
    face[151] = [60, 30]   # forehead anchor
    hand = rng.randint(90, 150, size=(N_HAND, 2))
    hand[0] = [110, 80]
    hand[9] = [120, 100]
    return face, hand


def make_frame(rng, t, face, hand):
    """Green channel pulses at HR_HZ in the face area, delayed in the hand."""
    frame = np.full((H, W, 3), 90, np.uint8)
    pulse_f = 20 + 12 * np.sin(2 * np.pi * HR_HZ * t)
    pulse_h = 20 + 12 * np.sin(2 * np.pi * HR_HZ * (t - HAND_DELAY))
    frame[10:70, 30:100, 1] = np.uint8(100 + pulse_f)
    frame[70:115, 90:155, 1] = np.uint8(100 + pulse_h)
    frame = frame + rng.randint(0, 3, frame.shape).astype(np.uint8)
    return frame


def detections_from(points, max_dets, drop=False):
    if drop:
        return Detections.empty(max_dets, points.shape[0])
    pts = points.astype(np.float32)
    bbox = np.array([pts[:, 0].min(), pts[:, 1].min(),
                     pts[:, 0].max(), pts[:, 1].max()], np.float32)
    b = np.full((max_dets, 4), np.nan, np.float32)
    p = np.full((max_dets,) + pts.shape, np.nan, np.float32)
    b[0], p[0] = bbox, pts
    return Detections(jnp.asarray(b), jnp.asarray(p), jnp.int32(1))


def mock_model_results(face, hand, drop_face=False, drop_hand=False):
    return ModelResults(
        face_detector=Detections.empty(4, 6),
        face_landmarker=detections_from(face, 1, drop_face),
        hand_landmarker=detections_from(hand, 2, drop_hand),
        seg_class=jnp.zeros((0, 0), jnp.int32),
        seg_conf=jnp.zeros((0, 0, 0), jnp.float32),
        seg_valid=jnp.asarray(False))


def ref_results(face, hand, drop_face=False, drop_hand=False):
    def dets(pts, drop):
        if drop:
            return []
        bbox = [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]
        return [(bbox, pts)]
    return types.SimpleNamespace(
        face_landmarker=types.SimpleNamespace(detections=dets(face, drop_face)),
        hand_landmarker=types.SimpleNamespace(detections=dets(hand, drop_hand)))


@pytest.mark.parametrize("transform,methods", [
    (T.PGRAM_LS, (M.FILTER_BUTTER,)),
    (T.PGRAM_WELCH, (M.FILTER_BUTTER,)),
    (T.DFT_RFFT, (M.DETREND_LINEAR,)),
])
def test_engine_signal_path_matches_reference(transform, methods):
    n_frames = 80
    fs = 25.0
    sig_cfg = SignalConfig(
        roi_configs=(FACE_FOREHEAD_CONFIG, HAND_PALM_CONFIG),
        signal_max_samples=64, peak_max_samples=16,
        processing_methods=methods, spectrum_transform=transform)
    cfg = EngineConfig(signal=sig_cfg, frame_height=H, frame_width=W,
                       inference=InferenceConfig(face_landmarker=False,
                                                 hand_landmarker=False))
    eng = Engine(cfg)
    state = eng.init_signal_state()
    step = jax.jit(eng.signal_step)

    sp = ref_signal_processor.SignalProcessor(
        selected_roi_configs=[ref_roi.FACE_FOREHEAD_CONFIG,
                              ref_roi.HAND_PALM_CONFIG],
        signal_max_samples=64, peak_max_samples=16,
        processing_methods=[getattr(ref_signal_processor.SignalProcessingMethod,
                                    m.name) for m in methods],
        spectrum_transform=getattr(ref_signal_processor.SignalSpectrumTransform,
                                   transform.name))

    rng = np.random.RandomState(0)
    face, hand = synth_landmarks(rng)
    out = ref_store = None
    for i in range(n_frames):
        t = np.float32((i + 1) / fs * (1 + 0.1 * np.sin(i)))
        frame_rgb = make_frame(rng, float(t), face, hand)
        drop_face = 30 <= i < 36  # face leaves the frame for a bit
        mine_models = mock_model_results(face, hand, drop_face=drop_face)
        state, out = step(state, mine_models, jnp.asarray(frame_rgb), t)
        fd = types.SimpleNamespace(frame=frame_rgb[..., ::-1],
                                   timestamp=float(t))
        ref_store = sp.process(fd, ref_results(face, hand, drop_face=drop_face))

    # Raw ring parity (exact sampling + NaN layout).
    ref_raw = np.stack([np.array(s.y, np.float64) for s in ref_store.sg_raw])
    mine_raw = np.asarray(out.raw_y, np.float64)
    assert (np.isnan(mine_raw) == np.isnan(ref_raw)).all()
    np.testing.assert_allclose(np.nan_to_num(mine_raw), np.nan_to_num(ref_raw),
                               atol=2e-3)

    # Processed + spectrum parity.
    ref_proc = np.stack([np.array(s.y, np.float64) for s in ref_store.sg_proc])
    mine_proc = np.asarray(out.proc_y, np.float64)
    scale = np.nanmax(np.abs(ref_proc)) + 1e-9
    assert (np.isnan(mine_proc) == np.isnan(ref_proc)).all()
    np.testing.assert_allclose(np.nan_to_num(mine_proc), np.nan_to_num(ref_proc),
                               atol=5e-3 * scale)

    # BPM / PTT means (the HUD numbers): ±1 BPM acceptance gate.
    ref_bpm = np.asarray(ref_store.sg_bpm.get_means(as_int=True), np.float64)
    mine_bpm = np.asarray(out.bpm, np.float64)
    assert np.all(np.abs(mine_bpm - ref_bpm) <= 1.0), (mine_bpm, ref_bpm)
    ref_ptt = np.asarray(ref_store.sg_ptt.get_means(as_int=True), np.float64)
    mine_ptt = np.asarray(out.ptt, np.float64)
    assert np.allclose(mine_ptt, ref_ptt, atol=1.0, equal_nan=True), \
        (mine_ptt, ref_ptt)

    # The estimated HR is actually right (synthetic truth 78 BPM). Only
    # Lomb-Scargle is robust to the heavy timestamp jitter in this fixture
    # (the reference README makes the same observation, README.md:44).
    if transform is T.PGRAM_LS:
        assert abs(float(mine_bpm[0]) - HR_HZ * 60) < 6, mine_bpm


def test_engine_bpm_accuracy_uniform_video():
    """Clean uniformly-sampled pulse: HR recovered within ±1 BPM of truth."""
    fs = 30.0
    sig_cfg = SignalConfig(roi_configs=(FACE_FOREHEAD_CONFIG, HAND_PALM_CONFIG),
                           signal_max_samples=128, peak_max_samples=16)
    cfg = EngineConfig(signal=sig_cfg, frame_height=H, frame_width=W,
                       inference=InferenceConfig(face_landmarker=False,
                                                 hand_landmarker=False))
    eng = Engine(cfg)
    state = eng.init_signal_state()
    step = jax.jit(eng.signal_step)
    rng = np.random.RandomState(1)
    face, hand = synth_landmarks(rng)
    for i in range(150):
        t = np.float32((i + 1) / fs)
        frame = make_frame(rng, float(t), face, hand)
        models = mock_model_results(face, hand)
        state, out = step(state, models, jnp.asarray(frame), t)
    bpm = float(np.asarray(out.bpm)[0])
    assert abs(bpm - HR_HZ * 60) <= 2.0, bpm
    # PTT near the synthetic 40 ms face->hand delay. scipy's correlate(a, b)
    # convention peaks at NEGATIVE lag when b is a delayed (the reference
    # inherits this sign), and the peak quantizes to the 33 ms frame period.
    ptt = float(np.asarray(out.ptt)[0])
    assert abs(ptt + HAND_DELAY * 1000) <= 25.0, ptt


@pytest.mark.slow
def test_batch_step_planar_frames_match_nhwc():
    """batch_step accepts planar ([S, 3, H, W]) frames — the feeder/bench
    upload layout — with results identical to NHWC."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bp_from_video_tpu.config import (EngineConfig, InferenceConfig,
                                          SignalConfig)
    from bp_from_video_tpu.runtime.engine import Engine

    cfg = EngineConfig(
        frame_height=48, frame_width=64, num_streams=2,
        signal=SignalConfig(signal_max_samples=16, peak_max_samples=4),
        inference=InferenceConfig(
            face_detector_path=None, face_landmarker_path=None,
            hand_landmarker_path=None, person_segmenter_path=None))
    eng = Engine(cfg)
    state = jax.tree.map(lambda x: jnp.stack([x, x]), eng.init_state())
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (2, 48, 64, 3), np.uint8))
    ts = jnp.asarray([1 / 30.0, 1 / 30.0], jnp.float32)
    st_a, out_a = jax.jit(eng.batch_step)(eng.params, state, frames, ts)
    st_b, out_b = jax.jit(eng.batch_step)(
        eng.params, state, jnp.transpose(frames, (0, 3, 1, 2)), ts)
    for a, b in zip(jax.tree.leaves((st_a, out_a)),
                    jax.tree.leaves((st_b, out_b))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stale_batch_resend_does_not_advance_rings():
    """The latest-wins feeder re-ships a stream's previous (frame,
    timestamp) whenever only other streams were fresh; re-sends must not
    push duplicate rows (dx=0 -> inf fs, halved spectral window).  A
    timestamp equal to the ring tail identifies the re-send (per-stream
    timestamps strictly increase)."""
    cfg = EngineConfig(
        signal=SignalConfig(signal_max_samples=16, peak_max_samples=4),
        inference=InferenceConfig(
            face_detector_path=None, face_landmarker_path=None,
            hand_landmarker_path=None, person_segmenter_path=None),
        frame_height=32, frame_width=32)
    eng = Engine(cfg)
    step = jax.jit(eng.step)
    state = eng.init_state()
    rng = np.random.default_rng(3)
    frame = jnp.asarray(rng.integers(0, 256, (32, 32, 3), np.uint8))
    for t in range(4):
        state, out = step(eng.params, state, frame,
                          jnp.float32((t + 1) / 30.0))
    raw_x_before = np.asarray(state.signals.raw_x)
    # Re-send of the SAME timestamp: signal state must not change.
    state2, out2 = step(eng.params, state, frame, jnp.float32(4 / 30.0))
    np.testing.assert_array_equal(np.asarray(state2.signals.raw_x),
                                  raw_x_before)
    np.testing.assert_array_equal(np.asarray(state2.signals.bpm_x),
                                  np.asarray(state.signals.bpm_x))
    # A genuinely fresh timestamp advances again.
    state3, _ = step(eng.params, state2, frame, jnp.float32(5 / 30.0))
    assert float(np.asarray(state3.signals.raw_x)[-1]) == np.float32(5 / 30.0)


def _tiny_lagged_engine(streams=2):
    cfg = EngineConfig(
        frame_height=48, frame_width=64, num_streams=streams,
        signal=SignalConfig(signal_max_samples=16, peak_max_samples=4),
        inference=InferenceConfig(
            face_detector_path=None, face_landmarker_path=None,
            hand_landmarker_path=None, person_segmenter_path=None))
    eng = Engine(cfg)
    state = jax.tree.map(
        lambda x: jnp.stack([x] * streams), eng.init_state())
    return eng, state


def test_batch_step_lagged_f1_equals_batch_step():
    """F=1 micro-batch is EXACTLY the per-frame batch step (same rects,
    same pushes, same analysis) — the lagged path's base contract."""
    eng, state = _tiny_lagged_engine()
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 256, (2, 48, 64, 3), np.uint8))
    ts = jnp.asarray([1 / 30.0, 1 / 30.0], jnp.float32)
    st_a, out_a = jax.jit(eng.batch_step)(eng.params, state, frames, ts)
    st_b, out_b = jax.jit(eng.batch_step_lagged)(
        eng.params, state, frames[None], ts[None])
    for a, b in zip(jax.tree.leaves((st_a, out_a)),
                    jax.tree.leaves((st_b, out_b))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_step_lagged_ring_mechanics():
    """F=3: the raw ring advances by exactly the 3 window timestamps per
    step while the vitals rings advance by ONE (analysis runs once per
    window — the documented micro-batch operating point)."""
    eng, state = _tiny_lagged_engine()
    rng = np.random.default_rng(5)
    f_n = 3
    lag = jax.jit(eng.batch_step_lagged)
    for k in range(2):
        frames = jnp.asarray(rng.integers(
            0, 256, (f_n, 2, 48, 64, 3), np.uint8))
        base = (k * f_n + 1) / 30.0
        ts = jnp.asarray(base + jnp.arange(f_n)[:, None] / 30.0
                         + jnp.zeros((1, 2)), jnp.float32)
        state, out = lag(eng.params, state, frames, ts)
    raw_x = np.asarray(state.signals.raw_x)     # [S, N]
    want_tail = np.asarray(ts)[:, 0]
    np.testing.assert_allclose(raw_x[0, -f_n:], want_tail, rtol=1e-6)
    # 6 frames pushed total; the rest of the ring is still NaN-prefilled.
    assert np.isfinite(raw_x[0]).sum() == 2 * f_n
    # vitals rings: one push per lagged step.
    assert np.isfinite(np.asarray(state.signals.bpm_x)[0]).sum() == 2
    # models output is the LAST frame's results (shape contract).
    assert out.models.face_landmarker.points.shape[0] == 2
