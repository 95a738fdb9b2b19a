"""Recorder + checkpoint/resume tests."""

import os

import jax.numpy as jnp
import numpy as np

from bp_from_video_tpu.runtime import recorder as rec


class FakeOut:
    def __init__(self, bpm, ptt, fs):
        self.bpm = jnp.asarray(bpm)
        self.ptt = jnp.asarray(ptt)
        self.curr_fs = jnp.asarray(fs)


def test_signal_recorder_roundtrip(tmp_path):
    path = str(tmp_path / "run.npz")
    r = rec.SignalRecorder(path)
    for t in range(5):
        r.add(t / 30.0, FakeOut([60.0 + t, 70.0], [25.0], 30.0))
    assert len(r) == 5
    r.save()
    data = np.load(path)
    assert data["bpm"].shape == (5, 2)
    np.testing.assert_allclose(data["bpm"][:, 0], 60 + np.arange(5))
    np.testing.assert_allclose(data["timestamp"],
                               np.arange(5, dtype=np.float32) / 30.0)


def test_state_checkpoint_roundtrip(tmp_path):
    from bp_from_video_tpu.config import EngineConfig, InferenceConfig, SignalConfig
    from bp_from_video_tpu.runtime.engine import Engine

    cfg = EngineConfig(
        signal=SignalConfig(signal_max_samples=8, peak_max_samples=4),
        inference=InferenceConfig(
            face_detector_path=None, face_landmarker_path=None,
            hand_landmarker_path=None, person_segmenter_path=None),
        frame_height=16, frame_width=16)
    eng = Engine(cfg)
    state = eng.init_state()
    # Mutate something recognizable.
    sig = state.signals._replace(raw_x=jnp.arange(8, dtype=jnp.float32))
    state = state._replace(signals=sig)

    path = str(tmp_path / "ckpt")
    saved = rec.save_state(path, state)
    restored = rec.load_state(saved if saved.endswith(".npz") else path,
                              eng.init_state())
    np.testing.assert_allclose(np.asarray(restored.signals.raw_x),
                               np.arange(8))
    assert restored.track.face_rect.shape == state.track.face_rect.shape


def test_signal_recorder_mixed_live_and_clip_rows(tmp_path):
    """add() steps and add_clip() clips mix into one uniformly stacked npz
    (clips are stored row-per-step)."""
    class FakeClip:
        def __init__(self, t):
            self.bpm = jnp.asarray([[60.0 + t, 70.0], [61.0 + t, 71.0]])
            self.ptt = jnp.asarray([[25.0], [26.0]])
            self.curr_fs = jnp.asarray([30.0, 30.0])

    path = str(tmp_path / "mixed.npz")
    r = rec.SignalRecorder(path)
    r.add(0.0, FakeOut([60.0, 70.0], [25.0], 30.0))
    r.add_clip([1 / 30.0, 2 / 30.0], FakeClip(1.0))
    r.add(3 / 30.0, FakeOut([63.0, 73.0], [28.0], 30.0))
    assert len(r) == 4
    r.save()
    data = np.load(path)  # default allow_pickle=False must succeed
    assert data["bpm"].shape == (4, 2)
    np.testing.assert_allclose(data["timestamp"],
                               np.arange(4, dtype=np.float32) / 30.0)


def test_save_returns_existing_path_without_suffix(tmp_path):
    """np.savez appends '.npz' when missing; save() must return the path
    of the file that actually exists."""
    import os

    r = rec.SignalRecorder(str(tmp_path / "out"))
    r.add(0.1, FakeOut([60.0], [20.0], 30.0))
    path = r.save()
    assert path.endswith(".npz") and os.path.exists(path)
