"""End-to-end driver tests: synthetic pulsing video file -> sequential and
pipelined drivers (headless) -> plausible HR out; CLI argument mapping."""

import numpy as np
import pytest

import jax.numpy as jnp

from bp_from_video_tpu.cli import build_parser, config_from_args
from bp_from_video_tpu.config import (
    CaptureConfig, EngineConfig, InferenceConfig, SignalConfig,
    SignalProcessingMethod, SignalSpectrumTransform)

cv2 = pytest.importorskip("cv2")

H, W, FPS, N_FRAMES = 64, 80, 30.0, 60


@pytest.fixture(scope="module")
def pulse_video(tmp_path_factory):
    """Uncompressed AVI with a 1.5 Hz green pulse across the whole frame."""
    path = str(tmp_path_factory.mktemp("vid") / "pulse.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter.fourcc(*"MJPG"), FPS, (W, H))
    assert wr.isOpened()
    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        t = i / FPS
        g = 110 + 40 * np.sin(2 * np.pi * 1.5 * t)
        frame = np.full((H, W, 3), 90, np.uint8)
        frame[..., 1] = np.uint8(g)
        frame += rng.integers(0, 3, frame.shape, dtype=np.uint8)
        wr.write(frame)
    wr.release()
    return path


def tiny_engine_config():
    return EngineConfig(
        signal=SignalConfig(signal_max_samples=48, peak_max_samples=8),
        inference=InferenceConfig(
            face_detector_path=None, face_landmarker_path=None,
            hand_landmarker_path=None, person_segmenter_path=None))


def test_sequential_driver_runs_to_eof(pulse_video, capsys):
    from bp_from_video_tpu.drivers import sequential
    out = sequential.run(tiny_engine_config(), CaptureConfig(path=pulse_video),
                         show=False, print_profile=True)
    assert out is not None
    assert out.raw_x.shape == (48,)
    # The profiler report covers the stage boundaries.
    report = capsys.readouterr().out
    assert "engine_step" in report and "read_frame" in report


def test_pipelined_driver_runs(pulse_video):
    from bp_from_video_tpu.drivers import pipelined
    out = pipelined.run(tiny_engine_config(),
                        [CaptureConfig(path=pulse_video),
                         CaptureConfig(path=pulse_video)],
                        show=False, max_frames=10, print_profile=False)
    assert out is not None
    assert out.bpm.shape[0] == 2   # stream-major outputs


def test_cli_config_mapping():
    args = build_parser().parse_args([
        "--source", "vid.mp4", "--rois", "forehead", "cheek",
        "--channel", "chrom_green", "--methods", "detrend_linear",
        "filter_butter", "--transform", "pgram_welch",
        "--signal-samples", "128", "--min-freq", "0.7",
        "--models", "face_landmarker", "--running-mode", "image",
        "--dtype", "bfloat16", "--crop-portrait", "--no-flip",
        "--calibration-time", "2.5"])
    cfg, caps = config_from_args(args)
    assert cfg.signal.num_signals == 2
    assert cfg.signal.color_channel.value == "chrom_green"
    assert cfg.signal.processing_methods == (
        SignalProcessingMethod.DETREND_LINEAR,
        SignalProcessingMethod.FILTER_BUTTER)
    assert cfg.signal.spectrum_transform is SignalSpectrumTransform.PGRAM_WELCH
    assert cfg.signal.signal_max_samples == 128
    assert cfg.signal.min_freq == 0.7
    assert cfg.inference.face_landmarker and not cfg.inference.hand_landmarker
    assert cfg.inference.running_mode.value == "image"
    assert cfg.compute_dtype == "bfloat16"
    assert caps[0].path == "vid.mp4"
    assert caps[0].crop_portrait is True
    assert caps[0].flip_horizontally is False
    assert caps[0].calibration_time == 2.5


def test_cli_preset():
    args = build_parser().parse_args(["--preset", "multistream"])
    cfg, _ = config_from_args(args)
    assert cfg.inference.person_segmenter
    assert cfg.num_streams == 8


@pytest.mark.slow
def test_offline_batch_processing(pulse_video):
    from bp_from_video_tpu.runtime import offline

    out, clip_ts = offline.process_videos(
        [pulse_video, pulse_video], tiny_engine_config(), max_frames=30,
        chunk=16)
    assert clip_ts.shape == (30, 2)
    np.testing.assert_allclose(clip_ts[:, 0], np.arange(30) / FPS,
                               atol=1e-3)
    assert out.bpm.shape[0] == 30            # capped by max_frames
    assert out.bpm.shape[1] == 2             # two streams
    assert np.isfinite(out.curr_fs[5:]).all()
    # The 30-frame clip at chunk=16 runs a PADDED tail block (tail blocks
    # reuse the compiled chunk shape; pad steps must not leak into kept
    # outputs): results must equal the single-block run exactly.
    out1, _ = offline.process_videos(
        [pulse_video, pulse_video], tiny_engine_config(), max_frames=30,
        chunk=30)
    np.testing.assert_allclose(out.bpm, out1.bpm, equal_nan=True, atol=1e-5)
    np.testing.assert_allclose(out.ptt, out1.ptt, equal_nan=True, atol=1e-5)


@pytest.mark.slow  # IMAGE-mode semantics are covered at runner level
def test_image_running_mode(pulse_video):
    """IMAGE mode re-detects every frame (reference inference_runner.py:97-102)
    — tracking state must stay disengaged."""
    import dataclasses
    import jax
    from bp_from_video_tpu.runtime.engine import Engine
    from bp_from_video_tpu.config import RunningMode

    cfg = tiny_engine_config()
    cfg = dataclasses.replace(cfg, inference=dataclasses.replace(
        cfg.inference, running_mode=RunningMode.IMAGE))
    eng = Engine(cfg)
    step = jax.jit(eng.step)
    state = eng.init_state()
    frame = jnp.zeros((cfg.frame_height, cfg.frame_width, 3), jnp.uint8)
    for t in range(3):
        state, out = step(eng.params, state, frame, jnp.float32((t + 1) / 30))
    assert out.raw_y.shape == (2, 48)


@pytest.mark.slow
def test_pipelined_driver_with_mesh(pulse_video):
    """Pipelined driver over a dp mesh (shard_map path end-to-end with real
    capture threads)."""
    from bp_from_video_tpu.drivers import pipelined
    from bp_from_video_tpu.parallel import make_mesh
    from conftest import cpu_devices

    mesh = make_mesh({"dp": 2}, cpu_devices(2))
    out = pipelined.run(tiny_engine_config(),
                        [CaptureConfig(path=pulse_video),
                         CaptureConfig(path=pulse_video)],
                        mesh=mesh, show=False, max_frames=6,
                        print_profile=False)
    assert out is not None and out.bpm.shape[0] == 2


@pytest.mark.slow
def test_cli_offline_mode(pulse_video, capsys):
    from bp_from_video_tpu.cli import main

    rc = main(["--source", pulse_video, "--offline", "--headless",
               "--signal-samples", "48", "--peak-samples", "8",
               "--models", "face_landmarker", "--rois", "forehead",
               "--no-pallas", "--max-frames", "30"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "settled mean BPM" in out


@pytest.mark.slow
def test_cli_bp_estimation_offline(pulse_video, tmp_path, capsys):
    """Train a BP head on the synthetic task, then --bp through the offline
    CLI: the settled report carries a per-stream BP estimate (or NaN when
    the head's vitals never settle — the graceful-degradation contract)."""
    from bp_from_video_tpu.cli import main
    from bp_from_video_tpu.train.__main__ import main as train_main

    pred_path = str(tmp_path / "pred.npz")
    # 2 BPM columns + 1 PTT pair matches the default dual-ROI config.
    assert train_main(["--synthetic", "256", "--steps", "30", "--batch",
                       "64", "--predictor", pred_path]) == 0
    capsys.readouterr()

    rc = main(["--source", pulse_video, "--offline", "--headless",
               "--signal-samples", "48", "--peak-samples", "8",
               "--no-pallas", "--max-frames", "30", "--bp", pred_path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "settled mean BP:" in out
