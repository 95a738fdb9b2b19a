"""Real-weight asset drop-in path, driven end-to-end with REAL TFLite
flatbuffers built at test time (tests/tflite_fixtures.py).

VERDICT.md Weak #5: the `.task` blob-name heuristics and the 2016-anchor
PALM decode had never executed against a real bundle — a name mismatch
would silently fall back to random stand-ins.  These tests pin:
  * bundle member-name resolution (palm/landmark heuristics),
  * TFLite->JAX compilation of the hand pipeline nets,
  * PALM decode against the 2016 BlazePalm anchors + weighted NMS,
  * detection->rect->crop->landmark->projection plumbing (closed form,
    the fixture nets are input-independent),
  * the real selfie-multiclass I/O contract (softmax confidences),
  * LOUD warnings + ``real_weights`` flags whenever stand-ins are used.
"""

import logging
import zipfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bp_from_video_tpu.config import InferenceConfig, RunningMode
from bp_from_video_tpu.models.runner import InferenceRunner

from tests import tflite_fixtures as fx

pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def hand_task(tmp_path_factory):
    p = tmp_path_factory.mktemp("assets") / "hand_landmarker.task"
    p.write_bytes(fx.build_hand_task_bundle())
    return str(p)


@pytest.fixture(scope="module")
def seg_tflite(tmp_path_factory):
    p = tmp_path_factory.mktemp("assets") / "selfie_multiclass.tflite"
    p.write_bytes(fx.build_segmenter())
    return str(p)


@pytest.fixture(scope="module")
def video_runner(hand_task):
    """ONE shared VIDEO-mode runner + jitted predict for every test that
    drives the fixture bundle (construction compiles both hand graphs and
    predict traces the 2016-anchor decode — repeating that per test made
    this module a suite-time hog).  The runner is stateless; each test
    starts from its own init_state()."""
    runner = InferenceRunner(_hand_cfg(hand_task), 192, 192)
    return runner, jax.jit(runner.predict)


def _hand_cfg(path, mode=RunningMode.VIDEO):
    return InferenceConfig(
        face_detector=False, face_landmarker=False, hand_landmarker=True,
        person_segmenter=False, hand_landmarker_path=path,
        running_mode=mode)


def expected_hand_points(frame_wh=192):
    """Closed-form expected landmark pixels (reference pixel contract:
    clip then floor) for the fixture constants on a square frame equal to
    the palm input size (letterbox is identity there)."""
    ax, ay = fx.PALM_STAR_CENTER
    cx, cy = ax * frame_wh, ay * frame_wh          # det box center
    # rect_transform(scale=2.6, shift_y=-0.5) at rotation 0.
    side = fx.PALM_BOX_WH * 2.6
    rcx, rcy = cx, cy - 0.5 * fx.PALM_BOX_WH
    pts = fx.hand_landmark_points().astype(np.float64)
    x = rcx + (pts[:, 0] / 224.0 - 0.5) * side
    y = rcy + (pts[:, 1] / 224.0 - 0.5) * side
    x = np.floor(np.clip(x, 0, frame_wh - 1))
    y = np.floor(np.clip(y, 0, frame_wh - 1))
    return np.stack([x, y], axis=-1)


def test_hand_bundle_resolves_and_decodes(video_runner):
    rng = np.random.RandomState(0)
    runner, predict = video_runner
    assert runner.real_weights == {"palm_det": True, "hand_lm": True}

    state = runner.init_state()
    frame = jnp.asarray(rng.randint(0, 255, (192, 192, 3)), jnp.uint8)
    new_state, res = predict(runner.params, state, frame)

    hands = res.hand_landmarker
    assert int(hands.count) == 1
    assert bool(new_state.hand_tracking[0]) and not bool(
        new_state.hand_tracking[1])
    got = np.asarray(hands.points[0], np.float64)
    np.testing.assert_allclose(got, expected_hand_points(), atol=1.0)
    # Exact for all landmarks whose float position is not within f32 noise
    # of an integer boundary (the fixture constants keep them clear).
    np.testing.assert_array_equal(got, expected_hand_points())
    # Slot 1 (no second hand): NaN detection contract.
    assert np.isnan(np.asarray(hands.bbox[1])).all()


def test_hand_video_mode_tracks_across_frames(video_runner):
    rng = np.random.RandomState(1)
    runner, predict = video_runner
    state = runner.init_state()
    frame = jnp.asarray(rng.randint(0, 255, (192, 192, 3)), jnp.uint8)
    state, res1 = predict(runner.params, state, frame)
    # Frame 2: slot 0 tracked -> landmark rect comes from frame 1's
    # landmarks; presence stays 0.9 so the hand persists.
    state, res2 = predict(runner.params, state, frame)
    assert int(res2.hand_landmarker.count) == 1
    assert bool(state.hand_tracking[0])
    pts = np.asarray(res2.hand_landmarker.points[0])
    assert np.isfinite(pts).all()
    assert (pts >= 0).all() and (pts <= 191).all()


@pytest.mark.slow
def test_image_mode_is_deterministic(hand_task):
    rng = np.random.RandomState(2)
    runner = InferenceRunner(_hand_cfg(hand_task, RunningMode.IMAGE), 192, 192)
    state = runner.init_state()
    f1 = jnp.asarray(rng.randint(0, 255, (192, 192, 3)), jnp.uint8)
    f2 = jnp.asarray(rng.randint(0, 255, (192, 192, 3)), jnp.uint8)
    _, r1 = runner.predict(runner.params, state, f1)
    _, r2 = runner.predict(runner.params, state, f2)
    # Input-independent fixture nets: identical outputs on any frame.
    np.testing.assert_array_equal(np.asarray(r1.hand_landmarker.points),
                                  np.asarray(r2.hand_landmarker.points))


def test_bundle_name_mismatch_warns_loudly(tmp_path, caplog):
    bad = tmp_path / "hand_landmarker.task"
    bad.write_bytes(fx.build_hand_task_bundle(
        palm_name="model_a.tflite", lm_name="model_b.tflite"))
    with caplog.at_level(logging.WARNING, "bp_from_video_tpu.models.runner"):
        runner = InferenceRunner(_hand_cfg(str(bad)), 192, 192)
    assert runner.real_weights == {"palm_det": False, "hand_lm": False}
    text = caplog.text
    assert "blob-name resolution failed" in text
    assert "model_a.tflite" in text
    assert "RANDOM-INIT" in text


def test_missing_asset_warns_loudly(caplog):
    with caplog.at_level(logging.WARNING, "bp_from_video_tpu.models.runner"):
        runner = InferenceRunner(_hand_cfg(None), 192, 192)
    assert runner.real_weights == {"palm_det": False, "hand_lm": False}
    assert caplog.text.count("RANDOM-INIT") == 2


def test_bundle_zip_members(hand_task):
    # The fixture bundle uses the real MediaPipe member names the
    # heuristics must keep matching.
    names = zipfile.ZipFile(hand_task).namelist()
    assert "palm_detection.tflite" in names
    assert "hand_landmarks_detector.tflite" in names


def test_segmenter_real_blob_contract(seg_tflite):
    rng = np.random.RandomState(3)
    cfg = InferenceConfig(
        face_detector=False, face_landmarker=False, hand_landmarker=False,
        person_segmenter=True, person_segmenter_path=seg_tflite)
    runner = InferenceRunner(cfg, 64, 64)
    assert runner.real_weights == {"seg": True}
    state = runner.init_state()
    frame = jnp.asarray(rng.randint(0, 255, (64, 64, 3)), jnp.uint8)
    _, res = runner.predict(runner.params, state, frame)
    assert bool(res.seg_valid)
    # Constant logits -> argmax class everywhere; conf = softmax(logits).
    assert (np.asarray(res.seg_class) == int(np.argmax(fx.SEG_LOGITS))).all()
    want = np.exp(fx.SEG_LOGITS) / np.exp(fx.SEG_LOGITS).sum()
    got = np.asarray(res.seg_conf, np.float64)   # [6, H, W]
    # bf16 upsample path: ~1e-2 mask-grade tolerance.
    np.testing.assert_allclose(got.mean(axis=(1, 2)), want, atol=1e-2)
    assert res.seg_conf.shape == (6, 64, 64)


def test_resize_bilinear_compiles_to_interpreter_parity():
    """RESIZE_BILINEAR in every coordinate mode — half-pixel (up AND down,
    warp.resize_bilinear_planar/_nhwc), align-corners and asymmetric
    (_resize_bilinear_legacy) — lowers to MXU interpolation matmuls that
    must match the TFLite interpreter, including the no-antialias
    downscale jax.image.resize gets wrong."""
    from bp_from_video_tpu.models import tflite_compiler as tc
    from tests.test_tflite_compiler import tflite_reference

    data = fx.build_resize_net()
    rng = np.random.RandomState(11)
    x = rng.uniform(-1, 1, (1, 16, 20, 3)).astype(np.float32)
    want = tflite_reference(data, [x])

    for layout, planar in (("NHWC", False), ("NCHW", True)):
        fn, params = tc.compile_tflite(data, layout=layout,
                                       planar_inputs=planar)
        xin = (jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)) if planar
               else jnp.asarray(x))
        for g, w in zip(fn(params, xin), want):
            g = np.asarray(g)
            if g.shape != w.shape:                            # planar out
                g = np.transpose(g, (0, 2, 3, 1))
            np.testing.assert_allclose(g, w, atol=2e-5)


def test_resize_nearest_compiles_to_interpreter_parity():
    """RESIZE_NEAREST_NEIGHBOR lowers to one-hot selection matmuls with
    exact per-flag TFLite index semantics (half-pixel, align-corners,
    legacy) — nearest selection must be BIT-exact vs the interpreter."""
    from bp_from_video_tpu.models import tflite_compiler as tc
    from tests.test_tflite_compiler import tflite_reference

    data = fx.build_resize_nearest_net()
    rng = np.random.RandomState(13)
    x = rng.uniform(-1, 1, (1, 12, 18, 3)).astype(np.float32)
    want = tflite_reference(data, [x])

    for layout, planar in (("NHWC", False), ("NCHW", True)):
        fn, params = tc.compile_tflite(data, layout=layout,
                                       planar_inputs=planar)
        xin = (jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)) if planar
               else jnp.asarray(x))
        got = [np.asarray(g) for g in fn(params, xin)]
        for g, w in zip(got, want):
            if g.shape != w.shape:
                g = np.transpose(g, (0, 2, 3, 1))
            np.testing.assert_allclose(g, w, atol=1e-6)


def test_lost_slot_does_not_steal_tracked_hand(video_runner):
    """VIDEO mode, slot 0 tracking the fixture's only hand, slot 1 lost:
    the re-run palm detector's lone detection overlaps slot 0's tracked
    rect and must be SUPPRESSED (MediaPipe's association calculator) —
    without it, slot 1 locks onto the same physical hand forever."""
    rng = np.random.RandomState(5)
    runner, predict = video_runner
    state = runner.init_state()
    frame = jnp.asarray(rng.randint(0, 255, (192, 192, 3)), jnp.uint8)
    state, _ = predict(runner.params, state, frame)
    assert list(np.asarray(state.hand_tracking)) == [True, False]
    # Frame 2: slot 1 is lost, the detector re-runs, and its lone
    # detection (IoU ~0.55 with slot 0's tracked rect) must be suppressed.
    # (Only one frame is checked: the fixture's input-independent landmark
    # net inflates the tracked rect ~1.5x per frame, so by frame 3 the
    # overlap legitimately drops below the 0.5 association threshold —
    # real landmark nets track the same physical hand at a stable rect.)
    state, res = predict(runner.params, state, frame)
    assert list(np.asarray(state.hand_tracking)) == [True, False]
    assert int(res.hand_landmarker.count) == 1


def test_associate_hand_dets_unit():
    from bp_from_video_tpu.models.runner import _associate_hand_dets

    t_rects = jnp.asarray([[50.0, 50.0, 40.0, 40.0, 0.0],
                           [0.0, 0.0, 0.0, 0.0, 0.0]])
    tracking = jnp.asarray([True, False])
    # Det 0 overlaps the tracked rect (suppressed); det 1 is elsewhere.
    det = jnp.asarray([[52.0, 50.0, 40.0, 40.0, 0.1],
                       [150.0, 150.0, 30.0, 30.0, 0.2]])
    rects, ok = _associate_hand_dets(tracking, t_rects, det,
                                     jnp.asarray([True, True]))
    assert list(np.asarray(ok)) == [True, True]
    np.testing.assert_allclose(np.asarray(rects[0]), np.asarray(t_rects[0]))
    np.testing.assert_allclose(np.asarray(rects[1]), np.asarray(det[1]))

    # Only the overlapping det exists -> the lost slot stays empty.
    rects, ok = _associate_hand_dets(tracking, t_rects, det,
                                     jnp.asarray([True, False]))
    assert list(np.asarray(ok)) == [True, False]
    assert np.isnan(np.asarray(rects[1])).all()

    # Nothing tracked -> detections fill slots in order.
    rects, ok = _associate_hand_dets(jnp.asarray([False, False]), t_rects,
                                     det, jnp.asarray([True, True]))
    assert list(np.asarray(ok)) == [True, True]
    np.testing.assert_allclose(np.asarray(rects), np.asarray(det))


def test_transpose_conv_declared_output_shape_parity():
    """TRANSPOSE_CONV honors the op's explicit output_shape (SAME with
    stride 2 admits both 2*in and 2*in-1; TFLite derives padding from the
    declared size) — parity vs the interpreter in both layouts."""
    from bp_from_video_tpu.models import tflite_compiler as tc
    from tests.test_tflite_compiler import tflite_reference

    data = fx.build_transpose_conv_net()
    rng = np.random.RandomState(17)
    x = rng.uniform(-1, 1, (1, 10, 14, 3)).astype(np.float32)
    want = tflite_reference(data, [x])[0]
    assert want.shape == (1, 39, 55, 2)

    for layout, planar in (("NHWC", False), ("NCHW", True)):
        fn, params = tc.compile_tflite(data, layout=layout,
                                       planar_inputs=planar)
        xin = (jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)) if planar
               else jnp.asarray(x))
        got = np.asarray(fn(params, xin)[0])
        if got.shape != want.shape:
            got = np.transpose(got, (0, 2, 3, 1))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_per_channel_int8_quantization_parity():
    """Per-channel int8 conv weights must dequantize with each channel's
    own scale — collapsing to Scale(0) is off by orders of magnitude on
    this fixture (channel scales span 0.01..10)."""
    from bp_from_video_tpu.models import tflite_compiler as tc
    from tests.test_tflite_compiler import tflite_reference

    data = fx.build_per_channel_int8_net()
    rng = np.random.RandomState(19)
    x = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    want = tflite_reference(data, [x])[0]

    fn, params = tc.compile_tflite(data)
    got = np.asarray(fn(params, jnp.asarray(x))[0])
    # Quantized reference: activation-grid tolerance, not fp exactness.
    scale = float(np.abs(want).max()) or 1.0
    assert np.abs(got - want).max() / scale < 0.05, (
        np.abs(got - want).max(), scale)
