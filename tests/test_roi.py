"""ROI geometry + sampling parity vs the reference implementation."""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.config import (
    ModelType, SignalColorChannel, FACE_FOREHEAD_CONFIG, FACE_CHEEK_CONFIG,
    HAND_PALM_CONFIG)
from bp_from_video_tpu.ops import roi as roi_ops
from bp_from_video_tpu.ops import signal as sig

from tests.ref_oracle import ref_signal_processor, ref_roi


def ref_calc_rois(roi_cfgs, face_dets, hand_dets):
    # The reference SignalStore requires >=2 signals (comb(1,2)=0 crashes a
    # SignalGroup); pad the config list, results index per-config anyway.
    sp = ref_signal_processor.SignalProcessor(
        selected_roi_configs=list(roi_cfgs) * 2)
    results = types.SimpleNamespace(
        face_landmarker=types.SimpleNamespace(detections=face_dets),
        hand_landmarker=types.SimpleNamespace(detections=hand_dets))
    return sp.calc_rois(results)


def to_detections(dets, max_dets, num_points):
    out = roi_ops.Detections.empty(max_dets, num_points)
    if not dets:
        return out
    bbox = np.full((max_dets, 4), np.nan, np.float32)
    pts = np.full((max_dets, num_points, 2), np.nan, np.float32)
    for i, (b, p) in enumerate(dets):
        bbox[i] = b
        pts[i] = p
    return roi_ops.Detections(jnp.asarray(bbox), jnp.asarray(pts),
                              jnp.int32(len(dets)))


REF_CFGS = {
    "forehead": (FACE_FOREHEAD_CONFIG, ref_roi.FACE_FOREHEAD_CONFIG),
    "cheek": (FACE_CHEEK_CONFIG, ref_roi.FACE_CHEEK_CONFIG),
    "palm": (HAND_PALM_CONFIG, ref_roi.HAND_PALM_CONFIG),
}


@pytest.mark.parametrize("name", list(REF_CFGS))
def test_calc_roi_parity(name):
    mine_cfg, ref_cfg = REF_CFGS[name]
    rng = np.random.RandomState(hash(name) % 2**31)
    n_pts = 478 if mine_cfg.model_type is ModelType.FACE_LANDMARKER else 21
    for trial in range(20):
        pts = rng.randint(0, 480, size=(n_pts, 2))
        bbox = [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]
        det = (bbox, pts)
        face = [det] if mine_cfg.model_type is ModelType.FACE_LANDMARKER else []
        hand = [det] if mine_cfg.model_type is ModelType.HAND_LANDMARKER else []
        ref = np.array(ref_calc_rois([ref_cfg], face, hand)[0], np.float64)
        by_model = {
            ModelType.FACE_LANDMARKER: to_detections(face, 1, 478),
            ModelType.HAND_LANDMARKER: to_detections(hand, 2, 21),
        }
        mine = np.asarray(roi_ops.calc_rois((mine_cfg,), by_model)[0], np.float64)
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_calc_roi_nan_when_missing():
    by_model = {ModelType.FACE_LANDMARKER: roi_ops.Detections.empty(1, 478),
                ModelType.HAND_LANDMARKER: roi_ops.Detections.empty(2, 21)}
    out = np.asarray(roi_ops.calc_rois(
        (FACE_FOREHEAD_CONFIG, HAND_PALM_CONFIG), by_model))
    assert np.isnan(out).all() and out.shape == (2, 6)


def ref_sample(frame_bgr, sroi, channel):
    sp = ref_signal_processor.SignalProcessor(
        selected_roi_configs=[None, None],
        color_channel=getattr(ref_signal_processor.SignalColorChannel,
                              channel.name))
    return sp.sample_signal(frame_bgr, sroi)


@pytest.mark.parametrize("channel", [SignalColorChannel.GREEN,
                                     SignalColorChannel.CHROM_GREEN])
def test_sample_roi_parity(channel):
    rng = np.random.RandomState(0)
    frame_rgb = rng.randint(0, 256, size=(120, 160, 3), dtype=np.uint8)
    frame_bgr = frame_rgb[..., ::-1]
    cases = [
        (10, 20, 5, 8, 40, 30),      # normal crop
        (0, 0, 0, 0, 160, 120),      # full frame
        (10, 20, 30, 40, 30, 40),    # empty crop -> NaN
        (10, 20, 30, 40, 20, 50),    # x1 < x0 -> empty -> NaN
        (5, 5, -10, 4, 20, 30),      # negative start wraps (numpy quirk)
        (5, 5, 150, 100, 200, 300),  # past-the-end clamps
        (np.nan,) * 6,               # missing ROI -> NaN
    ]
    for sroi in cases:
        with np.errstate(invalid="ignore"):
            import warnings
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                ref = ref_sample(frame_bgr, sroi, channel)
        mine = float(roi_ops.sample_roi(
            jnp.asarray(frame_rgb), jnp.asarray(sroi, jnp.float32), channel))
        np.testing.assert_allclose(mine, np.float64(ref), rtol=1e-5,
                                   equal_nan=True, err_msg=str(sroi))


def test_sample_rois_batched_and_weighted():
    rng = np.random.RandomState(1)
    frame = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
    rois = jnp.asarray([[10, 10, 4, 4, 20, 20], [0, 0, 30, 30, 60, 60]],
                       jnp.float32)
    out = np.asarray(roi_ops.sample_rois(jnp.asarray(frame), rois,
                                         SignalColorChannel.GREEN))
    expect0 = frame[4:20, 4:20, 1].mean()
    expect1 = frame[30:60, 30:60, 1].mean()
    np.testing.assert_allclose(out, [expect0, expect1], rtol=1e-5)

    # Weighted (segmenter-masked) mean.
    wmask = rng.uniform(size=(64, 64)).astype(np.float32)
    outw = float(roi_ops.sample_roi(jnp.asarray(frame), rois[0],
                                    SignalColorChannel.GREEN,
                                    weights=jnp.asarray(wmask)))
    crop_w = wmask[4:20, 4:20]
    expect = (frame[4:20, 4:20, 1] * crop_w).sum() / crop_w.sum()
    np.testing.assert_allclose(outw, expect, rtol=1e-4)


def test_roi_ring_temporal_filter():
    """ROI bbox temporal filtering via ring + rounded masked mean
    (reference signal_processor.py:304-305 with roi_max_samples>1)."""
    x, y = sig.full_signal(3, y_shape=(2, 6))
    rois = np.stack([np.arange(6.0), np.arange(6.0) + 10])
    for i in range(2):
        x, y = sig.push(x, y, float(i), jnp.asarray(rois + i))
    filt = np.asarray(sig.masked_mean(y, as_int=True))
    np.testing.assert_allclose(filt, np.round(rois + 0.5))
