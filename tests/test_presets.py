"""The five BASELINE benchmark presets, run end-to-end at tiny scale:
compile coverage for every model combination (including the segmenter and
all-four-models paths) and the full config space wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.config import InferenceConfig, preset_configs
from bp_from_video_tpu.runtime.engine import Engine


def shrink(cfg):
    """Tiny shapes + random-init weights for fast CPU compilation."""
    sig = dataclasses.replace(cfg.signal, signal_max_samples=16,
                              peak_max_samples=4)
    inf = dataclasses.replace(
        cfg.inference, face_detector_path=None, face_landmarker_path=None,
        hand_landmarker_path=None, person_segmenter_path=None)
    return dataclasses.replace(cfg, signal=sig, inference=inf,
                               frame_height=32, frame_width=32,
                               num_streams=1)


# Quick keeps two presets (cheapest + segmenter coverage); the rest are
# slow-marked — BENCH_ALL compiles and runs every preset on the real TPU
# each round, so the quick loop's compile coverage is redundant there.
@pytest.mark.parametrize(
    "name",
    [n if n in ("butter_welch_face", "segmenter_fir")
     else pytest.param(n, marks=pytest.mark.slow)
     for n in sorted(preset_configs())])
def test_preset_runs(name):
    cfg = shrink(preset_configs()[name])
    eng = Engine(cfg)
    step = jax.jit(eng.step)
    state = eng.init_state()
    rng = np.random.default_rng(0)
    for t in range(3):
        frame = jnp.asarray(rng.integers(0, 256, (32, 32, 3), np.uint8))
        state, out = step(eng.params, state, frame, jnp.float32((t + 1) / 30))
    ns = cfg.signal.num_signals
    assert out.bpm.shape == (ns,)
    assert out.raw_y.shape == (ns, 16)
    assert out.spec_y.shape == (ns, 16)
    if cfg.inference.person_segmenter:
        assert out.models.seg_conf.shape == (6, 32, 32)
        assert bool(out.models.seg_valid)
    if cfg.inference.face_detector:
        assert out.models.face_detector.bbox.shape[1] == 4
    # ROI outputs are always 6-tuples per signal.
    assert out.rois.shape == (ns, 6)
