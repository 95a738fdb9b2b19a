"""Vision-IN-the-loop HR accuracy: full fused engine step with REAL face
weights (BlazeFace detector + face-mesh landmarker from the reference's
asset bundle) on a synthetic pulsing face video, recovered heart rate
checked against the synthetic ground truth.

This closes the parity-evidence gap VERDICT.md (round 1) called out: the
DSP path was oracle-verified with *injected* detections (test_engine.py),
but nothing exercised detection -> tracking -> crop -> landmark ->
ROI-sampling -> DSP end-to-end with real weights against a known answer.
Reference contract being matched: bp.py:21-30 (the whole per-frame loop)
with inference_runner.py VIDEO-mode tracking semantics
(inference_runner.py:97-102).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.config import (EngineConfig, InferenceConfig,
                                      SignalConfig, FACE_FOREHEAD_CONFIG)
from bp_from_video_tpu.runtime.engine import Engine

from tools.rotsweep import synth_face

HAVE_ASSETS = os.path.exists("/root/reference/models/face_landmarker.task")

HR_HZ = 1.3      # ground truth: 78 BPM
FS = 30.0


def pulsing_face(base: np.ndarray, mask: np.ndarray, t: float) -> np.ndarray:
    """Green channel of the facial skin modulated at HR_HZ (classic rPPG
    signal model); amplitude small enough not to disturb detection."""
    frame = base.copy()
    g = frame[..., 1].astype(np.int16)
    g[mask] += np.int16(round(9 * np.sin(2 * np.pi * HR_HZ * t)))
    frame[..., 1] = np.clip(g, 0, 255).astype(np.uint8)
    return frame


@pytest.mark.skipif(not HAVE_ASSETS, reason="face assets absent")
@pytest.mark.slow
def test_real_weight_vision_loop_recovers_hr():
    cfg = EngineConfig(
        frame_height=256, frame_width=256,
        signal=SignalConfig(roi_configs=(FACE_FOREHEAD_CONFIG,),
                            signal_max_samples=128, peak_max_samples=16),
        inference=InferenceConfig(hand_landmarker=False))
    eng = Engine(cfg, asset_dir="/root/reference")
    step = jax.jit(eng.step)

    base = synth_face()
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    skin = ((xx - 128) / 60.0) ** 2 + ((yy - 128) / 80.0) ** 2 <= 1.0

    state = eng.init_state()
    out = None
    for i in range(140):
        t = (i + 1) / FS
        frame = pulsing_face(base, skin, t)
        state, out = step(eng.params, state, jnp.asarray(frame),
                          jnp.float32(t))

    # The real detector found and tracked the synthetic face...
    assert int(out.models.face_landmarker.count) == 1
    # ...the forehead ROI sampled real pixels (ring filled, no NaN tail)...
    raw = np.asarray(out.raw_y[0], np.float64)
    assert np.isfinite(raw).all()
    # ...and the recovered HR matches the synthetic ground truth.  Gate is
    # the reference's own ±1 BPM acceptance reading plus headroom for
    # landmark jitter moving the ROI a few pixels frame to frame.
    bpm = float(np.asarray(out.bpm)[0])
    assert abs(bpm - HR_HZ * 60) <= 3.0, bpm


@pytest.mark.skipif(not HAVE_ASSETS, reason="face assets absent")
@pytest.mark.slow
def test_real_weight_vision_loop_tracks_moving_face():
    """Same loop with the subject drifting around the frame: VIDEO-mode
    tracked crops must follow the face (reference
    inference_runner.py:97-102 re-detects only on tracking loss) and the
    HR estimate must survive the ROI moving with it."""
    from tools.rotsweep import synth_face as face_at

    cfg = EngineConfig(
        frame_height=256, frame_width=256,
        signal=SignalConfig(roi_configs=(FACE_FOREHEAD_CONFIG,),
                            signal_max_samples=128, peak_max_samples=16),
        inference=InferenceConfig(hand_landmarker=False))
    eng = Engine(cfg, asset_dir="/root/reference")
    step = jax.jit(eng.step)

    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    state = eng.init_state()
    out = None
    tracked = 0
    n_frames = 140
    for i in range(n_frames):
        t = (i + 1) / FS
        # ~0.5 px/frame orbital drift, +-16 px around center.
        cx = 128 + 16 * np.sin(2 * np.pi * 0.08 * t)
        cy = 128 + 12 * np.cos(2 * np.pi * 0.08 * t)
        base = face_at(cx=cx, cy=cy)
        skin = ((xx - cx) / 60.0) ** 2 + ((yy - cy) / 80.0) ** 2 <= 1.0
        frame = pulsing_face(base, skin, t)
        state, out = step(eng.params, state, jnp.asarray(frame),
                          jnp.float32(t))
        tracked += int(out.models.face_landmarker.count) == 1

    assert tracked >= n_frames - 5, tracked  # at most the acquisition frames
    # Landmarks actually followed the subject to its final position.
    pts = np.asarray(out.models.face_landmarker.points[0], np.float64)
    cx_est, cy_est = pts[:, 0].mean(), pts[:, 1].mean()
    assert abs(cx_est - cx) < 25 and abs(cy_est - cy) < 25, (cx_est, cy_est)
    bpm = float(np.asarray(out.bpm)[0])
    assert abs(bpm - HR_HZ * 60) <= 4.0, bpm


@pytest.mark.skipif(not HAVE_ASSETS, reason="face assets absent")
@pytest.mark.slow
def test_tpu_accuracy_tool_cpu_smoke():
    """tools/tpu_accuracy.py (the on-hardware end-to-end HR-accuracy
    artifact) must stay runnable and pass its own gate on the CPU
    backend — locks the tool against bit-rot between rounds."""
    import json
    import subprocess
    import sys

    env = dict(os.environ, BENCH_PLATFORM="cpu", ACC_STREAMS="2")
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)
    p = subprocess.run(
        [sys.executable, "tools/tpu_accuracy.py"], env=env,
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert p.returncode == 0, p.stdout + p.stderr
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["value"] <= 3.0


@pytest.mark.trained_standins
@pytest.mark.skipif(
    not os.path.exists("models/seg_standin_synth.npz"),
    reason="trained segmenter artifact absent (run tools/train_seg_standin.py)")
def test_seg_weighted_sampling_recovers_hr_with_trained_masks():
    """Preset 2's skin-weighted sampling through the TRAINED procedural
    segmenter does real physiological work (VERDICT r3 next #4): a person
    scene whose FACE SKIN pulses at f1 while a non-skin distractor (hair)
    inside the SAME ROI box pulses harder at f2 — with the trained mask
    weighting the sampling, the engine recovers f1; the unweighted
    control locks onto the stronger distractor."""
    import dataclasses

    from bp_from_video_tpu.config import ModelType, ROIConfig
    from bp_from_video_tpu.models import blaze
    from bp_from_video_tpu.models.runner import (Detections, ModelResults,
                                                 NUM_FACE_LANDMARKS)
    from tools.train_seg_standin import FACE_SKIN, HAIR, render_person

    f1, f2 = 1.2, 2.5           # Hz: skin truth vs distractor
    h = w = 256
    img, classes = jax.jit(
        lambda k: render_person(k, True))(jax.random.key(3))
    img = np.asarray(img)                       # [3, h, w] f32
    classes = np.asarray(classes)
    skin_m = classes == FACE_SKIN
    hair_m = classes == HAIR
    assert skin_m.sum() > 500 and hair_m.sum() > 500

    # ROI box spanning the face AND the hair above it, anchored on the
    # face-skin centroid via a custom margin config.
    ys, xs = np.nonzero(skin_m)
    anchor = np.array([xs.mean(), ys.mean()], np.float32)
    ys2, xs2 = np.nonzero(skin_m | hair_m)
    bbox = np.array([xs2.min(), ys2.min(), xs2.max(), ys2.max()],
                    np.float32)
    roi_cfg = ROIConfig(ModelType.FACE_LANDMARKER, (0,),
                        (-0.45, -0.55, 0.45, 0.3))

    points = np.tile(anchor, (NUM_FACE_LANDMARKS, 1)).astype(np.float32)
    face_det = Detections(bbox=jnp.asarray(bbox)[None],
                          points=jnp.asarray(points)[None],
                          count=jnp.asarray(1, jnp.int32))

    # Trained segmenter mask of the BASE scene (static; the pulse does not
    # move class boundaries) -> seg_conf in the runner's [6, H, W] layout.
    seg = blaze.load_standin_npz("models/seg_standin_synth.npz")
    conf = jax.jit(lambda p, x: blaze.segmenter_apply(p, x, 256))(
        jax.device_put(seg), jnp.asarray(img[None] / 255.0))[0]

    def run(person_seg: bool):
        cfg = EngineConfig(
            frame_height=h, frame_width=w,
            signal=SignalConfig(roi_configs=(roi_cfg,),
                                signal_max_samples=128,
                                peak_max_samples=16),
            inference=InferenceConfig(
                face_landmarker=True, hand_landmarker=False,
                person_segmenter=person_seg,
                face_detector_path=None, face_landmarker_path=None,
                hand_landmarker_path=None, person_segmenter_path=None))
        eng = Engine(cfg)
        models = ModelResults(
            face_detector=Detections.empty(1, 6),
            face_landmarker=face_det,
            hand_landmarker=Detections.empty(2, 21),
            seg_class=jnp.zeros((0, 0), jnp.int32),
            seg_conf=conf, seg_valid=jnp.asarray(True))
        # One device scan instead of 150 per-frame dispatches (the suite
        # is trace/dispatch-bound; frames precompute vectorized on host).
        n_t = 150
        ts = ((np.arange(n_t) + 1) / 30.0).astype(np.float32)
        g = (img[1][None]
             + skin_m[None] * (10.0 * np.sin(2 * np.pi * f1 * ts)
                               )[:, None, None]
             + hair_m[None] * (28.0 * np.sin(2 * np.pi * f2 * ts)
                               )[:, None, None])
        frames = np.stack([np.broadcast_to(img[0], g.shape),
                           np.clip(g, 0, 255),
                           np.broadcast_to(img[2], g.shape)],
                          axis=-1).astype(np.uint8)

        def body(st, xt):
            fr, t = xt
            st, out = eng.signal_step(st, models, fr, t)
            return st, out.bpm

        @jax.jit
        def scan_all(st, fs, tss):
            return jax.lax.scan(body, st, (fs, tss))

        _, bpms = scan_all(eng.init_signal_state(), jnp.asarray(frames),
                           jnp.asarray(ts))
        return float(np.asarray(bpms)[-1, 0])

    bpm_weighted = run(True)
    bpm_control = run(False)
    assert abs(bpm_weighted - f1 * 60.0) <= 4.0, bpm_weighted
    # The control only needs to be PULLED OFF the skin truth toward the
    # distractor (two-tone windows put its exact peak between lines).
    assert abs(bpm_control - f1 * 60.0) >= 30.0, bpm_control
