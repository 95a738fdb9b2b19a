"""Rotated-crop fidelity bound (VERDICT.md Missing #3): the axis-aligned
cover fast path must stay within a few pixels of the exact rotated-crop
path for near-upright subjects.  Uses the REAL face detector + mesh
weights on a synthetic face (tools/rotsweep.py is the full sweep; README
"Known gaps" documents the measured curve this test locks in)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tools.rotsweep import rotate_image, synth_face, unrotate_points

BUNDLE = "/root/reference/models/face_landmarker.task"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(BUNDLE),
                       reason="reference model bundle absent"),
]


@pytest.fixture(scope="module")
def runners():
    from bp_from_video_tpu.config import InferenceConfig, RunningMode
    from bp_from_video_tpu.models.runner import InferenceRunner
    out = {}
    for mode in ("exact", "cover", "shear"):
        cfg = InferenceConfig(face_landmarker=True, hand_landmarker=False,
                              running_mode=RunningMode.IMAGE,
                              rotation_mode=mode)
        out[mode] = InferenceRunner(cfg, 256, 256,
                                    asset_dir="/root/reference")
    # Legacy keys used by the original bound tests.
    out[True] = out["exact"]
    out[False] = out["cover"]
    return out


def _landmarks(runner, img):
    st = runner.init_state()
    _, res = jax.jit(runner.predict)(runner.params, st, jnp.asarray(img))
    assert int(res.face_landmarker.count) == 1
    return np.asarray(res.face_landmarker.points[0], np.float64)


def test_cover_path_error_bound_upright_to_15deg(runners):
    img0 = synth_face()
    base = _landmarks(runners[True], img0)
    for theta in (0, 15):
        img = rotate_image(img0, theta) if theta else img0
        pts = _landmarks(runners[False], img)
        err = np.linalg.norm(unrotate_points(pts, theta) - base, axis=-1)
        # Measured: mean 0.26 px at 0°, 2.7 px at 15° (≈160 px face).
        # Bound with slack for platform-to-platform conv reordering.
        assert err.mean() < 4.5, (theta, err.mean())
        assert np.percentile(err, 95) < 9.0, (theta, np.percentile(err, 95))


def test_exact_path_is_rotation_stable(runners):
    img0 = synth_face()
    base = _landmarks(runners[True], img0)
    pts = _landmarks(runners[True], rotate_image(img0, 15))
    err = np.linalg.norm(unrotate_points(pts, 15) - base, axis=-1)
    assert err.mean() < 3.0, err.mean()


def test_shear_path_tracks_exact_path(runners):
    """The gather-free FFT-shear rotated crop must stay within ~a pixel of
    the exact rotated-gather path at every tested tilt (it feeds the nets
    the SAME rotated view, sinc- instead of bilinear-interpolated)."""
    img0 = synth_face()
    for theta in (0, 15, 30):
        img = rotate_image(img0, theta) if theta else img0
        pe = _landmarks(runners["exact"], img)
        ps = _landmarks(runners["shear"], img)
        d = np.linalg.norm(pe - ps, axis=-1)
        assert d.mean() < 2.0, (theta, d.mean())
        assert np.percentile(d, 95) < 4.0, (theta, np.percentile(d, 95))
