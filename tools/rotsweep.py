"""Rotated-crop fidelity sweep (VERDICT.md Missing #3).

MediaPipe's hidden calculators rotate every landmark crop to eye/wrist
alignment (reference inference_runner.py:120-122); the rebuild's default
samples the axis-aligned COVER of the rotated tracking rect instead
(config.exact_rotation=False — two MXU matmuls instead of an
element-serial gather).  This tool quantifies what that costs: a synthetic
face (which the REAL BlazeFace + face-mesh weights detect and landmark
reliably) is rotated in-plane by theta, both crop paths run, landmarks are
un-rotated back, and the error vs the upright exact-path baseline is
reported per path.

Usage:  JAX_PLATFORMS=cpu python tools/rotsweep.py
Output: one JSON line per (theta, path) with mean/max landmark error (px).
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_face(h=256, w=256, cx=128, cy=128, s=80):
    """Cartoon face the real face-mesh weights respond to (verified:
    detection count 1, eye landmarks within ~12 px of the drawn eyes)."""
    img = np.full((h, w, 3), 120, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def ell(ex, ey, rx, ry):
        return ((xx - ex) / rx) ** 2 + ((yy - ey) / ry) ** 2 <= 1.0

    img[ell(cx, cy, 0.75 * s, s)] = (205, 170, 140)
    img[ell(cx - 0.33 * s, cy - 0.25 * s, 0.14 * s, 0.09 * s)] = (250,) * 3
    img[ell(cx + 0.33 * s, cy - 0.25 * s, 0.14 * s, 0.09 * s)] = (250,) * 3
    img[ell(cx - 0.33 * s, cy - 0.25 * s, 0.055 * s, 0.055 * s)] = (40, 30, 30)
    img[ell(cx + 0.33 * s, cy - 0.25 * s, 0.055 * s, 0.055 * s)] = (40, 30, 30)
    img[ell(cx - 0.33 * s, cy - 0.45 * s, 0.18 * s, 0.04 * s)] = (70, 50, 40)
    img[ell(cx + 0.33 * s, cy - 0.45 * s, 0.18 * s, 0.04 * s)] = (70, 50, 40)
    img[ell(cx, cy + 0.12 * s, 0.06 * s, 0.16 * s)] = (170, 130, 105)
    img[ell(cx, cy + 0.5 * s, 0.3 * s, 0.08 * s)] = (150, 70, 70)
    return img


def rotate_image(img: np.ndarray, theta_deg: float) -> np.ndarray:
    import scipy.ndimage
    return scipy.ndimage.rotate(img, theta_deg, reshape=False, order=1,
                                mode="nearest")


def unrotate_points(pts: np.ndarray, theta_deg: float, cx=128.0, cy=128.0
                    ) -> np.ndarray:
    """Map landmarks found on the rotated image back to upright coords.
    scipy.ndimage.rotate(theta) maps upright p to R(+theta-image) @ p; the
    inverse rotates found points by theta about the center (y-down)."""
    t = np.deg2rad(theta_deg)
    c, s = np.cos(t), np.sin(t)
    d = pts - np.array([cx, cy])
    return np.stack([c * d[:, 0] - s * d[:, 1],
                     s * d[:, 0] + c * d[:, 1]], axis=-1) + np.array([cx, cy])


def run_sweep(thetas=(0, 5, 10, 15, 20, 25, 30)):
    import jax
    import jax.numpy as jnp
    # The env's sitecustomize force-selects the remote-TPU platform via a
    # config update at interpreter start (beats JAX_PLATFORMS); pin back.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    from bp_from_video_tpu.config import InferenceConfig, RunningMode
    from bp_from_video_tpu.models.runner import InferenceRunner

    runners = {}
    for mode in ("exact", "cover", "shear", "hybrid"):
        cfg = InferenceConfig(face_landmarker=True, hand_landmarker=False,
                              running_mode=RunningMode.IMAGE,
                              rotation_mode=mode)
        runners[mode] = InferenceRunner(cfg, 256, 256,
                                        asset_dir="/root/reference")

    img0 = synth_face()

    def landmarks(runner, img):
        st = runner.init_state()
        _, res = jax.jit(runner.predict)(runner.params, st, jnp.asarray(img))
        if int(res.face_landmarker.count) < 1:
            return None
        return np.asarray(res.face_landmarker.points[0], np.float64)

    base = landmarks(runners["exact"], img0)
    assert base is not None, "baseline detection failed"

    results = []
    for theta in thetas:
        img = rotate_image(img0, theta) if theta else img0
        for mode in ("exact", "cover", "shear", "hybrid"):
            pts = landmarks(runners[mode], img)
            if pts is None:
                rec = {"theta_deg": theta, "mode": mode, "detected": False}
            else:
                up = unrotate_points(pts, theta)
                err = np.linalg.norm(up - base, axis=-1)
                rec = {"theta_deg": theta, "mode": mode, "detected": True,
                       "mean_err_px": round(float(err.mean()), 2),
                       "p95_err_px": round(float(np.percentile(err, 95)), 2),
                       "max_err_px": round(float(err.max()), 2)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    run_sweep()
