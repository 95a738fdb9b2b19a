"""Gather-free rotated crop (warp.crop_rect_shear): the 3-shear FFT
rotation must reproduce the exact rotated-gather crop up to interpolation
kernel (sinc vs bilinear), and the runner's rotation_mode="shear" must
feed the landmark nets the same rotated view as rotation_mode="exact".

Tolerances come from the measured parity probe (smooth content: interior
mean |d| ≈ 0.07 of a ~170-unit range; see warp.crop_rect_shear
docstring).  The exact path (reference MediaPipe ImageToTensor semantics,
inference_runner.py:120-122) is the oracle throughout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.config import InferenceConfig, RunningMode
from bp_from_video_tpu.models import warp


def _smooth_frame(h=480, w=640):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return jnp.asarray(np.stack([
        128 + 80 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
        128 + 60 * np.cos(xx / 9.0 + yy / 31.0),
        128 + 90 * np.sin((xx + yy) / 41.0),
    ], axis=-1))


def test_fract_shift_integer_matches_roll():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(4, 32)).astype(np.float32))
    sh = jnp.asarray([0.0, 1.0, 2.0, -3.0])
    out = np.asarray(warp.fract_shift(v, sh, axis=1))
    ref = np.stack([np.roll(np.asarray(v)[i], -int(sh[i]))
                    for i in range(4)])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fract_shift_dft_matches_fft():
    """The MXU matmul real-DFT backend (auto-selected on TPU, where the
    FFT lowering is ~20x slower at crop-canvas sizes) must agree with the
    jnp.fft path to float precision on both axes."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (5, 3, 64)).astype(np.float32))
    sh = jnp.asarray(rng.uniform(-5, 5, (5, 3)).astype(np.float32))
    a = warp.fract_shift(x, sh, axis=2, method="fft")
    b = warp.fract_shift(x, sh, axis=2, method="dft")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    x2 = jnp.asarray(rng.uniform(0, 255, (48, 7)).astype(np.float32))
    sh2 = jnp.asarray(rng.uniform(-3, 3, (7,)).astype(np.float32))
    a2 = warp.fract_shift(x2, sh2, axis=0, method="fft")
    b2 = warp.fract_shift(x2, sh2, axis=0, method="dft")
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=2e-3)


def test_fract_shift_half_sample_on_sinusoid():
    """Fractional shifts are exact for band-limited content."""
    n = 64
    x = jnp.arange(n, dtype=jnp.float32)
    sig = jnp.sin(2 * jnp.pi * 3 * x / n)[None, :]
    out = np.asarray(warp.fract_shift(sig, jnp.asarray([0.5]), axis=1))
    ref = np.sin(2 * np.pi * 3 * (np.arange(n) + 0.5) / n)
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


@pytest.mark.parametrize("deg", [15, 30, -25, 60, 100, 135, 179, -135, -179])
def test_crop_rect_shear_matches_exact_centered(deg):
    frame = _smooth_frame()
    r = warp.Rect(jnp.float32(320.0), jnp.float32(240.0), jnp.float32(200.0),
                  jnp.float32(200.0), jnp.float32(np.deg2rad(deg)))
    exact = np.asarray(warp.crop_rect(frame, r, 256, exact_rotation=True))
    fast = np.asarray(warp.crop_rect_shear(frame, r, 256))
    d = np.abs(exact - fast)[8:-8, 8:-8]
    assert d.mean() < 0.5, d.mean()            # measured ≈ 0.07
    assert np.percentile(d, 99) < 2.0          # measured ≈ 0.4


@pytest.mark.parametrize("deg", [90, -90, 180])
def test_crop_rect_shear_quarter_turns_exact(deg):
    """Quarter turns fold into index permutations of the canvas — the
    shear residual is 0 and the result must match the gather path to
    resample tolerance (identical bilinear cover sampling)."""
    frame = _smooth_frame()
    r = warp.Rect(jnp.float32(320.0), jnp.float32(240.0), jnp.float32(200.0),
                  jnp.float32(200.0), jnp.float32(np.deg2rad(deg)))
    exact = np.asarray(warp.crop_rect(frame, r, 256, exact_rotation=True))
    fast = np.asarray(warp.crop_rect_shear(frame, r, 256))
    np.testing.assert_allclose(fast[8:-8, 8:-8], exact[8:-8, 8:-8],
                               atol=1e-2)


def test_crop_rect_shear_anisotropic_rect():
    frame = _smooth_frame()
    r = warp.Rect(jnp.float32(320.0), jnp.float32(240.0), jnp.float32(260.0),
                  jnp.float32(180.0), jnp.float32(np.deg2rad(20)))
    exact = np.asarray(warp.crop_rect(frame, r, 256, exact_rotation=True))
    fast = np.asarray(warp.crop_rect_shear(frame, r, 256))
    d = np.abs(exact - fast)[8:-8, 8:-8]
    assert d.mean() < 0.5, d.mean()            # measured ≈ 0.07


def test_crop_rect_shear_zero_rotation_is_separable():
    """θ=0 must reduce to the separable matmul crop (phase ramps = 1)."""
    frame = _smooth_frame(96, 128)
    r = warp.Rect(jnp.float32(60.0), jnp.float32(50.0), jnp.float32(64.0),
                  jnp.float32(64.0), jnp.float32(0.0))
    fast0 = np.asarray(warp.crop_rect(frame, r, 64, exact_rotation=False))
    shear = np.asarray(warp.crop_rect_shear(frame, r, 64))
    np.testing.assert_allclose(shear, fast0, atol=1e-3)


def test_crop_rect_shear_off_frame_zero_padding():
    """Out-of-frame region must stay ≈ 0 (ringing-bounded), matching the
    exact path's zero-outside-frame semantics."""
    frame = _smooth_frame(200, 200)
    r = warp.Rect(jnp.float32(20.0), jnp.float32(20.0), jnp.float32(120.0),
                  jnp.float32(120.0), jnp.float32(np.deg2rad(20)))
    exact = np.asarray(warp.crop_rect(frame, r, 128, exact_rotation=True))
    fast = np.asarray(warp.crop_rect_shear(frame, r, 128))
    d = np.abs(exact - fast)[4:-4, 4:-4]
    # Hard zero boundary rings at the few-unit level; the bulk must agree.
    assert d.mean() < 1.0, d.mean()            # measured ≈ 0.29
    assert d.max() < 40.0, d.max()             # measured ≈ 22


def test_runner_shear_mode_matches_exact_landmarks():
    """End-to-end: rotation_mode='shear' must land within a fraction of a
    pixel of rotation_mode='exact' (random-init nets see near-identical
    crops; both project through the SAME rotated rect)."""
    from bp_from_video_tpu.models.runner import InferenceRunner
    rng = np.random.default_rng(7)
    frame = jnp.asarray(rng.uniform(0, 255, (128, 128, 3)).astype(np.uint8))
    pts = {}
    for mode in ("exact", "shear"):
        cfg = InferenceConfig(face_landmarker=True, hand_landmarker=False,
                              running_mode=RunningMode.IMAGE,
                              rotation_mode=mode)
        runner = InferenceRunner(cfg, 128, 128)
        st = runner.init_state()
        _, res = jax.jit(runner.predict)(runner.params, st, frame)
        pts[mode] = np.asarray(res.face_landmarker.points, np.float64)
    # Same detector output (crop path doesn't affect detection), so the
    # landmark nets see the same rect; crops differ only by interpolation
    # kernel.  Random-init nets amplify small input deltas, so allow a
    # couple of pixels.
    d = np.linalg.norm(pts["exact"] - pts["shear"], axis=-1)
    assert np.isfinite(pts["shear"]).all() == np.isfinite(pts["exact"]).all()
    finite = np.isfinite(d)
    if finite.any():
        assert np.nanmean(d[finite]) < 4.0, np.nanmean(d[finite])


def test_rotation_mode_validation_and_resolution():
    with pytest.raises(ValueError):
        InferenceConfig(rotation_mode="twist")
    assert InferenceConfig().resolved_rotation_mode() == "cover"
    assert InferenceConfig(
        exact_rotation=True).resolved_rotation_mode() == "exact"
    assert InferenceConfig(
        rotation_mode="shear").resolved_rotation_mode() == "shear"
    # rotation_mode wins over the legacy bool.
    assert InferenceConfig(
        exact_rotation=True,
        rotation_mode="cover").resolved_rotation_mode() == "cover"
