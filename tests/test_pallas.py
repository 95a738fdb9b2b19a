"""Pallas kernel tests (interpret mode on the CPU test platform; the real
TPU path is exercised by bench.py / the drivers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.pallas import warp_kernel


@pytest.mark.parametrize("sizes", [(32,), (32, 24, 24)])
def test_multi_crop_matches_reference(sizes):
    rng = np.random.default_rng(0)
    s, h, w = 2, 48, 64
    frames = jnp.asarray(rng.integers(0, 256, (s, 3, h, w), dtype=np.uint8))
    rects = jnp.asarray(rng.uniform(10, 40, (s, len(sizes), 4))
                        .astype(np.float32))
    got = warp_kernel.multi_crop(frames, rects, sizes, interpret=True)
    want = warp_kernel.multi_crop_reference(frames, rects, sizes)
    for g, t in zip(got, want):
        assert g.shape == t.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(t),
                                   atol=1e-3, rtol=1e-4)


def test_multi_crop_nan_rect_gives_zeros():
    s, h, w = 1, 32, 32
    frames = jnp.full((s, 3, h, w), 200, jnp.uint8)
    rects = jnp.full((s, 1, 4), jnp.nan, jnp.float32)
    (out,) = warp_kernel.multi_crop(frames, rects, (16,), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_multi_crop_zero_pad_outside():
    s, h, w = 1, 32, 32
    frames = jnp.full((s, 3, h, w), 100, jnp.uint8)
    # Rect half outside the frame: outside samples are zero.
    rects = jnp.asarray([[[0.0, 16.0, 32.0, 16.0]]], jnp.float32)
    (out,) = warp_kernel.multi_crop(frames, rects, (16,), interpret=True)
    out = np.asarray(out)[0, 0]
    assert out[:, -1].max() > 90      # inside the frame
    assert out[:, 0].max() == 0.0     # fully outside -> zero pad


def test_roi_sums_matches_xla(tmp_path=None):
    from bp_from_video_tpu.config import SignalColorChannel
    from bp_from_video_tpu.ops import roi as roi_ops

    rng = np.random.default_rng(2)
    s, h, w, r = 2, 48, 64, 3
    frames = jnp.asarray(rng.integers(0, 256, (s, h, w, 3), dtype=np.uint8))
    rois = rng.uniform(2, 40, (s, r, 6)).astype(np.float32)
    rois[:, :, 4] = rois[:, :, 2] + rng.uniform(4, 20, (s, r))  # x1 > x0
    rois[:, :, 5] = rois[:, :, 3] + rng.uniform(4, 20, (s, r))  # y1 > y0
    rois = np.round(rois)
    rois[0, 1] = np.nan                      # missing detection
    rois[1, 2, 2:] = (10, 10, 10, 10)        # empty crop
    rois = jnp.asarray(rois)

    for channel in (SignalColorChannel.GREEN, SignalColorChannel.CHROM_GREEN):
        want = roi_ops.sample_rois_batch(frames, rois, channel,
                                         use_pallas=False)
        got = roi_ops.sample_rois_batch(frames, rois, channel,
                                        use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, equal_nan=True)


def test_roi_sums_weighted_matches_xla():
    from bp_from_video_tpu.config import SignalColorChannel
    from bp_from_video_tpu.ops import roi as roi_ops

    rng = np.random.default_rng(3)
    s, h, w = 2, 32, 40
    frames = jnp.asarray(rng.integers(0, 256, (s, h, w, 3), dtype=np.uint8))
    rois = jnp.asarray([[[5, 5, 2, 3, 20, 18]], [[8, 8, 4, 4, 30, 28]]],
                       jnp.float32)
    weights = jnp.asarray(rng.uniform(0, 1, (s, h, w)).astype(np.float32))
    want = roi_ops.sample_rois_batch(frames, rois,
                                     SignalColorChannel.GREEN, weights,
                                     use_pallas=False)
    got = roi_ops.sample_rois_batch(frames, rois, SignalColorChannel.GREEN,
                                    weights, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4, equal_nan=True)


@pytest.mark.parametrize("pack", [2, (2, 1)])
def test_multi_crop_packed_layout(pack):
    """pack=2 emits crops 2x2 space-to-depth packed, channel (a*2+b)*C+c —
    the packed-graph input convention of tflite_compiler."""
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 256, (2, 3, 96, 128), np.uint8))
    rects = jnp.asarray([[[60.0, 40.0, 50.0, 44.0],
                          [30.0, 60.0, 80.0, 70.0]]] * 2, jnp.float32)
    plain = warp_kernel.multi_crop(frames, rects, (64, 48), interpret=True)
    mixed = warp_kernel.multi_crop(frames, rects, (64, 48), interpret=True,
                                   pack=pack)
    packs = (pack, pack) if isinstance(pack, int) else pack
    for p, q, pk in zip(plain, mixed, packs):
        if pk == 1:
            np.testing.assert_array_equal(np.asarray(q), np.asarray(p))
            continue
        assert q.shape == (2, 12, p.shape[2] // 2, p.shape[3] // 2)
        for a in range(2):
            for b in range(2):
                for ch in range(3):
                    np.testing.assert_array_equal(
                        np.asarray(q[:, (a * 2 + b) * 3 + ch]),
                        np.asarray(p[:, ch, a::2, b::2]))


def _pack22(crop_planar):
    """[C, S, S] -> [4C, S/2, S/2] in multi_crop's (a*2+b)*C + c order."""
    c, s, _ = crop_planar.shape
    return jnp.stack([crop_planar[ch, a::2, b::2]
                      for a in range(2) for b in range(2)
                      for ch in range(3)])


def test_stem_kernel_matches_reference():
    from bp_from_video_tpu.pallas import stem_kernel as sk
    rng = np.random.default_rng(7)
    crops = jnp.asarray(rng.uniform(0, 1, (3, 12, 32, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 24)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (24,)), jnp.float32)
    ref = sk.stem_packed_reference(crops, w, b)
    for use_dot in (True, False):
        got = sk.stem_packed(crops, w, b, interpret=True, use_dot=use_dot)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_fused_stem_composes_to_full_landmark_apply():
    """stem_packed + landmark_trunk == blaze_landmark_apply exactly (the
    fused-stem production path bypasses the in-graph stem)."""
    from bp_from_video_tpu.models import blaze
    from bp_from_video_tpu.pallas import stem_kernel as sk
    rng = np.random.default_rng(8)
    size = 64
    params = blaze.init_blaze_landmark(11, size, 21)
    crop = jnp.asarray(rng.uniform(0, 1, (3, size, size)), jnp.float32)
    want = blaze.blaze_landmark_apply(params, crop[None], size)
    packed = _pack22(crop)
    stems = sk.stem_packed(packed[None], params["stem"]["w"],
                           params["stem"]["b"], interpret=True)
    got = blaze.landmark_trunk(params, stems, size)
    for g, t in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(t),
                                   atol=2e-4, rtol=1e-4)
