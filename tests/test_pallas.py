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


@pytest.mark.parametrize("cin,cout,h", [(24, 48, 14), (48, 96, 7),
                                        (3, 24, 16)])
def test_block_kernel_matches_dense_oracle(cin, cout, h):
    """dense_s2_block == XLA stride-2 SAME conv (+ blaze residual when
    C is a block channel count) on the same composed weight, bf16 taps,
    f32 accumulation."""
    from bp_from_video_tpu.pallas import block_kernel as bk
    rng = np.random.default_rng(9)
    bsz, resid = 3, cin % 8 == 0
    x = jnp.asarray(rng.standard_normal((bsz, cin, 2 * h, 2 * h)),
                    jnp.bfloat16)
    wd = jnp.asarray(rng.normal(0, 0.2, (3, 3, cin, cout)), jnp.float32)
    bd = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
    wmat, wspec = bk.pack_block_weights(wd, cin=cin)
    got = bk.dense_s2_block(bk.pack_s2d(x), wmat, wspec, bd, None,
                            cin=cin, resid=resid, interpret=True)
    y = jax.lax.conv_general_dilated(
        x, wd.astype(jnp.bfloat16), (2, 2), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32) + bd.reshape(-1, 1, 1)
    if resid:
        pool = jax.lax.reduce_window(x.astype(jnp.float32), -jnp.inf,
                                     jax.lax.max, (1, 1, 2, 2),
                                     (1, 1, 2, 2), "SAME")
        y = y + jnp.pad(pool, ((0, 0), (0, cout - cin), (0, 0), (0, 0)))
    want = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2 * float(jnp.max(jnp.abs(want)).astype(jnp.float32)) * 2**-8,
        rtol=2**-7)


@pytest.mark.parametrize("cin,cmid,h,last_act", [
    (16, 8, 12, "prelu"), (32, 16, 8, "prelu"), (16, 8, 10, "none")])
def test_bottleneck_kernel_matches_xla_chain(cin, cmid, h, last_act):
    """bottleneck_s1 == the unfused XLA chain (1x1-down -> PReLU ->
    dw3x3/s1 SAME -> 1x1-up -> add residual [-> PReLU]) in f32."""
    from bp_from_video_tpu.pallas import block_kernel as bk
    rng = np.random.default_rng(11)
    bsz = 2
    f32 = jnp.float32
    x = jnp.asarray(rng.standard_normal((bsz, cin, h, h)), f32)
    w_down = jnp.asarray(rng.normal(0, 0.3, (1, 1, cin, cmid)), f32)
    b_down = jnp.asarray(rng.normal(0, 0.1, (cmid,)), f32)
    a_mid = jnp.asarray(rng.uniform(0.1, 0.5, (cmid,)), f32)
    w_dw = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, cmid)), f32)
    b_dw = jnp.asarray(rng.normal(0, 0.1, (cmid,)), f32)
    w_up = jnp.asarray(rng.normal(0, 0.3, (1, 1, cmid, cin)), f32)
    b_up = jnp.asarray(rng.normal(0, 0.1, (cin,)), f32)
    a_out = jnp.asarray(rng.uniform(0.1, 0.5, (cin,)), f32)

    z = jax.lax.conv_general_dilated(
        x, w_down, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW")) + b_down.reshape(-1, 1, 1)
    z = jnp.where(z >= 0, z, z * a_mid.reshape(-1, 1, 1))
    z = jax.lax.conv_general_dilated(
        z, w_dw, (1, 1), "SAME", feature_group_count=cmid,
        dimension_numbers=("NCHW", "HWIO", "NCHW")) + b_dw.reshape(-1, 1, 1)
    z = jax.lax.conv_general_dilated(
        z, w_up, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW")) + b_up.reshape(-1, 1, 1)
    want = z + x
    if last_act == "prelu":
        want = jnp.where(want >= 0, want, want * a_out.reshape(-1, 1, 1))

    wd, wu = bk.pack_bottleneck_weights(w_down, w_dw, w_up, dtype=f32)
    bu = b_up + w_up[0, 0].T @ b_dw
    got = bk.bottleneck_s1(x, x, wd, b_down, a_mid, wu, bu,
                           a_out if last_act == "prelu" else None,
                           last_act=last_act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bottleneck_chain_matches_unit_calls():
    """bottleneck_chain == the same units applied via bottleneck_s1 one
    call at a time (bit-exact: both round once per unit)."""
    from bp_from_video_tpu.pallas import block_kernel as bk
    rng = np.random.default_rng(12)
    bsz, c, d, h, u = 2, 16, 8, 9, 3
    f32 = jnp.float32
    x = jnp.asarray(rng.standard_normal((bsz, c, h, h)), f32)
    wds, bds, ads, wus, bus, aus = [], [], [], [], [], []
    for _ in range(u):
        w_down = jnp.asarray(rng.normal(0, 0.3, (1, 1, c, d)), f32)
        w_dw = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, d)), f32)
        w_up = jnp.asarray(rng.normal(0, 0.3, (1, 1, d, c)), f32)
        wd, wu = bk.pack_bottleneck_weights(w_down, w_dw, w_up, dtype=f32)
        wds.append(wd)
        wus.append(wu)
        bds.append(jnp.asarray(rng.normal(0, 0.1, (d,)), f32))
        ads.append(jnp.asarray(rng.uniform(0.1, 0.5, (d,)), f32))
        bus.append(jnp.asarray(rng.normal(0, 0.1, (c,)), f32))
        aus.append(jnp.asarray(rng.uniform(0.1, 0.5, (c,)), f32))
    want = x
    for i in range(u):
        want = bk.bottleneck_s1(want, want, wds[i], bds[i], ads[i],
                                wus[i], bus[i], aus[i], last_act="prelu",
                                interpret=True)
    got = bk.bottleneck_chain(
        x, jnp.stack(wds), jnp.stack(bds), jnp.stack(ads),
        jnp.stack(wus), jnp.stack(bus), jnp.stack(aus),
        last_act="prelu", interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_trunk_matches_composed_xla_chain():
    """Block-kernel trunk == the same chain of composed dense convs run
    through XLA (bf16 taps, f32 accumulation, blaze residuals) — verifies
    the chaining, the s2d glue, and the spatial trunk features end-to-end.  (The
    dense twin is the exact composition of each dw+pw pair,
    models/blaze.py:52-60; it rounds once where the two-step path rounds
    twice, so the two-step landmark_trunk is only bf16-close, which the
    per-block oracle test already bounds.)"""
    from bp_from_video_tpu.models import blaze
    from bp_from_video_tpu.pallas import block_kernel as bk
    rng = np.random.default_rng(10)
    size = 64
    params = blaze.init_blaze_landmark(12, size, 21)
    arrays, specs = bk.prepare_trunk(params)
    stems = jnp.asarray(rng.uniform(0, 1, (2, 24, size // 2, size // 2)),
                        jnp.bfloat16)
    feats = bk.trunk_apply(arrays, specs, stems, interpret=True)

    y = stems
    for name in ("b1", "b2", "b3", "b4"):
        wd, bd = bk.compose_block_params(params[name])
        cin, cout = wd.shape[2], wd.shape[3]
        z = jax.lax.conv_general_dilated(
            y, wd.astype(jnp.bfloat16), (2, 2), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32) + bd.reshape(-1, 1, 1)
        pool = jax.lax.reduce_window(y.astype(jnp.float32), -jnp.inf,
                                     jax.lax.max, (1, 1, 2, 2),
                                     (1, 1, 2, 2), "SAME")
        z = z + jnp.pad(pool, ((0, 0), (0, cout - cin), (0, 0), (0, 0)))
        y = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(feats, np.float32),
                               np.asarray(y, np.float32),
                               rtol=0.02, atol=0.05)
    # Heads consume the spatial features unchanged (batched).
    lm, presence, aux = blaze.landmark_heads(params, feats, size)
    assert lm.shape == (2, 3 * 21) and presence.shape == (2, 1)
    assert bool(jnp.all((lm >= 0) & (lm <= size)))


@pytest.mark.slow
def test_fused_trunk_engine_smoke():
    """The whole fused-kernel hand path (pallas multi-crop -> block-kernel
    stem -> block-kernel trunk -> batched heads) traces, runs (TPU
    interpret simulator), and produces finite tracked results."""
    from jax.experimental.pallas import tpu as pltpu
    from bp_from_video_tpu.config import InferenceConfig
    from bp_from_video_tpu.models.runner import InferenceRunner

    cfg = InferenceConfig(
        hand_landmarker=True, face_detector_path=None,
        face_landmarker_path=None, hand_landmarker_path=None,
        person_segmenter_path=None, use_pallas=True, fused_stem=True,
        fused_trunk=True)
    r = InferenceRunner(cfg, 64, 64)
    assert r._use_fused_trunk("hand_lm")
    state = jax.tree.map(lambda x: jnp.stack([x, x]), r.init_state())
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.integers(0, 256, (2, 3, 64, 64), np.uint8))
    with pltpu.force_tpu_interpret_mode():
        new_state, res = jax.jit(r.predict_batch)(r.params, state, frames)
    pts = np.asarray(res.hand_landmarker.points, np.float32)
    assert pts.shape[:2] == (2, 2)
    # Presence of the random-init net decides tracking; whatever it says,
    # the outputs must be finite or NaN-by-contract, never garbage.
    tracked = np.asarray(new_state.hand_tracking)
    assert np.isfinite(pts[tracked]).all()


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


def test_stem_packed_rejects_k5():
    """_shifted only implements the unit shifts a 3x3/2 window needs on the
    packed layout; a 5x5 stem must be rejected, not silently mis-shifted."""
    import jax.numpy as jnp
    from bp_from_video_tpu.pallas import stem_kernel as sk
    with pytest.raises(AssertionError, match="k<=3"):
        sk.stem_packed(jnp.zeros((1, 12, 16, 16)), jnp.zeros((5, 5, 3, 8)),
                       jnp.zeros((8,)), interpret=True)
