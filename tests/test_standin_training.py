"""Contract tests for the procedural stand-in trainers (tools/train_*):
the synthesis geometry must stay the EXACT inverse of the serve path —
a drift here silently re-opens the round-3 train/serve distribution gap
(held-out 11.8 px but 63 px through the real predict loop)."""

import jax
import jax.numpy as jnp
import numpy as np

from bp_from_video_tpu.models import warp


def test_crop_sample_gt_is_projection_inverse():
    """crop_sample's crop-pixel targets, pushed through the runner's own
    projection (_project_lm: lm / size -> project_landmarks through the
    same cover rect), must land back on the frame-space keypoints."""
    from tools.train_hand_standin import FR, S, render_hand

    key = jax.random.key(11)
    img, kps, pres = render_hand(key, True, FR)

    # Reproduce crop_sample's rect path WITHOUT jitter (jitter moves the
    # rect, not the identity: gt is computed from the jittered cover, so
    # projection through that same cover is still exact — zero jitter
    # keeps the test's algebra readable).
    track = warp.rect_transform(
        warp.landmarks_to_rect(kps, 0, 9, jnp.pi / 2),
        scale=2.0, shift_y=-0.1)
    cov = warp.axis_aligned_cover(track)
    u = (kps[:, 0] - cov.cx) / cov.w + 0.5
    v = (kps[:, 1] - cov.cy) / cov.h + 0.5
    gt_crop_px = jnp.stack([u, v], axis=-1) * S

    # The runner's projection: lm [L, 3-ish] crop px -> norm -> frame px.
    back = warp.project_landmarks(gt_crop_px / S, cov)
    np.testing.assert_allclose(np.asarray(back), np.asarray(kps),
                               rtol=1e-5, atol=1e-3)


def test_palm_gt_rotation_matches_runner_contract():
    """palm_gt puts kp0=wrist and kp2=middle-MCP so the runner's
    detection_to_rect(..., 0, 2, pi/2) recovers the same rotation as the
    landmark tracker's landmarks_to_rect(kps, 0, 9, pi/2)."""
    from tools.train_hand_standin import FR, render_hand
    from tools.train_palm_standin import palm_gt

    for seed in (1, 7, 23):
        _, kps, _ = render_hand(jax.random.key(seed), True, FR)
        c, side, kp7 = palm_gt(kps)
        box = jnp.asarray([c[0] - side / 2, c[1] - side / 2,
                           c[0] + side / 2, c[1] + side / 2])
        det_rect = warp.detection_to_rect(box, kp7, 0, 2, jnp.pi / 2)
        trk_rect = warp.landmarks_to_rect(kps, 0, 9, jnp.pi / 2)
        d = float(jnp.abs(warp.normalize_radians(
            det_rect.rotation - trk_rect.rotation)))
        assert d < 1e-4, d
        # The palm ring sits inside the full-hand bbox.
        assert float(side) <= float(jnp.maximum(trk_rect.w,
                                                trk_rect.h)) * 1.3


def test_seg_class_constants_match_runner():
    """The segmenter trainer's class indices are the runner's contract
    (selfie_multiclass layout: drawer consumes FACE_SKIN's confidence —
    reference drawer.py:99)."""
    from bp_from_video_tpu.models import runner as runner_mod
    from tools.train_seg_standin import BG, C, FACE_SKIN

    assert C == runner_mod.SEG_CLASSES
    assert FACE_SKIN == runner_mod.SEG_SKIN_CLASS
    assert BG == 0


def test_render_person_paint_order_and_coverage():
    """The person renderer's class map covers every trained class across
    seeds, face paints OVER hair (the crescent shows only outside the
    face), and person-free scenes are all background."""
    from tools.train_seg_standin import (BG, CLOTHES, FACE_SKIN, HAIR,
                                         render_person)

    seen = set()
    for seed in range(6):
        img, classes = jax.jit(
            lambda k: render_person(k, True))(jax.random.key(seed))
        c = np.asarray(classes)
        seen |= set(np.unique(c).tolist())
        assert (c == FACE_SKIN).sum() > 300
        assert (c == CLOTHES).sum() > 300
        assert np.asarray(img).shape == (3, 256, 256)
    assert {BG, HAIR, FACE_SKIN, CLOTHES}.issubset(seen), seen

    _, empty = jax.jit(
        lambda k: render_person(k, False))(jax.random.key(0))
    assert (np.asarray(empty) == BG).all()
