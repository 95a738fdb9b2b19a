"""Train the hand-landmark STAND-IN on procedurally rendered hands.

The reference snapshot lacks the real hand bundle
(`/root/reference/models/.MISSING_LARGE_BLOBS`), so the rebuild's hand
half runs an architecture-faithful but RANDOM-INIT stand-in — tracked at
the right compute shape, numerically noise (VERDICT r2 Missing #1/Weak
#6).  With no egress and no hand data, the strongest closure available
is supervised training on PROCEDURAL hands: a 2-D skeletal hand model
(MediaPipe's 21-keypoint layout — wrist + 4 joints x 5 fingers,
reference inference_runner.py:135-151 consumes exactly these) rendered
in-graph as capsule/ellipse SDFs with full label knowledge, random pose,
scale, rotation, color and background.

Everything is TPU-shaped: data synthesis is jitted math (no host data
path), and training runs as `lax.scan` chunks of optimizer steps per
dispatch (the remote tunnel costs ~30 ms per dispatch — per-step calls
would be 95% dispatch).

Output: ``models/hand_lm_standin_synth.npz`` — the trained params
(including the repacked Pallas stem twin) — plus a tracking-level
validation: an InferenceRunner with the trained weights swapped in must
TRACK a moving rendered hand through its own predict loop (presence
gate, landmark-derived next rect), with wrist/middle-MCP errors a few
px.  The artifact is LOADED BY DEFAULT whenever the real hand bundle is
absent (InferenceConfig.hand_lm_standin_path; round 4 — the spatial
dense head broke the pooled head's 30 px floor, making the trained
stand-in tracking-grade on procedural hands).

Usage:  python tools/train_hand_standin.py            (TPU, ~2k steps)
        BENCH_PLATFORM=cpu STEPS=60 BATCH=8 python tools/train_hand_standin.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402

S = 224          # hand-crop input size (MediaPipe hand landmark net)
FR = 320         # synthetic frame size the crops are sampled from
L = 21           # landmarks
NEG_FRAC = 0.25  # fraction of background-only (presence=0) samples


def render_hand(key, with_hand, fr=S, pose=None, with_mask=False):
    """PRNG key -> (image [3, fr, fr] f32 0..255, keypoints [L, 2] px,
    presence {0,1}[, skin mask [fr, fr] bool]).  Pure jnp; jit/vmap-able.
    ``pose`` overrides the sampled (cx, cy, theta, scale) — the tracking
    validation uses it to move one hand smoothly while keeping the finger
    pose fixed by key; ``with_mask`` additionally returns the hand's skin
    mask (the pixels a pulse modulates in the accuracy phases)."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 12)
    u = lambda k, lo, hi, shape=(): jax.random.uniform(
        k, shape, jnp.float32, lo, hi)

    if pose is None:
        cx = u(ks[0], 0.30 * fr, 0.70 * fr)
        cy = u(ks[1], 0.30 * fr, 0.70 * fr)
        theta = u(ks[2], -jnp.pi, jnp.pi)
        scale = u(ks[3], 0.05 * fr, 0.18 * fr)    # palm radius-ish
    else:
        cx, cy, theta, scale = pose

    # Skeleton in the hand frame (+y = fingers direction before rotation).
    # Finger fan angles (thumb wide) + per-finger length multipliers.
    fan = jnp.asarray([-1.05, -0.35, 0.0, 0.32, 0.68]) \
        + u(ks[4], -0.08, 0.08, (5,))
    flen = jnp.asarray([0.70, 1.00, 1.12, 1.02, 0.82]) \
        * u(ks[5], 0.9, 1.1, (5,))
    seg = jnp.asarray([0.50, 0.30, 0.24])          # MCP->PIP->DIP->TIP

    def rot(px, py):
        c, s_ = jnp.cos(theta), jnp.sin(theta)
        return cx + c * px - s_ * py, cy + s_ * px + c * py

    wrist = jnp.stack(rot(0.0, -1.05 * scale))
    pts = [wrist]
    for f in range(5):
        a = fan[f]
        dx, dy = jnp.sin(a), jnp.cos(a)
        # Knuckle ring ~0.55*scale from palm center along the fan.
        base_x, base_y = 0.55 * scale * dx, 0.35 * scale + 0.2 * scale * dy
        p = jnp.stack([base_x, base_y])
        d = jnp.stack([dx, dy])
        for j in range(4):
            if j > 0:
                p = p + d * (seg[j - 1] * flen[f] * scale)
            pts.append(jnp.stack(rot(p[0], p[1])))
    kps = jnp.stack(pts)                           # [21, 2] px

    yy, xx = jnp.mgrid[0:fr, 0:fr]
    pix = jnp.stack([xx, yy], -1).astype(jnp.float32)  # [fr, fr, 2]

    def capsule(a, b, r):
        ab = b - a
        t = jnp.clip(jnp.einsum("hwc,c->hw", pix - a, ab)
                     / (ab @ ab + 1e-6), 0.0, 1.0)
        d = jnp.linalg.norm(pix - (a + t[..., None] * ab[None, None]),
                            axis=-1)
        return d < r

    # Bones: wrist->MCP per finger + 3 segments per finger.
    mask = jnp.zeros((fr, fr), bool)
    r_f = 0.11 * scale
    for f in range(5):
        mcp = kps[1 + 4 * f]
        mask |= capsule(wrist, mcp, 0.13 * scale)
        for j in range(3):
            mask |= capsule(kps[1 + 4 * f + j], kps[2 + 4 * f + j], r_f)
    # Palm blob: ellipse around the centroid of wrist+knuckles.
    pcx, pcy = rot(0.0, -0.15 * scale)
    c, s_ = jnp.cos(theta), jnp.sin(theta)
    rel = pix - jnp.stack([pcx, pcy])
    ex = (rel[..., 0] * c + rel[..., 1] * s_) / (0.62 * scale)
    ey = (-rel[..., 0] * s_ + rel[..., 1] * c) / (0.78 * scale)
    mask |= (ex * ex + ey * ey) < 1.0
    mask &= jnp.asarray(with_hand, bool)

    bg = u(ks[6], 40.0, 200.0)
    noise = jax.random.normal(ks[7], (fr, fr)) * u(ks[8], 2.0, 12.0)
    skin = jnp.asarray([205.0, 170.0, 140.0]) + u(ks[9], -35.0, 35.0, (3,))
    shade = 1.0 + 0.1 * jnp.sin(pix[..., 0] / u(ks[10], 20.0, 60.0))
    img = jnp.where(mask[None], skin[:, None, None] * shade[None],
                    bg + noise[None])
    img = jnp.clip(img + jax.random.normal(ks[11], (3, fr, fr)) * 3.0,
                   0.0, 255.0)
    if with_mask:
        return img, kps, jnp.asarray(with_hand, jnp.float32), mask
    return img, kps, jnp.asarray(with_hand, jnp.float32)


def crop_sample(key, with_hand):
    """One SERVE-DISTRIBUTION training sample: render a hand into an
    FR-frame, derive the runner's own crop rect from the GT landmarks —
    the tracking geometry (landmarks_to_rect -> rect_transform(2.0,
    shift_y=-0.1), runner.py hand_next_rect) or, 25% of the time, the
    palm-DETECTOR geometry (palm ring bbox, scale 2.6, shift_y=-0.5,
    runner.py palm rect) — jitter it like a previous-frame rect, take its
    axis-aligned cover, and extract the crop with warp.crop_rect (the
    exact serve path).  Round 3's trainer rendered hands pixel-native at
    crop resolution; through the real predict loop the net then saw a
    resampled, scale-normalized, differently-framed view and landmark
    error tripled (11.8 held-out -> 63 px tracked).

    Returns (crop [3, S, S] f32 0..255, gt crop-px [L, 2], presence)."""
    import jax
    import jax.numpy as jnp

    from bp_from_video_tpu.models import warp

    k_img, k_geom, k_jit, k_neg = jax.random.split(key, 4)
    img, kps, pres = render_hand(k_img, with_hand, FR)   # [3, FR, FR]

    track = warp.rect_transform(
        warp.landmarks_to_rect(kps, 0, 9, jnp.pi / 2),
        scale=2.0, shift_y=-0.1)
    palm_ring = kps[jnp.asarray([0, 1, 5, 9, 13, 17])]
    det = warp.rect_transform(
        warp.landmarks_to_rect(palm_ring, 0, 3, jnp.pi / 2),
        scale=2.6, shift_y=-0.5)
    use_det = jax.random.uniform(k_geom) < 0.25
    rect = jax.tree.map(lambda a, b: jnp.where(use_det, a, b), det, track)

    # Previous-frame jitter: the serve-time rect comes from the LAST
    # frame's landmarks (or a detector box), so train with the rect
    # displaced/scaled/rotated off the current truth.
    jc = jax.random.uniform(k_jit, (4,), jnp.float32, -1.0, 1.0)
    rect = warp.Rect(rect.cx + 0.05 * rect.w * jc[0],
                     rect.cy + 0.05 * rect.h * jc[1],
                     rect.w * (1.0 + 0.15 * jc[2]),
                     rect.h * (1.0 + 0.15 * jc[2]),
                     rect.rotation + 0.15 * jc[3])
    # Background-only samples have no landmarks to anchor a rect: crop a
    # random window instead (what the tracker serves right after a false
    # detection).
    kn = jax.random.uniform(k_neg, (4,), jnp.float32)
    side = (0.25 + 0.75 * kn[2]) * FR
    neg = warp.Rect(FR * (0.3 + 0.4 * kn[0]), FR * (0.3 + 0.4 * kn[1]),
                    side, side, (kn[3] - 0.5) * 2 * jnp.pi)
    rect = jax.tree.map(
        lambda a, b: jnp.where(pres > 0, a, b), rect, neg)

    cov = warp.axis_aligned_cover(rect)
    crop = warp.crop_rect(jnp.transpose(img, (1, 2, 0)), cov, S,
                          exact_rotation=False)          # [S, S, 3]
    # GT landmarks in crop pixels: the exact inverse of the runner's
    # _project_lm (lm / size -> project_landmarks through the same cover).
    u = (kps[:, 0] - cov.cx) / cov.w + 0.5
    v = (kps[:, 1] - cov.cy) / cov.h + 0.5
    gt = jnp.stack([u, v], axis=-1) * S
    return jnp.transpose(crop, (2, 0, 1)), gt, pres


def main():
    if not os.environ.get("BENCH_PLATFORM"):
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("train_hand_standin: tunnel unreachable", file=sys.stderr)
            sys.exit(3)
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    _enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()

    from bp_from_video_tpu.models import blaze

    steps = int(os.environ.get("STEPS", "16000"))
    batch = int(os.environ.get("BATCH", "32"))
    chunk = int(os.environ.get("CHUNK", "50"))
    params = blaze.init_blaze_landmark(7, S, L)
    params.pop("stem_p")  # repacked from the trained stem at save time
    params = jax.device_put(params)
    opt = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, 5e-4, min(500, steps // 4), steps, 1e-5))
    opt_state = opt.init(params)

    def batch_data(key):
        kk = jax.random.split(key, batch + 1)
        with_hand = (jax.random.uniform(kk[0], (batch,)) > NEG_FRAC)
        return jax.vmap(crop_sample)(kk[1:], with_hand)

    def loss_fn(p, imgs, kps, pres):
        lm, phat, _aux = blaze.blaze_landmark_apply(
            p, imgs / 255.0, S)                     # [B, 3L], [B, 1]
        lm = lm.reshape(batch, L, 3)
        # x, y supervised in normalized crop units; z unsupervised (the
        # procedural model is 2-D — mirror the heads' sigmoid range by
        # letting z float).  Charbonnier on the per-landmark DISTANCE:
        # optimizes the mean-px gate directly instead of MSE's
        # outlier-dominated objective.
        err = (lm[..., :2] - kps) / S
        d = jnp.sqrt(jnp.sum(err * err, axis=-1) + 1e-6)
        lm_loss = jnp.mean(jnp.where(pres[:, None] > 0, d, 0.0))
        bce = -jnp.mean(pres * jnp.log(phat[:, 0] + 1e-6)
                        + (1 - pres) * jnp.log(1 - phat[:, 0] + 1e-6))
        return lm_loss + 0.05 * bce, (lm_loss, bce)

    def train_step(carry, key):
        p, o = carry
        imgs, kps, pres = batch_data(key)
        (loss, (lm_l, bce)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, imgs, kps, pres)
        up, o = opt.update(g, o, p)
        return (jax.tree.map(lambda a, b: a + b, p, up), o), \
            jnp.stack([loss, lm_l, bce])

    @jax.jit
    def train_chunk(p, o, key):
        (p, o), losses = jax.lax.scan(
            train_step, (p, o), jax.random.split(key, chunk))
        return p, o, losses[-1]

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models")
    path = os.path.join(out, "hand_lm_standin_synth.npz")
    if os.environ.get("EVAL_ONLY"):
        # Re-run eval + tracking validation against the saved artifact
        # (e.g. after a validation-harness fix) without retraining.
        host0 = blaze.load_standin_npz(path)
        host0.pop("stem_p", None)
        params = jax.device_put(host0)
        print(f"EVAL_ONLY: loaded {path}", flush=True)
    else:
        key = jax.random.key(42)
        for c in range(steps // chunk):
            key, sub = jax.random.split(key)
            params, opt_state, last = train_chunk(params, opt_state, sub)
            if c % 4 == 0 or (c + 1) * chunk >= steps:
                l = np.asarray(last)
                print(f"step {(c + 1) * chunk}: loss={l[0]:.5f} "
                      f"lm={l[1]:.5f} bce={l[2]:.4f}", flush=True)

    # --- held-out eval: landmark error in px (8 fresh batches) ------------
    eval_fn = jax.jit(lambda p, x: blaze.blaze_landmark_apply(
        p, x / 255.0, S))
    errs_all, accs = [], []
    for i in range(8):
        imgs, kps, pres = jax.jit(batch_data)(jax.random.key(777 + i))
        lm, phat, _ = eval_fn(params, imgs)
        lm = np.asarray(lm).reshape(batch, L, 3)[..., :2]
        kps_np, pres_np = np.asarray(kps), np.asarray(pres) > 0
        errs_all.append(np.linalg.norm(lm - kps_np, axis=-1)[pres_np])
        phat_np = np.asarray(phat)[:, 0]
        accs.append(((phat_np > 0.5) == pres_np).mean())
    err = np.concatenate(errs_all)
    pres_acc = float(np.mean(accs))
    print(f"held-out ({err.shape[0]} hands): mean lm err {err.mean():.2f} "
          f"px, p95 {np.percentile(err, 95):.2f} px, presence acc "
          f"{pres_acc:.3f}", flush=True)

    # --- save: numpy pytree + repacked Pallas stem twin -------------------
    host = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    host["stem_p"] = blaze._pack_stem(host["stem"], 3, S)
    os.makedirs(out, exist_ok=True)
    blaze.save_standin_npz(path, host,
                           meta={"input_size": S, "num_landmarks": 21})
    print(f"saved {path}", flush=True)

    # --- tracking-level validation: the runner TRACKS a moving hand -------
    from bp_from_video_tpu.config import InferenceConfig, RunningMode
    from bp_from_video_tpu.models.runner import InferenceRunner

    cfg = InferenceConfig(face_landmarker=False, hand_landmarker=True,
                          running_mode=RunningMode.VIDEO, max_hands=1)
    H = W = 256
    runner = InferenceRunner(cfg, H, W)
    rp = dict(runner.params)
    rp["hand_lm"] = jax.device_put(host)   # swap in the trained net
    predict = jax.jit(runner.predict)

    from bp_from_video_tpu.models import warp

    st = runner.init_state()
    # Seed tracking once with the runner's own rect formula on frame-0 GT
    # (the palm DETECTOR stand-in stays random — this validates the
    # trained landmark net's track-ability, not detection), then follow a
    # SMOOTHLY moving hand: fixed finger pose (one key), center/rotation/
    # scale drifting per frame like a real hand between 30 Hz frames.
    pose_key = jax.random.key(123)
    errs, present = [], []
    n_frames = 24
    for i in range(n_frames):
        t = i / (n_frames - 1)
        pose = (jnp.float32(H * (0.36 + 0.26 * t)),
                jnp.float32(H * (0.58 - 0.20 * t)),
                jnp.float32(-0.6 + 1.1 * t),
                jnp.float32(H * 0.105))
        img, kps, _ = render_hand(pose_key, True, fr=H, pose=pose)
        frame = jnp.transpose(img, (1, 2, 0)).astype(jnp.uint8)
        gt = np.asarray(kps)
        if i == 0:
            r0 = warp.rect_transform(
                warp.landmarks_to_rect(kps, 0, 9, jnp.pi / 2),
                scale=2.0, shift_y=-0.1)
            c = jnp.asarray([r0.cx, r0.cy, r0.w, r0.h, r0.rotation],
                            jnp.float32)
            st = st._replace(hand_rects=st.hand_rects.at[0].set(c),
                             hand_tracking=st.hand_tracking.at[0].set(True))
        st, res = predict(rp, st, frame)
        d = res.hand_landmarker
        if int(d.count) > 0:
            pts = np.asarray(d.points[0], np.float64)[:L]
            errs.append(np.linalg.norm(pts - gt, axis=-1).mean())
            present.append(True)
        else:
            present.append(False)
    frac = float(np.mean(present))
    mean_err = float(np.mean(errs)) if errs else float("nan")
    print(f"tracking validation: tracked {frac:.2f} of frames, mean "
          f"landmark err {mean_err:.2f} px", flush=True)

    rec = {"steps": steps, "batch": batch,
           "held_out_mean_px": round(float(err.mean()), 2),
           "held_out_p95_px": round(float(np.percentile(err, 95)), 2),
           "presence_acc": round(pres_acc, 3),
           "tracked_frac": round(frac, 3),
           "tracking_mean_px": round(mean_err, 2),
           "backend": jax.default_backend()}
    print(json.dumps(rec), flush=True)
    with open(os.path.join(out, "hand_lm_standin_synth.json"), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
