"""Train the PALM DETECTOR stand-in on procedural hands — natural hand
ACQUISITION without seeded tracking.

Round 4 made the hand landmark stand-in tracking-grade
(tools/train_hand_standin.py), but acquisition still needed a seeded
rect because the palm detector stayed random-init.  This trainer closes
that: the same SDF hand renderer supervises the SSD stand-in detector
(models/blaze.init_blaze_detector — heads at /8 and /16, 2016 anchors,
7 keypoints; reference palm_detection contract,
/root/reference/inference_runner.py:135-151) with decode-consistent
targets:

  * regressors: (GT - anchor) * input_size for center/keypoints, GT size
    * input_size for w/h (the exact inverse of detection.decode).
  * logits: positive on the K_POS anchors nearest the GT palm center
    when a hand is present; negative elsewhere (BCE, positive-weighted).

GT palm box = square over the palm ring (wrist + MCPs); keypoints put
kp0 = wrist and kp2 = middle-MCP so the runner's
detection_to_rect(..., 0, 2, pi/2) rotation contract holds.

Validation: an InferenceRunner with trained palm + hand nets must
ACQUIRE a hand it has never been told about (init_state, no seeding,
VIDEO mode) and then track it — the acquisition half of the hand
lifecycle.  Writes models/palm_det_standin_synth.{npz,json}; the
artifact loads BY DEFAULT when the real bundle is absent
(InferenceConfig.palm_det_standin_path).

Usage:  python tools/train_palm_standin.py             (TPU, ~12k steps)
        BENCH_PLATFORM=cpu STEPS=20 BATCH=2 CHUNK=10 python tools/train_palm_standin.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402
from tools.train_hand_standin import FR, render_hand  # noqa: E402

DET_S = 192      # palm detector input (MediaPipe palm_detection contract)
K_POS = 6        # anchors assigned positive per hand
NEG_FRAC = 0.3


def palm_gt(kps):
    """GT palm box + 7 keypoints (frame px) from the 21 hand landmarks.

    Box: square over the palm ring (wrist + 5 MCPs), padded 25%.
    Keypoints: [wrist, index MCP, middle MCP, ring MCP, pinky MCP,
    thumb base, palm center] — kp0/kp2 are the pair the runner's
    detection_to_rect consumes for rotation."""
    import jax.numpy as jnp
    ring = kps[jnp.asarray([0, 5, 9, 13, 17])]
    lo = jnp.min(ring, axis=0)
    hi = jnp.max(ring, axis=0)
    c = (lo + hi) / 2.0
    side = 1.25 * jnp.max(hi - lo)
    kp7 = jnp.stack([kps[0], kps[5], kps[9], kps[13], kps[17], kps[1], c])
    return c, side, kp7


def render_face_distractor(key, fr):
    """Procedural face-like distractor: skin ellipse + hair crescent +
    eyes/mouth, randomized geometry and palette.  Returns (rgb [3,fr,fr],
    mask [fr,fr]).

    Round-5 finding (TPUACC phase D): a palm detector trained only on
    hand scenes FALSE-POSITIVES on faces — a skin ellipse looks like a
    palm blob — so when the hand leaves the frame it 're-acquires' the
    subject's face and the hand lifecycle silently corrupts.  Faces are
    hard negatives here, in the same procedural family as (but not
    identical to) the accuracy tools' synth_face."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 10)
    u = lambda k, lo, hi, shape=(): jax.random.uniform(
        k, shape, jnp.float32, lo, hi)
    yy, xx = jnp.mgrid[0:fr, 0:fr]
    xf, yf = xx.astype(jnp.float32), yy.astype(jnp.float32)

    def ellipse(cx, cy, rx, ry):
        return (((xf - cx) / rx) ** 2 + ((yf - cy) / ry) ** 2) <= 1.0

    cx = u(ks[0], 0.22 * fr, 0.78 * fr)
    cy = u(ks[1], 0.22 * fr, 0.78 * fr)
    rx = u(ks[2], 0.10 * fr, 0.24 * fr)
    ry = rx * u(ks[3], 1.15, 1.45)
    face = ellipse(cx, cy, rx, ry)
    hair = ellipse(cx, cy - 0.30 * ry, 1.22 * rx, 1.12 * ry) & ~face
    eye_l = ellipse(cx - 0.40 * rx, cy - 0.18 * ry, 0.16 * rx, 0.10 * ry)
    eye_r = ellipse(cx + 0.40 * rx, cy - 0.18 * ry, 0.16 * rx, 0.10 * ry)
    mouth = ellipse(cx, cy + 0.48 * ry, 0.42 * rx, 0.12 * ry)

    skin = (jnp.asarray([205.0, 170.0, 140.0])
            + u(ks[4], -45.0, 45.0, (3,)))
    hair_c = u(ks[5], 20.0, 90.0, (3,))
    dark = u(ks[6], 20.0, 70.0, (3,))
    img = jnp.zeros((3, fr, fr))
    for m, c in ((face, skin), (hair, hair_c), (eye_l, dark),
                 (eye_r, dark), (mouth, dark)):
        img = jnp.where(m[None], c[:, None, None], img)
    shade = 1.0 + 0.10 * jnp.sin(yf / u(ks[7], 25.0, 60.0))
    img = jnp.clip(img * shade[None]
                   + jax.random.normal(ks[8], (3, fr, fr)) * 3.0,
                   0.0, 255.0)
    return img, face | hair


def main():
    if not os.environ.get("BENCH_PLATFORM"):
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("train_palm_standin: tunnel unreachable", file=sys.stderr)
            sys.exit(3)
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    _enable_compile_cache()
    import functools

    import jax.numpy as jnp
    import numpy as np
    import optax

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        force_sync_dispatch()

    from bp_from_video_tpu.models import anchors as anchors_lib
    from bp_from_video_tpu.models import blaze, detection, warp

    anchors = jnp.asarray(anchors_lib.generate_anchors(anchors_lib.PALM))
    a_n = anchors.shape[0]
    steps = int(os.environ.get("STEPS", "12000"))
    batch = int(os.environ.get("BATCH", "16"))
    chunk = int(os.environ.get("CHUNK", "25"))
    params = blaze.init_blaze_detector(21, DET_S, a_n, 7)
    params = jax.device_put(params)
    opt = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, 5e-4, min(500, steps // 4), steps, 1e-5))
    opt_state = opt.init(params)

    def sample(key, with_hand):
        """One letterboxed training frame + decode-inverse targets.

        Half the frames (hand-present AND hand-free alike) carry a
        face-like distractor painted UNDER the hand — a hard negative the
        logits must reject (see render_face_distractor)."""
        k_hand, k_face, k_gate = jax.random.split(key, 3)
        img, kps, pres, hmask = render_hand(k_hand, with_hand, FR,
                                            with_mask=True)
        fimg, fmask = render_face_distractor(k_face, FR)
        put_face = (jax.random.uniform(k_gate, ()) < 0.5)
        paint = fmask & ~hmask & put_face
        img = jnp.where(paint[None], fimg, img)
        lb = warp.letterbox(jnp.transpose(img, (1, 2, 0)), DET_S)
        x = jnp.transpose(lb.image, (2, 0, 1)) / 255.0     # planar, zero1
        # Frame px -> letterbox-normalized (the decode coordinate space):
        # unletterbox_points maps letterbox-normalized -> frame px; invert.
        c, side, kp7 = palm_gt(kps)
        to_lbn = lambda p: (p / lb.scale
                            + jnp.stack([lb.pad_x, lb.pad_y])) / DET_S
        c_n = to_lbn(c)
        kp_n = jax.vmap(to_lbn)(kp7)
        size_n = side / lb.scale / DET_S
        d2 = jnp.sum((anchors - c_n[None]) ** 2, axis=-1)
        order = jnp.argsort(d2)
        pos = jnp.zeros((a_n,), bool).at[order[:K_POS]].set(True)
        pos = pos & jnp.asarray(pres > 0, bool)
        # Decode-inverse regressor targets, valid on positive anchors.
        reg = jnp.concatenate([
            (c_n[None] - anchors) * DET_S,                 # [A, 2]
            jnp.broadcast_to(size_n * DET_S, (a_n, 2)),    # w, h
            ((kp_n[None] - anchors[:, None]) * DET_S
             ).reshape(a_n, 14)], axis=-1)                 # [A, 18]
        return x, reg, pos

    def loss_fn(p, xs, regs, poss):
        pred_reg, pred_log = jax.vmap(
            lambda x: blaze.blaze_detector_apply(p, x[None], 7))(xs)
        pred_reg = pred_reg[:, 0]                          # [B, A, 18]
        pred_log = pred_log[:, 0, :, 0]                    # [B, A]
        # Positive-weighted BCE: 2016 anchors, ~6 positive.
        lab = poss.astype(jnp.float32)
        bce = optax.sigmoid_binary_cross_entropy(pred_log, lab)
        bce = jnp.mean(bce * jnp.where(poss, 100.0, 1.0))
        reg_err = optax.huber_loss(pred_reg, regs, delta=8.0)
        reg_l = (jnp.sum(reg_err * poss[..., None])
                 / (18.0 * jnp.maximum(jnp.sum(poss), 1.0)))
        return bce + 0.05 * reg_l, (bce, reg_l)

    def train_step(carry, key):
        p, o = carry
        kk = jax.random.split(key, batch + 1)
        wh = jax.random.uniform(kk[0], (batch,)) > NEG_FRAC
        xs, regs, poss = jax.vmap(sample)(kk[1:], wh)
        (loss, (bce, reg_l)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, xs, regs, poss)
        up, o = opt.update(g, o, p)
        return (jax.tree.map(lambda a, b: a + b, p, up), o), \
            jnp.stack([loss, bce, reg_l])

    @jax.jit
    def train_chunk(p, o, key):
        (p, o), losses = jax.lax.scan(
            train_step, (p, o), jax.random.split(key, chunk))
        return p, o, losses[-1]

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models")
    path = os.path.join(out, "palm_det_standin_synth.npz")
    if os.environ.get("EVAL_ONLY"):
        params = jax.device_put(blaze.load_standin_npz(path))
        print(f"EVAL_ONLY: loaded {path}", flush=True)
    else:
        key = jax.random.key(77)
        for c in range(steps // chunk):
            key, sub = jax.random.split(key)
            params, opt_state, last = train_chunk(params, opt_state, sub)
            if c % 8 == 0 or (c + 1) * chunk >= steps:
                l = np.asarray(last)
                print(f"step {(c + 1) * chunk}: loss={l[0]:.4f} "
                      f"bce={l[1]:.4f} reg={l[2]:.4f}", flush=True)

    # --- held-out detector eval -------------------------------------------
    @jax.jit
    def detect_one(p, x):
        reg, log = blaze.blaze_detector_apply(p, x[None], 7)
        raw = detection.decode(detection.PALM_DECODE,
                               reg[0].astype(jnp.float32),
                               log[0].astype(jnp.float32), anchors)
        return detection.weighted_nms(detection.PALM_DECODE, raw, 1)

    hits, c_errs, rot_errs = [], [], []
    for i in range(64):
        key = jax.random.key(9000 + i)
        img, kps, _, hmask = render_hand(key, True, FR, with_mask=True)
        if i % 2 == 1:   # half the eval scenes carry the face distractor
            fimg, fmask = render_face_distractor(
                jax.random.key(500 + i), FR)
            img = jnp.where((fmask & ~hmask)[None], fimg, img)
        lb = warp.letterbox(jnp.transpose(img, (1, 2, 0)), DET_S)
        x = jnp.transpose(lb.image, (2, 0, 1)) / 255.0
        nms = detect_one(params, x)
        c, side, kp7 = palm_gt(kps)
        if int(nms.count) < 1:
            hits.append(False)
            continue
        box = np.asarray(warp.unletterbox_points(
            nms.boxes.reshape(-1, 2, 2), lb, DET_S))[0]    # [2, 2] frame px
        kp = np.asarray(warp.unletterbox_points(nms.kps, lb, DET_S))[0]
        det_c = box.reshape(-1, 2).mean(0)
        c_err = float(np.linalg.norm(det_c - np.asarray(c)))
        v_gt = np.asarray(kps[9] - kps[0])
        v_dt = kp[2] - kp[0]
        ang = np.arccos(np.clip(
            np.dot(v_gt, v_dt)
            / (np.linalg.norm(v_gt) * np.linalg.norm(v_dt) + 1e-9),
            -1, 1))
        hits.append(c_err < 0.35 * float(side))
        c_errs.append(c_err)
        rot_errs.append(np.degrees(ang))
    hit_rate = float(np.mean(hits))
    print(f"held-out: hit {hit_rate:.3f}, center err "
          f"{np.mean(c_errs):.1f} px, rot err {np.mean(rot_errs):.1f} deg",
          flush=True)

    # Face-only rejection: hand-free scenes with ONLY the face distractor
    # must yield zero detections (the phase-D lifecycle depends on it —
    # a false palm on the face silently corrupts the hand ROI when the
    # real hand leaves the frame).
    false_pos = 0
    n_reject = 48
    for i in range(n_reject):
        img, _, _, _ = render_hand(jax.random.key(12000 + i), False, FR,
                                   with_mask=True)
        fimg, fmask = render_face_distractor(jax.random.key(700 + i), FR)
        img = jnp.where(fmask[None], fimg, img)
        lb = warp.letterbox(jnp.transpose(img, (1, 2, 0)), DET_S)
        nms = detect_one(params,
                         jnp.transpose(lb.image, (2, 0, 1)) / 255.0)
        false_pos += int(int(nms.count) > 0)
    face_fp_rate = false_pos / n_reject
    print(f"face-only rejection: {false_pos}/{n_reject} false acquires "
          f"({face_fp_rate:.3f})", flush=True)

    host = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    os.makedirs(out, exist_ok=True)
    # Candidate-then-promote: the acquisition validation below loads the
    # artifact through the runner path, but a failed/smoke run must never
    # clobber the shipped known-good detector.
    cand_path = path.replace(".npz", ".candidate.npz")
    blaze.save_standin_npz(cand_path, host,
                           meta={"input_size": DET_S, "anchors": 2016,
                                 "kps": 7})
    print(f"saved candidate {cand_path}", flush=True)

    # --- acquisition validation: runner acquires UNSEEDED -----------------
    from bp_from_video_tpu.config import InferenceConfig, RunningMode
    from bp_from_video_tpu.models.runner import InferenceRunner

    cfg = InferenceConfig(face_landmarker=False, hand_landmarker=True,
                          running_mode=RunningMode.VIDEO, max_hands=1,
                          palm_det_standin_path=cand_path)
    H = W = 256
    runner = InferenceRunner(cfg, H, W)
    predict = jax.jit(runner.predict)
    pose_key = jax.random.key(321)
    st = runner.init_state()          # NO seeding — detector must acquire
    tracked, errs = [], []
    n_frames = 24
    for i in range(n_frames):
        t = i / (n_frames - 1)
        pose = (jnp.float32(H * (0.40 + 0.18 * t)),
                jnp.float32(H * (0.55 - 0.12 * t)),
                jnp.float32(0.5 - 0.8 * t),
                jnp.float32(H * 0.10))
        img, kps, _ = render_hand(pose_key, True, fr=H, pose=pose)
        frame = jnp.transpose(img, (1, 2, 0)).astype(jnp.uint8)
        st, res = predict(runner.params, st, frame)
        d = res.hand_landmarker
        if int(d.count) > 0:
            pts = np.asarray(d.points[0], np.float64)[:21]
            errs.append(np.linalg.norm(pts - np.asarray(kps),
                                       axis=-1).mean())
            tracked.append(True)
        else:
            tracked.append(False)
    # Acquisition: the first detection may take a couple frames; steady
    # state is everything after the first hit.
    first = tracked.index(True) if any(tracked) else n_frames
    steady = tracked[first:]
    acq_frac = float(np.mean(steady)) if steady else 0.0
    mean_err = float(np.mean(errs)) if errs else float("nan")
    print(f"acquisition validation: first hit frame {first}, steady "
          f"tracked {acq_frac:.2f}, mean landmark err {mean_err:.2f} px",
          flush=True)

    rec = {"steps": steps, "batch": batch,
           "held_out_hit_rate": round(hit_rate, 3),
           "held_out_center_err_px": round(float(np.mean(c_errs)), 1)
           if c_errs else None,
           "held_out_rot_err_deg": round(float(np.mean(rot_errs)), 1)
           if rot_errs else None,
           "face_only_false_acquire_rate": round(face_fp_rate, 3),
           "face_reject_gate": 0.05,
           "acq_first_hit_frame": first,
           "acq_steady_tracked": round(acq_frac, 3),
           "acq_mean_landmark_px": (round(mean_err, 2)
                                    if np.isfinite(mean_err) else None),
           "ok": bool(hit_rate >= 0.9 and face_fp_rate <= 0.05
                      and acq_frac >= 0.9),
           "backend": jax.default_backend()}
    print(json.dumps(rec), flush=True)
    if rec["ok"]:
        os.replace(cand_path, path)
        print(f"promoted {path}", flush=True)
    else:
        print(f"gates failed — candidate left at {cand_path}, shipped "
              f"artifact untouched", flush=True)
    with open(os.path.join(out, "palm_det_standin_synth.json"
                           if rec["ok"] else
                           "palm_det_standin_synth.failed.json"), "w") as f:
        json.dump(rec, f, indent=1)
    sys.exit(0 if rec["ok"] else 1)


if __name__ == "__main__":
    main()
