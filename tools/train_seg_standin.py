"""Train the selfie-multiclass segmenter STAND-IN on procedural scenes.

The reference snapshot lacks the real ``selfie_multiclass.tflite`` blob
(`/root/reference/models/.MISSING_LARGE_BLOBS`), so the rebuild's
segmenter is an architecture stand-in — random-init until now, which
made the skin-weighted sampling mode (BASELINE config 2; reference
inference_runner.py:154-166, drawer.py:99) multiply by noise (VERDICT r3
Missing #2).  Mirroring the hand approach (tools/train_hand_standin.py):
procedural SDF person scenes with full label knowledge — torso/clothes,
neck, hair crescent, face ellipse, hands, occasional held object — in
the model's 6-class layout (0 bg, 1 hair, 2 body-skin, 3 FACE-SKIN —
the class the pipeline consumes, 4 clothes, 5 other).

Everything is TPU-shaped: jitted in-graph synthesis, `lax.scan` chunks
of optimizer steps per dispatch.  Output:
``models/seg_standin_synth.npz`` (+ json metrics), loaded BY DEFAULT by
InferenceRunner when the real blob is absent
(InferenceConfig.seg_standin_path).

Usage:  python tools/train_seg_standin.py             (TPU, ~16k steps)
        BENCH_PLATFORM=cpu STEPS=20 BATCH=2 CHUNK=10 python tools/train_seg_standin.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache  # noqa: E402

S = 256          # segmenter input size (selfie_multiclass contract)
C = 6            # classes
NEG_FRAC = 0.15  # fraction of person-free (all-background) scenes

# Class indices (reference drawer.py:99 consumes FACE_SKIN's confidence).
BG, HAIR, BODY_SKIN, FACE_SKIN, CLOTHES, OTHER = range(6)


def render_person(key, with_person, fr=S):
    """PRNG key -> (image [3, fr, fr] f32 0..255, classes [fr, fr] i32).

    A frontal upper-body scene from ellipse/rect SDFs, painted back to
    front so the class map is the last paint at each pixel.  Pure jnp;
    jit/vmap-able."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 24)
    u = lambda k, lo, hi, shape=(): jax.random.uniform(
        k, shape, jnp.float32, lo, hi)

    yy, xx = jnp.mgrid[0:fr, 0:fr]
    xf, yf = xx.astype(jnp.float32), yy.astype(jnp.float32)

    def ellipse(cx, cy, rx, ry):
        return (((xf - cx) / rx) ** 2 + ((yf - cy) / ry) ** 2) <= 1.0

    fcx = u(ks[0], 0.38 * fr, 0.62 * fr)
    fcy = u(ks[1], 0.30 * fr, 0.48 * fr)
    frx = u(ks[2], 0.10 * fr, 0.20 * fr)
    fry = frx * u(ks[3], 1.2, 1.45)

    face = ellipse(fcx, fcy, frx, fry)
    hair = ellipse(fcx, fcy - 0.30 * fry, 1.22 * frx, 1.12 * fry)
    neck = ((jnp.abs(xf - fcx) < 0.45 * frx)
            & (yf > fcy) & (yf < fcy + 1.9 * fry))
    torso = ellipse(fcx + u(ks[4], -0.05, 0.05) * fr,
                    fcy + 2.6 * fry, 2.6 * frx, 2.1 * fry)
    # Hands: 0-2 skin blobs low in the frame (frequent — body-skin IoU
    # was gradient-starved at 0.55/0.50 presence, VERDICT r4 weak #3).
    nh = (u(ks[5], 0.0, 1.0) < 0.75)
    hand1 = ellipse(fcx - u(ks[6], 1.2, 2.2) * frx,
                    fcy + u(ks[7], 3.0, 4.2) * fry,
                    0.55 * frx, 0.45 * fry) & nh
    hand2 = ellipse(fcx + u(ks[8], 1.2, 2.2) * frx,
                    fcy + u(ks[9], 3.0, 4.2) * fry,
                    0.55 * frx, 0.45 * fry) & (u(ks[10], 0.0, 1.0) < 0.6)
    # Held object ("other"): frequent and TEXTURED — a flat ellipse whose
    # color can land arbitrarily close to the clothes palette is
    # irreducibly confusable; the stripe field below makes 'other' a
    # texture class, not a color class (VERDICT r4 weak #3: other=0.42).
    obj_r = u(ks[18], 0.35, 0.65) * frx
    obj = ellipse(fcx + u(ks[11], -1.8, 1.8) * frx,
                  fcy + u(ks[12], 2.0, 3.8) * fry,
                  obj_r, obj_r * u(ks[19], 0.8, 1.25))
    obj = obj & (u(ks[13], 0.0, 1.0) < 0.65)

    wp = jnp.asarray(with_person, bool)
    classes = jnp.zeros((fr, fr), jnp.int32)
    # Paint order: torso -> neck -> hair -> face -> hands -> object.
    for mask, cls in ((torso, CLOTHES), (neck, BODY_SKIN), (hair, HAIR),
                      (face, FACE_SKIN), (hand1, BODY_SKIN),
                      (hand2, BODY_SKIN), (obj, OTHER)):
        classes = jnp.where(mask & wp, cls, classes)

    # Colors: per-class base with per-scene variation, shading, noise.
    skin = jnp.asarray([205.0, 170.0, 140.0]) + u(ks[14], -40.0, 40.0, (3,))
    key_c = jax.random.split(ks[15], 5)
    hair_c = u(key_c[0], 20.0, 90.0, (3,))
    cloth_c = u(key_c[1], 30.0, 220.0, (3,))
    obj_c = u(key_c[2], 60.0, 220.0, (3,))
    bg = u(key_c[3], 40.0, 200.0) + 0.15 * yf / fr * 60.0
    palette = jnp.stack([jnp.broadcast_to(jnp.zeros(3), (3,)), hair_c,
                         skin, skin, cloth_c, obj_c])      # [6, 3]
    onehot = jax.nn.one_hot(classes, C)                    # [fr, fr, 6]
    col = jnp.einsum("hwc,ck->khw", onehot, palette)       # [3, fr, fr]
    shade = 1.0 + 0.12 * jnp.sin(yf / u(key_c[4], 25.0, 70.0))
    # Fresh keys for the noise fields (review finding, round 4: reusing
    # ks[5]/ks[7] here coupled the background texture to hand presence/
    # position — a spurious correlation the net could exploit).
    img = jnp.where((classes > 0)[None], col * shade[None],
                    bg[None] + jax.random.normal(ks[16], (fr, fr))[None] * 6.0)
    # The 'other' texture signature: a random-orientation stripe field on
    # the held object only, strong enough to survive the +-3 pixel noise.
    ang = u(ks[20], 0.0, jnp.pi)
    freq = u(ks[21], 0.15, 0.5)
    stripes = jnp.sin(freq * (xf * jnp.cos(ang) + yf * jnp.sin(ang))
                      + u(ks[22], 0.0, 6.28))
    img = img + jnp.where((classes == OTHER)[None],
                          stripes[None] * u(ks[23], 25.0, 55.0), 0.0)
    img = jnp.clip(
        img + jax.random.normal(ks[17], (3, fr, fr)) * 3.0, 0.0, 255.0)
    return img, classes


def seg_logits(p, x, s):
    """Pre-softmax full-res logits — exactly blaze.segmenter_apply without
    the softmax (training needs log-probabilities)."""
    from bp_from_video_tpu.models import blaze, warp
    y = blaze._conv(p["head"], blaze.segmenter_features(p, x, s))
    return warp.resize_bilinear_planar(y, s, s)


def main():
    if not os.environ.get("BENCH_PLATFORM"):
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("train_seg_standin: tunnel unreachable", file=sys.stderr)
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

    from bp_from_video_tpu.models import blaze

    steps = int(os.environ.get("STEPS", "12000"))
    batch = int(os.environ.get("BATCH", "16"))
    chunk = int(os.environ.get("CHUNK", "25"))
    params = blaze.init_segmenter(11, S, C)
    params = jax.device_put(params)
    opt = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, 6e-4, min(500, steps // 4), steps, 1e-5))
    opt_state = opt.init(params)

    def batch_data(key):
        kk = jax.random.split(key, batch + 1)
        with_person = (jax.random.uniform(kk[0], (batch,)) > NEG_FRAC)
        return jax.vmap(render_person)(kk[1:], with_person)

    # Background dominates the pixel count; down-weight it so the small
    # classes (face-skin especially — the one the pipeline consumes) get
    # gradient share.  'other' and body-skin get extra share: the round-4
    # artifact starved them (0.42 / 0.80 IoU, VERDICT r4 weak #3).
    class_w = jnp.asarray([0.25, 1.0, 1.6, 2.0, 1.0, 2.0])

    def loss_fn(p, imgs, classes):
        logits = jax.vmap(
            lambda x: seg_logits(p, x[None] / 255.0, S)[0])(imgs)
        logp = jax.nn.log_softmax(logits, axis=1)        # [B, 6, S, S]
        onehot = jax.nn.one_hot(classes, C, axis=1)      # [B, 6, S, S]
        w = class_w.reshape(1, C, 1, 1)
        ce = -jnp.sum(onehot * logp * w, axis=1)
        return jnp.mean(ce), jnp.mean(ce)

    def train_step(carry, key):
        p, o = carry
        imgs, classes = batch_data(key)
        (loss, _), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, imgs, classes)
        up, o = opt.update(g, o, p)
        return (jax.tree.map(lambda a, b: a + b, p, up), o), loss

    @jax.jit
    def train_chunk(p, o, key):
        (p, o), losses = jax.lax.scan(
            train_step, (p, o), jax.random.split(key, chunk))
        return p, o, losses[-1]

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models")
    path = os.path.join(out, "seg_standin_synth.npz")
    if os.environ.get("EVAL_ONLY"):
        params = jax.device_put(blaze.load_standin_npz(path))
        print(f"EVAL_ONLY: loaded {path}", flush=True)
    else:
        key = jax.random.key(4242)
        for c in range(steps // chunk):
            key, sub = jax.random.split(key)
            params, opt_state, last = train_chunk(params, opt_state, sub)
            if c % 8 == 0 or (c + 1) * chunk >= steps:
                print(f"step {(c + 1) * chunk}: loss={float(last):.5f}",
                      flush=True)

    # --- held-out eval: per-class IoU -------------------------------------
    pred_fn = jax.jit(lambda p, x: jnp.argmax(
        seg_logits(p, x[None] / 255.0, S)[0], axis=0))
    inter = np.zeros(C)
    union = np.zeros(C)
    n_eval = int(os.environ.get("EVAL_BATCHES", "6"))
    for i in range(n_eval):
        imgs, classes = jax.jit(batch_data)(jax.random.key(31337 + i))
        for b in range(imgs.shape[0]):
            pred = np.asarray(pred_fn(params, imgs[b]))
            want = np.asarray(classes[b])
            for c in range(C):
                pi, wi = pred == c, want == c
                inter[c] += np.sum(pi & wi)
                union[c] += np.sum(pi | wi)
    iou = inter / np.maximum(union, 1)
    print("held-out IoU: " + " ".join(
        f"{n}={iou[c]:.3f}" for c, n in enumerate(
            ["bg", "hair", "bodyskin", "faceskin", "clothes", "other"])),
        flush=True)

    gates = {"faceskin": 0.93, "bodyskin": 0.85, "other": 0.6}
    passed = bool(iou[FACE_SKIN] >= gates["faceskin"]
                  and iou[BODY_SKIN] >= gates["bodyskin"]
                  and iou[OTHER] >= gates["other"])
    host = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    os.makedirs(out, exist_ok=True)
    # A failed/smoke run must never clobber the shipped known-good
    # artifact (same contract as the BP e2e predictor export).
    save_path = path if passed else path.replace(".npz", ".failed.npz")
    blaze.save_standin_npz(save_path, host,
                           meta={"input_size": S, "classes": 6})
    print(f"saved {save_path}", flush=True)
    rec = {"steps": steps, "batch": batch,
           "iou": {n: round(float(iou[c]), 3) for c, n in enumerate(
               ["bg", "hair", "bodyskin", "faceskin", "clothes", "other"])},
           "iou_gates": gates,
           "ok": passed,
           "backend": jax.default_backend()}
    print(json.dumps(rec), flush=True)
    json_name = ("seg_standin_synth.json" if passed
                 else "seg_standin_synth.failed.json")
    with open(os.path.join(out, json_name), "w") as f:
        json.dump(rec, f, indent=1)
    sys.exit(0 if rec["ok"] else 1)


if __name__ == "__main__":
    main()
