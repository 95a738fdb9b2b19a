"""BlazePalm/BlazeHand/segmenter architecture stand-ins, randomly initialized.

The reference snapshot ships only the face model weights; the hand landmarker
and selfie-multiclass blobs are absent (/root/reference/models — SURVEY.md
§2.2, .MISSING_LARGE_BLOBS).  These generators provide real JAX
architectures with the correct I/O contracts (anchor counts, landmark
counts, mask classes) and representative compute cost, so the full 4-model
pipeline runs end-to-end; drop the standard MediaPipe bundles into the asset
dir and the TFLite->JAX compiler path replaces them with real weights.

Activations are stored planar ([N, C, H, W]) between ops — the TPU-native
layout for tiny-channel vision nets (NHWC buffers put C=8..192 in sublanes
and batch in lanes, padding both tile dimensions; planar tiles (H, W)
exactly at any batch/channel count).  ``*_apply`` take planar inputs
([N, 3, S, S]); detector/landmark outputs keep their NHWC-era contracts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bp_from_video_tpu.models import warp

Array = jax.Array


def _conv_init(rng, kh, kw, cin, cout):
    """He-init conv params as NUMPY arrays (``rng``: np.random.Generator).

    Stand-in init is host-side by design: eager device init was dozens of
    tunnel dispatches per net, and the fused-trunk packing helpers must
    read the params without a device-to-host transfer — the first D2H in
    a process permanently degrades the axon client's dispatch path
    (tools/poisonprobe.py).  The params upload once with the pytree."""
    fan_in = kh * kw * cin
    w = rng.standard_normal((kh, kw, cin, cout), np.float32)
    return {"w": w * np.float32(np.sqrt(2.0 / fan_in)),
            "b": np.zeros((cout,), np.float32)}


def _conv(p, x, stride=1, padding="SAME", groups=1):
    """Planar conv: x [N, C, H, W] -> [N, C', H', W'], output in the weight
    dtype (one rounding after the MXU's f32 accumulation)."""
    w = p["w"]
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, (stride, stride), padding,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=w.dtype)
    return y + p["b"].astype(w.dtype).reshape(-1, 1, 1)


def _blaze_block_init(rng, cin, cout, k=5):
    return {"dw": _conv_init(rng, k, k, 1, cin),
            "pw": _conv_init(rng, 1, 1, cin, cout)}


# Compose each block's depthwise+pointwise pair into ONE dense conv before
# dispatch: the two are linear maps with no activation between them, so
#   W[u,v,c,o] = dw[u,v,0,c] * pw[0,0,c,o]
# is the exact same function.  Measured on TPU v5e (tools/ablate.py, batch
# 64-128): the composition alone is ~10% SLOWER than the dw+pw pair — conv
# time there scales with streamed rows x kernel taps, and trading one
# 1-tap pass for extra taps on a kh*kw kernel loses.  Kept (default off)
# because it is the enabling step for space-to-depth packing, which cuts
# the row count 4x.
_COMPOSE_DW_PW = False


def _blaze_block(p, x, stride=1):
    cin = x.shape[1]
    if _COMPOSE_DW_PW:
        dw_w, pw_w = p["dw"]["w"], p["pw"]["w"]
        comp = {"w": dw_w[:, :, 0, :, None] * pw_w[0, 0][None, None],
                "b": p["pw"]["b"] + pw_w[0, 0].T @ p["dw"]["b"]}
        y = _conv(comp, x, stride=stride)
    else:
        y = _conv(p["dw"], x, stride=stride, groups=cin)
        y = _conv(p["pw"], y)
    if stride == 2:
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 1, 2, 2), (1, 1, 2, 2), "SAME")
    cout = y.shape[1]
    if cout != cin:
        x = jnp.pad(x, ((0, 0), (0, cout - cin), (0, 0), (0, 0)))
    return jax.nn.relu(y + x)


def init_blaze_detector(seed: int, input_size: int, num_anchors: int,
                        num_kps: int) -> dict:
    """Two-scale SSD detector: heads at /8 and /16 with 2 and 6 anchors per
    cell (matching the face/palm anchor layouts)."""
    rng = np.random.default_rng(seed)
    box_dim = 4 + 2 * num_kps
    return {
        "stem": _conv_init(rng, 5, 5, 3, 24),
        "b1": _blaze_block_init(rng, 24, 24),
        "b2": _blaze_block_init(rng, 24, 48),   # /4
        "b3": _blaze_block_init(rng, 48, 48),
        "b4": _blaze_block_init(rng, 48, 96),   # /8
        "b5": _blaze_block_init(rng, 96, 96),
        "b6": _blaze_block_init(rng, 96, 96),   # /16
        "head8_box": _conv_init(rng, 1, 1, 96, 2 * box_dim),
        "head16_box": _conv_init(rng, 1, 1, 96, 6 * box_dim),
        "head8_cls": _conv_init(rng, 1, 1, 96, 2),
        "head16_cls": _conv_init(rng, 1, 1, 96, 6),
    }


def _head(p, y, last_dim):
    """1x1 head conv + anchor-major flatten (the SSD head contract orders
    cells row-major with per-cell anchors contiguous — i.e. NHWC order)."""
    h = _conv(p, y)                          # [1, A*D, Hc, Wc]
    return jnp.transpose(h, (0, 2, 3, 1)).reshape(1, -1, last_dim)


def blaze_detector_apply(p: dict, x: Array, num_kps: int) -> tuple[Array, Array]:
    """x: planar [1, 3, S, S] -> (regressors [1, A, 4+2K], logits [1, A, 1])."""
    box_dim = 4 + 2 * num_kps
    y = jax.nn.relu(_conv(p["stem"], x, stride=2))   # /2
    y = _blaze_block(p["b1"], y)
    y = _blaze_block(p["b2"], y, stride=2)           # /4
    y = _blaze_block(p["b3"], y)
    y8 = _blaze_block(p["b4"], y, stride=2)          # /8
    y8 = _blaze_block(p["b5"], y8)
    y16 = _blaze_block(p["b6"], y8, stride=2)        # /16
    r8 = _head(p["head8_box"], y8, box_dim)
    r16 = _head(p["head16_box"], y16, box_dim)
    c8 = _head(p["head8_cls"], y8, 1)
    c16 = _head(p["head16_cls"], y16, 1)
    return (jnp.concatenate([r8, r16], axis=1),
            jnp.concatenate([c8, c16], axis=1))


def _pack_stem(stem: dict, k: int, in_size: int) -> dict:
    """Space-to-depth-packed twin of a stride-2 SAME stem conv (init-time
    numpy; exact same linear map on 2x2-packed inputs/outputs).

    The stem is ~99%% of a landmark stand-in's MXU row count (rows x taps:
    e.g. 112(2) x 25 taps at 224(2) input vs a few K for the rest), and both
    its contraction (k*k*3 -> k'*k'*12) and output channels (24 -> 96) stay
    within ONE 128-wide MXU tile after packing — the regime where 2x2
    packing is a true 4x row win (past 128 the zero-padded kernel costs
    K-tiles and cancels it; measured on the face mesh graph).
    """
    from bp_from_video_tpu.models.tflite_compiler import (_pack_conv_weight,
                                                          _tflite_pad)
    w = np.asarray(stem["w"], np.float32)   # HWIO [k,k,3,O] (host numpy)
    b = np.asarray(stem["b"], np.float32)
    out = in_size // 2
    pads = (_tflite_pad(in_size, k, 2, "SAME"),) * 2
    wp, bp, _, _ = _pack_conv_weight(
        w.transpose(3, 0, 1, 2), b, 2, pads, 2,
        (in_size, in_size), (out // 2, out // 2))
    # Stride/padding are a static function of (k, in_size) — recomputed at
    # trace time in blaze_landmark_apply so the params pytree stays pure
    # arrays (jit-safe).  NUMPY out, like every init helper here.
    return {"w": np.ascontiguousarray(wp.transpose(1, 2, 3, 0)),  # HWIO
            "b": np.asarray(bp)}


def init_blaze_landmark(seed: int, input_size: int, num_landmarks: int) -> dict:
    rng = np.random.default_rng(seed)
    # Landmark nets are MobileNet-style 3x3 depthwise-separable trunks in
    # the MediaPipe family — the 5x5 "blaze" blocks belong to the DETECTORS
    # (BlazeFace/BlazePalm).  3x3 here is both more architecture-faithful
    # and ~2.8x cheaper on the stem, which dominates the stand-in's MXU row
    # count (conv time on TPU tracks rows x taps).
    stem = _conv_init(rng, 3, 3, 3, 24)
    # Landmark head: dense regression from the FLATTENED pre-pool feature
    # map ([192, S/32, S/32] -> 3L), like the real MediaPipe landmark nets
    # (their trunks end in a conv-to-FC over spatial features, not a global
    # pool).  A globally-pooled head destroys spatial phase and floors the
    # trained stand-in at ~30 px held-out error (tools/train_hand_standin,
    # round 3) — the dense spatial readout removes that architectural
    # ceiling at negligible compute (one [B, 192*g*g] x [192*g*g, 3L] dot,
    # ~0.6 MFLOPs/crop at 224^2 vs the trunk's hundreds).
    g = input_size // 32
    fan = 192 * g * g
    head_w = rng.standard_normal((fan, 3 * num_landmarks), np.float32)
    return {
        "stem": stem,
        "stem_p": _pack_stem(stem, 3, input_size),
        "b1": _blaze_block_init(rng, 24, 48, k=3),
        "b2": _blaze_block_init(rng, 48, 96, k=3),
        "b3": _blaze_block_init(rng, 96, 96, k=3),
        "b4": _blaze_block_init(rng, 96, 192, k=3),
        "head_lm": {"w": head_w * np.float32(np.sqrt(1.0 / fan)),
                    "b": np.zeros((3 * num_landmarks,), np.float32)},
        "head_presence": _conv_init(rng, 1, 1, 192, 1),
        "head_aux": _conv_init(rng, 1, 1, 192, 1),
    }


def blaze_landmark_apply(p: dict, x: Array, input_size: int) -> tuple[Array, Array, Array]:
    """x: planar [1, 3, S, S] — or [1, 12, S/2, S/2] when the crop arrives
    2x2 space-to-depth packed (Pallas multi_crop pack=2; channel order
    (a*2+b)*3+c) — -> (landmarks [1, 3L] in crop pixels, presence [1, 1]
    (sigmoided), aux/handedness [1, 1])."""
    s = input_size
    if x.shape[1] == 12 and "stem_p" in p:
        from bp_from_video_tpu.models.tflite_compiler import (_pack_axis,
                                                              _tflite_pad)
        k = p["stem"]["w"].shape[0]
        pad1d = _tflite_pad(s, k, 2, "SAME")
        _, _, padp = _pack_axis(k, pad1d, 2, 2, s, s // 4)
        sp = p["stem_p"]
        w = sp["w"]
        y = jax.lax.conv_general_dilated(
            x.astype(w.dtype), w, (2, 2), [padp, padp],
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=w.dtype)
        y = y + sp["b"].astype(w.dtype).reshape(-1, 1, 1)
        # Unpack [1, 4*24, s/4, s/4] -> [1, 24, s/2, s/2] (group-major
        # packed channels: index (dy*2+dx)*24 + o).
        n, c4, hh, ww = y.shape
        o = c4 // 4
        y = y.reshape(n, 2, 2, o, hh, ww)
        y = jnp.transpose(y, (0, 3, 4, 1, 5, 2))
        y = y.reshape(n, o, 2 * hh, 2 * ww)
        y = jax.nn.relu(y)
    else:
        y = jax.nn.relu(_conv(p["stem"], x, stride=2))
    return landmark_trunk(p, y, s)


def landmark_trunk(p: dict, y: Array, input_size: int
                   ) -> tuple[Array, Array, Array]:
    """Post-stem trunk + heads: y = ReLU'd stem activations
    [1, 24, S/2, S/2] (the pallas/stem_kernel fused path feeds this
    directly)."""
    s = input_size
    y = _blaze_block(p["b1"], y, stride=2)
    y = _blaze_block(p["b2"], y, stride=2)
    y = _blaze_block(p["b3"], y, stride=2)
    y = _blaze_block(p["b4"], y, stride=2)
    return landmark_heads(p, y, s)


def landmark_heads(p: dict, y: Array, input_size: int
                   ) -> tuple[Array, Array, Array]:
    """SPATIAL trunk features [B, 192, S/32, S/32] -> (landmarks [B, 3L]
    in crop pixels, presence [B, 1], aux [B, 1]) — batched (the fused
    Pallas trunk feeds the whole crop batch at once).

    Landmarks read the flattened spatial map through a dense matrix (f32
    accumulation — the readout sets landmark precision); presence and
    handedness are global properties and keep pooled 1x1 heads."""
    b = y.shape[0]
    w = p["head_lm"]["w"]
    feats = y.reshape(b, -1).astype(w.dtype)
    lm = jax.lax.dot_general(
        feats, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    lm = lm + p["head_lm"]["b"].astype(jnp.float32)
    # Scale outputs into the crop-pixel range so downstream geometry stays
    # well-conditioned even at random init.
    lm = (jax.nn.sigmoid(lm) * input_size)
    pooled = jnp.mean(y, axis=(2, 3), keepdims=True)
    presence = jax.nn.sigmoid(_conv(p["head_presence"], pooled).reshape(b, 1))
    aux = jax.nn.sigmoid(_conv(p["head_aux"], pooled).reshape(b, 1))
    return lm, presence, aux


def save_standin_npz(path: str, params: dict, meta: dict | None = None) -> None:
    """Save a stand-in params pytree (nested dicts of arrays) as a flat
    npz keyed by '/'-joined paths — no pickling, any nesting depth.

    ``meta`` (int-valued) is stamped under reserved ``__meta__/`` keys —
    the geometry fingerprint (input_size, anchor count, ...) that the
    loader verifies so an artifact trained at a different resolution or
    anchor grid cannot pass the head-shape check and load with
    semantically wrong geometry (advisor r4)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(k.key for k in kp)
        flat[key] = np.asarray(leaf)
    for k, v in (meta or {}).items():
        flat[f"__meta__/{k}"] = np.asarray(int(v))
    np.savez(path, **flat)


def load_standin_npz(path: str, return_meta: bool = False):
    """Inverse of :func:`save_standin_npz` (host numpy leaves — the loaded
    pytree must stay D2H-free through the packing helpers, see
    _conv_init).  ``return_meta=True`` additionally returns the
    ``__meta__`` fingerprint dict (empty for pre-meta artifacts)."""
    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for k in parts[:-1]:
                node = node.setdefault(k, {})
            node[parts[-1]] = data[key]
    meta = {k: int(v) for k, v in out.pop("__meta__", {}).items()}
    if return_meta:
        return out, meta
    return out


def init_segmenter(seed: int, input_size: int, num_classes: int = 6) -> dict:
    """Encoder/decoder stand-in sized to the real selfie_multiclass model's
    compute class (~300-400 MFLOPs at 256²; the first cut ran its decoder
    convs at full resolution and weighed 4x the real model)."""
    rng = np.random.default_rng(seed)
    return {
        "stem": _conv_init(rng, 3, 3, 3, 16),
        "b1": _blaze_block_init(rng, 16, 32),
        "b2": _blaze_block_init(rng, 32, 64),
        "b3": _blaze_block_init(rng, 64, 64),
        "up1": _conv_init(rng, 3, 3, 64, 24),
        "up2": _conv_init(rng, 3, 3, 24, 12),
        "head": _conv_init(rng, 1, 1, 12, num_classes),
    }


def segmenter_apply(p: dict, x: Array, input_size: int) -> Array:
    """x: planar [1, 3, S, S] -> confidence masks [1, C, S, S] (softmaxed,
    PLANAR — consumers branch on the runner's ``seg_planar`` flag; the
    NHWC formulation paid two full-res transposes and ran softmax with 6
    of 128 lanes live).  Decoder upsamples progressively (/4 -> /2 ->
    full) so no 3x3 conv runs at full resolution; the 1x1 class head is
    applied at /2 BEFORE the final resize — a 1x1 conv commutes exactly
    with bilinear interpolation (both linear, interp weights sum to 1 per
    pixel), so this halves the final upsample's channel count (12 -> 6)
    without changing the function computed."""
    s = input_size
    y = _conv(p["head"], segmenter_features(p, x, s))  # 1x1 head at /2
    y = warp.resize_bilinear_planar(y, s, s)
    return jax.nn.softmax(y, axis=1)


def segmenter_features(p: dict, x: Array, input_size: int) -> Array:
    """The segmenter trunk shared by ``segmenter_apply`` and its
    head-commutation test: encoder + decoder up to the /2 feature map
    (planar [1, 12, S/2, S/2]), everything EXCEPT the class head and the
    final upsample."""
    s = input_size
    y = jax.nn.relu(_conv(p["stem"], x, stride=2))   # /2
    y = _blaze_block(p["b1"], y, stride=2)           # /4
    y = _blaze_block(p["b2"], y, stride=2)           # /8
    y = _blaze_block(p["b3"], y)
    # Decoder upsamples as MXU interpolation matmuls (jax.image.resize is
    # gather-based — element-serial on TPU — and dominated this net's
    # in-context cost, not the convs).
    y = warp.resize_bilinear_planar(y, s // 4, s // 4)
    y = jax.nn.relu(_conv(p["up1"], y))
    y = warp.resize_bilinear_planar(y, s // 2, s // 2)
    return jax.nn.relu(_conv(p["up2"], y))
