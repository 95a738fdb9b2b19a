"""Synthetic real-TFLite fixtures for the asset drop-in path.

The reference snapshot is missing the hand/segmenter blobs
(.MISSING_LARGE_BLOBS), so the real-weight loading path could never
execute (VERDICT.md Weak #5).  These builders use TensorFlow to emit REAL
flatbuffers with the exact I/O contracts of the missing MediaPipe assets
(reference inference_runner.py:61-64):

  * palm detector    [1,192,192,3] -> regressors [1,2016,18] + logits [1,2016,1]
  * hand landmarks   [1,224,224,3] -> lm [1,63], presence [1,1],
                     handedness [1,1], world lm [1,63]
  * selfie multiclass [1,256,256,3] -> softmax confidences [1,256,256,6]

The nets are input-independent (zero kernels, crafted biases) so every
downstream stage — blob-name resolution, TFLite->JAX compilation, 2016-
anchor PALM decode, weighted NMS, rect transforms, crop + projection — has
a closed-form expected output the tests can verify against.
"""

from __future__ import annotations

import io
import zipfile

import numpy as np

# The single hot anchor: stride-8 cell (12, 12), anchor 0 of 2, row-major
# with anchors-per-cell innermost (models/anchors.py layout) -> center
# (12.5/24, 12.5/24).
PALM_STAR_ANCHOR = (12 * 24 + 12) * 2
PALM_STAR_CENTER = (12.5 / 24.0, 12.5 / 24.0)
# Regressor row (offsets in 192-input pixels): centered box 60x60, kp0 at
# the anchor, kp2 straight up 40px -> rotation exactly 0 for the palm's
# pi/2 target angle.
PALM_BOX_WH = 60.0
PALM_KP2_DY = -40.0
# Hand landmark j sits at crop coords (40 + 6j, 60 + 5j) of the 224 crop.
HAND_LM_BASE = (40.0, 60.0)
HAND_LM_STEP = (6.0, 5.0)
HAND_PRESENCE = 0.9
HAND_HANDEDNESS = 0.7
# Selfie-multiclass per-class logits; softmax argmax = class 2 (body-skin).
SEG_LOGITS = (0.1, 0.2, 0.9, 0.4, 0.3, 0.0)


def _convert(module, fn):
    import tensorflow as tf
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [fn.get_concrete_function()], module)
    return conv.convert()


def build_palm_detector() -> bytes:
    import tensorflow as tf

    a = 2016
    reg = np.zeros((a, 18), np.float32)
    reg[:, 2] = PALM_BOX_WH
    reg[:, 3] = PALM_BOX_WH
    reg[:, 9] = PALM_KP2_DY  # kp2 y-offset (kp pairs start at column 4)
    logits = np.full((a, 1), -8.0, np.float32)
    logits[PALM_STAR_ANCHOR] = 8.0
    reg_c = tf.constant(reg.reshape(1, -1))
    log_c = tf.constant(logits.reshape(1, -1))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 192, 192, 3], tf.float32)])
        def __call__(self, x):
            f = tf.reduce_mean(x, axis=[1, 2])            # [1, 3]
            z = tf.matmul(f, tf.zeros([3, 1]))            # [1, 1]
            return (tf.reshape(z + reg_c, [1, a, 18]),
                    tf.reshape(z + log_c, [1, a, 1]))

    m = M()
    return _convert(m, m.__call__)


def hand_landmark_points() -> np.ndarray:
    j = np.arange(21, dtype=np.float32)
    return np.stack([HAND_LM_BASE[0] + HAND_LM_STEP[0] * j,
                     HAND_LM_BASE[1] + HAND_LM_STEP[1] * j], axis=-1)


def build_hand_landmarker() -> bytes:
    import tensorflow as tf

    pts = hand_landmark_points()
    lm = np.zeros((21, 3), np.float32)
    lm[:, :2] = pts
    lm_c = tf.constant(lm.reshape(1, 63))
    world_c = tf.constant(np.zeros((1, 63), np.float32))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 224, 224, 3], tf.float32)])
        def __call__(self, x):
            f = tf.reduce_mean(x, axis=[1, 2])
            z = tf.matmul(f, tf.zeros([3, 1]))
            return (z + lm_c,                      # landmarks [1, 63]
                    z + tf.constant([[HAND_PRESENCE]]),
                    z + tf.constant([[HAND_HANDEDNESS]]),
                    z + world_c)

    m = M()
    return _convert(m, m.__call__)


def build_hand_task_bundle(palm_name="palm_detection.tflite",
                           lm_name="hand_landmarks_detector.tflite") -> bytes:
    """A synthetic hand_landmarker.task zip with the real bundle's member
    names (override to exercise name-mismatch handling)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(palm_name, build_palm_detector())
        z.writestr(lm_name, build_hand_landmarker())
    return buf.getvalue()


def build_resize_net() -> bytes:
    """Input-DEPENDENT net exercising RESIZE_BILINEAR (half-pixel) both up
    and down: [1,16,20,3] -> conv -> up [40,52] -> down [9,11].  Locks the
    compiler's MXU interpolation-matmul resize against the TFLite
    interpreter's gather/filter semantics (incl. no-antialias downscale)."""
    import tensorflow as tf

    rng = np.random.RandomState(3)
    k = tf.constant(rng.uniform(-0.5, 0.5, (3, 3, 3, 4)).astype(np.float32))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 16, 20, 3], tf.float32)])
        def __call__(self, x):
            y = tf.nn.relu(tf.nn.conv2d(x, k, 1, "SAME"))
            up = tf.image.resize(y, [40, 52], "bilinear")
            down = tf.image.resize(up, [9, 11], "bilinear")
            # Legacy coordinate modes (no half-pixel): align-corners and
            # asymmetric, lowered via _resize_bilinear_legacy.
            ac = tf.compat.v1.image.resize_bilinear(y, [40, 52],
                                                    align_corners=True)
            legacy = tf.compat.v1.image.resize_bilinear(y, [9, 11],
                                                        align_corners=False)
            return down, ac, legacy

    m = M()
    return _convert(m, m.__call__)


def build_resize_nearest_net() -> bytes:
    """RESIZE_NEAREST_NEIGHBOR in all three flag combinations (half-pixel
    via tf.image.resize, align-corners and legacy via the v1 op), plus a
    conv so outputs are input-dependent.  Locks the compiler's one-hot
    selection matmuls against the interpreter's per-flag index math."""
    import tensorflow as tf

    rng = np.random.RandomState(7)
    k = tf.constant(rng.uniform(-0.5, 0.5, (3, 3, 3, 4)).astype(np.float32))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 12, 18, 3], tf.float32)])
        def __call__(self, x):
            y = tf.nn.relu(tf.nn.conv2d(x, k, 1, "SAME"))
            hp = tf.image.resize(y, [30, 41], "nearest")
            ac = tf.compat.v1.image.resize_nearest_neighbor(
                y, [30, 41], align_corners=True)
            legacy = tf.compat.v1.image.resize_nearest_neighbor(
                y, [5, 7], align_corners=False)
            return hp, ac, legacy

    m = M()
    return _convert(m, m.__call__)


def build_transpose_conv_net() -> bytes:
    """TRANSPOSE_CONV with explicit output shapes: the usual in*stride
    SAME case AND an odd 2*in-1 declared size (legal TFLite — the op's
    output_shape input is authoritative and determines the padding)."""
    import tensorflow as tf

    rng = np.random.RandomState(9)
    k1 = tf.constant(rng.uniform(-0.5, 0.5, (3, 3, 4, 3)).astype(np.float32))
    k2 = tf.constant(rng.uniform(-0.5, 0.5, (2, 2, 2, 4)).astype(np.float32))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 10, 14, 3], tf.float32)])
        def __call__(self, x):
            even = tf.nn.conv2d_transpose(
                x, k1, [1, 20, 28, 4], strides=2, padding="SAME")
            odd = tf.nn.conv2d_transpose(
                tf.nn.relu(even), k2, [1, 39, 55, 2], strides=2,
                padding="SAME")
            return odd

    m = M()
    return _convert(m, m.__call__)


def build_per_channel_int8_net() -> bytes:
    """Fully-integer-quantized conv net (per-CHANNEL weight scales — the
    TFLite default for int8 convs): channel k's weights live at scale
    2^k-ish, so collapsing to Scale(0) is off by orders of magnitude."""
    import tensorflow as tf

    rng = np.random.RandomState(4)
    # Per-channel magnitudes spanning 3 orders of magnitude.
    k = (rng.uniform(-1, 1, (3, 3, 3, 4))
         * np.asarray([0.01, 0.1, 1.0, 10.0])).astype(np.float32)
    kc = tf.constant(k)

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 16, 16, 3], tf.float32)])
        def __call__(self, x):
            return tf.nn.relu(tf.nn.conv2d(x, kc, 1, "SAME"))

    m = M()
    # Dynamic-range quantization: per-channel int8 WEIGHTS with float
    # activations — the weight path the per-channel _dequant fix covers
    # (full-integer graphs additionally need QUANTIZE activation ops,
    # which the float-executing compiler does not simulate).
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [m.__call__.get_concrete_function()], m)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    return conv.convert()


def build_segmenter() -> bytes:
    import tensorflow as tf

    bias = tf.constant(np.asarray(SEG_LOGITS, np.float32))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 256, 256, 3], tf.float32)])
        def __call__(self, x):
            y = tf.nn.conv2d(x, tf.zeros([1, 1, 3, 6]), 1, "SAME") + bias
            return tf.nn.softmax(y)

    m = M()
    return _convert(m, m.__call__)


# ---------------------------------------------------------------------------
# FAITHFUL architecture twins (VERDICT r4 next #2).
#
# The zero-kernel fixtures above prove plumbing with closed-form outputs; the
# builders below prove COMPILE FIDELITY for the two absent MediaPipe
# architectures: depthwise-separable trunks with hard-swish activations,
# residual adds, two-scale anchor heads (palm), FC landmark heads (hand), and
# a transpose-conv + resize-bilinear decoder (segmenter) — with RANDOM
# NONZERO weights, so parity vs the TFLite interpreter exercises real
# arithmetic through the whole graph, not constant folding.  Per-channel
# int8 variants come from the converter's dynamic-range quantization.
# Ref: /root/reference/inference_runner.py:61-64 (asset contracts).
# ---------------------------------------------------------------------------


def _he(rng, *shape, gain=0.7):
    fan_in = int(np.prod(shape[:-1]))
    return (rng.standard_normal(shape) * gain
            * np.sqrt(2.0 / fan_in)).astype(np.float32)


def _faithful_convert(module, fn, quantize=False):
    import tensorflow as tf
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [fn.get_concrete_function()], module)
    if quantize:
        # Dynamic-range: per-channel int8 weights, float activations.
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
    return conv.convert()


def _make_trunk_ops(tf, rng, plan):
    """Constants for a depthwise-separable trunk: [(dw_k, pw_k, pw_b,
    stride, residual), ...] per block, from a (cin, cout, stride) plan."""
    blocks = []
    cin = plan[0]
    for cout, stride in plan[1:]:
        dw = tf.constant(_he(rng, 3, 3, cin, 1))
        pw = tf.constant(_he(rng, 1, 1, cin, cout))
        b = tf.constant((rng.standard_normal(cout) * 0.05).astype(np.float32))
        blocks.append((dw, pw, b, stride, stride == 1 and cin == cout))
        cin = cout
    return blocks


def _hswish(tf, x):
    # The MLIR converter fuses this exact pattern into a HARD_SWISH op.
    return x * tf.nn.relu6(x + 3.0) / 6.0


def _run_trunk(tf, x, blocks):
    for dw, pw, b, stride, residual in blocks:
        y = tf.nn.depthwise_conv2d(x, dw, [1, stride, stride, 1], "SAME")
        y = _hswish(tf, y)
        y = tf.nn.conv2d(y, pw, 1, "SAME") + b
        y = _hswish(tf, y)
        x = x + y if residual else y
    return x


def build_faithful_hand_landmarker(quantize=False) -> bytes:
    """MobileNet-ish 224² trunk (dw-separable, hard-swish, one residual) +
    GAP + 4 FC heads matching the real hand_landmarks_detector contract:
    lm [1,63], presence [1,1], handedness [1,1], world lm [1,63]."""
    import tensorflow as tf

    rng = np.random.RandomState(101)
    stem_k = tf.constant(_he(rng, 3, 3, 3, 16))
    blocks = _make_trunk_ops(
        tf, rng, [16, (24, 2), (24, 1), (40, 2), (64, 2), (96, 2)])
    fc_lm_w = tf.constant(_he(rng, 96, 63))
    # Landmark bias spread over the crop interior keeps downstream rect
    # geometry sane when this blob is run through the full predict path.
    fc_lm_b = tf.constant(rng.uniform(60.0, 160.0, 63).astype(np.float32))
    fc_pres = (tf.constant(_he(rng, 96, 1)), tf.constant(np.float32(1.5)))
    fc_hand = (tf.constant(_he(rng, 96, 1)), tf.constant(np.float32(0.3)))
    fc_world = tf.constant(_he(rng, 96, 63))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 224, 224, 3], tf.float32)])
        def __call__(self, x):
            y = _hswish(tf, tf.nn.conv2d(x, stem_k, 2, "SAME"))
            y = _run_trunk(tf, y, blocks)
            f = tf.reduce_mean(y, axis=[1, 2])              # [1, 96]
            return (tf.matmul(f, fc_lm_w) + fc_lm_b,
                    tf.sigmoid(tf.matmul(f, fc_pres[0]) + fc_pres[1]),
                    tf.sigmoid(tf.matmul(f, fc_hand[0]) + fc_hand[1]),
                    tf.matmul(f, fc_world))

    m = M()
    return _faithful_convert(m, m.__call__, quantize)


def build_faithful_palm_detector(quantize=False) -> bytes:
    """BlazePalm-shaped 192² detector: dw-separable trunk to strides 8 and
    16, two-scale 1x1 heads reshaped and concatenated into the real
    contract — regressors [1,2016,18] + logits [1,2016,1] (24·24·2
    stride-8 anchors then 12·12·6 stride-16, cell-major)."""
    import tensorflow as tf

    rng = np.random.RandomState(103)
    stem_k = tf.constant(_he(rng, 3, 3, 3, 16))
    trunk8 = _make_trunk_ops(tf, rng, [16, (24, 2), (24, 1), (48, 2)])
    trunk16 = _make_trunk_ops(tf, rng, [48, (64, 2)])
    h8_reg = tf.constant(_he(rng, 1, 1, 48, 2 * 18))
    h16_reg = tf.constant(_he(rng, 1, 1, 64, 6 * 18))
    # Negative logit bias keeps random-weight detections sparse so the
    # full predict path stays well-behaved on this blob.
    h8_log = (tf.constant(_he(rng, 1, 1, 48, 2)),
              tf.constant(np.float32(-3.0)))
    h16_log = (tf.constant(_he(rng, 1, 1, 64, 6)),
               tf.constant(np.float32(-3.0)))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 192, 192, 3], tf.float32)])
        def __call__(self, x):
            y = _hswish(tf, tf.nn.conv2d(x, stem_k, 2, "SAME"))
            f8 = _run_trunk(tf, y, trunk8)                  # [1, 24, 24, 48]
            f16 = _run_trunk(tf, f8, trunk16)               # [1, 12, 12, 64]
            reg = tf.concat([
                tf.reshape(tf.nn.conv2d(f8, h8_reg, 1, "SAME"),
                           [1, 24 * 24 * 2, 18]),
                tf.reshape(tf.nn.conv2d(f16, h16_reg, 1, "SAME"),
                           [1, 12 * 12 * 6, 18])], axis=1)
            log = tf.concat([
                tf.reshape(tf.nn.conv2d(f8, h8_log[0], 1, "SAME")
                           + h8_log[1], [1, 24 * 24 * 2, 1]),
                tf.reshape(tf.nn.conv2d(f16, h16_log[0], 1, "SAME")
                           + h16_log[1], [1, 12 * 12 * 6, 1])], axis=1)
            return reg, log

    m = M()
    return _faithful_convert(m, m.__call__, quantize)


def build_faithful_segmenter(quantize=False) -> bytes:
    """selfie_multiclass-shaped 256² segmenter: dw-separable encoder,
    residual mid block, TRANSPOSE_CONV + RESIZE_BILINEAR decoder with
    encoder skip adds, 6-class softmax at full resolution."""
    import tensorflow as tf

    rng = np.random.RandomState(107)
    stem_k = tf.constant(_he(rng, 3, 3, 3, 12))
    enc1 = _make_trunk_ops(tf, rng, [12, (16, 2)])
    enc2 = _make_trunk_ops(tf, rng, [16, (24, 2)])
    mid = _make_trunk_ops(tf, rng, [24, (24, 1)])
    up1_k = tf.constant(_he(rng, 3, 3, 16, 24))    # transpose conv 24->16
    dec2_k = tf.constant(_he(rng, 1, 1, 16, 12))
    head_k = tf.constant(_he(rng, 1, 1, 12, 6))
    head_b = tf.constant((rng.standard_normal(6) * 0.3).astype(np.float32))

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 256, 256, 3], tf.float32)])
        def __call__(self, x):
            s = _hswish(tf, tf.nn.conv2d(x, stem_k, 2, "SAME"))  # 128, 12
            e1 = _run_trunk(tf, s, enc1)                         # 64, 16
            e2 = _run_trunk(tf, e1, enc2)                        # 32, 24
            m_ = _run_trunk(tf, e2, mid)                         # 32, 24
            d1 = tf.nn.conv2d_transpose(
                m_, up1_k, [1, 64, 64, 16], strides=2, padding="SAME")
            d1 = _hswish(tf, d1 + e1)                            # 64, 16
            d2 = tf.image.resize(d1, [128, 128], "bilinear")
            d2 = _hswish(tf, tf.nn.conv2d(d2, dec2_k, 1, "SAME") + s)
            logits = tf.nn.conv2d(d2, head_k, 1, "SAME") + head_b
            full = tf.image.resize(logits, [256, 256], "bilinear")
            return tf.nn.softmax(full)

    m = M()
    return _faithful_convert(m, m.__call__, quantize)


def build_faithful_hand_task_bundle() -> bytes:
    """hand_landmarker.task twin with FAITHFUL nets under the real bundle's
    member names."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("palm_detection.tflite", build_faithful_palm_detector())
        z.writestr("hand_landmarks_detector.tflite",
                   build_faithful_hand_landmarker())
    return buf.getvalue()
