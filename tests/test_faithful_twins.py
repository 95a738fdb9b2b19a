"""Faithful architecture twins of the two ABSENT MediaPipe assets
(VERDICT r4 next #2).

The reference snapshot ships without hand_landmarker.task and
selfie_multiclass_256x256.tflite (reference .MISSING_LARGE_BLOBS;
inference_runner.py:61-64), so the compiler had never executed those two
architectures end-to-end as ONE graph — only zero-kernel plumbing bundles
and per-op micro-nets.  These tests compile REALISTIC twins (depthwise-
separable trunks, fused HARD_SWISH, residual adds, two-scale anchor heads,
FC landmark heads, TRANSPOSE_CONV + RESIZE_BILINEAR decoder) with RANDOM
NONZERO weights and gate them against the TFLite interpreter:

  * f32: <= 2e-5 x output scale (the prescribed drop-in gate),
  * bf16: <= 1% of scale + 0.01 (documented engine-dtype tolerance),
  * per-channel int8 (dynamic-range hybrid): <= 2% of scale — the
    interpreter quantizes ACTIVATIONS dynamically too, which the
    float-executing compiler intentionally does not simulate,

then run both blobs through the full bundle-resolution + predict path.
The int8 variants pin the hoist-time dequant of DIRECT int8 weight
constants (TF>=2.20 hybrid graphs carry no DEQUANTIZE nodes; the compiler
previously fed raw int8 into float convs and crashed).

Slow-marked: each test converts TF models at build time (seconds each) on
top of the TF import; the quick suite stays trace-bound contract tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bp_from_video_tpu.models import tflite_compiler as tc

from tests import tflite_fixtures as fx

pytest.importorskip("tensorflow")

pytestmark = pytest.mark.slow

TWINS = {
    "palm": (fx.build_faithful_palm_detector,
             {"DEPTHWISE_CONV_2D", "HARD_SWISH", "CONCATENATION",
              "RESHAPE"}),
    "hand": (fx.build_faithful_hand_landmarker,
             {"DEPTHWISE_CONV_2D", "HARD_SWISH", "FULLY_CONNECTED",
              "MEAN"}),
    "seg": (fx.build_faithful_segmenter,
            {"DEPTHWISE_CONV_2D", "HARD_SWISH", "TRANSPOSE_CONV",
             "RESIZE_BILINEAR", "SOFTMAX"}),
}


@pytest.fixture(scope="module")
def blobs():
    return {name: builder() for name, (builder, _) in TWINS.items()}


def _interp(data, x):
    from tests.test_tflite_compiler import tflite_reference
    return tflite_reference(data, [x])


def _match(mine, ref):
    """Greedy (shape, min-maxdiff) assignment: the hand twin emits two
    [1,63] and two [1,1] outputs and the interpreter's output order is not
    the graph's."""
    used, pairs = set(), []
    for m in (np.asarray(o, np.float32) for o in mine):
        d, j = min((float(np.abs(m - r).max()), j)
                   for j, r in enumerate(ref)
                   if r.shape == m.shape and j not in used)
        used.add(j)
        pairs.append((m, ref[j], d))
    return pairs


@pytest.mark.parametrize("name", sorted(TWINS))
def test_faithful_twin_f32_parity(name, blobs):
    data = blobs[name]
    graph = tc.parse_tflite(data)
    ops = {op.opcode for op in graph.ops}
    missing = TWINS[name][1] - ops
    assert not missing, f"twin lost its faithful ops: {missing} (has {ops})"

    rng = np.random.RandomState(31)
    # Production path: NCHW + planar inputs, exactly what the runner uses.
    fn, params = tc.compile_tflite(data, layout="NCHW", planar_inputs=True)
    x = rng.uniform(0, 1, fn.input_shapes[0]).astype(np.float32)
    ref = _interp(data, x)
    mine = jax.jit(fn)(params, jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)))
    ref_shapes = {r.shape for r in ref}
    mine = [np.transpose(m, (0, 2, 3, 1))
            if (np.asarray(m).ndim == 4
                and np.asarray(m).shape not in ref_shapes) else m
            for m in mine]
    for m, r, d in _match(mine, ref):
        scale = float(np.abs(r).max()) + 1e-6
        assert d <= 2e-5 * scale, (name, m.shape, d, scale)


@pytest.mark.parametrize("name", sorted(TWINS))
def test_faithful_twin_bf16_tolerance(name, blobs):
    data = blobs[name]
    fn32, p32 = tc.compile_tflite(data)
    fn16, p16 = tc.compile_tflite(data, dtype=jnp.bfloat16)
    rng = np.random.RandomState(37)
    x = rng.uniform(0, 1, fn32.input_shapes[0]).astype(np.float32)
    a = jax.jit(fn32)(p32, jnp.asarray(x))
    b = jax.jit(fn16)(p16, jnp.asarray(x))
    for m32, m16 in zip(a, b):
        m32 = np.asarray(m32, np.float32)
        m16 = np.asarray(m16, np.float32)
        scale = float(np.abs(m32).max()) + 1e-6
        # Measured on these graphs: <=0.35% of scale; gate with headroom.
        assert np.abs(m32 - m16).max() <= 0.01 * scale + 0.01, (
            name, m32.shape, np.abs(m32 - m16).max(), scale)


@pytest.mark.parametrize("name", sorted(TWINS))
def test_faithful_twin_per_channel_int8(name):
    builder = TWINS[name][0]
    data = builder(quantize=True)
    graph = tc.parse_tflite(data)
    # The converter's dynamic-range pass must have actually quantized the
    # conv/FC weights (else this test would silently re-run the f32 one).
    assert any(t.data is not None and t.data.dtype == np.int8
               and t.quant is not None for t in graph.tensors), (
        "no per-channel int8 weights in the quantized twin")
    fn, params = tc.compile_tflite(data)
    rng = np.random.RandomState(41)
    x = rng.uniform(0, 1, fn.input_shapes[0]).astype(np.float32)
    ref = _interp(data, x)
    mine = jax.jit(fn)(params, jnp.asarray(x))
    for m, r, d in _match(mine, ref):
        scale = float(np.abs(r).max()) + 1e-6
        assert d <= 0.02 * scale, (name, m.shape, d, scale)


def test_faithful_bundle_full_predict_path(tmp_path):
    """Drop-in readiness: the faithful blobs resolve through the real
    bundle path (zip member-name heuristics), compile inside
    InferenceRunner construction, and execute through predict — the exact
    flow a user dropping the real assets in would hit."""
    import io
    import zipfile

    from bp_from_video_tpu.config import InferenceConfig
    from bp_from_video_tpu.models.runner import InferenceRunner

    task = tmp_path / "hand_landmarker.task"
    task.write_bytes(fx.build_faithful_hand_task_bundle())
    seg = tmp_path / "selfie_multiclass_256x256.tflite"
    seg.write_bytes(fx.build_faithful_segmenter())

    cfg = InferenceConfig(
        face_detector=False, face_landmarker=False, hand_landmarker=True,
        person_segmenter=True, hand_landmarker_path=str(task),
        person_segmenter_path=str(seg))
    runner = InferenceRunner(cfg, 192, 192)
    assert runner.real_weights == {"palm_det": True, "hand_lm": True,
                                   "seg": True}

    rng = np.random.RandomState(43)
    frame = jnp.asarray(rng.randint(0, 255, (192, 192, 3)), jnp.uint8)
    state = runner.init_state()
    state, res = runner.predict(runner.params, state, frame)
    # Random weights make detection content meaningless; the contract is
    # that the full graph executes with sane output ranges.
    assert bool(res.seg_valid)
    conf = np.asarray(res.seg_conf, np.float64)          # [6, H, W]
    assert conf.shape == (6, 192, 192)
    np.testing.assert_allclose(conf.sum(axis=0), 1.0, atol=2e-2)
    assert int(np.asarray(res.hand_landmarker.count)) >= 0
    # A second frame exercises the VIDEO-mode gate with the same blobs.
    state, res2 = runner.predict(runner.params, state, frame)
    assert res2.seg_conf.shape == (6, 192, 192)
