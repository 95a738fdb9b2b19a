"""TFLite->JAX compiler parity vs the TFLite interpreter on the real bundled
model binaries (face detector, face landmarks, blendshapes)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bp_from_video_tpu.models import tflite_compiler as tc

BUNDLE = "/root/reference/models/face_landmarker.task"

pytestmark = pytest.mark.skipif(not os.path.exists(BUNDLE),
                                reason="reference model bundle absent")


def tflite_reference(data: bytes, inputs):
    import tensorflow as tf
    ip = tf.lite.Interpreter(model_content=data)
    ip.allocate_tensors()
    for d, x in zip(ip.get_input_details(), inputs):
        ip.set_tensor(d["index"], x)
    ip.invoke()
    return [ip.get_tensor(d["index"]) for d in ip.get_output_details()]


def _models():
    blobs = tc.load_task_bundle(BUNDLE)
    return blobs


# Module-scoped compile cache: the suite is trace-bound and half this
# module used to compile the SAME 471-op face-mesh graph over and over
# (round-5 durations: planar 58 s, batch_flexible 42 s, ...).  Tests share
# one (fn, params, jitted) triple per (model, compile-options) key; fn is
# pure and params are never mutated, so sharing is safe.
_COMPILE_CACHE: dict = {}


def get_compiled(name: str, **kw):
    key = (name, tuple(sorted(kw.items())))
    if key not in _COMPILE_CACHE:
        fn, params = tc.compile_tflite(_models()[name], **kw)
        _COMPILE_CACHE[key] = (fn, params, jax.jit(fn))
    return _COMPILE_CACHE[key]


@pytest.mark.parametrize("layout", ["NHWC", "NCHW"])
@pytest.mark.parametrize("name,atol", [
    ("face_detector.tflite", 5e-4),
    ("face_landmarks_detector.tflite", 5e-3),
    ("face_blendshapes.tflite", 5e-3),
])
def test_compiled_matches_interpreter(name, atol, layout):
    data = _models()[name]
    fn, params, jfn = get_compiled(name, layout=layout)
    rng = np.random.RandomState(0)
    inputs = []
    for shape in fn.input_shapes:
        if name == "face_blendshapes.tflite":
            x = rng.uniform(0, 256, size=shape).astype(np.float32)
        else:
            x = rng.uniform(0, 1, size=shape).astype(np.float32)
        inputs.append(x)
    ref = tflite_reference(data, inputs)
    mine = jfn(params, *[jnp.asarray(x) for x in inputs])
    # The interpreter may order outputs differently from graph.outputs; match
    # by shape + value proximity.
    assert len(mine) == len(ref)
    ref_by_shape = {tuple(r.shape): r for r in ref}
    for m in mine:
        m = np.asarray(m, np.float32)
        r = ref_by_shape[tuple(m.shape)]
        scale = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(m, r, atol=atol * scale,
                                   err_msg=f"{name} output {m.shape}")


def test_planar_inputs_match_nhwc():
    """planar_inputs=True takes [N, C, H, W] images and matches exactly."""
    fn, p, jfn = get_compiled("face_landmarks_detector.tflite",
                              layout="NHWC")
    fnp, pp, jfnp = get_compiled("face_landmarks_detector.tflite",
                                 layout="NCHW", planar_inputs=True)
    rng = np.random.RandomState(7)
    x = rng.uniform(0, 1, size=fn.input_shapes[0]).astype(np.float32)
    a = jfn(p, jnp.asarray(x))
    b = jfnp(pp, jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)))
    for m, n in zip(a, b):
        np.testing.assert_allclose(np.asarray(m), np.asarray(n),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_vmap_over_compiled_model():
    fn, params, _ = get_compiled("face_detector.tflite", layout="NHWC")
    rng = np.random.RandomState(1)
    batch = rng.uniform(0, 1, size=(3, 1, 128, 128, 3)).astype(np.float32)
    single = [np.asarray(fn(params, jnp.asarray(batch[i]))[0]) for i in range(3)]
    batched = jax.vmap(lambda x: fn(params, x)[0])(jnp.asarray(batch))
    np.testing.assert_allclose(np.asarray(batched), np.stack(single),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow  # the TPU bench drives the bf16 compile path every round
def test_bf16_compile_is_close():
    fn32, p32, _ = get_compiled("face_detector.tflite", layout="NHWC")
    fn16, p16, _ = get_compiled("face_detector.tflite",
                                dtype=jnp.bfloat16)
    rng = np.random.RandomState(2)
    x = rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
    o32 = np.asarray(fn32(p32, jnp.asarray(x))[1], np.float32)
    o16 = np.asarray(fn16(p16, jnp.asarray(x))[1], np.float32)
    # classificator logits: bf16 keeps ranking-level accuracy
    assert np.abs(o32 - o16).max() < 0.35 * (np.abs(o32).max() + 1e-6)

@pytest.mark.parametrize("name", ["face_landmarks_detector.tflite",
                                  "face_detector.tflite"])
def test_graph_optimizations_are_exact(name):
    """fuse_dw_pw_pairs and space_to_depth_pack keep interpreter parity.

    The composition is linear-map algebra (no activation sits between the
    MediaPipe depthwise and pointwise convs); the packing is a layout
    re-scatter of the same weights — both must match the TFLite interpreter
    to f32 round-off, not merely to a loose behavioral tolerance.
    """
    data = _models()[name]
    fn0, p0, _ = get_compiled(name, fuse_dw_pw=False)
    rng = np.random.RandomState(3)
    x = rng.uniform(0, 1, size=fn0.input_shapes[0]).astype(np.float32)
    ref = tflite_reference(data, [x])
    ref_by_shape = {tuple(r.shape): r for r in ref}
    fused, pf, jfused = get_compiled(name, fuse_dw_pw=True)
    packed, ppk, jpacked = get_compiled(name, fuse_dw_pw=True, pack_s2d=64)
    # The packed graph must actually have packed ops (and no depthwise left).
    opcodes = [op.opcode for op in packed.graph.ops]
    assert "SPACE_TO_DEPTH" in opcodes
    assert "DEPTHWISE_CONV_2D" not in opcodes
    for jfn, p in ((jfused, pf), (jpacked, ppk)):
        for m in jfn(p, jnp.asarray(x)):
            m = np.asarray(m, np.float32)
            r = ref_by_shape[tuple(m.shape)]
            scale = np.abs(r).max() + 1e-6
            np.testing.assert_allclose(m, r, atol=1e-4 * scale + 1e-5)

def test_packed_inputs_match_unpacked():
    """packed_inputs=True consumes pre-packed crops bit-identically."""
    fn0, p0, jfn0 = get_compiled("face_landmarks_detector.tflite",
                                 fuse_dw_pw=True, pack_s2d=64)
    fn1, p1, jfn1 = get_compiled("face_landmarks_detector.tflite",
                                 fuse_dw_pw=True, pack_s2d=64,
                                 packed_inputs=True)
    assert fn1.input_shapes == [(1, 128, 128, 12)]
    rng = np.random.RandomState(5)
    x = rng.uniform(0, 1, size=(1, 256, 256, 3)).astype(np.float32)
    xp = (x.reshape(1, 128, 2, 128, 2, 3).transpose(0, 1, 3, 2, 4, 5)
          .reshape(1, 128, 128, 12))
    for a, b in zip(jfn0(p0, jnp.asarray(x)), jfn1(p1, jnp.asarray(xp))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fuse_bottlenecks_matches_unfused():
    """fuse_bn=True rewrites the face mesh's 28 stride-1 bottleneck
    residual units into PALLAS_BN ops (471 -> ~134 ops) and keeps parity
    with the unfused compiled graph (interpret-mode kernels)."""
    from jax.experimental.pallas import tpu as pltpu
    data = _models()["face_landmarks_detector.tflite"]
    fn0, p0, _ = get_compiled("face_landmarks_detector.tflite",
                              layout="NCHW", planar_inputs=True)
    fn1, p1 = tc.compile_tflite(data, layout="NCHW", planar_inputs=True,
                                fuse_bn=True, fuse_bn_min_hw=0)
    ops1 = [op.opcode for op in fn1.graph.ops]
    # All 28 units fuse; the 7 stages of 4 merge into 7 chain kernels.
    assert ops1.count("PALLAS_BN_CHAIN") == 7
    assert ops1.count("PALLAS_BN") == 0
    # The production default (min_hw=96) keeps only the 128^2 stage.
    fn96, _ = tc.compile_tflite(data, layout="NCHW", planar_inputs=True,
                                fuse_bn=True)
    ops96 = [op.opcode for op in fn96.graph.ops]
    assert ops96.count("PALLAS_BN_CHAIN") == 1
    assert ops96.count("PALLAS_BN") == 0
    # Only the 6 stride-2 downsample units keep a DEPTHWISE_CONV_2D.
    assert sum(op.opcode == "DEPTHWISE_CONV_2D"
               for op in fn1.graph.ops) == 6
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (1, 3, 256, 256)).astype(np.float32)
    ref = fn0(p0, jnp.asarray(x))
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(fn1)(p1, jnp.asarray(x))
    for r, g in zip(ref, got):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        scale = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g, r, atol=1e-3 * scale)


def test_batch_flexible_matches_per_sample():
    """batch_flexible=True runs a whole batch through the batch-1 graph in
    one call, matching per-sample invocations exactly."""
    fn, p, _ = get_compiled("face_landmarks_detector.tflite",
                            layout="NCHW", planar_inputs=True,
                            batch_flexible=True)
    rng = np.random.RandomState(9)
    x = rng.uniform(0, 1, (3, 3, 256, 256)).astype(np.float32)
    # 3 batch-1 eager calls + 1 batch-3: shape-flexibility is the point,
    # so per-shape jits would not amortize — keep eager.
    singles = [fn(p, jnp.asarray(x[i:i + 1])) for i in range(3)]
    batched = fn(p, jnp.asarray(x))
    for k, b in enumerate(batched):
        s = np.concatenate([np.asarray(sv[k]) for sv in singles])
        # Batch-1 vs batch-3 conv lowerings accumulate in different
        # orders; bound the drift relative to the output's scale.
        scale = max(np.abs(s).max(), 1.0)
        np.testing.assert_allclose(np.asarray(b).reshape(s.shape), s,
                                   atol=1e-4 * scale)


def test_external_stem_matches_full_graph():
    """external_stem=True splits the face mesh's conv+PReLU stem out; the
    Pallas stem kernel (interpret) + the rest of the graph must reproduce
    the full compiled graph bit-for-bit (the fused_stem production path)."""
    from bp_from_video_tpu.pallas import stem_kernel as sk
    data = _models()["face_landmarks_detector.tflite"]
    fn0, p0, _ = get_compiled("face_landmarks_detector.tflite",
                              layout="NCHW", planar_inputs=True)
    fn1, p1 = tc.compile_tflite(data, layout="NCHW", planar_inputs=True,
                                external_stem=True)
    meta = fn1.external_stem_meta
    assert meta["in_size"] == 256 and meta["out_channels"] == 16
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (1, 3, 256, 256)).astype(np.float32)
    ref = fn0(p0, jnp.asarray(x))
    xp = np.stack([x[0, c, a::2, b::2] for a in range(2) for b in range(2)
                   for c in range(3)])[None]
    pk = meta["params"]
    stems = sk.stem_packed(jnp.asarray(xp), p1[pk["w"]], p1[pk["b"]],
                           p1[pk["alpha"]], interpret=True)
    got = fn1(p1, stems)
    for r, g in zip(ref, got):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        scale = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(g, r, atol=1e-3 * scale)
    # The dead stem weights must not ride along in the params pytree.
    import jax as _jax
    n0 = sum(a.size for a in _jax.tree.leaves(p0))
    n1 = sum(a.size for a in _jax.tree.leaves(p1))
    assert n1 <= n0 + 16 * 2  # alpha+bias added, conv weight removed


def test_fuse_bottlenecks_rejects_bounded_add_activation():
    """A bottleneck whose ADD carries a bounded fused activation (RELU6)
    must stay UNFUSED: the Pallas kernel's epilogue has no clamp, so fusing
    would silently unbound the activation (regression — it used to map
    RELU6 to plain relu)."""
    data = _models()["face_landmarks_detector.tflite"]
    g = tc.parse_tflite(data)
    base = tc.fuse_bottlenecks(g, min_hw=0)
    adds_left = sum(op.opcode == "ADD" for op in base.ops)
    fused_ids = {id(o) for o in base.ops}
    victim = next(op for op in g.ops
                  if op.opcode == "ADD" and id(op) not in fused_ids)
    victim.options["activation"] = "RELU6"
    try:
        got = tc.fuse_bottlenecks(g, min_hw=0)
        assert any(op is victim for op in got.ops)
        assert sum(op.opcode == "ADD" for op in got.ops) == adds_left + 1
    finally:
        victim.options["activation"] = "NONE"


def test_external_stem_declines_shared_input():
    """When the image input feeds a second consumer besides the stem conv,
    re-rooting the graph at the stem output would orphan that consumer's
    input — extraction must decline, not produce a broken graph."""
    data = _models()["face_landmarks_detector.tflite"]
    g = tc.parse_tflite(data)
    _, stem = tc._extract_stem(g)
    assert stem is not None  # sanity: the unmodified mesh does extract
    tensors = list(g.tensors)
    tensors.append(tc.TensorInfo("extra", g.tensors[g.inputs[0]].shape,
                                 np.float32, None, None))
    extra = tc.OpNode("RELU", [g.inputs[0]], [len(tensors) - 1], {})
    g3 = tc.Graph(tensors, list(g.ops) + [extra], list(g.inputs),
                  list(g.outputs) + [len(tensors) - 1])
    g4, stem4 = tc._extract_stem(g3)
    assert stem4 is None and g4 is g3
