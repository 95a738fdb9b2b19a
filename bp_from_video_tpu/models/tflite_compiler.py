"""TFLite → JAX graph compiler: the framework's model "graph builder".

The reference executes its four vision networks inside MediaPipe's C++ graph
runtime + TFLite interpreter (reference inference_runner.py:6-12, :79-91).
Here the `.tflite` flatbuffer itself is compiled into a **pure JAX function**
plus a weights pytree, so the network runs inside the fused jitted per-frame
step on the TPU — jit/vmap/pjit-compatible, weights castable to bf16 for the
MXU, no interpreter in the loop.

Covers the op set of the MediaPipe face/hand/segmentation model family
(conv/dwconv/pool/pad/prelu/resize/transpose-conv/... ); unsupported ops
raise with the op name so coverage gaps are explicit.

Quantization support boundary: f32, f16-behind-DEQUANTIZE (the shipped
MediaPipe format), and dynamic-range int8 weights incl. per-channel scales
all compile (weights dequantize at load; execution is float).  FULL-integer
graphs (QUANTIZE activation ops, int8 graph I/O) are out of scope — this
compiler executes in float and does not simulate integer kernels; the
QUANTIZE op raises like any unsupported op.

Parsing uses TensorFlow's generated flatbuffer schema bindings (the .tflite
schema is public); execution is plain jax.numpy / lax.
"""

from __future__ import annotations

import dataclasses
import io
import logging
import zipfile
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from bp_from_video_tpu.models import warp

Array = jax.Array

# Lazy import: tensorflow is only needed at model-load time, never inside
# the jitted step.
_schema = None


def _schema_fb():
    global _schema
    if _schema is None:
        from tensorflow.lite.python import schema_py_generated as schema_fb
        _schema = schema_fb
    return _schema


_TENSOR_DTYPES = {
    # TFLite schema TensorType numbering (verified against the installed
    # schema): ... 15 = UINT32, 16 = UINT16, 17 = INT4 (packed nibbles —
    # unsupported, must not silently .view() as a wider dtype).
    0: np.float32, 1: np.float16, 2: np.int32, 3: np.uint8, 4: np.int64,
    6: np.bool_, 7: np.int16, 9: np.int8, 10: np.float64, 15: np.uint32,
    16: np.uint16,
}


@dataclasses.dataclass
class TensorInfo:
    name: str
    shape: tuple[int, ...]
    dtype: Any
    data: np.ndarray | None          # constant data, already dequantized
    quant: tuple[float, int] | None  # (scale, zero_point) if quantized


@dataclasses.dataclass
class OpNode:
    opcode: str
    inputs: list[int]
    outputs: list[int]
    options: dict


@dataclasses.dataclass
class Graph:
    tensors: list[TensorInfo]
    ops: list[OpNode]
    inputs: list[int]
    outputs: list[int]


def _opcode_name(model, op) -> str:
    schema_fb = _schema_fb()
    oc = model.OperatorCodes(op.OpcodeIndex())
    code = oc.DeprecatedBuiltinCode()
    if code == 127:  # BuiltinOperator placeholder: real code in BuiltinCode
        code = oc.BuiltinCode()
    else:
        code = max(code, oc.BuiltinCode())
    for name in dir(schema_fb.BuiltinOperator):
        if not name.startswith("_") and getattr(schema_fb.BuiltinOperator, name) == code:
            return name
    return f"UNKNOWN_{code}"


def _options(op, cls) -> Any:
    o = cls()
    tab = op.BuiltinOptions()
    if tab is None:
        return None
    o.Init(tab.Bytes, tab.Pos)
    return o


_ACT_NAMES = {0: "NONE", 1: "RELU", 2: "RELU_N1_TO_1", 3: "RELU6", 4: "TANH"}
_PAD_NAMES = {0: "SAME", 1: "VALID"}


def _parse_options(model, op, name) -> dict:
    schema_fb = _schema_fb()
    if name == "CONV_2D":
        o = _options(op, schema_fb.Conv2DOptions)
        return dict(stride=(o.StrideH(), o.StrideW()),
                    dilation=(o.DilationHFactor(), o.DilationWFactor()),
                    padding=_PAD_NAMES[o.Padding()],
                    activation=_ACT_NAMES[o.FusedActivationFunction()])
    if name == "DEPTHWISE_CONV_2D":
        o = _options(op, schema_fb.DepthwiseConv2DOptions)
        return dict(stride=(o.StrideH(), o.StrideW()),
                    dilation=(o.DilationHFactor(), o.DilationWFactor()),
                    padding=_PAD_NAMES[o.Padding()],
                    depth_multiplier=o.DepthMultiplier(),
                    activation=_ACT_NAMES[o.FusedActivationFunction()])
    if name == "TRANSPOSE_CONV":
        o = _options(op, schema_fb.TransposeConvOptions)
        return dict(stride=(o.StrideH(), o.StrideW()),
                    padding=_PAD_NAMES[o.Padding()])
    if name in ("MAX_POOL_2D", "AVERAGE_POOL_2D"):
        o = _options(op, schema_fb.Pool2DOptions)
        return dict(stride=(o.StrideH(), o.StrideW()),
                    filter=(o.FilterHeight(), o.FilterWidth()),
                    padding=_PAD_NAMES[o.Padding()],
                    activation=_ACT_NAMES[o.FusedActivationFunction()])
    if name in ("ADD", "SUB", "MUL", "DIV"):
        cls = getattr(schema_fb, name.capitalize() + "Options")
        o = _options(op, cls)
        act = o.FusedActivationFunction() if o is not None else 0
        return dict(activation=_ACT_NAMES[act])
    if name == "CONCATENATION":
        o = _options(op, schema_fb.ConcatenationOptions)
        return dict(axis=o.Axis())
    if name == "RESHAPE":
        o = _options(op, schema_fb.ReshapeOptions)
        new_shape = None
        if o is not None and o.NewShapeLength() > 0:
            new_shape = tuple(o.NewShape(i) for i in range(o.NewShapeLength()))
        return dict(new_shape=new_shape)
    if name in ("MEAN", "SUM", "REDUCE_MAX"):
        o = _options(op, schema_fb.ReducerOptions)
        return dict(keep_dims=bool(o.KeepDims()) if o is not None else False)
    if name == "STRIDED_SLICE":
        o = _options(op, schema_fb.StridedSliceOptions)
        return dict(begin_mask=o.BeginMask(), end_mask=o.EndMask(),
                    ellipsis_mask=o.EllipsisMask(),
                    new_axis_mask=o.NewAxisMask(),
                    shrink_axis_mask=o.ShrinkAxisMask())
    if name == "RESIZE_BILINEAR":
        o = _options(op, schema_fb.ResizeBilinearOptions)
        return dict(align_corners=bool(o.AlignCorners()),
                    half_pixel_centers=bool(o.HalfPixelCenters()))
    if name == "RESIZE_NEAREST_NEIGHBOR":
        o = _options(op, schema_fb.ResizeNearestNeighborOptions)
        return dict(align_corners=bool(o.AlignCorners()),
                    half_pixel_centers=bool(o.HalfPixelCenters()))
    if name == "FULLY_CONNECTED":
        o = _options(op, schema_fb.FullyConnectedOptions)
        return dict(activation=_ACT_NAMES[o.FusedActivationFunction()])
    if name == "SOFTMAX":
        o = _options(op, schema_fb.SoftmaxOptions)
        return dict(beta=o.Beta())
    return {}


def parse_tflite(data: bytes) -> Graph:
    """Parse a .tflite flatbuffer into a small IR (tensors + topo op list)."""
    schema_fb = _schema_fb()
    model = schema_fb.Model.GetRootAsModel(data, 0)
    sg = model.Subgraphs(0)
    tensors: list[TensorInfo] = []
    for i in range(sg.TensorsLength()):
        t = sg.Tensors(i)
        shape = tuple(t.ShapeAsNumpy().tolist()) if t.ShapeLength() else ()
        dtype = _TENSOR_DTYPES.get(t.Type())
        buf = model.Buffers(t.Buffer())
        if dtype is None:
            if buf.DataLength() > 0:
                # Silently .view()-ing an unknown type (e.g. INT4 packed
                # nibbles) would yield garbage constants; fail loudly.
                raise NotImplementedError(
                    f"tensor type {t.Type()} with constant data")
            dtype = np.float32
        arr = None
        if buf.DataLength() > 0:
            raw = buf.DataAsNumpy().view(dtype)
            arr = raw.reshape(shape) if shape else raw
        quant = None
        q = t.Quantization()
        if q is not None and q.ScaleLength() == 1:
            quant = (float(q.Scale(0)),
                     int(q.ZeroPoint(0)) if q.ZeroPointLength() else 0)
        elif q is not None and q.ScaleLength() > 1:
            # Per-channel (per-axis) quantization: full scale/zero-point
            # vectors plus the quantized dimension — collapsing to
            # Scale(0) would dequantize every channel with channel 0's
            # scale (silent garbage weights).
            quant = (q.ScaleAsNumpy().astype(np.float32),
                     (q.ZeroPointAsNumpy().astype(np.int64)
                      if q.ZeroPointLength() else
                      np.zeros(q.ScaleLength(), np.int64)),
                     int(q.QuantizedDimension()))
        name = t.Name().decode() if t.Name() else f"t{i}"
        tensors.append(TensorInfo(name, shape, dtype, arr, quant))
    ops: list[OpNode] = []
    for i in range(sg.OperatorsLength()):
        op = sg.Operators(i)
        name = _opcode_name(model, op)
        ins = [op.Inputs(j) for j in range(op.InputsLength())]
        outs = [op.Outputs(j) for j in range(op.OutputsLength())]
        ops.append(OpNode(name, ins, outs, _parse_options(model, op, name)))
    inputs = [sg.Inputs(i) for i in range(sg.InputsLength())]
    outputs = [sg.Outputs(i) for i in range(sg.OutputsLength())]
    return Graph(tensors, ops, inputs, outputs)


# --- graph optimization ------------------------------------------------------


class _GraphEdit:
    """Shared graph-pass machinery: the consumers map, DEQUANTIZE-folding
    constant resolution, and constant/activation tensor appends.  Every
    rewrite pass (fuse_dw_pw_pairs, fuse_bottlenecks, space_to_depth_pack,
    _extract_stem) needs some subset; one copy means the passes cannot
    disagree about which tensors are constant."""

    def __init__(self, graph: Graph):
        self.graph = graph
        self.tensors = list(graph.tensors)
        self.consumers: dict[int, list[int]] = {}
        for i, op in enumerate(graph.ops):
            for t in op.inputs:
                if t >= 0:
                    self.consumers.setdefault(t, []).append(i)
        self.dequant_of = {op.outputs[0]: op.inputs[0] for op in graph.ops
                           if op.opcode == "DEQUANTIZE"
                           and graph.tensors[op.inputs[0]].data is not None}

    def const(self, idx: int) -> np.ndarray | None:
        if idx < 0:
            return None
        src = self.dequant_of.get(idx)
        if src is not None:
            info = self.graph.tensors[src]
            return _dequant(info, info.data)
        info = self.tensors[idx]
        return None if info.data is None else _dequant(info, info.data)

    def add_const(self, name: str, arr: np.ndarray) -> int:
        self.tensors.append(TensorInfo(name, tuple(arr.shape), arr.dtype,
                                       np.ascontiguousarray(arr), None))
        return len(self.tensors) - 1

    def add_tensor(self, name: str, shape, data=None) -> int:
        self.tensors.append(TensorInfo(
            name, tuple(int(x) for x in shape), np.float32,
            None if data is None else np.ascontiguousarray(data), None))
        return len(self.tensors) - 1

    def sole_consumer(self, t: int) -> tuple[int, "OpNode | None"]:
        cons = self.consumers.get(t, [])
        if len(cons) == 1 and t not in self.graph.outputs:
            return cons[0], self.graph.ops[cons[0]]
        return -1, None


def fuse_dw_pw_pairs(graph: Graph) -> Graph:
    """Fold DEPTHWISE_CONV_2D -> 1x1 CONV_2D pairs into single dense convs.

    The MediaPipe face/hand graphs put NO activation between the depthwise
    and the following pointwise conv (e.g. face_landmarks_detector ops
    DW@3x3 -> CONV@1x1 throughout the bottleneck blocks), so the pair is a
    composition of two linear maps and folds EXACTLY into one dense
    (kh, kw) convolution:

        W[o,u,v,c] = pw[o,c] * dw[u,v,c]      b[o] = pw_b[o] + sum_c pw[o,c] dw_b[c]

    TPU rationale: a 1x1 conv with C_in=8..32 uses <2% of the MXU's 128x128
    cells and still streams every activation row through the array; the
    composed conv raises the contraction dim to kh*kw*C_in (72..288) at the
    same row count AND removes the depthwise output's HBM round trip (the
    dominant cost — these nets are bandwidth-bound at batch 64).  The extra
    multiply-accumulates land on MXU cells that were idle.

    Returns a new Graph sharing tensor storage; composed weights are
    appended as new constant tensors.
    """
    ge = _GraphEdit(graph)
    consumers, tensors = ge.consumers, ge.tensors
    const, add_const = ge.const, ge.add_const

    new_ops: list[OpNode] = []
    skip: set[int] = set()
    for i, op in enumerate(graph.ops):
        if i in skip:
            continue
        if (op.opcode == "DEPTHWISE_CONV_2D"
                and op.options.get("activation") == "NONE"
                and op.options.get("depth_multiplier") == 1
                and op.options.get("dilation") == (1, 1)):
            out = op.outputs[0]
            cons = consumers.get(out, [])
            if len(cons) == 1 and out not in graph.outputs:
                nxt = graph.ops[cons[0]]
                dw_w = const(op.inputs[1])
                pw_w = const(nxt.inputs[1]) if nxt.opcode == "CONV_2D" else None
                if (nxt.opcode == "CONV_2D" and nxt.inputs[0] == out
                        and nxt.options.get("stride") == (1, 1)
                        and nxt.options.get("dilation") == (1, 1)
                        and dw_w is not None and pw_w is not None
                        and pw_w.shape[1] == pw_w.shape[2] == 1):
                    kh, kw = dw_w.shape[1], dw_w.shape[2]
                    c = dw_w.shape[3]
                    o_ = pw_w.shape[0]
                    # [o, kh, kw, c] — TFLite CONV_2D weight layout.
                    comp = (pw_w.reshape(o_, 1, 1, c).astype(np.float32)
                            * dw_w.reshape(1, kh, kw, c).astype(np.float32))
                    dw_b = const(op.inputs[2]) if len(op.inputs) > 2 else None
                    pw_b = const(nxt.inputs[2]) if len(nxt.inputs) > 2 else None
                    bias = np.zeros((o_,), np.float32)
                    if pw_b is not None:
                        bias += pw_b.astype(np.float32)
                    if dw_b is not None:
                        bias += pw_w.reshape(o_, c).astype(np.float32) @ (
                            dw_b.astype(np.float32))
                    w_idx = add_const(f"fused_dwpw_w_{i}", comp)
                    b_idx = add_const(f"fused_dwpw_b_{i}", bias)
                    new_ops.append(OpNode(
                        "CONV_2D", [op.inputs[0], w_idx, b_idx],
                        list(nxt.outputs),
                        dict(stride=op.options["stride"], dilation=(1, 1),
                             padding=op.options["padding"],
                             activation=nxt.options.get("activation",
                                                        "NONE"))))
                    skip.add(cons[0])
                    continue
        new_ops.append(op)
    return Graph(tensors, new_ops, list(graph.inputs), list(graph.outputs))


def fuse_bottlenecks(graph: Graph, min_hw: int = 0) -> Graph:
    """Fuse the MediaPipe bottleneck residual unit into one Pallas op.

    The face_landmarks_detector trunk (and its siblings) repeats
        CONV1x1(C->D) -> PRELU -> DW3x3/s1 -> CONV1x1(D->C') -> ADD(r)
        [-> PRELU]
    with no activation between the depthwise and the up-projection — the
    dw+up pair composes exactly into one dense 3x3 D->C' conv, and the
    whole unit becomes TWO MXU contractions per crop on flat VMEM-resident
    activations (pallas/block_kernel.bottleneck_s1), replacing five
    row-streamed XLA ops and their HBM round trips.

    Matched chains are replaced by a ``PALLAS_BN`` pseudo-op whose inputs
    are [x, residual, wd, bd, ad, wu, bu, au] (the packed weights appended
    as new constant tensors); options carry {"cmid", "last_act"}.

    ``min_hw``: only fuse units whose spatial size is >= min_hw — measured
    on TPU (tools/bnprobe.py, v5e, batch 64): the kernel wins at 128^2
    (1.48x) and loses below 64^2 (0.44-0.90x), where the rolls' VPU cost
    and the thin-M dots can't amortize; XLA's conv pipeline handles the
    small-spatial tail better.
    """
    from bp_from_video_tpu.pallas import block_kernel as bk

    ge = _GraphEdit(graph)
    consumers, tensors = ge.consumers, ge.tensors
    const, add_const = ge.const, ge.add_const
    sole_consumer = ge.sole_consumer
    _producer = {t: j for j, o in enumerate(graph.ops) for t in o.outputs}

    new_ops: list[OpNode] = []
    skip: set[int] = set()
    n_fused = 0
    for i, op in enumerate(graph.ops):
        if i in skip:
            continue
        # -- match: 1x1 down-projection ------------------------------------
        w_down = const(op.inputs[1]) if op.opcode == "CONV_2D" else None
        if (w_down is None or w_down.shape[1] != 1 or w_down.shape[2] != 1
                or op.options.get("stride") != (1, 1)
                or op.options.get("activation") != "NONE"):
            new_ops.append(op)
            continue
        out_shape = graph.tensors[op.outputs[0]].shape
        if len(out_shape) != 4 or min(out_shape[1], out_shape[2]) < min_hw:
            new_ops.append(op)
            continue
        pre_i, pre = sole_consumer(op.outputs[0])
        if pre is None or pre.opcode != "PRELU":
            new_ops.append(op)
            continue
        a_mid = const(pre.inputs[1])
        dwo_i, dwo = sole_consumer(pre.outputs[0])
        if (dwo is None or dwo.opcode != "DEPTHWISE_CONV_2D"
                or dwo.options.get("stride") != (1, 1)
                or dwo.options.get("dilation") != (1, 1)
                or dwo.options.get("depth_multiplier") != 1
                or dwo.options.get("padding") != "SAME"
                or dwo.options.get("activation") != "NONE"
                or a_mid is None):
            new_ops.append(op)
            continue
        w_dw = const(dwo.inputs[1])
        if w_dw is None or w_dw.shape[1:3] != (3, 3):
            new_ops.append(op)
            continue
        upo_i, upo = sole_consumer(dwo.outputs[0])
        w_up = const(upo.inputs[1]) if (upo is not None
                                        and upo.opcode == "CONV_2D") else None
        if (w_up is None or w_up.shape[1] != 1 or w_up.shape[2] != 1
                or upo.options.get("stride") != (1, 1)
                or upo.options.get("activation") != "NONE"):
            new_ops.append(op)
            continue
        addo_i, addo = sole_consumer(upo.outputs[0])
        if addo is None or addo.opcode != "ADD":
            new_ops.append(op)
            continue
        resid = [t for t in addo.inputs if t != upo.outputs[0]]
        if len(resid) != 1 or const(resid[0]) is not None:
            new_ops.append(op)
            continue
        if _producer.get(resid[0], -1) > i:
            # The fused op lands at the down-conv's position but consumes
            # the ADD's residual input; a residual produced AFTER the
            # down-conv (legal topological order) would be read before it
            # exists.  Leave such units unfused.
            new_ops.append(op)
            continue
        last_i, last = sole_consumer(addo.outputs[0])
        act = addo.options.get("activation", "NONE")
        if last is not None and last.opcode == "PRELU" and act == "NONE":
            a_out = const(last.inputs[1])
            out_t = last.outputs[0]
            last_act = "prelu"
            tail = {addo_i, last_i}
        elif act in ("NONE", "RELU"):
            a_out = None
            out_t = addo.outputs[0]
            last_act = "relu" if act == "RELU" else "none"
            tail = {addo_i}
        else:
            # RELU6/RELU_N1_TO_1/TANH on the ADD have no kernel epilogue —
            # fusing would silently change the activation; leave unfused.
            new_ops.append(op)
            continue
        # -- pack ------------------------------------------------------------
        d = w_down.shape[0]
        cout = w_up.shape[0]
        # TFLite CONV weights are [out, kh, kw, in]; the kernel wants
        # HWIO-style operands (pack_bottleneck_weights handles layout).
        wd, wu = bk.pack_bottleneck_weights(
            w_down.transpose(1, 2, 3, 0),      # [1,1,C,D]  (numpy in/out —
            w_dw.transpose(1, 2, 0, 3),        # [3,3,1,D]   a device round
            w_up.transpose(1, 2, 3, 0),        # [1,1,D,C']  trip here would
            dtype=np.float32)  # graph dtype applied at param load; the D2H
        # leg of the old jnp round-trip was what poisoned fused_trunk
        # construction (tools/poisonprobe.py, round 3).
        bd = const(op.inputs[2]) if len(op.inputs) > 2 else None
        bd = (np.zeros((d,), np.float32) if bd is None
              else bd.astype(np.float32))
        b_dw = const(dwo.inputs[2]) if len(dwo.inputs) > 2 else None
        b_up = const(upo.inputs[2]) if len(upo.inputs) > 2 else None
        bu = np.zeros((cout,), np.float32)
        if b_up is not None:
            bu += b_up.astype(np.float32)
        if b_dw is not None:
            # dw bias rides through the composed dense conv: the conv sums
            # 9 taps of (z + 0) ... the dw bias adds once per output:
            bu += w_up.reshape(cout, d).astype(np.float32) @ (
                b_dw.astype(np.float32))
        au = (np.zeros((cout,), np.float32) if a_out is None
              else a_out.reshape(-1).astype(np.float32))
        ins = [op.inputs[0], resid[0],
               add_const(f"bn_wd_{i}", np.asarray(wd, np.float32)),
               add_const(f"bn_bd_{i}", bd),
               add_const(f"bn_ad_{i}", a_mid.reshape(-1).astype(np.float32)),
               add_const(f"bn_wu_{i}", np.asarray(wu, np.float32)),
               add_const(f"bn_bu_{i}", bu),
               add_const(f"bn_au_{i}", au)]
        new_ops.append(OpNode("PALLAS_BN", ins, [out_t],
                              {"cmid": int(d), "last_act": last_act}))
        skip.update({pre_i, dwo_i, upo_i} | tail)
        n_fused += 1
    if n_fused:
        logging.getLogger(__name__).info(
            "fuse_bottlenecks: fused %d residual units", n_fused)
    return Graph(tensors, new_ops, list(graph.inputs), list(graph.outputs))


def chain_bottlenecks(graph: Graph) -> Graph:
    """Merge runs of self-residual same-shape ``PALLAS_BN`` ops into one
    ``PALLAS_BN_CHAIN`` op (pallas/block_kernel.bottleneck_chain).

    The face-mesh trunk runs 4 identical units per stage; chaining a whole
    stage into one kernel call keeps the activation VMEM-resident across
    all of them (one load + one store per stage instead of four), which is
    what makes the small-spatial stages profitable to fuse at all
    (tools/bnprobe.py: per-unit calls lose below 64^2 on call overhead).

    Chain inputs: [x, wd, bd, ad, wu, bu, au] with the per-unit packed
    weights stacked on a leading U axis; options {"cmid", "last_act"}.
    """
    ge = _GraphEdit(graph)
    consumers, tensors, add_const = ge.consumers, ge.tensors, ge.add_const

    def chainable(op: OpNode) -> bool:
        return (op.opcode == "PALLAS_BN" and op.inputs[0] == op.inputs[1])

    def follows(a: OpNode, ai: int, b: OpNode) -> bool:
        # set(): a self-residual PALLAS_BN consumes its input at BOTH
        # operand slots, so the list-valued consumers map holds the op
        # index twice.
        return (b.inputs[0] == a.outputs[0] and b.inputs[1] == a.outputs[0]
                and b.options == a.options
                and set(consumers.get(a.outputs[0], ())) == {ai + 1}
                and a.outputs[0] not in graph.outputs)

    new_ops: list[OpNode] = []
    i = 0
    n_chained = 0
    ops = graph.ops
    while i < len(ops):
        op = ops[i]
        run = [i]
        if chainable(op):
            j = i
            while (j + 1 < len(ops) and chainable(ops[j + 1])
                   and follows(ops[j], j, ops[j + 1])):
                run.append(j + 1)
                j += 1
        if len(run) < 2:
            new_ops.append(op)
            i += 1
            continue
        members = [ops[k] for k in run]

        def stacked(slot: int, name: str) -> int:
            arrs = [tensors[m.inputs[slot]].data for m in members]
            return add_const(f"bnc_{name}_{run[0]}", np.stack(arrs))

        ins = [op.inputs[0], stacked(2, "wd"), stacked(3, "bd"),
               stacked(4, "ad"), stacked(5, "wu"), stacked(6, "bu"),
               stacked(7, "au")]
        new_ops.append(OpNode("PALLAS_BN_CHAIN", ins,
                              [members[-1].outputs[0]], dict(op.options)))
        n_chained += 1
        i = run[-1] + 1
    if n_chained:
        logging.getLogger(__name__).info(
            "chain_bottlenecks: merged %d stage chains", n_chained)
    return Graph(tensors, new_ops, list(graph.inputs), list(graph.outputs))


def _tflite_pad(in_size: int, k: int, s: int, padding) -> tuple[int, int]:
    """TFLite's explicit (lo, hi) padding for one spatial dim."""
    if isinstance(padding, tuple):
        return padding
    if padding == "VALID":
        return (0, 0)
    out = -(-in_size // s)
    total = max((out - 1) * s + k - in_size, 0)
    lo = total // 2
    return (lo, total - lo)


def _pack_axis(k: int, pad: tuple[int, int], s: int, f_out: int,
               in_size: int, out_size: int) -> tuple[int, int, tuple[int, int]]:
    """Packed-domain kernel extent and explicit padding for one spatial dim
    (shared by _pack_conv_weight and the blaze stand-ins' packed stems)."""
    sp = s * f_out // 2
    lo, _ = pad
    ts = [s * d + u - lo for d in range(f_out) for u in range(k)]
    r_min = min(t // 2 for t in ts)
    r_max = max(t // 2 for t in ts)
    kp = r_max - r_min + 1
    plo = -r_min
    packed_in = in_size // 2
    phi = max(0, sp * (out_size - 1) + kp - plo - packed_in)
    return r_min, kp, (plo, phi)


def _pack_conv_weight(w: np.ndarray, b: np.ndarray | None, s: int,
                      pads: tuple[tuple[int, int], tuple[int, int]],
                      f_out: int, in_hw: tuple[int, int],
                      out_hw: tuple[int, int]):
    """Re-scatter a conv weight [O, kh, kw, C] into the 2x2 space-to-depth
    packed domain.

    Packed tensors store x[2i+a, 2j+b, c] at X[i, j, (a*2+b)*C + c].  An
    original (kh, kw, stride s) conv becomes a (kh', kw', stride s*f_out/2)
    conv on the packed rep: original tap offset t = s*dy + u - pad_lo maps
    to packed tap r = t//2, sub-position a = t%2.  f_out=2 emits a packed
    output (channels (dy*2+dx)*O + o); f_out=1 emits unpacked.

    Returns (w' [O', kh', kw', 4C], b' [O'], stride', explicit padding).
    """
    o_, kh, kw, c = w.shape
    assert s * f_out in (2, 4), "unsupported stride/packing combination"
    sp = s * f_out // 2
    ry0, khp, pad_y = _pack_axis(kh, pads[0], s, f_out, in_hw[0], out_hw[0])
    rx0, kwp, pad_x = _pack_axis(kw, pads[1], s, f_out, in_hw[1], out_hw[1])

    wp = np.zeros((f_out * f_out * o_, khp, kwp, 4 * c), np.float32)
    for dy in range(f_out):
        for dx in range(f_out):
            g = dy * f_out + dx
            for u in range(kh):
                ty = s * dy + u - pads[0][0]
                for v in range(kw):
                    tx = s * dx + v - pads[1][0]
                    gi = (ty % 2) * 2 + (tx % 2)
                    wp[g * o_:(g + 1) * o_, ty // 2 - ry0, tx // 2 - rx0,
                       gi * c:(gi + 1) * c] = w[:, u, v, :]
    bp = None if b is None else np.tile(b.astype(np.float32), f_out * f_out)
    return wp, bp, sp, (pad_y, pad_x)


def space_to_depth_pack(graph: Graph, min_hw: int = 64,
                        packed_inputs: bool = False) -> Graph:
    """Store every activation with H, W >= ``min_hw`` 2x2 space-to-depth
    packed ([H/2, W/2, 4C]) and rewrite the ops between them.

    TPU rationale: the early high-resolution stages of the MediaPipe nets
    have 8-32 channels, so their convs occupy <6% of the MXU's 128x128
    cells while streaming batch*H*W rows through the array — time scales
    with ROWS, not FLOPs.  Packing quarters the row count and quadruples
    both the contraction dim (kh*kw*4C) and the output channels, moving the
    same math onto cells that were idle.  (The classic space-to-depth conv
    transformation; weights are re-scattered offline, numerics unchanged up
    to f32 summation order.)

    Ops without a packed rewrite fall back automatically: a DEPTH_TO_SPACE
    materializes the unpacked tensor on demand.
    """
    ge = _GraphEdit(graph)
    tensors = ge.tensors
    const, add_tensor = ge.const, ge.add_tensor

    new_ops: list[OpNode] = []
    packed_of: dict[int, int] = {}    # orig idx -> packed-rep tensor idx
    unpacked_of: dict[int, int] = {}  # packed-only outputs -> unpacked idx

    def shape_of(t: int):
        return tensors[t].shape

    def packable(t: int) -> bool:
        s = shape_of(t)
        return (len(s) == 4 and s[0] == 1 and s[1] >= min_hw
                and s[1] % 2 == 0 and s[2] % 2 == 0)

    def get_packed(t: int) -> int | None:
        if t in packed_of:
            return packed_of[t]
        if t not in produced or not packable(t):
            return None
        _, h, w, c = shape_of(t)
        p = add_tensor(f"{tensors[t].name}_s2d", (1, h // 2, w // 2, 4 * c))
        new_ops.append(OpNode("SPACE_TO_DEPTH", [t], [p], {"block": 2}))
        packed_of[t] = p
        return p

    def ensure_unpacked(t: int) -> int:
        if t in unpacked_of:
            return unpacked_of[t]
        if t in packed_of and t not in produced:
            u = add_tensor(f"{tensors[t].name}_d2s", shape_of(t))
            new_ops.append(OpNode("DEPTH_TO_SPACE", [packed_of[t]], [u],
                                  {"block": 2}))
            unpacked_of[t] = u
            return u
        return t

    produced: set[int] = set(graph.inputs)  # tensors with a live unpacked rep
    new_inputs = list(graph.inputs)
    if packed_inputs:
        # The caller feeds 4-D image inputs ALREADY packed (e.g. the Pallas
        # multi-crop kernel's pack=2 output): swap the graph input for a
        # packed-shape tensor; the original only materializes on demand.
        for i, t in enumerate(graph.inputs):
            if packable(t):
                _, h, w, c = shape_of(t)
                p = add_tensor(f"{tensors[t].name}_pin",
                               (1, h // 2, w // 2, 4 * c))
                packed_of[t] = p
                new_inputs[i] = p
                produced.discard(t)
    for idx, info in enumerate(tensors):
        if info.data is not None:
            produced.add(idx)
    produced.update(ge.dequant_of.keys())

    for op in graph.ops:
        name, ins, outs = op.opcode, op.inputs, op.outputs
        out0 = outs[0] if outs else -1

        if name == "CONV_2D" and len(ins) >= 2:
            pin = get_packed(ins[0])
            w = const(ins[1])
            osh = shape_of(out0)
            stride = op.options["stride"]
            if (pin is not None and w is not None and len(osh) == 4
                    and op.options.get("dilation") == (1, 1)
                    and stride in ((1, 1), (2, 2))):
                ish = shape_of(ins[0])
                f_out = 2 if (osh[1] >= min_hw and osh[1] % 2 == 0
                              and osh[2] % 2 == 0) else 1
                s = stride[0]
                if s * f_out in (2, 4):
                    b = const(ins[2]) if len(ins) > 2 and ins[2] >= 0 else None
                    pads = (_tflite_pad(ish[1], w.shape[1], s,
                                        op.options["padding"]),
                            _tflite_pad(ish[2], w.shape[2], s,
                                        op.options["padding"]))
                    out_hw = ((osh[1] // 2, osh[2] // 2) if f_out == 2
                              else (osh[1], osh[2]))
                    wp, bp, sp, padp = _pack_conv_weight(
                        w, b, s, pads, f_out, (ish[1], ish[2]), out_hw)
                    w_idx = add_tensor(f"s2d_w_{out0}", wp.shape, wp)
                    b_idx = (-1 if bp is None
                             else add_tensor(f"s2d_b_{out0}", bp.shape, bp))
                    if f_out == 2:
                        p_out = add_tensor(f"{tensors[out0].name}_p",
                                           (1, osh[1] // 2, osh[2] // 2,
                                            4 * osh[3]))
                        packed_of[out0] = p_out
                        dst = p_out
                    else:
                        dst = out0
                        produced.add(out0)
                    new_ops.append(OpNode(
                        "CONV_2D", [pin, w_idx, b_idx], [dst],
                        dict(stride=(sp, sp), dilation=(1, 1), padding=padp,
                             activation=op.options.get("activation",
                                                       "NONE"))))
                    continue

        elif name == "PRELU" and len(ins) == 2:
            alpha = const(ins[1])
            pin = get_packed(ins[0]) if alpha is not None else None
            if pin is not None:
                at = np.tile(alpha.reshape(-1), 4)
                a_idx = add_tensor(f"s2d_alpha_{out0}", at.shape, at)
                p_out = add_tensor(f"{tensors[out0].name}_p",
                                   shape_of(pin))
                packed_of[out0] = p_out
                new_ops.append(OpNode("PRELU", [pin, a_idx], [p_out],
                                      dict(op.options)))
                continue

        elif name == "ADD" and len(ins) == 2:
            if (shape_of(ins[0]) == shape_of(ins[1])
                    and const(ins[0]) is None and const(ins[1]) is None
                    and (ins[0] in packed_of or ins[1] in packed_of)):
                pa, pb = get_packed(ins[0]), get_packed(ins[1])
                if pa is not None and pb is not None:
                    p_out = add_tensor(f"{tensors[out0].name}_p",
                                       shape_of(pa))
                    packed_of[out0] = p_out
                    new_ops.append(OpNode("ADD", [pa, pb], [p_out],
                                          dict(op.options)))
                    continue

        elif name == "MAX_POOL_2D":
            pin = packed_of.get(ins[0])
            if (pin is not None
                    and op.options.get("filter") == (2, 2)
                    and op.options.get("stride") == (2, 2)):
                # Pool output (i, j) = max over the 4 sub-positions of
                # packed pixel (i, j): a pure channel-group max.
                new_ops.append(OpNode("CHANNEL_GROUP_MAX", [pin], [out0],
                                      {"groups": 4}))
                produced.add(out0)
                continue

        elif name == "PAD":
            padv = const(ins[1])
            pin = (get_packed(ins[0])
                   if (padv is not None and padv.shape == (4, 2)
                       and not padv[:3].any() and padv[3, 0] == 0) else None)
            if pin is not None:
                c_old = shape_of(ins[0])[3]
                p_out = add_tensor(f"{tensors[out0].name}_p",
                                   (1,) + shape_of(pin)[1:3]
                                   + (4 * shape_of(out0)[3],))
                packed_of[out0] = p_out
                new_ops.append(OpNode(
                    "PACKED_CHANNEL_PAD", [pin], [p_out],
                    {"groups": 4, "channels": int(c_old),
                     "pad": int(padv[3, 1])}))
                continue

        # Fallback: run the op unpacked, materializing packed-only inputs.
        rewired = [ensure_unpacked(t) if t >= 0 else t for t in ins]
        new_ops.append(OpNode(name, rewired, list(outs), op.options))
        for t in outs:
            produced.add(t)

    # Graph outputs must exist unpacked.
    tail: list[OpNode] = []
    for t in graph.outputs:
        if t in packed_of and t not in produced:
            u = packed_of[t]
            tail.append(OpNode("DEPTH_TO_SPACE", [u], [t], {"block": 2}))
    new_ops.extend(tail)
    return Graph(tensors, new_ops, new_inputs, list(graph.outputs))


# --- execution ---------------------------------------------------------------


def _act(x: Array, name: str) -> Array:
    if name == "NONE":
        return x
    if name == "RELU":
        return jnp.maximum(x, 0.0)
    if name == "RELU6":
        return jnp.clip(x, 0.0, 6.0)
    if name == "RELU_N1_TO_1":
        return jnp.clip(x, -1.0, 1.0)
    if name == "TANH":
        return jnp.tanh(x)
    raise NotImplementedError(f"activation {name}")


def _dequant(info: TensorInfo, arr: np.ndarray) -> np.ndarray:
    if arr.dtype in (np.float16,):
        return arr.astype(np.float32)
    if arr.dtype in (np.int8, np.uint8) and info.quant is not None:
        if len(info.quant) == 3:
            # Per-channel: broadcast each channel's (scale, zero_point)
            # along the quantized dimension.
            scales, zps, dim = info.quant
            bshape = [1] * arr.ndim
            bshape[dim] = -1
            return ((arr.astype(np.float32) - zps.reshape(bshape))
                    * scales.reshape(bshape))
        scale, zp = info.quant
        return (arr.astype(np.float32) - zp) * scale
    return arr


def _dce(graph: Graph) -> Graph:
    """Drop ops whose outputs nothing consumes and blank the constant data
    of unreferenced tensors.

    The graph transforms (fuse_dw_pw_pairs / space_to_depth_pack) supersede
    weights by appending rewritten copies; without this pass compile_tflite
    would still hoist every original per-layer weight (and its DEQUANTIZE
    source) into the params pytree, holding dead arrays in HBM for the life
    of the model."""
    live: set[int] = set(graph.outputs)
    keep: list[OpNode] = []
    for op in reversed(graph.ops):
        if any(t in live for t in op.outputs):
            keep.append(op)
            live.update(t for t in op.inputs if t >= 0)
    keep.reverse()
    live.update(graph.inputs)
    tensors = [info if (i in live or info.data is None)
               else TensorInfo(info.name, info.shape, info.dtype, None,
                               info.quant)
               for i, info in enumerate(graph.tensors)]
    return Graph(tensors, keep, list(graph.inputs), list(graph.outputs))


def _extract_stem(graph: Graph) -> tuple[Graph, dict | None]:
    """Split off a leading 3x3/stride-2 SAME image-stem conv (+ optional
    PReLU) so it can run as the fused Pallas stem kernel on packed crops
    (pallas/stem_kernel) while the rest of the graph compiles as usual.

    Matches the MediaPipe landmark-net entry pattern (e.g. the face mesh:
    CONV_2D [1,S,S,3]->[1,S/2,S/2,O] stride 2 SAME, then PRELU with
    per-channel alphas).  On a match, returns a graph whose input IS the
    activation tensor after the stem, plus {'w' HWIO, 'b', 'alpha',
    'in_size'}.  No match -> (graph, None) unchanged.
    """
    if len(graph.inputs) != 1:
        return graph, None
    inp = graph.inputs[0]
    ishape = graph.tensors[inp].shape
    if len(ishape) != 4 or ishape[3] != 3 or ishape[1] != ishape[2] \
            or ishape[1] % 2:
        return graph, None

    const = _GraphEdit(graph).const

    conv = next((op for op in graph.ops if op.opcode == "CONV_2D"
                 and op.inputs[0] == inp), None)
    if conv is None:
        return graph, None
    # The stem conv must be the image input's SOLE consumer: re-rooting the
    # graph at the stem output orphans the input tensor, so any other
    # consumer (a parallel normalization/resize branch) would read a tensor
    # no op produces.  Decline extraction instead.
    if any(inp in op.inputs for op in graph.ops if op is not conv):
        return graph, None
    o = conv.options
    if (o.get("stride") != (2, 2) or o.get("padding") != "SAME"
            or o.get("activation") not in ("NONE", "RELU")
            or o.get("dilation", (1, 1)) != (1, 1)):
        return graph, None
    w = const(conv.inputs[1])
    b = const(conv.inputs[2]) if len(conv.inputs) > 2 and \
        conv.inputs[2] >= 0 else None
    if w is None or w.shape[1:3] != (3, 3) or w.shape[3] != 3:
        return graph, None
    cout = w.shape[0]
    if b is None:
        b = np.zeros((cout,), np.float32)

    # Optional PReLU directly after (activation NONE case).
    stem_out = conv.outputs[0]
    alpha = np.zeros((cout,), np.float32)
    consumed = {id(conv)}
    if o.get("activation") == "NONE":
        users = [op for op in graph.ops
                 if stem_out in op.inputs and op is not conv]
        if len(users) != 1 or users[0].opcode != "PRELU":
            return graph, None
        prelu = users[0]
        a = const(prelu.inputs[1])
        if a is None or int(np.prod(a.shape)) != cout:
            return graph, None
        alpha = np.asarray(a, np.float32).reshape(cout)
        stem_out = prelu.outputs[0]
        consumed.add(id(prelu))

    # Drop the consumed ops (and their now-dead weight DEQUANTIZEs via the
    # normal folding path) and re-root the graph at the stem output.
    keep_ops = [op for op in graph.ops if id(op) not in consumed]
    new_graph = Graph(tensors=graph.tensors, ops=keep_ops,
                      inputs=[stem_out], outputs=graph.outputs)
    stem = {
        "w": np.transpose(np.asarray(w, np.float32), (1, 2, 3, 0)),  # HWIO
        "b": np.asarray(b, np.float32),
        "alpha": alpha,
        "in_size": ishape[1],
        "out_channels": cout,
    }
    return new_graph, stem


def compile_tflite(data: bytes, dtype=jnp.float32, layout: str = "NHWC",
                   planar_inputs: bool = False, fuse_dw_pw: bool = False,
                   pack_s2d: int = 0, packed_inputs: bool = False,
                   external_stem: bool = False, fuse_bn: bool = False,
                   fuse_bn_min_hw: int = 96, batch_flexible: bool = False
                   ) -> tuple[Callable[..., list[Array]], dict[str, Array]]:
    """Compile a .tflite model into ``fn(params, *inputs) -> [outputs]`` and
    its weights pytree.

    Constant DEQUANTIZE chains are folded into the weights at load time.
    ``dtype`` casts float weights/compute (e.g. jnp.bfloat16 for the MXU).

    ``layout="NCHW"`` stores activations planar ([N, C, H, W]) between ops
    while keeping the external NHWC I/O contract; ``planar_inputs=True``
    additionally makes the compiled fn take its 4-D image inputs already
    planar (so an upstream planar producer — e.g. the Pallas multi-crop
    kernel — feeds the net without a transpose round-trip).  This is the TPU-native
    layout for these tiny-channel vision nets: NHWC buffers put channels
    (8-32) in sublanes and batch in lanes, padding both tile dimensions
    (measured 2.7x HBM traffic inflation on the face-mesh graph at batch
    64); planar buffers tile (H, W) exactly at any batch/channel count.
    Convolution outputs are emitted in the compute dtype (one rounding after
    the MXU's f32 accumulation), halving conv traffic again under bf16.
    """
    graph = parse_tflite(data)
    stem_meta = None
    if external_stem:
        graph, stem_meta = _extract_stem(graph)
    if fuse_bn:
        # Before fuse_dw_pw: the bottleneck matcher must claim its
        # dw -> 1x1-up pairs before the generic pair fusion rewrites them.
        graph = fuse_bottlenecks(graph, min_hw=fuse_bn_min_hw)
        # DCE first: dead DEQUANTIZE ops of the fused weights sit between
        # consecutive PALLAS_BN ops and would break the adjacency scan.
        graph = chain_bottlenecks(_dce(graph))
    if fuse_dw_pw:
        graph = fuse_dw_pw_pairs(graph)
    if pack_s2d:
        graph = space_to_depth_pack(graph, min_hw=pack_s2d,
                                    packed_inputs=packed_inputs)
    if fuse_bn or fuse_dw_pw or pack_s2d or stem_meta is not None:
        graph = _dce(graph)

    params: dict[str, Array] = {}
    const_keys: dict[int, str] = {}
    # Fold constant-input DEQUANTIZE ops.
    dequant_of: dict[int, int] = {}
    for op in graph.ops:
        if op.opcode == "DEQUANTIZE":
            src = op.inputs[0]
            if graph.tensors[src].data is not None:
                dequant_of[op.outputs[0]] = src

    def const_value(idx: int) -> np.ndarray | None:
        if idx in dequant_of:
            src = dequant_of[idx]
            return _dequant(graph.tensors[src], graph.tensors[src].data)
        info = graph.tensors[idx]
        if info.data is None:
            return None
        return info.data

    # Raw f16/int8 weight tensors whose ONLY consumers are folded
    # DEQUANTIZE ops would otherwise be hoisted alongside their dequantized
    # copies — measured 50% dead duplicate weight bytes on the face mesh.
    consumers: dict[int, set[str]] = {}
    for op in graph.ops:
        for t in op.inputs:
            if t >= 0:
                consumers.setdefault(t, set()).add(
                    "folded" if (op.opcode == "DEQUANTIZE"
                                 and op.outputs[0] in dequant_of)
                    else op.opcode)
    folded_sources = {src for out, src in dequant_of.items()
                      if consumers.get(src) == {"folded"}
                      and src not in graph.outputs}

    for idx, info in enumerate(graph.tensors):
        if idx in folded_sources:
            continue
        val = const_value(idx)
        if val is None:
            continue
        key = f"{idx}:{info.name}"
        # Params stay NUMPY at build: construction-time eager uploads were
        # one tunnel dispatch per const (hundreds for the face mesh), and
        # downstream packing helpers must read weights without a D2H
        # (tools/poisonprobe.py).  InferenceRunner device_puts the whole
        # pytree once at the end of construction.
        if np.issubdtype(np.asarray(val).dtype, np.floating):
            params[key] = np.asarray(val, np.float32).astype(dtype)
        elif (np.asarray(val).dtype in (np.int8, np.uint8)
              and info.quant is not None):
            # Hybrid dynamic-range graphs (TF>=2.20 converter) feed int8
            # weight constants DIRECTLY into float conv/FC ops — no
            # DEQUANTIZE node to fold.  This float-executing compiler
            # dequantizes them at hoist time (per-channel scales included);
            # the interpreter's extra activation-quantization noise is why
            # int8 parity tests gate at percent, not 1e-5, level.
            params[key] = _dequant(info, np.asarray(val)).astype(dtype)
        else:
            params[key] = np.asarray(val)
        const_keys[idx] = key

    input_shapes = [graph.tensors[i].shape for i in graph.inputs]

    nchw = layout == "NCHW"
    if layout not in ("NHWC", "NCHW"):
        raise ValueError(f"unknown layout {layout}")
    # NHWC axis -> NCHW axis, for remapping concat axes / reduction axes.
    _AX = {0: 0, 1: 2, 2: 3, 3: 1}

    def fn(p: dict[str, Array], *inputs: Array) -> list[Array]:
        if len(inputs) != len(graph.inputs):
            raise ValueError(f"expected {len(graph.inputs)} inputs")
        env: dict[int, Array] = {}
        lay: dict[int, bool] = {}  # idx -> stored planar (NCHW)
        for idx, key in const_keys.items():
            env[idx] = p[key]
        for idx, x in zip(graph.inputs, inputs):
            x = jnp.asarray(x, dtype)
            env[idx] = x
            if planar_inputs and nchw and x.ndim == 4:
                lay[idx] = True

        def get(i: int) -> Array:
            """Tensor in its NHWC-contract form (transposing back if the
            stored copy is planar)."""
            x = env[i]
            if lay.get(i):
                x = jnp.transpose(x, (0, 2, 3, 1))
            return x

        def get_planar(i: int) -> Array:
            """Tensor as [N, C, H, W] (right-aligning sub-4D shapes by NHWC
            broadcast semantics first)."""
            x = env[i]
            if lay.get(i):
                return x
            if x.ndim < 4:
                x = x.reshape((1,) * (4 - x.ndim) + x.shape)
            return jnp.transpose(x, (0, 3, 1, 2))

        def put(i: int, x: Array, planar: bool = False) -> None:
            env[i] = x
            if planar:
                lay[i] = True

        def ew_operands(ins_: list[int]) -> tuple[list[Array], bool]:
            """Elementwise operands in a common layout: planar if any operand
            is stored planar (constants get right-aligned + transposed, which
            folds at compile time), NHWC otherwise."""
            if nchw and any(lay.get(i) for i in ins_):
                return [get_planar(i) for i in ins_], True
            return [get(i) for i in ins_], False

        def np_const(i: int) -> np.ndarray:
            v = const_value(i)
            if v is None:
                raise NotImplementedError("dynamic shape operand")
            return np.asarray(v)

        for op in graph.ops:
            name, ins, outs, o = op.opcode, op.inputs, op.outputs, op.options
            if name == "DEQUANTIZE":
                if outs[0] in dequant_of:
                    continue  # folded constant
                put(outs[0], env[ins[0]].astype(dtype), lay.get(ins[0], False))
            elif name == "CONV_2D":
                x = get_planar(ins[0]) if nchw else get(ins[0])
                w = get(ins[1])
                # TFLite weights: [out, kh, kw, in] -> HWIO
                wt = jnp.transpose(w, (1, 2, 3, 0))
                dn = ("NCHW", "HWIO", "NCHW") if nchw else ("NHWC", "HWIO", "NHWC")
                y = jax.lax.conv_general_dilated(
                    x, wt, window_strides=o["stride"], padding=o["padding"],
                    rhs_dilation=o["dilation"],
                    dimension_numbers=dn,
                    preferred_element_type=dtype).astype(dtype)
                if len(ins) > 2 and ins[2] >= 0:
                    b = get(ins[2])
                    y = y + (b.reshape(-1, 1, 1) if nchw else b)
                put(outs[0], _act(y, o["activation"]), nchw)
            elif name == "DEPTHWISE_CONV_2D":
                x = get_planar(ins[0]) if nchw else get(ins[0])
                w = get(ins[1])
                cin = x.shape[1] if nchw else x.shape[-1]
                mult = o["depth_multiplier"]
                # TFLite weights: [1, kh, kw, in*mult] -> HWIO with groups=in
                wt = jnp.transpose(w, (1, 2, 0, 3))
                wt = wt.reshape(w.shape[1], w.shape[2], 1, cin * mult)
                dn = ("NCHW", "HWIO", "NCHW") if nchw else ("NHWC", "HWIO", "NHWC")
                y = jax.lax.conv_general_dilated(
                    x, wt, window_strides=o["stride"], padding=o["padding"],
                    rhs_dilation=o["dilation"], feature_group_count=cin,
                    dimension_numbers=dn,
                    preferred_element_type=dtype).astype(dtype)
                if len(ins) > 2 and ins[2] >= 0:
                    b = get(ins[2])
                    y = y + (b.reshape(-1, 1, 1) if nchw else b)
                put(outs[0], _act(y, o["activation"]), nchw)
            elif name == "TRANSPOSE_CONV":
                out_shape = np_const(ins[0])
                w = get(ins[1])
                x = get_planar(ins[2]) if nchw else get(ins[2])
                # TFLite weights: [out, kh, kw, in] -> gradient-conv HWIO.
                wt = jnp.transpose(w, (1, 2, 3, 0))  # H W I O
                dn = ("NCHW", "HWIO", "NCHW") if nchw else ("NHWC", "HWIO", "NHWC")
                # The op's EXPLICIT output shape is authoritative: SAME
                # with stride > 1 admits several legal sizes, and TFLite
                # derives the padding from the declared one (lax.
                # conv_transpose would silently substitute in*stride).
                # Gradient-of-conv form: dilate the input by the stride,
                # pad (k-1-before, k-1-after), correlate with the
                # spatially-flipped kernel.
                sh, sw = o["stride"]
                kh, kw = int(wt.shape[0]), int(wt.shape[1])
                oh, ow = int(out_shape[1]), int(out_shape[2])
                in_h = x.shape[2] if nchw else x.shape[1]
                in_w = x.shape[3] if nchw else x.shape[2]
                pads = []
                for in_sz, out_sz, k, st in ((in_h, oh, kh, sh),
                                             (in_w, ow, kw, sw)):
                    total = (max((in_sz - 1) * st + k - out_sz, 0)
                             if o["padding"] == "SAME" else 0)
                    before = total // 2
                    pads.append((k - 1 - before, k - 1 - (total - before)))
                y = jax.lax.conv_general_dilated(
                    x, jnp.flip(wt, (0, 1)), window_strides=(1, 1),
                    padding=pads, lhs_dilation=o["stride"],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32).astype(dtype)
                got_hw = ((y.shape[2], y.shape[3]) if nchw
                          else (y.shape[1], y.shape[2]))
                if got_hw != (oh, ow):
                    raise ValueError(
                        f"TRANSPOSE_CONV output {got_hw} != declared "
                        f"({oh}, {ow})")
                if len(ins) > 3 and ins[3] >= 0:
                    b = get(ins[3])
                    y = y + (b.reshape(-1, 1, 1) if nchw else b)
                put(outs[0], y, nchw)
            elif name in ("MAX_POOL_2D", "AVERAGE_POOL_2D"):
                x = get_planar(ins[0]) if nchw else get(ins[0])
                if nchw:
                    window = (1, 1) + o["filter"]
                    strides = (1, 1) + o["stride"]
                else:
                    window = (1,) + o["filter"] + (1,)
                    strides = (1,) + o["stride"] + (1,)
                if name == "MAX_POOL_2D":
                    y = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, window, strides, o["padding"])
                else:
                    s = jax.lax.reduce_window(
                        x, 0.0, jax.lax.add, window, strides, o["padding"])
                    c = jax.lax.reduce_window(
                        jnp.ones_like(x), 0.0, jax.lax.add, window, strides,
                        o["padding"])
                    y = s / c
                put(outs[0], _act(y.astype(dtype), o["activation"]), nchw)
            elif name in ("PAD", "MIRROR_PAD"):
                pads = [(int(a), int(b)) for a, b in np_const(ins[1])]
                mode = "reflect" if name == "MIRROR_PAD" else "constant"
                if nchw and len(pads) == 4:
                    x = get_planar(ins[0])
                    pads = [pads[0], pads[3], pads[1], pads[2]]
                    put(outs[0], jnp.pad(x, pads, mode=mode), True)
                else:
                    put(outs[0], jnp.pad(get(ins[0]), pads, mode=mode))
            elif name in ("ADD", "SUB", "MUL", "DIV", "MAXIMUM", "MINIMUM",
                          "SQUARED_DIFFERENCE", "PRELU"):
                (a, b), planar = ew_operands([ins[0], ins[1]])
                if name == "SQUARED_DIFFERENCE":
                    y = (a - b) * (a - b)
                elif name == "PRELU":
                    y = jnp.where(a >= 0, a, a * b)
                else:
                    y = {"ADD": jnp.add, "SUB": jnp.subtract,
                         "MUL": jnp.multiply, "DIV": jnp.divide,
                         "MAXIMUM": jnp.maximum,
                         "MINIMUM": jnp.minimum}[name](a, b)
                put(outs[0], _act(y, o.get("activation", "NONE")), planar)
            elif name in ("NEG", "SQRT", "RSQRT", "RELU", "RELU6",
                          "LEAKY_RELU", "LOGISTIC", "TANH", "HARD_SWISH",
                          "EXP"):
                x = env[ins[0]]
                y = {
                    "NEG": lambda v: -v,
                    "SQRT": jnp.sqrt,
                    "RSQRT": jax.lax.rsqrt,
                    "RELU": lambda v: jnp.maximum(v, 0.0),
                    "RELU6": lambda v: jnp.clip(v, 0.0, 6.0),
                    "LEAKY_RELU": lambda v: jnp.where(v >= 0, v, 0.01 * v),
                    "LOGISTIC": jax.nn.sigmoid,
                    "TANH": jnp.tanh,
                    "HARD_SWISH": lambda v: v * jnp.clip(v + 3.0, 0.0, 6.0) / 6.0,
                    "EXP": jnp.exp,
                }[name](x)
                put(outs[0], y, lay.get(ins[0], False))
            elif name == "SOFTMAX":
                put(outs[0], jax.nn.softmax(get(ins[0]) * o.get("beta", 1.0),
                                            axis=-1))
            elif name == "RESHAPE":
                x = get(ins[0])
                shape = o.get("new_shape")
                if shape is None:
                    shape = tuple(int(v) for v in np_const(ins[1]))
                if (batch_flexible and len(shape) and shape[0] == 1
                        and all(d != -1 for d in shape[1:])):
                    # batch_flexible: the graph's static batch-1 reshapes
                    # follow the real batch (every other op in these nets
                    # is batch-covariant), so ONE compiled fn serves any
                    # leading batch — the runner feeds whole stream
                    # batches without vmap, which is what lets the Pallas
                    # ops see the full batch as their grid.
                    shape = (-1,) + tuple(shape[1:])
                put(outs[0], jnp.reshape(x, shape))
            elif name == "TRANSPOSE":
                perm = tuple(int(v) for v in np_const(ins[1]))
                put(outs[0], jnp.transpose(get(ins[0]), perm))
            elif name == "CONCATENATION":
                if nchw and any(lay.get(i) for i in ins):
                    axis = _AX[o["axis"] % 4]
                    put(outs[0], jnp.concatenate(
                        [get_planar(i) for i in ins], axis=axis), True)
                else:
                    put(outs[0], jnp.concatenate([get(i) for i in ins],
                                                 axis=o["axis"]))
            elif name in ("MEAN", "SUM", "REDUCE_MAX"):
                axes = tuple(int(v) for v in np.atleast_1d(np_const(ins[1])))
                red = {"MEAN": jnp.mean, "SUM": jnp.sum,
                       "REDUCE_MAX": jnp.max}[name]
                keep = o.get("keep_dims", False)
                ax_set = {a % 4 for a in axes}
                # Planar shortcut only where the squeezed result keeps the
                # same dim order as NHWC ({H,W} -> [N,C]; {C} -> [N,H,W]),
                # or under keepdims (result stays rank-4 planar).
                if lay.get(ins[0]) and (keep or ax_set in ({1, 2}, {3})):
                    axes_p = tuple(_AX[a % 4] for a in axes)
                    put(outs[0], red(env[ins[0]], axis=axes_p, keepdims=keep),
                        keep)
                else:
                    put(outs[0], red(get(ins[0]), axis=axes, keepdims=keep))
            elif name == "STRIDED_SLICE":
                x = get(ins[0])
                begin = np_const(ins[1]).astype(int)
                end = np_const(ins[2]).astype(int)
                strides = np_const(ins[3]).astype(int)
                if o["ellipsis_mask"] or o["new_axis_mask"]:
                    raise NotImplementedError("strided_slice masks")
                idx = []
                for d in range(len(begin)):
                    b = None if (o["begin_mask"] >> d) & 1 else int(begin[d])
                    e = None if (o["end_mask"] >> d) & 1 else int(end[d])
                    if (o["shrink_axis_mask"] >> d) & 1:
                        idx.append(int(begin[d]))
                    else:
                        idx.append(slice(b, e, int(strides[d])))
                env[outs[0]] = x[tuple(idx)]
            elif name == "SLICE":
                x = get(ins[0])
                begin = np_const(ins[1]).astype(int)
                size = np_const(ins[2]).astype(int)
                idx = tuple(slice(int(b), None if s == -1 else int(b + s))
                            for b, s in zip(begin, size))
                env[outs[0]] = x[idx]
            elif name in ("RESIZE_BILINEAR", "RESIZE_NEAREST_NEIGHBOR"):
                hw = tuple(int(v) for v in np_const(ins[1]))
                planar = bool(nchw and lay.get(ins[0])
                              and (name == "RESIZE_NEAREST_NEIGHBOR"
                                   or o["half_pixel_centers"]))
                if planar:
                    x = env[ins[0]]
                    shape = (x.shape[0], x.shape[1], hw[0], hw[1])
                else:
                    x = get(ins[0])
                    shape = (x.shape[0], hw[0], hw[1], x.shape[3])
                if name == "RESIZE_NEAREST_NEIGHBOR":
                    put(outs[0], _resize_nearest_mm(
                        x, hw, o["half_pixel_centers"], o["align_corners"],
                        planar), planar)
                elif o["half_pixel_centers"]:
                    # MXU interpolation matmuls, not jax.image.resize:
                    # gathers are element-serial on TPU, and jax.image
                    # antialias-filters downscales where TFLite does not.
                    resized = (warp.resize_bilinear_planar(x, *hw) if planar
                               else warp.resize_bilinear_nhwc(x, *hw))
                    put(outs[0], resized.astype(dtype), planar)
                else:
                    # align_corners / asymmetric bilinear via explicit gather.
                    put(outs[0], _resize_bilinear_legacy(
                        x, hw, o["align_corners"]).astype(dtype))
            elif name == "FULLY_CONNECTED":
                x, w = get(ins[0]), get(ins[1])
                y = jnp.einsum("...i,oi->...o", x, w,
                               preferred_element_type=jnp.float32).astype(dtype)
                if len(ins) > 2 and ins[2] >= 0:
                    y = y + get(ins[2])
                put(outs[0], _act(y, o["activation"]))
            # --- space_to_depth_pack pseudo-ops (see space_to_depth_pack) ---
            elif name == "SPACE_TO_DEPTH":
                x = get(ins[0])
                n, h, w, c = x.shape
                y = x.reshape(n, h // 2, 2, w // 2, 2, c)
                y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
                put(outs[0], y.reshape(n, h // 2, w // 2, 4 * c))
            elif name == "DEPTH_TO_SPACE":
                x = get(ins[0])
                n, h, w, c4 = x.shape
                c = c4 // 4
                y = x.reshape(n, h, w, 2, 2, c)
                y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
                put(outs[0], y.reshape(n, 2 * h, 2 * w, c))
            elif name == "CHANNEL_GROUP_MAX":
                x = get(ins[0])
                n, h, w, cg = x.shape
                g = o["groups"]
                put(outs[0], jnp.max(x.reshape(n, h, w, g, cg // g), axis=3))
            elif name == "PALLAS_BN":
                # Fused bottleneck residual unit (fuse_bottlenecks):
                # two MXU dots per crop, VMEM-resident.
                from bp_from_video_tpu.pallas import block_kernel as bk
                x = get_planar(ins[0]).astype(dtype)
                r = get_planar(ins[1]).astype(dtype)
                y = bk.bottleneck_s1(
                    x, r, get(ins[2]).astype(dtype), get(ins[3]),
                    get(ins[4]), get(ins[5]).astype(dtype), get(ins[6]),
                    get(ins[7]), last_act=o["last_act"])
                put(outs[0], y.astype(dtype), True)
            elif name == "PALLAS_BN_CHAIN":
                # A whole stage of self-residual bottleneck units in one
                # VMEM-resident kernel (chain_bottlenecks).
                from bp_from_video_tpu.pallas import block_kernel as bk
                x = get_planar(ins[0]).astype(dtype)
                y = bk.bottleneck_chain(
                    x, get(ins[1]).astype(dtype), get(ins[2]),
                    get(ins[3]), get(ins[4]).astype(dtype), get(ins[5]),
                    get(ins[6]), last_act=o["last_act"])
                put(outs[0], y.astype(dtype), True)
            elif name == "PACKED_CHANNEL_PAD":
                x = get(ins[0])
                n, h, w, _ = x.shape
                g, c_old, padc = o["groups"], o["channels"], o["pad"]
                y = x.reshape(n, h, w, g, c_old)
                y = jnp.pad(y, ((0, 0),) * 3 + ((0, 0), (0, padc)))
                put(outs[0], y.reshape(n, h, w, g * (c_old + padc)))
            else:
                raise NotImplementedError(f"TFLite op {name}")
        return [get(i) for i in graph.outputs]

    fn.input_shapes = input_shapes  # type: ignore[attr-defined]
    fn.output_shapes = [graph.tensors[i].shape  # type: ignore[attr-defined]
                        for i in graph.outputs]
    fn.graph = graph                # type: ignore[attr-defined]
    if stem_meta is not None:
        # The externalized stem's weights ride in the params pytree; the
        # caller runs pallas/stem_kernel.stem_packed(crops, w, b, alpha)
        # and feeds the result as the compiled fn's (planar) input.
        for name in ("w", "b", "alpha"):
            params[f"__stem__:{name}"] = jnp.asarray(stem_meta[name], dtype)
        fn.external_stem_meta = {      # type: ignore[attr-defined]
            "in_size": stem_meta["in_size"],
            "out_channels": stem_meta["out_channels"],
            "params": {n: f"__stem__:{n}" for n in ("w", "b", "alpha")},
        }
    return fn, params


def _nearest_index(out_len: int, in_len: int, half_pixel: bool,
                   align_corners: bool) -> np.ndarray:
    """TFLite RESIZE_NEAREST_NEIGHBOR source index per output position
    (reference kernel semantics for each flag combination)."""
    o = np.arange(out_len, dtype=np.float64)
    if align_corners and out_len > 1:
        # TfLiteRound = half away from zero (np.round is half-to-even, and
        # o*(in-1)/(out-1) hits exact .5s); indices are >= 0 so +0.5/floor.
        offset = 0.5 if half_pixel else 0.0
        idx = np.floor(
            (o + offset) * (in_len - 1) / (out_len - 1) - offset + 0.5)
    elif half_pixel:
        idx = np.floor((o + 0.5) * in_len / out_len)
    else:
        idx = np.floor(o * in_len / out_len)
    return np.clip(idx.astype(np.int64), 0, in_len - 1)


def _resize_nearest_mm(x: Array, hw: tuple[int, int], half_pixel: bool,
                       align_corners: bool, planar: bool) -> Array:
    """RESIZE_NEAREST_NEIGHBOR as one-hot selection matmuls — the last
    gather-based resize in the compiler (gathers are element-serial on
    TPU); exact TFLite index semantics via _nearest_index."""
    nh, nw = hw
    if planar:
        h, w = x.shape[-2], x.shape[-1]
    else:
        _, h, w, _ = x.shape
    if not jnp.issubdtype(x.dtype, jnp.floating):  # pragma: no cover
        # Integer feature maps: one-hot matmul accumulation would change
        # dtype semantics; take the (exact) indexed rows instead.
        iy, ix = _nearest_index(nh, h, half_pixel, align_corners), \
            _nearest_index(nw, w, half_pixel, align_corners)
        return (x[..., iy, :][..., ix] if planar
                else x[:, iy][:, :, ix])
    wy = jax.nn.one_hot(_nearest_index(nh, h, half_pixel, align_corners),
                        h, dtype=x.dtype)                      # [oh, H]
    wx = jax.nn.one_hot(_nearest_index(nw, w, half_pixel, align_corners),
                        w, dtype=x.dtype)                      # [ow, W]
    if planar:
        t = jnp.einsum("...hw,oh->...ow", x, wy)
        return jnp.einsum("...hw,pw->...hp", t, wx)
    t = jnp.einsum("bhwc,oh->bowc", x, wy)
    return jnp.einsum("bhwc,pw->bhpc", t, wx)


def _resize_bilinear_legacy(x: Array, hw: tuple[int, int],
                            align_corners: bool) -> Array:
    """TFLite RESIZE_BILINEAR without half-pixel centers (align-corners or
    asymmetric coordinates), as the same edge-clamped interpolation-matrix
    matmuls the half-pixel path uses (warp.interp_matrix): the triangular
    kernel with clamped sample coordinates reproduces the clamped
    floor/floor+1 two-tap blend exactly, with no gathers."""
    from bp_from_video_tpu.models.warp import interp_matrix
    _, h, w, _ = x.shape
    nh, nw = hw
    if align_corners and nh > 1 and nw > 1:
        ys = jnp.linspace(0.0, h - 1.0, nh)
        xs = jnp.linspace(0.0, w - 1.0, nw)
    else:
        ys = jnp.arange(nh) * (h / nh)
        xs = jnp.arange(nw) * (w / nw)
    wy = interp_matrix(ys, h, "edge").astype(x.dtype)   # [oh, H]
    wx = interp_matrix(xs, w, "edge").astype(x.dtype)   # [ow, W]
    t = jnp.einsum("bhwc,oh->bowc", x, wy,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("bhwc,pw->bhpc", t, wx,
                      preferred_element_type=jnp.float32).astype(x.dtype)


# --- asset loading -----------------------------------------------------------


def load_task_bundle(path: str) -> dict[str, bytes]:
    """Unpack a MediaPipe .task zip bundle into {filename: tflite bytes}
    (the reference ships face_landmarker.task; inference_runner.py:62)."""
    out = {}
    with zipfile.ZipFile(path) as z:
        for name in z.namelist():
            if name.endswith(".tflite"):
                out[name] = z.read(name)
    return out


def load_tflite_file(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()
