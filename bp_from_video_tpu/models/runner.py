"""The fused TPU inference runner — the reference's InferenceRunner
(inference_runner.py:56-188) rebuilt as one pure jitted function over all
enabled models, with detect-then-track VIDEO semantics carried in an explicit
state pytree instead of MediaPipe's hidden C++ graph state.

Per frame:  face detector (standalone) / face landmarker (internal detector +
mesh, tracked) / hand landmarker (palm detector + per-hand landmark net,
tracked) / person segmenter — all compiled from the real TFLite weights when
the asset files exist (models/tflite_compiler.py), falling back to
randomly-initialized architecture stand-ins otherwise (models/blaze.py;
the hand/segmenter blobs are absent from the reference snapshot).

Outputs use the reference's pixel-integer contract: landmark coordinates are
clipped to the frame then truncated (inference_runner.py:108-110, :126-129,
:145-148), bboxes are landmark min/max for landmarkers and the detection box
for the face detector, detections sorted by area descending.
"""

from __future__ import annotations

import logging
import os
import zlib
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bp_from_video_tpu.config import InferenceConfig, RunningMode
from bp_from_video_tpu.models import anchors as anchors_lib
from bp_from_video_tpu.models import blaze, detection, warp
from bp_from_video_tpu.models import tflite_compiler as tc
from bp_from_video_tpu.models.detection import NMSOut
from bp_from_video_tpu.ops.roi import Detections, is_planar_frames as roi_is_planar

Array = jax.Array

logger = logging.getLogger(__name__)

NUM_FACE_LANDMARKS = 478
NUM_HAND_LANDMARKS = 21
NUM_FACE_DET_KPS = 6
NUM_PALM_KPS = 7
MAX_FACE_DETS = 4
SEG_CLASSES = 6
# Selfie-multiclass class index the live pipeline consumes: face-skin
# (reference drawer.py:99 blends confidence_masks[3] into the frame).
SEG_SKIN_CLASS = 3
PRESENCE_THRESHOLD = 0.5


def _rect_iou_matrix(a: Array, b: Array) -> Array:
    """Pairwise IoU of (cx, cy, w, h[, rot]) rects, rotation ignored —
    MediaPipe's association calculator compares norm rects the same way."""
    ax0, ay0 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax1, ay1 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx0, by0 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx1, by1 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    ix = jnp.maximum(0.0, jnp.minimum(ax1[:, None], bx1[None, :])
                     - jnp.maximum(ax0[:, None], bx0[None, :]))
    iy = jnp.maximum(0.0, jnp.minimum(ay1[:, None], by1[None, :])
                     - jnp.maximum(ay0[:, None], by0[None, :]))
    inter = ix * iy
    area_a = (ax1 - ax0) * (ay1 - ay0)
    area_b = (bx1 - bx0) * (by1 - by0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def _associate_hand_dets(tracking: Array, t_rects: Array, det_rects: Array,
                         det_valid: Array, iou_thr: float = 0.5
                         ) -> tuple[Array, Array]:
    """Fill LOST hand slots from palm detections with track association.

    MediaPipe's graph suppresses detections overlapping already-tracked
    rects before refilling (association calculator, min_similarity 0.5);
    without it, a slot that loses its hand re-acquires the detector's
    top-score hand — usually the one the OTHER slot still tracks — and
    both slots track one physical hand forever.  Remaining detections are
    assigned to lost slots in rank order (r-th lost slot takes the r-th
    unsuppressed detection).  Returns (rects [nh, 5], slot_ok [nh])."""
    ious = _rect_iou_matrix(det_rects, t_rects)             # [nd, nt]
    sup = jnp.any((ious > iou_thr) & tracking[None, :], axis=1)
    free_det = det_valid & ~sup
    det_rank = jnp.cumsum(free_det) - 1
    lost = ~tracking
    slot_rank = jnp.cumsum(lost) - 1
    match = (lost[:, None] & free_det[None, :]
             & (slot_rank[:, None] == det_rank[None, :]))   # [nh, nd]
    got = jnp.any(match, axis=1)
    # Zero invalid/unselected det rows BEFORE the select-matmul: unfilled
    # NMS slots carry NaN rects and 0 * NaN = NaN would poison every sum.
    det_clean = jnp.where(free_det[:, None], jnp.nan_to_num(det_rects), 0.0)
    new_rect = match.astype(det_rects.dtype) @ det_clean
    # Unfilled slots carry NaN rects — _safe_rect's centered default takes
    # over for the (masked-out) crop, as in the pre-association layout.
    rects = jnp.where(tracking[:, None], t_rects,
                      jnp.where(got[:, None], new_rect,
                                jnp.float32(jnp.nan)))
    return rects, tracking | got


def skin_confidence(seg_conf):
    """The face-skin confidence mask from ``seg_conf`` in either layout:
    [..., 6, H, W] (seg_full_masks=True) or [..., 1, H, W] (skin-only
    operating point).  Works batched and solo.  Any other channel count
    fails loudly rather than silently picking the wrong mask."""
    c = seg_conf.shape[-3]
    if c not in (1, SEG_CLASSES):
        raise ValueError(f"seg_conf has {c} channels; expected 1 "
                         f"(skin-only) or {SEG_CLASSES} (full masks)")
    return seg_conf[..., min(SEG_SKIN_CLASS, c - 1), :, :]

# Tracking-rect anchor landmarks: face = outer eye corners, hand = wrist ->
# middle-finger MCP (the MediaPipe landmarks-to-ROI conventions).
FACE_ROT_LANDMARKS = (33, 263)
HAND_ROT_LANDMARKS = (0, 9)


class TrackState(NamedTuple):
    """Detect-then-track state (replaces MediaPipe VIDEO-mode hidden state)."""

    face_rect: Array       # [5] (cx, cy, w, h, rot) in pixels
    face_tracking: Array   # bool scalar
    hand_rects: Array      # [max_hands, 5]
    hand_tracking: Array   # bool [max_hands]
    # Detector-scheduling ages (int32, per stream): frames spent needing a
    # detection without being served by the bounded sub-batch.  0 while
    # tracking or once served; the sub-batch serves the most-starved streams
    # first, so no stream starves (see predict_batch).
    face_det_age: Array
    hand_det_age: Array


class ModelResults(NamedTuple):
    """Per-frame outputs for all four models (reference InferenceResults,
    inference_runner.py:34-43). Disabled models hold empty placeholders."""

    face_detector: Detections
    face_landmarker: Detections
    hand_landmarker: Detections
    seg_class: Array   # int32 category mask: [H, W] frame-res, or model-res
    #                    when seg_full_masks=False (or [0,0] disabled)
    seg_conf: Array    # f32 confidence masks [6, H, W]; [1, H, W] skin-only
    #                    when seg_full_masks=False (or [0,0,0] disabled)
    seg_valid: Array   # bool scalar

    def model_outputs(self):
        """The reference's 4-way iteration order (InferenceResults.__iter__,
        inference_runner.py:42-43)."""
        return (self.face_detector, self.face_landmarker,
                self.hand_landmarker, (self.seg_class, self.seg_conf))


def _seed(key: str) -> int:
    """Deterministic stand-in weight seed (``hash()`` is PYTHONHASHSEED-
    salted: multi-host SPMD would build different 'replicated' weights per
    host, and runs would not reproduce across restarts)."""
    return zlib.crc32(key.encode()) % 2**31


def _rect_arr(r: warp.Rect) -> Array:
    return jnp.stack([r.cx, r.cy, r.w, r.h, r.rotation])


def _arr_rect(a: Array) -> warp.Rect:
    return warp.Rect(a[0], a[1], a[2], a[3], a[4])


def _clip_floor(pts: Array, width: int, height: int) -> Array:
    """Reference pixel contract: clip to [0, dim-1] then truncate to int
    (inference_runner.py:108-110)."""
    x = jnp.floor(jnp.clip(pts[..., 0], 0, width - 1))
    y = jnp.floor(jnp.clip(pts[..., 1], 0, height - 1))
    return jnp.stack([x, y], axis=-1)


def _pack_s2d_crop(x: Array) -> Array:
    """Plain planar crop [C, S, S] -> 2x2 space-to-depth packed
    [4C, S/2, S/2] in the multi-crop kernel's parity-major channel order
    ((a*2+b)*C + c) — the layout packed-input nets consume."""
    c, sh, sw = x.shape
    x = x.reshape(c, sh // 2, 2, sw // 2, 2)
    x = jnp.transpose(x, (2, 4, 0, 1, 3))
    return x.reshape(4 * c, sh // 2, sw // 2)


def _safe_rect(a: Array, width: int, height: int) -> warp.Rect:
    """Replace non-finite rect entries with a frame-centered default so crop
    gathers stay in-range (results are masked out downstream)."""
    default = jnp.asarray([width / 2, height / 2, width, height, 0.0], jnp.float32)
    a = jnp.where(jnp.isfinite(a), a, default)
    return _arr_rect(a)


def _pow2_ladder(m: int) -> list[int]:
    """[1, 2, 4, ...] capped by (and always ending at) ``m`` — the static
    sub-batch sizes a scalar switch picks from so a compacted gather pays
    for the gated count's power-of-two, not the full budget."""
    out = []
    p = 1
    while p < m:
        out.append(p)
        p *= 2
    out.append(m)
    return out


class InferenceRunner:
    """Builds the compiled model set and exposes a pure ``predict`` step.

    Host-side construction (asset loading, TFLite compilation) happens once;
    ``predict(params, state, frame_rgb)`` is pure and jit/vmap-friendly.
    Mirrors the reference constructor surface (model enable flags, asset
    paths, running mode — inference_runner.py:58-76).
    """

    def __init__(self, cfg: InferenceConfig, frame_height: int,
                 frame_width: int, asset_dir: str | None = None,
                 dtype=jnp.float32) -> None:
        self.cfg = cfg
        self.h, self.w = frame_height, frame_width
        self.dtype = dtype
        self.params: dict[str, Any] = {}
        self._fns: dict[str, Callable] = {}
        self._packed_in: dict[str, bool] = {}  # nets taking s2d-packed crops
        #: key -> fused-Pallas-stem source: {"kind": "standin"} (blaze
        #: params carry their own 'stem') or {"kind": "external",
        #: "params": {name: params-key}} (stem split out of a real TFLite
        #: graph by tflite_compiler._extract_stem).
        self._stem_src: dict[str, dict] = {}
        self._trunk_specs: dict[str, tuple] = {}
        #: key -> True when compiled from a real TFLite blob, False when a
        #: random-init stand-in is in use (VERDICT.md Missing #1/#2: stand-in
        #: fallbacks must be loud and observable, never silent).
        self.real_weights: dict[str, bool] = {}
        #: key -> True when a TRAINED procedural stand-in replaced the
        #: random init (real_weights stays False — the weights only know
        #: synthetic SDF scenes, not the real model's distribution).
        self.trained_standin: dict[str, bool] = {}
        asset_dir = asset_dir or "."

        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))

        def resolve(p):
            if p is None:
                return None
            for cand in (p, os.path.join(asset_dir, p),
                         os.path.join(repo_root, p),
                         os.path.join("/root/reference", p)):
                if os.path.exists(cand):
                    return cand
            return None

        self.face_anchors = jnp.asarray(
            anchors_lib.generate_anchors(anchors_lib.FACE_SHORT_RANGE))
        self.palm_anchors = jnp.asarray(
            anchors_lib.generate_anchors(anchors_lib.PALM))

        if cfg.face_detector:
            path = resolve(cfg.face_detector_path)
            self._load_detector("face_det", path, fallback_size=128,
                                fallback_anchors=896, fallback_kps=NUM_FACE_DET_KPS)
        if cfg.face_landmarker:
            path = resolve(cfg.face_landmarker_path)
            blobs = tc.load_task_bundle(path) if path else {}
            self._load_detector("flm_det", None, fallback_size=128,
                                fallback_anchors=896, fallback_kps=NUM_FACE_DET_KPS,
                                blob=blobs.get("face_detector.tflite"))
            self._load_landmark("flm_lm", blobs.get("face_landmarks_detector.tflite"),
                                fallback_size=256, num_landmarks=NUM_FACE_LANDMARKS)
        if cfg.hand_landmarker:
            path = resolve(cfg.hand_landmarker_path)
            blobs = tc.load_task_bundle(path) if path else {}
            # Real-bundle blob names: palm_detection.tflite +
            # hand_landmarks_detector.tflite (MediaPipe hand_landmarker.task;
            # matched by substring so nested paths / variant suffixes work).
            palm_blob = next((v for k, v in blobs.items() if "palm" in k), None)
            lm_blob = next((v for k, v in blobs.items()
                            if "landmark" in k and "palm" not in k), None)
            if blobs and (palm_blob is None or lm_blob is None):
                logger.warning(
                    "hand_landmarker bundle %r loaded but blob-name "
                    "resolution failed (entries: %s; need one matching "
                    "'palm' and one matching 'landmark'-not-'palm') — "
                    "falling back to RANDOM-INIT stand-ins",
                    path, sorted(blobs))
            self._load_detector("palm_det", None, fallback_size=192,
                                fallback_anchors=2016, fallback_kps=NUM_PALM_KPS,
                                blob=palm_blob,
                                standin_path=resolve(cfg.palm_det_standin_path))
            self._load_landmark("hand_lm", lm_blob, fallback_size=224,
                                num_landmarks=NUM_HAND_LANDMARKS,
                                standin_path=resolve(cfg.hand_lm_standin_path))
        if cfg.person_segmenter:
            path = resolve(cfg.person_segmenter_path)
            blob = tc.load_tflite_file(path) if path else None
            self._load_segmenter("seg", blob, fallback_size=256,
                                 standin_path=resolve(cfg.seg_standin_path))

        # Model loading builds every param HOST-SIDE (numpy): compile_tflite
        # consts, stand-in inits, and the fused-trunk packing all stay off
        # the device so construction performs ZERO device round-trips — the
        # first device-to-host transfer in a process permanently degrades
        # the axon client's dispatch path (~5 min stall, then ~25 ms/call;
        # tools/poisonprobe.py bisect, round 3).  One explicit upload here
        # places the whole pytree; without it, numpy leaves would re-upload
        # on every jitted call.
        self.params = jax.device_put(self.params)

    # -- model loading ---------------------------------------------------

    def _cast(self, params):
        """Cast float params to the compute dtype (bf16 for the MXU)."""
        return jax.tree.map(
            lambda a: a.astype(self.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    def _warn_standin(self, key: str) -> None:
        self.real_weights[key] = False
        logger.warning(
            "model %r: no TFLite weights resolved — using a RANDOM-INIT "
            "architecture stand-in; its outputs are NOT accurate "
            "(provide the asset via InferenceConfig paths / asset_dir)", key)

    def _load_trained_standin(self, key: str, standin_path, expect,
                              meta_expect=None) -> dict | None:
        """Load a trained procedural stand-in npz (host numpy pytree) when
        present and shape-compatible; returns None to fall back to random
        init.  ``expect``: {path-tuple: shape} leaves that must match (the
        architecture fingerprint — a stale artifact from an older head
        layout must not half-load).  ``meta_expect``: {name: int} entries
        that must match the artifact's ``__meta__`` stamp — head shapes
        alone are input-size/anchor-layout independent (1x1 convs), so an
        artifact trained at a different resolution or anchor grid would
        otherwise load with semantically wrong geometry (advisor r4)."""
        self.real_weights[key] = False
        if not standin_path:
            return None
        try:
            cand, meta = blaze.load_standin_npz(standin_path,
                                                return_meta=True)
            for path_keys, shape in expect.items():
                node = cand
                for k in path_keys:
                    node = node[k]
                if tuple(node.shape) != tuple(shape):
                    raise ValueError(
                        f"{'/'.join(path_keys)} shape {node.shape} != "
                        f"expected {shape}")
            for name, want in (meta_expect or {}).items():
                if name not in meta:
                    raise ValueError(
                        f"artifact lacks __meta__/{name} stamp "
                        f"(pre-meta artifact — retrain or migrate)")
                if meta[name] != int(want):
                    raise ValueError(
                        f"__meta__/{name}={meta[name]} != expected "
                        f"{int(want)}")
        except Exception as e:  # stale/corrupt artifact: loud, non-fatal
            logger.warning(
                "model %r: trained stand-in %r unusable (%s) — using "
                "RANDOM-INIT stand-in", key, standin_path, e)
            return None
        self.trained_standin[key] = True
        logger.warning(
            "model %r: no TFLite weights — using the TRAINED PROCEDURAL "
            "stand-in %r (knows synthetic SDF scenes only; NOT the real "
            "MediaPipe model)", key, standin_path)
        return cand

    def _load_detector(self, key, path, fallback_size, fallback_anchors,
                       fallback_kps, blob=None, standin_path=None):
        if blob is None and path is not None:
            blob = tc.load_tflite_file(path)
        if blob is not None:
            self.real_weights[key] = True
            fn, params = tc.compile_tflite(blob, self.dtype, layout="NCHW",
                                           planar_inputs=True,
                                           fuse_dw_pw=self.cfg.fuse_dw_pw,
                                           pack_s2d=self.cfg.pack_s2d)
            size = fn.input_shapes[0][1]

            def apply(p, x, fn=fn):
                outs = fn(p, x)
                # regressors: widest output; logits: single-channel output.
                reg = max(outs, key=lambda t: t.shape[-1])
                log = min(outs, key=lambda t: t.shape[-1])
                return reg, log
            self.params[key] = params
            self._fns[key] = apply
            self._fns[key + "_size"] = size
        else:
            box_dim = 4 + 2 * fallback_kps
            params = self._load_trained_standin(
                key, standin_path,
                {("head8_box", "w"): (1, 1, 96, 2 * box_dim),
                 ("head16_box", "w"): (1, 1, 96, 6 * box_dim)},
                meta_expect={"input_size": fallback_size,
                             "anchors": fallback_anchors,
                             "kps": fallback_kps})
            if params is None:
                self._warn_standin(key)
                params = blaze.init_blaze_detector(
                    _seed(key), fallback_size, fallback_anchors, fallback_kps)
            self.params[key] = self._cast(params)
            self._fns[key] = (lambda p, x, k=fallback_kps:
                              blaze.blaze_detector_apply(p, x, k))
            self._fns[key + "_size"] = fallback_size

    def _load_landmark(self, key, blob, fallback_size, num_landmarks,
                       standin_path=None):
        if blob is not None:
            self.real_weights[key] = True
            # fused_stem: split the net's leading 3x3/2 conv(+PReLU) out of
            # the graph and run it as the Pallas stem kernel on the packed
            # crops the multi-crop kernel emits (bit-exact; tested against
            # the whole compiled graph).  Otherwise, with packing on and
            # the Pallas crop path active, compile the net to take its crop
            # ALREADY 2x2 space-to-depth packed — the crop kernel emits
            # that layout directly (multi_crop pack=2), so the packed
            # graph's input relayout disappears entirely.
            want_stem = self.cfg.fused_stem and self.cfg.use_pallas
            packed_in = (bool(self.cfg.pack_s2d) and self.cfg.use_pallas
                         and not want_stem)
            fn, params = tc.compile_tflite(
                blob, self.dtype, layout="NCHW", planar_inputs=True,
                fuse_dw_pw=self.cfg.fuse_dw_pw,
                pack_s2d=0 if want_stem else self.cfg.pack_s2d,
                packed_inputs=packed_in, external_stem=want_stem,
                # fused_trunk on a REAL graph = fuse its bottleneck
                # residual units into Pallas block-kernel ops
                # (tflite_compiler.fuse_bottlenecks) and call the graph
                # once per stream BATCH (batch_flexible) instead of
                # per-stream vmap, so the kernels see the whole batch.
                # Gated on want_stem: the runtime fused-trunk path requires
                # the fused stem (_use_fused_trunk), so compiling PALLAS_BN
                # ops without it would only run them one-crop-at-a-time
                # under vmap — the small-grid regime bnprobe measured 2-3x
                # SLOWER than plain XLA.
                fuse_bn=self.cfg.fused_trunk and want_stem,
                fuse_bn_min_hw=self.cfg.fused_bn_min_hw,
                batch_flexible=self.cfg.fused_trunk and want_stem)
            stem_meta = getattr(fn, "external_stem_meta", None)
            if stem_meta is not None:
                size = stem_meta["in_size"]
                self._packed_in[key] = True
                self._stem_src[key] = {"kind": "external",
                                       "params": stem_meta["params"]}
                w_stem = params[stem_meta["params"]["w"]]
                if self.cfg.fused_trunk and w_stem.shape[0] == 3:
                    # Route the real net's externalized 3x3/2 stem through
                    # the flat-matmul block kernel too (the trunk itself
                    # stays the compiled XLA graph — real weights are a
                    # general op graph, not blaze blocks).
                    from bp_from_video_tpu.pallas import block_kernel
                    wmat, wspec = block_kernel.pack_block_weights(
                        w_stem, cin=w_stem.shape[2])
                    params["__stem_wmat__"] = wmat
                    self._stem_src[key].update(wmat_key="__stem_wmat__",
                                               wspec=wspec)
            else:
                size = fn.input_shapes[0][1]
                if packed_in and fn.input_shapes[0][3] == 12:
                    self._packed_in[key] = True
                    size *= 2

            # Output roles are resolved by SIZE plus (when ambiguous) a
            # one-time probe, not by position: converters order outputs
            # arbitrarily, and picking the WORLD landmarks ([L,3] metric,
            # |v| < ~1) instead of the screen landmarks ([L,3] crop
            # pixels, 0..size) silently zeroes the whole pipeline.  The
            # probe (a mid-gray forward pass; separates the two by scale
            # unambiguously) runs pinned to CPU so construction never
            # triggers an accelerator compile of the standalone net.
            sizes = [int(np.prod(s)) for s in fn.output_shapes]
            cands = [i for i, n in enumerate(sizes)
                     if n >= 3 * num_landmarks]
            if not cands:
                raise ValueError(
                    f"model {key!r}: no output holds >= {3 * num_landmarks} "
                    f"values (output sizes: {sizes})")
            if len(cands) == 1:
                lm_idx = cands[0]
            else:
                cpu = jax.devices("cpu")[0]
                # Probe a PLAIN compile of the same blob: the fused/packed
                # variants can contain Pallas TPU kernels that cannot lower
                # on the CPU backend, and the pass pipeline never reorders
                # graph outputs, so the plain twin resolves the same roles.
                pfn, pparams = tc.compile_tflite(blob, jnp.float32,
                                                 layout="NCHW",
                                                 planar_inputs=True)
                ish = pfn.input_shapes[0]  # reported NHWC; net takes planar
                with jax.default_device(cpu):
                    probe = jnp.full((ish[0], ish[3], ish[1], ish[2]), 0.5,
                                     jnp.float32)
                    outs = pfn(jax.device_put(pparams, cpu), probe)
                mags = {i: float(np.abs(np.asarray(outs[i], np.float32)).mean())
                        for i in cands}
                lm_idx = max(cands, key=mags.get)
            # Scalar roles (presence first, then handedness/tongueOut)
            # follow GRAPH OUTPUT ORDER — the contract of every shipped
            # MediaPipe bundle (hand: lm, score, handedness, world_lm;
            # face: lm, presence, tongueOut), locked by the fixture-bundle
            # tests.  Unlike the landmark tensors (size-disambiguated
            # above), two size-1 scalars cannot be told apart by probing —
            # a converter that reordered them would swap presence and
            # handedness, so the assumption is documented rather than
            # silently positional.
            scalar_idx = [i for i, n in enumerate(sizes) if n == 1]

            def apply(p, x, fn=fn, nl=num_landmarks, li=lm_idx,
                      si=tuple(scalar_idx)):
                outs = fn(p, x)
                flat = [o.reshape(-1) for o in outs]
                lm = flat[li][: 3 * nl]
                presence = flat[si[0]] if si else jnp.ones((1,))
                aux = flat[si[1]] if len(si) > 1 else jnp.zeros((1,))
                return lm[None], presence[None], aux[None]
            self.params[key] = params
            self._fns[key] = apply
            self._fns[key + "_size"] = size
            if self.cfg.fused_trunk and want_stem:
                # Only meaningful for the batch_flexible compile above —
                # without it the graph is fixed at batch 1.
                def apply_batch(p, x, fn=fn, nl=num_landmarks, li=lm_idx,
                                si=tuple(scalar_idx)):
                    outs = fn(p, x)
                    b = x.shape[0]
                    flat = [o.reshape(b, -1) for o in outs]
                    lm = flat[li][:, : 3 * nl]
                    presence = (flat[si[0]][:, 0] if si
                                else jnp.ones((b,), jnp.float32))
                    aux = (flat[si[1]][:, 0] if len(si) > 1
                           else jnp.zeros((b,), jnp.float32))
                    return lm, presence, aux
                self._fns[key + "_batch"] = apply_batch
        else:
            g = fallback_size // 32
            params = self._load_trained_standin(
                key, standin_path,
                {("head_lm", "w"): (192 * g * g, 3 * num_landmarks)},
                meta_expect={"input_size": fallback_size,
                             "num_landmarks": num_landmarks})
            if params is not None:
                # Re-derive the packed stem twin from the trained stem (the
                # artifact may predate a packing-layout change).
                params["stem_p"] = blaze._pack_stem(params["stem"], 3,
                                                    fallback_size)
            else:
                self._warn_standin(key)
                params = blaze.init_blaze_landmark(_seed(key), fallback_size,
                                                   num_landmarks)
            self.params[key] = self._cast(params)
            self._fns[key] = (lambda p, x, s=fallback_size:
                              blaze.blaze_landmark_apply(p, x, s))
            self._fns[key + "_size"] = fallback_size
            # The stand-ins carry a packed twin of their stem: feed them
            # s2d-packed crops too when the packed Pallas crop path is on.
            # The fused Pallas stem consumes the same packed layout.
            if self.cfg.use_pallas and (bool(self.cfg.pack_s2d)
                                        or self.cfg.fused_stem):
                self._packed_in[key] = True
            if self.cfg.fused_stem and self.cfg.use_pallas:
                self._stem_src[key] = {"kind": "standin"}
                if self.cfg.fused_trunk:
                    # Compose each dw+pw block into its dense twin and
                    # pre-pack the window-matrix weights (host-side, from
                    # the raw f32 params); the arrays ride in the params
                    # pytree, the static layout specs stay out of it.
                    # The stem routes through the same flat-matmul kernel
                    # (its packed twin replaces the VPU-FMA stem kernel).
                    from bp_from_video_tpu.pallas import block_kernel
                    arrays, specs = block_kernel.prepare_trunk(params)
                    self.params[key]["trunk"] = arrays
                    self._trunk_specs[key] = specs
                    wmat, wspec = block_kernel.pack_block_weights(
                        params["stem"]["w"], cin=3)
                    self.params[key]["stem_wmat"] = wmat
                    self._stem_src[key].update(wmat_key="stem_wmat",
                                               wspec=wspec)

    def _load_segmenter(self, key, blob, fallback_size, standin_path=None):
        if blob is not None:
            self.real_weights[key] = True
            fn, params = tc.compile_tflite(blob, self.dtype, layout="NCHW",
                                           planar_inputs=True,
                                           fuse_dw_pw=self.cfg.fuse_dw_pw,
                                           pack_s2d=self.cfg.pack_s2d)
            size = fn.input_shapes[0][1]

            def apply(p, x, fn=fn):
                out = max(fn(p, x), key=lambda t: t.size)
                return out
            self.params[key] = params
            self._fns[key] = apply
            self._fns[key + "_size"] = size
            self._fns[key + "_planar"] = False  # tflite graphs emit NHWC
        else:
            params = self._load_trained_standin(
                key, standin_path,
                {("head", "w"): (1, 1, 12, SEG_CLASSES)},
                meta_expect={"input_size": fallback_size,
                             "classes": SEG_CLASSES})
            if params is None:
                self._warn_standin(key)
                params = blaze.init_segmenter(_seed(key), fallback_size,
                                              SEG_CLASSES)
            self.params[key] = self._cast(params)
            self._fns[key] = (lambda p, x, s=fallback_size:
                              blaze.segmenter_apply(p, x, s))
            self._fns[key + "_size"] = fallback_size
            self._fns[key + "_planar"] = True   # stand-in emits [1,C,S,S]

    # -- state -------------------------------------------------------------

    def init_state(self) -> TrackState:
        default = jnp.asarray([self.w / 2, self.h / 2, self.w, self.h, 0.0],
                              jnp.float32)
        return TrackState(
            face_rect=default,
            face_tracking=jnp.asarray(False),
            hand_rects=jnp.tile(default[None], (self.cfg.max_hands, 1)),
            hand_tracking=jnp.zeros((self.cfg.max_hands,), bool),
            face_det_age=jnp.asarray(0, jnp.int32),
            hand_det_age=jnp.asarray(0, jnp.int32))

    def empty_results(self) -> ModelResults:
        return ModelResults(
            face_detector=Detections.empty(MAX_FACE_DETS, NUM_FACE_DET_KPS),
            face_landmarker=Detections.empty(self.cfg.max_faces,
                                             NUM_FACE_LANDMARKS),
            hand_landmarker=Detections.empty(self.cfg.max_hands,
                                             NUM_HAND_LANDMARKS),
            seg_class=jnp.zeros((0, 0), jnp.int32),
            seg_conf=jnp.zeros((0, 0, 0), jnp.float32),
            seg_valid=jnp.asarray(False))

    # -- sub-pipelines ------------------------------------------------------

    def _run_detector(self, key: str, decode_cfg: detection.DecodeConfig,
                      anchors: Array, params, frame: Array, in_range: str,
                      max_out: int) -> tuple[NMSOut, warp.Letterbox]:
        size = self._fns[key + "_size"]
        lb = warp.letterbox(frame, size, dtype=self.dtype)
        x = lb.image / 255.0
        if in_range == "pm1":
            x = x * 2.0 - 1.0
        # Nets consume planar [1, C, S, S] (NCHW activation layout).
        x = jnp.transpose(x, (2, 0, 1))[None]
        reg, log = self._fns[key](params, x.astype(self.dtype))
        raw = detection.decode(decode_cfg, reg[0].astype(jnp.float32),
                               log[0].astype(jnp.float32), anchors)
        nms = detection.weighted_nms(decode_cfg, raw, max_out)
        # Map normalized letterbox coords to frame pixels.
        boxes = nms.boxes.reshape(-1, 2, 2)
        boxes_px = warp.unletterbox_points(boxes, lb, size)
        kps_px = warp.unletterbox_points(nms.kps, lb, size)
        return NMSOut(boxes_px.reshape(-1, 4), kps_px, nms.scores, nms.count), lb

    def _run_landmarker(self, key: str, params, frame: Array,
                        rect: warp.Rect) -> tuple[Array, Array, Array]:
        size = self._fns[key + "_size"]
        mode = self.cfg.resolved_rotation_mode()
        if mode == "cover":
            rect = warp.axis_aligned_cover(rect)
            crop = warp.crop_rect(frame, rect, size, exact_rotation=False)
        elif mode == "shear":
            # Gather-free rotated crop: the net sees the SAME rotated view
            # as the exact path (sinc vs bilinear interpolation), and
            # projection uses the original rotated rect.
            crop = warp.crop_rect_shear(frame, rect, size)
        elif mode == "hybrid":
            # Angle-gated per crop: cover view within the tilt gate, shear
            # rotated view beyond it; projection follows the branch's rect.
            # (Under vmap this cond lowers to select — both crops run; the
            # batched TPU path gates at batch level instead,
            # predict_batch.)
            def do_cover(_):
                cov = warp.axis_aligned_cover(rect)
                return (warp.crop_rect(frame, cov, size,
                                       exact_rotation=False),
                        _rect_arr(cov))

            def do_shear(_):
                return (warp.crop_rect_shear(frame, rect, size),
                        _rect_arr(rect))

            ok = (jnp.abs(warp.normalize_radians(rect.rotation))
                  <= jnp.deg2rad(self.cfg.hybrid_max_tilt_deg))
            crop, ra = jax.lax.cond(ok, do_cover, do_shear, None)
            rect = _arr_rect(ra)
        else:
            crop = warp.crop_rect(frame, rect, size, exact_rotation=True)
        return self._landmark_from_crop(key, params,
                                        jnp.transpose(crop, (2, 0, 1)), rect)

    def _landmark_from_crop(self, key: str, params, crop: Array,
                            rect: warp.Rect, prescaled: bool = False
                            ) -> tuple[Array, Array, Array]:
        """Net + projection on an already-extracted PLANAR crop [C, S, S]
        (the fused Pallas multi-crop path feeds this directly; with
        ``prescaled`` the /255 normalization already happened in the crop
        kernel's epilogue)."""
        size = self._fns[key + "_size"]
        x = crop if prescaled else crop / 255.0
        src = self._stem_src.get(key)
        if (src is not None and src.get("kind") == "external"
                and x.shape[0] == 3):
            # The compiled graph was re-rooted at the externalized stem's
            # output (tflite_compiler external_stem): its input is the STEM
            # ACTIVATION tensor, not a packed crop.  A plain crop (the
            # exact_rotation / non-uint8 fallback) must run the stem here
            # as an ordinary XLA conv (+PReLU; alpha=0 == the RELU case)
            # before entering the graph.
            pk = src["params"]
            w = params[pk["w"]].astype(self.dtype)        # HWIO [3,3,3,O]
            y = jax.lax.conv_general_dilated(
                x[None].astype(self.dtype), w, (2, 2), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
                preferred_element_type=w.dtype)
            y = y + params[pk["b"]].astype(y.dtype).reshape(-1, 1, 1)
            al = params[pk["alpha"]].astype(y.dtype).reshape(-1, 1, 1)
            return self._landmark_from_stem(
                key, params, jnp.where(y >= 0, y, al * y)[0], rect)
        if self._packed_in.get(key) and x.shape[0] == 3:
            # Net expects packed crops but this one is plain (non-Pallas
            # crop path): pack in-graph ([3,S,S] -> [12,S/2,S/2]).
            x = _pack_s2d_crop(x)
        lm, presence, aux = self._fns[key](params, x[None].astype(self.dtype))
        pts_px = self._project_lm(key, lm[0], rect)
        return pts_px, presence[0, 0].astype(jnp.float32), aux[0, 0]

    def _use_fused_stem(self, key: str) -> bool:
        """Fused Pallas stem: stand-in landmark nets (their 'stem' params
        run in the kernel) and real compiled graphs whose leading conv was
        externalized (tflite_compiler external_stem) — both fed packed
        crops."""
        return (self.cfg.fused_stem and self.cfg.use_pallas
                and key in self._stem_src
                and bool(self._packed_in.get(key)))

    def _fused_stem_batch(self, key: str, params, crops_packed: Array
                          ) -> Array:
        """Stem activations for a batch of packed crops ([..., 4C, S/2,
        S/2] -> [..., O, S/2, S/2]); leading batch dims are collapsed
        around the kernel grid.

        With fused_trunk on, the stem runs through the same flat-matmul
        block kernel as the trunk (one MXU dot per crop,
        pallas/block_kernel); otherwise through the VPU-FMA stem kernel
        (pallas/stem_kernel)."""
        src = self._stem_src[key]
        if src["kind"] == "standin":
            w, bi, al = params["stem"]["w"], params["stem"]["b"], None
        else:
            pk = src["params"]
            w, bi, al = params[pk["w"]], params[pk["b"]], params[pk["alpha"]]
        lead = crops_packed.shape[:-3]
        flat = crops_packed.reshape((-1,) + crops_packed.shape[-3:])
        wkey = src.get("wmat_key")
        if wkey is not None:
            from bp_from_video_tpu.pallas import block_kernel
            stems = block_kernel.dense_s2_block(
                flat, params[wkey], src["wspec"], bi, al,
                cin=w.shape[2], resid=False,
                interpret=self.cfg.pallas_interpret)
        else:
            from bp_from_video_tpu.pallas import stem_kernel
            stems = stem_kernel.stem_packed(flat, w, bi, al,
                                            interpret=self.cfg.pallas_interpret)
        return stems.reshape(lead + stems.shape[1:])

    def _use_fused_trunk(self, key: str) -> bool:
        return (self.cfg.fused_trunk
                and (key in self._trunk_specs
                     or (key + "_batch") in self._fns)
                and self._use_fused_stem(key))

    def _fused_trunk_batch(self, key: str, params, stems: Array
                           ) -> tuple[Array, Array]:
        """Whole trunk + heads over a batch of stem activations
        ([..., C0, S/2, S/2] -> landmarks [..., 3L], presence [...]).

        Stand-ins route through pallas/block_kernel (each dw+pw block =
        one MXU contraction); real graphs through their batch_flexible
        compiled fn (one call for the whole batch — the PALLAS_BN_CHAIN
        ops inside see the full batch as their grid)."""
        lead = stems.shape[:-3]
        flat = stems.reshape((-1,) + stems.shape[-3:])
        if key in self._trunk_specs:
            from bp_from_video_tpu.pallas import block_kernel
            size = self._fns[key + "_size"]
            feats = block_kernel.trunk_apply(params["trunk"],
                                             self._trunk_specs[key], flat,
                                             interpret=self.cfg.pallas_interpret)
            lm, presence, _aux = blaze.landmark_heads(params, feats, size)
            presence = presence.reshape(lead)
        else:
            lm, presence, _aux = self._fns[key + "_batch"](params, flat)
            presence = presence.reshape(lead)
        return (lm.reshape(lead + lm.shape[1:]),
                presence.astype(jnp.float32))

    def _project_lm(self, key: str, lm: Array, rect: warp.Rect) -> Array:
        """One crop's raw landmark vector [3L] -> frame pixels [L, 2]."""
        size = self._fns[key + "_size"]
        pts = lm.astype(jnp.float32).reshape(-1, 3)[:, :2] / size
        return warp.project_landmarks(pts, rect)

    def _landmark_from_stem(self, key: str, params, stem_y: Array,
                            rect: warp.Rect) -> tuple[Array, Array, Array]:
        """Post-stem trunk + projection (fused-stem twin of
        :meth:`_landmark_from_crop`)."""
        size = self._fns[key + "_size"]
        if self._stem_src[key]["kind"] == "standin":
            lm, presence, _aux = blaze.landmark_trunk(params, stem_y[None],
                                                      size)
        else:
            lm, presence, _aux = self._fns[key](params, stem_y[None])
        pts_px = self._project_lm(key, lm[0], rect)
        return pts_px, presence[0, 0].astype(jnp.float32), _aux[0, 0]

    # -- bounded re-detection sub-batch -------------------------------------

    def _subbatch_detect(self, frames_rgb: Array, planar_in: bool,
                         need: Array, age: Array, cur_rects: Array,
                         det_one: Callable, k_max: int):
        """Run ``det_one`` on (up to) ``k_max`` compacted streams — the
        most-starved ones needing detection — instead of all S.

        ``det_one(frame_nhwc) -> (rects, valid)`` per stream.  Returns the
        merged full-size ``(det_rects, det_valid, served)``: unserved
        streams keep ``cur_rects`` with ``valid=False`` (they are re-tried
        next frame, oldest first — starvation-free by construction since
        unserved ages grow monotonically).
        """
        s = need.shape[0]
        prio = jnp.where(need, -age.astype(jnp.float32), jnp.inf)
        idx = jnp.argsort(prio)[:k_max]     # all needing first (oldest age
        sub_need = need[idx]                # first), tracked fillers after

        def detect(_):
            sub = frames_rgb[idx]
            if planar_in:
                sub = jnp.transpose(sub, (0, 2, 3, 1))
            return jax.vmap(det_one)(sub)

        def skip(_):
            tmpl = jax.eval_shape(detect, None)
            return jax.tree.map(lambda t: jnp.zeros(t.shape, t.dtype), tmpl)

        sub_rects, sub_valid = jax.lax.cond(jnp.any(need), detect, skip, None)
        nd_r = sub_need.reshape((k_max,) + (1,) * (sub_rects.ndim - 1))
        det_rects = cur_rects.at[idx].set(
            jnp.where(nd_r, sub_rects, cur_rects[idx]))
        nd_v = sub_need.reshape((k_max,) + (1,) * (sub_valid.ndim - 1))
        det_valid = jnp.zeros((s,) + sub_valid.shape[1:], bool).at[idx].set(
            sub_valid & nd_v)
        served = jnp.zeros((s,), bool).at[idx].set(sub_need)
        return det_rects, det_valid, served

    def _det_subbatch(self, s: int) -> int:
        k = self.cfg.detector_subbatch
        return s if k <= 0 else min(k, s)

    # -- fused predict ------------------------------------------------------

    def predict(self, params: dict, state: TrackState, frame_rgb: Array
                ) -> tuple[TrackState, ModelResults]:
        """One fused inference pass over all enabled models for ONE frame.

        frame_rgb: uint8/float [H, W, 3]. Pure function of its inputs —
        jit it freely. VIDEO mode consumes/produces tracking state; IMAGE
        mode re-detects every frame (reference inference_runner.py:97-102
        branch).

        Thin S=1 wrapper over :meth:`predict_batch` — one implementation,
        one set of semantics; at S=1 the batch-level detector gate IS the
        per-frame detect-then-track cond.
        """
        state_b = jax.tree.map(lambda x: x[None], state)
        new_state_b, res_b = self.predict_batch(params, state_b,
                                                frame_rgb[None])
        squeeze = lambda x: x[0]
        return (jax.tree.map(squeeze, new_state_b),
                jax.tree.map(squeeze, res_b))


    # -- batch-gated predict ----------------------------------------------------

    def predict_batch(self, params: dict, state: TrackState,
                      frames_rgb: Array) -> tuple[TrackState, ModelResults]:
        """``predict`` over a stream batch with DETECTORS GATED AT BATCH
        LEVEL.

        Under ``vmap`` a per-stream ``lax.cond`` lowers to ``select`` — both
        branches execute, so the reference's detect-once-then-track saving
        (MediaPipe VIDEO mode) is lost.  Here the tracking state is a
        stacked ``TrackState`` with leading stream axis and the detector
        branch is one SCALAR ``lax.cond`` over ``all(tracking)``: in steady
        state (every stream tracking) neither detector runs at all.  Result
        equivalence with per-stream ``vmap(predict)``: tracked streams take
        their rect from state either way; detecting streams get the same
        detection — the merge is elementwise.

        frames_rgb: uint8/float [S, H, W, 3]; every TrackState leaf carries
        a leading [S].
        """
        # NOTE: no eager f32 cast here. lax.cond operands are computed
        # regardless of the taken branch, so an up-front cast would move
        # S×H×W×3 f32 (hundreds of MB of HBM traffic) every steady-state
        # step just to feed the skipped detector branch.  Each consumer
        # casts lazily inside its own closure.
        #
        # Frames may arrive PLANAR ([S, 3, H, W] — the layout both Pallas
        # kernels consume and the layout the bench/feeder uploads).  The
        # NHWC view is materialized lazily INSIDE each detector branch so
        # the steady-state step never pays the 2*S*H*W*3-byte transpose
        # (a cond operand would be computed regardless of the branch).
        planar_in = roi_is_planar(frames_rgb)

        def as_nhwc():
            return (jnp.transpose(frames_rgb, (0, 2, 3, 1)) if planar_in
                    else frames_rgb)

        frames = frames_rgb
        s = frames.shape[0]
        video = self.cfg.running_mode is RunningMode.VIDEO
        res = jax.vmap(lambda _: self.empty_results())(jnp.arange(s))

        if self.cfg.face_detector:
            def fd_one(frame):
                nms, _ = self._run_detector(
                    "face_det", detection.FACE_DECODE, self.face_anchors,
                    params["face_det"], frame, "pm1", MAX_FACE_DETS)
                nms = detection.sort_by_area_desc(nms)
                kps = _clip_floor(nms.kps, self.w, self.h)
                return Detections(bbox=jnp.round(nms.boxes), points=kps,
                                  count=nms.count)
            res = res._replace(face_detector=jax.vmap(fd_one)(as_nhwc()))

        new_face_rect, new_face_tracking = state.face_rect, state.face_tracking
        new_face_age = state.face_det_age
        if self.cfg.face_landmarker:
            def face_rect_one(frame):
                nms, _ = self._run_detector(
                    "flm_det", detection.FACE_DECODE, self.face_anchors,
                    params["flm_det"], frame, "pm1", 1)
                r = warp.detection_to_rect(nms.boxes[0], nms.kps[0],
                                           0, 1, 0.0)
                r = warp.rect_transform(r, scale=1.5)
                return _rect_arr(r), nms.count > 0

            def detect_faces(_):
                return jax.vmap(face_rect_one)(as_nhwc())

            def reuse_faces(_):
                return state.face_rect, jnp.ones((s,), bool)

            if video:
                need = ~state.face_tracking
                k_max = self._det_subbatch(s)
                if k_max < s:
                    det_rects, det_ok_d, served = self._subbatch_detect(
                        frames_rgb, planar_in, need, state.face_det_age,
                        state.face_rect, face_rect_one, k_max)
                    new_face_age = jnp.where(need & ~served,
                                             state.face_det_age + 1, 0)
                else:
                    det_rects, det_ok_d = jax.lax.cond(
                        jnp.all(state.face_tracking), reuse_faces,
                        detect_faces, None)
                    new_face_age = jnp.zeros_like(state.face_det_age)
                rect_a = jnp.where(state.face_tracking[:, None],
                                   state.face_rect, det_rects)
                det_ok = state.face_tracking | det_ok_d
            else:
                rect_a, det_ok = detect_faces(None)
        else:
            rect_a = det_ok = None

        new_hand_rects, new_hand_tracking = state.hand_rects, state.hand_tracking
        new_hand_age = state.hand_det_age
        if self.cfg.hand_landmarker:
            n_hands = self.cfg.max_hands

            def palm_rects_one(frame):
                nms, _ = self._run_detector(
                    "palm_det", detection.PALM_DECODE, self.palm_anchors,
                    params["palm_det"], frame, "zero1", n_hands)
                def mk(i):
                    r = warp.detection_to_rect(nms.boxes[i], nms.kps[i],
                                               0, 2, jnp.pi / 2)
                    r = warp.rect_transform(r, scale=2.6, shift_y=-0.5)
                    return _rect_arr(r)
                rects = jnp.stack([mk(i) for i in range(n_hands)])
                valid = jnp.arange(n_hands) < nms.count
                return rects, valid

            def detect_palms(_):
                return jax.vmap(palm_rects_one)(as_nhwc())

            def reuse_palms(_):
                return state.hand_rects, state.hand_tracking

            if video:
                # A stream re-detects when ANY hand slot lost tracking
                # (MediaPipe re-runs the palm detector when fewer than
                # num_hands are tracked).
                need = ~jnp.all(state.hand_tracking, axis=-1)
                k_max = self._det_subbatch(s)
                if k_max < s:
                    det_rects, det_valid, served = self._subbatch_detect(
                        frames_rgb, planar_in, need, state.hand_det_age,
                        state.hand_rects, palm_rects_one, k_max)
                    new_hand_age = jnp.where(need & ~served,
                                             state.hand_det_age + 1, 0)
                else:
                    det_rects, det_valid = jax.lax.cond(
                        jnp.all(state.hand_tracking), reuse_palms,
                        detect_palms, None)
                    new_hand_age = jnp.zeros_like(state.hand_det_age)
                rects_a, slot_ok = jax.vmap(_associate_hand_dets)(
                    state.hand_tracking, state.hand_rects, det_rects,
                    det_valid)
            else:
                rects_a, slot_ok = detect_palms(None)
        else:
            rects_a = slot_ok = None

        # --- crop stage: optionally ONE fused Pallas pass over each frame
        # for every landmark crop (face + all hands) ---------------------------
        rot_mode = self.cfg.resolved_rotation_mode()
        use_pallas = (self.cfg.use_pallas
                      and rot_mode in ("cover", "hybrid")
                      and frames_rgb.dtype == jnp.uint8)
        face_crops = hand_crops = None
        face_cover = hand_cover = None
        face_raw = hand_raw = None
        if self.cfg.face_landmarker:
            face_raw = jax.vmap(lambda ra: _rect_arr(
                _safe_rect(ra, self.w, self.h)))(rect_a)          # [S, 5]
            face_cover = jax.vmap(lambda ra: _rect_arr(
                warp.axis_aligned_cover(_arr_rect(ra))))(face_raw)
        if self.cfg.hand_landmarker:
            hand_raw = jax.vmap(jax.vmap(lambda ra: _rect_arr(
                _safe_rect(ra, self.w, self.h))))(rects_a)        # [S, nh, 5]
            hand_cover = jax.vmap(jax.vmap(lambda ra: _rect_arr(
                warp.axis_aligned_cover(_arr_rect(ra)))))(hand_raw)
        # Projection rects default to the cover rects (crop==projection
        # grid); the hybrid gate below swaps BOTH crops and projection to
        # the rotated originals when any tracked crop tilts past the gate.
        face_prect, hand_prect = face_cover, hand_cover
        if use_pallas and (face_cover is not None or hand_cover is not None):
            from bp_from_video_tpu.pallas import warp_kernel
            sizes, packs = [], []
            if face_cover is not None:
                sizes.append(self._fns["flm_lm_size"])
                packs.append(2 if self._packed_in.get("flm_lm") else 1)
            if hand_cover is not None:
                nh = hand_cover.shape[1]
                sizes += [self._fns["hand_lm_size"]] * nh
                packs += ([2 if self._packed_in.get("hand_lm") else 1] * nh)

            def pallas_crops(_):
                rect_parts = []
                if face_cover is not None:
                    rect_parts.append(face_cover[:, None, :4])
                if hand_cover is not None:
                    rect_parts.append(hand_cover[..., :4])
                planar = (frames_rgb if planar_in
                          else jnp.transpose(frames_rgb, (0, 3, 1, 2)))
                # Crops come out planar ([S, 3, sz, sz]) — exactly the
                # nets' NCHW activation layout — pre-normalized and already
                # in the compute dtype (half-sized in HBM, no convert/
                # normalize pass).  Nets compiled for packed inputs get
                # theirs 2x2 space-to-depth packed ([S, 12, sz/2, sz/2])
                # straight from the kernel.
                return tuple(warp_kernel.multi_crop(
                    planar, jnp.concatenate(rect_parts, axis=1),
                    tuple(sizes), dtype=self.dtype, out_dtype=self.dtype,
                    scale=1.0 / 255.0, pack=tuple(packs),
                    interpret=self.cfg.pallas_interpret))

            if rot_mode == "hybrid":
                # Three-way angle gate on TWO scalar conds.  Upright
                # batches run only the Pallas cover path.  A batch where
                # only k <= shear_subbatch VALID crops tilt past
                # ``hybrid_max_tilt_deg`` runs the cover pass for everyone
                # plus a COMPACTED k-crop shear sub-batch merged over the
                # gated entries (the detector_subbatch pattern — one
                # tilted subject no longer costs all S streams the 2.9x
                # shear path, VERDICT r3 Weak #5).  More gated crops than
                # the budget falls back to the whole-batch shear branch,
                # so every gated crop ALWAYS sees the rotated view —
                # fidelity is angle-gated exactly as before at any count.
                # Validity masking matters: a stream that just lost
                # tracking keeps its (finite, maybe tilted) stale rect
                # until the bounded detector sub-batch serves it — its
                # landmark output is masked downstream, so it must not
                # count toward (or consume) the shear budget.
                gate_rad = jnp.deg2rad(self.cfg.hybrid_max_tilt_deg)
                tilt_f = tilt_h = None
                if face_raw is not None:
                    tilt_f = jnp.abs(warp.normalize_radians(face_raw[:, 4]))
                    if det_ok is not None:
                        tilt_f = jnp.where(det_ok, tilt_f, 0.0)
                if hand_raw is not None:
                    tilt_h = jnp.abs(warp.normalize_radians(
                        hand_raw[..., 4]))
                    if slot_ok is not None:
                        tilt_h = jnp.where(slot_ok, tilt_h, 0.0)
                gated_f = (tilt_f > gate_rad) if tilt_f is not None else None
                gated_h = (tilt_h > gate_rad) if tilt_h is not None else None
                n_f = (jnp.sum(gated_f) if gated_f is not None
                       else jnp.asarray(0))
                n_h = (jnp.sum(gated_h) if gated_h is not None
                       else jnp.asarray(0))
                any_gated = (n_f + n_h) > 0
                k = self.cfg.shear_subbatch
                if k > 0:
                    overflow = (n_f > min(k, s)) | (
                        n_h > min(k, s * (hand_raw.shape[1]
                                          if hand_raw is not None else 1)))
                else:
                    overflow = any_gated

                def shear_one(frame, ra, size, pack):
                    crop = warp.crop_rect_shear(
                        frame, _arr_rect(ra), size)       # [sz, sz, 3]
                    x = jnp.transpose(crop, (2, 0, 1)) / 255.0
                    if pack == 2:
                        x = _pack_s2d_crop(x)
                    return x.astype(self.dtype)

                _dummy = jnp.zeros((0,), jnp.float32)

                def cover_branch(_):
                    return (pallas_crops(None),
                            face_cover if face_cover is not None else _dummy,
                            hand_cover if hand_cover is not None else _dummy)

                def sub_branch(_):
                    outs = list(pallas_crops(None))

                    def gather_nhwc(idx):
                        # Gather the K needed frames FIRST, then relayout
                        # only those: a whole-batch as_nhwc() here would
                        # transpose all S*H*W*3 bytes to feed K frames.
                        g = frames_rgb[idx]
                        return (jnp.transpose(g, (0, 2, 3, 1))
                                if planar_in else g)

                    fp = face_cover if face_cover is not None else _dummy
                    hp = hand_cover if hand_cover is not None else _dummy
                    si = 0
                    # Each KIND's shear work sits behind its own scalar
                    # cond: a batch with only a tilted face must not pay
                    # the hand kind's K frame gathers + shear crops (and
                    # vice versa) — the served-mask merge would discard
                    # them anyway.
                    if face_raw is not None:
                        def make_face_sub(kf):
                            def face_sub(args):
                                base, fp0 = args
                                order = jnp.argsort(-tilt_f)[:kf]
                                served = gated_f[order]
                                sub = jax.vmap(lambda f_, ra: shear_one(
                                    f_, ra, sizes[0], packs[0]))(
                                        gather_nhwc(order), face_raw[order])
                                bsel = served.reshape(
                                    (-1,) + (1,) * (base.ndim - 1))
                                merged = base.at[order].set(
                                    jnp.where(bsel, sub, base[order]))
                                fp1 = fp0.at[order].set(
                                    jnp.where(served[:, None],
                                              face_raw[order], fp0[order]))
                                return merged, fp1
                            return face_sub

                        # Pay only for what is served: the compacted
                        # sub-batch is sized to the GATED count in powers
                        # of two behind a scalar switch, so one tilted
                        # subject costs a 1-crop shear regardless of the
                        # configured budget (VERDICT r4 next #4 — budget 8
                        # used to run 8 mostly-idle shear crops).
                        kfs = _pow2_ladder(min(k, s))
                        idx_f = jnp.clip(jnp.searchsorted(
                            jnp.asarray(kfs, jnp.int32),
                            n_f.astype(jnp.int32)), 0, len(kfs) - 1)
                        outs[0], fp = jax.lax.cond(
                            n_f > 0,
                            lambda a: jax.lax.switch(
                                idx_f, [make_face_sub(kf) for kf in kfs],
                                a),
                            lambda a: a,
                            (outs[0], face_cover))
                        si = 1
                    if hand_raw is not None:
                        nh_ = hand_raw.shape[1]
                        # hand_sub shears ALL hand slots' flattened crops
                        # with sizes[si]/packs[si] (the first hand slot's
                        # values) — valid only while every hand slot shares
                        # one crop size/pack layout (advisor r4).
                        assert all(sizes[si + j] == sizes[si]
                                   and packs[si + j] == packs[si]
                                   for j in range(nh_)), (
                            "hand slots diverge in size/pack; hand_sub "
                            "must index per-slot like full_branch")
                        hstack = jnp.stack(outs[si:si + nh_], axis=1)

                        def make_hand_sub(kh):
                            def hand_sub(args):
                                hstack0, hp0 = args
                                flat_raw = hand_raw.reshape(s * nh_, 5)
                                order = jnp.argsort(
                                    -tilt_h.reshape(-1))[:kh]
                                served = gated_h.reshape(-1)[order]
                                sub = jax.vmap(lambda f_, ra: shear_one(
                                    f_, ra, sizes[si], packs[si]))(
                                        gather_nhwc(order // nh_),
                                        flat_raw[order])
                                hflat = hstack0.reshape(
                                    (s * nh_,) + hstack0.shape[2:])
                                bsel = served.reshape(
                                    (-1,) + (1,) * (hflat.ndim - 1))
                                hflat = hflat.at[order].set(
                                    jnp.where(bsel, sub, hflat[order]))
                                hpf = hp0.reshape(s * nh_, 5)
                                hpf = hpf.at[order].set(
                                    jnp.where(served[:, None],
                                              flat_raw[order], hpf[order]))
                                return (hflat.reshape((s, nh_)
                                                      + hflat.shape[1:]),
                                        hpf.reshape(s, nh_, 5))
                            return hand_sub

                        # Same pay-per-serve ladder as the face kind.
                        khs = _pow2_ladder(min(k, s * nh_))
                        idx_h = jnp.clip(jnp.searchsorted(
                            jnp.asarray(khs, jnp.int32),
                            n_h.astype(jnp.int32)), 0, len(khs) - 1)
                        hstack, hp = jax.lax.cond(
                            n_h > 0,
                            lambda a: jax.lax.switch(
                                idx_h, [make_hand_sub(kh) for kh in khs],
                                a),
                            lambda a: a,
                            (hstack, hand_cover))
                        for j in range(nh_):
                            outs[si + j] = hstack[:, j]
                    return tuple(outs), fp, hp

                def full_branch(_):
                    nhwc = as_nhwc()

                    def one(raw, size, pack):
                        return jax.vmap(lambda f_, ra: shear_one(
                            f_, ra, size, pack))(nhwc, raw)

                    outs = []
                    si = 0
                    if face_raw is not None:
                        outs.append(one(face_raw, sizes[0], packs[0]))
                        si = 1
                    if hand_raw is not None:
                        for j in range(hand_raw.shape[1]):
                            outs.append(one(hand_raw[:, j], sizes[si + j],
                                            packs[si + j]))
                    return (tuple(outs),
                            face_raw if face_raw is not None else _dummy,
                            hand_raw if hand_raw is not None else _dummy)

                outs, fp, hp = jax.lax.cond(
                    overflow, full_branch,
                    lambda _: jax.lax.cond(any_gated, sub_branch,
                                           cover_branch, None), None)
                if face_cover is not None:
                    face_prect = fp
                if hand_cover is not None:
                    hand_prect = hp
            else:
                outs = pallas_crops(None)
            i = 0
            if face_cover is not None:
                face_crops = outs[0]                              # [S, 3, sz, sz]
                i = 1
            if hand_cover is not None:
                hand_crops = jnp.stack(outs[i:], axis=1)          # [S, nh, 3, sz, sz]

        if self.cfg.face_landmarker:
            def face_next_rect(pts_px):
                return _rect_arr(warp.rect_transform(
                    warp.landmarks_to_rect(pts_px, *FACE_ROT_LANDMARKS, 0.0),
                    scale=1.5))

            if face_crops is not None and self._use_fused_stem("flm_lm"):
                face_stems = self._fused_stem_batch(
                    "flm_lm", params["flm_lm"], face_crops)

                if self._use_fused_trunk("flm_lm"):
                    lm_b, presences = self._fused_trunk_batch(
                        "flm_lm", params["flm_lm"], face_stems)

                    def lm_proj(lm, cov):
                        pts_px = self._project_lm("flm_lm", lm,
                                                  _arr_rect(cov))
                        return pts_px, face_next_rect(pts_px)
                    pts_all, next_rects = jax.vmap(lm_proj)(lm_b,
                                                            face_prect)
                else:
                    def lm_stem(stem_y, cov):
                        pts_px, presence, _ = self._landmark_from_stem(
                            "flm_lm", params["flm_lm"], stem_y,
                            _arr_rect(cov))
                        return pts_px, presence, face_next_rect(pts_px)
                    pts_all, presences, next_rects = jax.vmap(lm_stem)(
                        face_stems, face_prect)
            elif face_crops is not None:
                def lm_crop(crop, cov):
                    pts_px, presence, _ = self._landmark_from_crop(
                        "flm_lm", params["flm_lm"], crop, _arr_rect(cov),
                        prescaled=True)
                    return pts_px, presence, face_next_rect(pts_px)
                pts_all, presences, next_rects = jax.vmap(lm_crop)(
                    face_crops, face_prect)
            else:
                def lm_full(frame, ra):
                    rect = _safe_rect(ra, self.w, self.h)
                    pts_px, presence, _ = self._run_landmarker(
                        "flm_lm", params["flm_lm"], frame, rect)
                    return pts_px, presence, face_next_rect(pts_px)
                pts_all, presences, next_rects = jax.vmap(lm_full)(
                    as_nhwc(), rect_a)
            present = det_ok & (presences > PRESENCE_THRESHOLD)
            new_face_rect = jnp.where(present[:, None], next_rects,
                                      state.face_rect)
            new_face_tracking = present

            def pack_face(pts_px, pres):
                pts_i = _clip_floor(pts_px, self.w, self.h)
                bbox = jnp.concatenate([jnp.min(pts_i, axis=0),
                                        jnp.max(pts_i, axis=0)])
                nanf = jnp.float32(jnp.nan)
                return Detections(
                    bbox=jnp.where(pres, bbox, nanf)[None],
                    points=jnp.where(pres, pts_i, nanf)[None],
                    count=pres.astype(jnp.int32))
            res = res._replace(
                face_landmarker=jax.vmap(pack_face)(pts_all, present))

        if self.cfg.hand_landmarker:
            def hand_next_rect(pts_px):
                return _rect_arr(warp.rect_transform(
                    warp.landmarks_to_rect(pts_px, *HAND_ROT_LANDMARKS,
                                           jnp.pi / 2), scale=2.0,
                    shift_y=-0.1))

            if hand_crops is not None and self._use_fused_stem("hand_lm"):
                hand_stems = self._fused_stem_batch(
                    "hand_lm", params["hand_lm"], hand_crops)

                if self._use_fused_trunk("hand_lm"):
                    lm_b, presences = self._fused_trunk_batch(
                        "hand_lm", params["hand_lm"], hand_stems)

                    def hand_proj(lm, cov):
                        pts_px = self._project_lm("hand_lm", lm,
                                                  _arr_rect(cov))
                        return pts_px, hand_next_rect(pts_px)
                    pts_all, next_rects = jax.vmap(jax.vmap(hand_proj))(
                        lm_b, hand_prect)
                else:
                    def hand_stem_one(stem_y, cov):
                        pts_px, presence, _ = self._landmark_from_stem(
                            "hand_lm", params["hand_lm"], stem_y,
                            _arr_rect(cov))
                        return pts_px, presence, hand_next_rect(pts_px)
                    pts_all, presences, next_rects = jax.vmap(jax.vmap(
                        hand_stem_one))(hand_stems, hand_prect)
            elif hand_crops is not None:
                def hand_crop_one(crop, cov):
                    pts_px, presence, _ = self._landmark_from_crop(
                        "hand_lm", params["hand_lm"], crop, _arr_rect(cov),
                        prescaled=True)
                    return pts_px, presence, hand_next_rect(pts_px)
                pts_all, presences, next_rects = jax.vmap(jax.vmap(
                    hand_crop_one))(hand_crops, hand_prect)
            else:
                def hand_full(frame, ra):
                    rect = _safe_rect(ra, self.w, self.h)
                    pts_px, presence, _ = self._run_landmarker(
                        "hand_lm", params["hand_lm"], frame, rect)
                    return pts_px, presence, hand_next_rect(pts_px)
                pts_all, presences, next_rects = jax.vmap(
                    lambda f, rs: jax.vmap(
                        lambda r1: hand_full(f, r1))(rs))(as_nhwc(), rects_a)
            present = slot_ok & (presences > PRESENCE_THRESHOLD)
            new_hand_rects = jnp.where(present[..., None], next_rects,
                                       state.hand_rects)
            new_hand_tracking = present

            def pack_hands(pts_h, pres_h):
                pts_i = _clip_floor(pts_h, self.w, self.h)
                bbox = jnp.concatenate([jnp.min(pts_i, axis=1),
                                        jnp.max(pts_i, axis=1)], axis=-1)
                nanf = jnp.float32(jnp.nan)
                area = (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1])
                order = jnp.argsort(jnp.where(pres_h, -area, jnp.inf))
                pres_s = pres_h[order]
                return Detections(
                    bbox=jnp.where(pres_s[:, None], bbox[order], nanf),
                    points=jnp.where(pres_s[:, None, None], pts_i[order],
                                     nanf),
                    count=jnp.sum(pres_h).astype(jnp.int32))
            res = res._replace(
                hand_landmarker=jax.vmap(pack_hands)(pts_all, present))

        if self.cfg.person_segmenter:
            size = self._fns["seg_size"]

            def seg_one(frame_planar):
                # Planar [3, H, W] end to end: every resample keeps W on
                # the lane axis (the HWC formulation put C=6 there — 6 of
                # 128 lanes live — and paid a full-res transpose at the
                # end).  Compute-dtype matmul operands (uint8 pixels are
                # exact in bf16); f32 accumulation emitted directly
                # (out_dtype) as before.
                small = warp.resize_bilinear_planar(
                    frame_planar.astype(self.dtype), size, size,
                    dtype=self.dtype, out_dtype=jnp.float32) / 255.0
                conf = self._fns["seg"](params["seg"],
                                        small[None].astype(self.dtype))
                # Stand-in emits planar [1,C,S,S] directly; tflite graphs
                # emit HWC — go planar at MODEL res (6*size² elements; the
                # full-res variant moved 6*frame_h*frame_w f32).
                conf_p = (conf[0] if self._fns["seg_planar"]
                          else jnp.transpose(conf[0], (2, 0, 1)))
                if self.cfg.seg_full_masks:
                    # Reference parity: all 6 confidence channels + argmax
                    # at frame resolution (inference_runner.py:164-165).
                    # Mask-grade data: upsample in bf16 (halves the
                    # full-res traffic), emit f32.
                    conf_full = warp.resize_bilinear_planar(
                        conf_p, self.h, self.w,
                        dtype=jnp.bfloat16, out_dtype=jnp.float32)
                    return (jnp.argmax(conf_full, axis=0).astype(jnp.int32),
                            conf_full)
                # Skin-only operating point: upsample the one channel the
                # pipeline consumes; category mask stays at model res.
                sk = SEG_SKIN_CLASS
                skin_full = warp.resize_bilinear_planar(
                    conf_p[sk:sk + 1], self.h, self.w,
                    dtype=jnp.bfloat16, out_dtype=jnp.float32)
                cls_small = jnp.argmax(conf_p, axis=0).astype(jnp.int32)
                return cls_small, skin_full

            frames_seg = (frames_rgb if planar_in else
                          jnp.transpose(frames_rgb, (0, 3, 1, 2)))
            seg_class, seg_conf = jax.vmap(seg_one)(frames_seg)
            res = res._replace(seg_class=seg_class, seg_conf=seg_conf,
                               seg_valid=jnp.ones((s,), bool))

        new_state = TrackState(new_face_rect, new_face_tracking,
                               new_hand_rects, new_hand_tracking,
                               new_face_age, new_hand_age)
        return new_state, res
