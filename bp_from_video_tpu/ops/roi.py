"""ROI geometry and pixel sampling (reference roi.py + signal_processor.py:
133-193): landmark-anchored rectangular regions and masked color-channel
means over the frame.

TPU-native shape: detections are fixed-size arrays (max-detections leading
axis + valid count); the ROI crop-and-mean is a **separable masked
reduction** — two matvecs against row/column indicator vectors — instead of a
dynamic-shape slice, which keeps the whole sampler inside the jitted step and
replicates numpy's slice semantics (including the negative-index wrap and
empty-slice → NaN quirks) branchlessly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bp_from_video_tpu.config import ModelType, ROIConfig, SignalColorChannel

Array = jax.Array


class Detections(NamedTuple):
    """Fixed-size per-model detection bundle, sorted by bbox area descending
    (the reference sorts, inference_runner.py:112/:131/:150).

    bbox:   f32[D, 4]  (x0, y0, x1, y1) pixel corners
    points: f32[D, L, 2]  landmark pixel coordinates (x, y)
    count:  i32 scalar — number of valid detections (leading slots)
    """

    bbox: Array
    points: Array
    count: Array

    @staticmethod
    def empty(max_dets: int, num_points: int) -> "Detections":
        return Detections(
            bbox=jnp.full((max_dets, 4), jnp.nan, jnp.float32),
            points=jnp.full((max_dets, num_points, 2), jnp.nan, jnp.float32),
            count=jnp.int32(0))


def calc_roi(cfg: ROIConfig, dets: Detections) -> Array:
    """One ROI 6-tuple (x, y, x0, y0, x1, y1) from the largest detection,
    NaN-filled when there is none (reference signal_processor.py:133-155).

    anchor = round(mean of configured landmark pixels); corners = anchor +
    margins scaled by the detection bbox size, rounded (np.round semantics:
    ties to even — jnp.round matches).
    """
    idx = jnp.asarray(cfg.landmark_indices, jnp.int32)
    pts = dets.points[0, idx, :]                     # largest detection
    anchor = jnp.round(jnp.mean(pts, axis=0))        # (x, y), integral floats
    bbox = dets.bbox[0]
    bw = bbox[2] - bbox[0]
    bh = bbox[3] - bbox[1]
    left_m, top_m, right_m, bottom_m = cfg.relative_bbox
    x, y = anchor[0], anchor[1]
    corners = jnp.stack([
        jnp.round(x + left_m * bw), jnp.round(y + top_m * bh),
        jnp.round(x + right_m * bw), jnp.round(y + bottom_m * bh)])
    out = jnp.concatenate([anchor, corners])
    return jnp.where(dets.count > 0, out, jnp.nan)


def calc_rois(roi_cfgs: tuple[ROIConfig, ...],
              by_model: dict[ModelType, Detections]) -> Array:
    """All configured ROIs as f32[S, 6] (reference calc_rois,
    signal_processor.py:133-155). Only landmarker models are legal sources,
    like the reference (:136-141)."""
    rows = []
    for cfg in roi_cfgs:
        if cfg.model_type not in (ModelType.FACE_LANDMARKER,
                                  ModelType.HAND_LANDMARKER):
            raise NotImplementedError(cfg.model_type)
        rows.append(calc_roi(cfg, by_model[cfg.model_type]))
    return jnp.stack(rows)


def _slice_indicator(start: Array, stop: Array, size: int) -> Array:
    """Indicator vector of Python slice semantics ``a[start:stop]`` on an
    axis of length ``size`` — negative indices wrap, results clamp."""
    def norm(i):
        return jnp.clip(jnp.where(i < 0, i + size, i), 0, size)
    s, e = norm(start), norm(stop)
    i = jnp.arange(size)
    return ((i >= s) & (i < e)).astype(jnp.float32)


def roi_channel_means(frame: Array, sroi: Array,
                      weights: Array | None = None) -> tuple[Array, Array]:
    """Per-channel mean over the ROI crop ``frame[y0:y1, x0:x1]`` as a
    separable reduction: means[c] = rᵀ F[..,c] q / (rᵀ1)(qᵀ1).

    Returns (means f32[C], valid scalar bool). ``valid`` is False for NaN
    ROIs or empty crops (the reference's NaN sample paths,
    signal_processor.py:177, :186-188).  Optional ``weights`` (f32[H, W],
    e.g. a segmenter skin-confidence mask) turn the result into a weighted
    mean — the framework's segmenter-masked ROI sampling mode.
    """
    h, w = frame.shape[0], frame.shape[1]
    finite = jnp.all(jnp.isfinite(sroi))
    s = jnp.where(jnp.isfinite(sroi), sroi, 0.0).astype(jnp.int32)
    _, _, x0, y0, x1, y1 = s[0], s[1], s[2], s[3], s[4], s[5]
    r = _slice_indicator(y0, y1, h)
    q = _slice_indicator(x0, x1, w)
    if weights is not None:
        wmap = weights * r[:, None] * q[None, :]
        denom = jnp.sum(wmap)
        sums = jnp.einsum("hw,hwc->c", wmap, frame.astype(jnp.float32))
    else:
        denom = jnp.sum(r) * jnp.sum(q)
        tmp = jnp.einsum("h,hwc->wc", r, frame.astype(jnp.float32))
        sums = jnp.einsum("w,wc->c", q, tmp)
    valid = finite & (denom > 0)
    means = sums / jnp.where(denom > 0, denom, 1.0)
    return means, valid


def sample_roi(frame_rgb: Array, sroi: Array,
               channel: SignalColorChannel,
               weights: Array | None = None) -> Array:
    """One scalar sample per ROI per frame (reference sample_signal,
    signal_processor.py:176-189): mean green, or mean green-chrominance
    G/2 − B/4 − R/4 + 0.5. NaN when the ROI is NaN or the crop is empty.

    ``frame_rgb`` is RGB (the TPU pipeline's native layout; the reference
    samples BGR with the same channel roles, signal_processor.py:180-183).
    """
    means, valid = roi_channel_means(frame_rgb, sroi, weights)
    return jnp.where(valid, _mix_channel(means, channel), jnp.nan)


def sample_rois(frame_rgb: Array, rois: Array,
                channel: SignalColorChannel,
                weights: Array | None = None) -> Array:
    """All ROI samples for one frame: f32[S]
    (reference sample_signals, signal_processor.py:191-193)."""
    fn = lambda r: sample_roi(frame_rgb, r, channel, weights)
    return jax.vmap(fn)(rois)


def _mix_channel(means: Array, channel: SignalColorChannel) -> Array:
    """Channel statistic from per-channel RGB means (reference
    signal_processor.py:180-186)."""
    if channel is SignalColorChannel.GREEN:
        return means[..., 1]
    if channel is SignalColorChannel.CHROM_GREEN:
        return (means[..., 1] / 2.0 - means[..., 2] / 4.0
                - means[..., 0] / 4.0 + 0.5)
    raise NotImplementedError(channel)  # pragma: no cover


def is_planar_frames(frames: Array) -> bool:
    """True when a 4-D frame batch is planar ([S, 3, H, W]) rather than
    NHWC.  One shared heuristic for every consumer (the engine's inference
    and ROI stages must agree); ambiguous only for W == 3 frames, which do
    not occur."""
    return (frames.ndim == 4 and frames.shape[1] == 3
            and frames.shape[-1] != 3)


def sample_rois_batch(frames_rgb: Array, rois: Array,
                      channel: SignalColorChannel,
                      weights: Array | None = None,
                      use_pallas: bool = False,
                      interpret: bool = False) -> Array:
    """Stream-batched ROI sampling: frames [S, H, W, 3] + rois [S, R, 6]
    -> samples f32 [S, R].

    ``use_pallas`` routes through the fused TPU reduce kernel
    (pallas/roi_kernel.py — one VMEM-resident frame pass for all ROIs);
    otherwise the vmapped separable-einsum path.  Identical NaN/validity
    semantics either way.

    Frames may also arrive PLANAR ([S, 3, H, W] — the zero-copy layout the
    multi-stream feeder/bench uploads); the Pallas path consumes that
    directly, the einsum path transposes back."""
    planar_in = is_planar_frames(frames_rgb)
    if not (use_pallas and frames_rgb.dtype == jnp.uint8):
        nhwc = (jnp.transpose(frames_rgb, (0, 2, 3, 1)) if planar_in
                else frames_rgb)
        if weights is None:
            return jax.vmap(
                lambda f, r: sample_rois(f, r, channel, None)
            )(nhwc, rois)
        return jax.vmap(
            lambda f, r, w: sample_rois(f, r, channel, w)
        )(nhwc, rois, weights)

    from bp_from_video_tpu.pallas import roi_kernel

    finite = jnp.all(jnp.isfinite(rois), axis=-1)            # [S, R]
    safe = jnp.where(finite[..., None], jnp.nan_to_num(rois), 0.0)
    planar = (frames_rgb if planar_in
              else jnp.transpose(frames_rgb, (0, 3, 1, 2)))
    sums, den = roi_kernel.roi_sums(planar, safe, weights,
                                    interpret=interpret)
    means = sums / jnp.where(den > 0, den, 1.0)[..., None]
    valid = finite & (den > 0)
    value = _mix_channel(means, channel)
    return jnp.where(valid, value, jnp.float32(jnp.nan))
