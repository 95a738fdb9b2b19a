"""Detector post-processing: raw SSD tensors → scored boxes+keypoints →
weighted non-max suppression, all fixed-shape (reference gets this from
MediaPipe's TensorsToDetectionsCalculator + NonMaxSuppressionCalculator in
C++; SURVEY.md §2.2).

TPU-native NMS: a static unrolled top-K loop of masked argmax + score-
weighted blending — no dynamic shapes, no host round-trip.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    input_size: int          # x/y/w/h scale (128 face, 192 palm)
    num_keypoints: int       # 6 face, 7 palm
    score_clip: float = 100.0
    min_score: float = 0.5
    iou_threshold: float = 0.3  # min_suppression_threshold


FACE_DECODE = DecodeConfig(input_size=128, num_keypoints=6)
PALM_DECODE = DecodeConfig(input_size=192, num_keypoints=7, min_score=0.5)


class RawDetections(NamedTuple):
    boxes: Array   # [A, 4] (x0, y0, x1, y1) normalized
    kps: Array     # [A, K, 2] normalized
    scores: Array  # [A]


def decode(cfg: DecodeConfig, regressors: Array, logits: Array,
           anchors: Array) -> RawDetections:
    """Decode SSD regressors against fixed-size anchors
    (x_center,y_center,w,h + K keypoint pairs, all /input_size, offset by
    the anchor center; fixed anchors have w=h=1)."""
    s = cfg.input_size
    raw = regressors.reshape(anchors.shape[0], -1)
    cx = raw[:, 0] / s + anchors[:, 0]
    cy = raw[:, 1] / s + anchors[:, 1]
    w = raw[:, 2] / s
    h = raw[:, 3] / s
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    kp = raw[:, 4:4 + 2 * cfg.num_keypoints].reshape(-1, cfg.num_keypoints, 2)
    kps = kp / s + anchors[:, None, :]
    clipped = jnp.clip(logits.reshape(-1), -cfg.score_clip, cfg.score_clip)
    return RawDetections(boxes, kps, jax.nn.sigmoid(clipped))


def iou(box: Array, boxes: Array) -> Array:
    """IoU of one box vs many ([4] vs [A,4], corner format)."""
    x0 = jnp.maximum(box[0], boxes[:, 0])
    y0 = jnp.maximum(box[1], boxes[:, 1])
    x1 = jnp.minimum(box[2], boxes[:, 2])
    y1 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    area = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    union = area + areas - inter
    return inter / jnp.where(union > 0, union, 1.0)


class NMSOut(NamedTuple):
    boxes: Array   # [K, 4]
    kps: Array     # [K, P, 2]
    scores: Array  # [K]
    count: Array   # scalar int32


def weighted_nms(cfg: DecodeConfig, dets: RawDetections, max_out: int) -> NMSOut:
    """MediaPipe-style WEIGHTED non-max suppression with a static output
    size: repeatedly take the best remaining candidate, blend every
    overlapping candidate (IoU > threshold) weighted by score, suppress the
    cluster."""
    alive = dets.scores >= cfg.min_score
    boxes, kps, scores = dets.boxes, dets.kps, dets.scores

    out_boxes, out_kps, out_scores, out_valid = [], [], [], []
    for _ in range(max_out):
        masked = jnp.where(alive, scores, -jnp.inf)
        idx = jnp.argmax(masked)
        has = jnp.any(alive)
        best_box = boxes[idx]
        overl = iou(best_box, boxes) > cfg.iou_threshold
        cluster = alive & overl
        wsum = jnp.maximum(jnp.sum(jnp.where(cluster, scores, 0.0)), 1e-12)
        wb = jnp.sum(jnp.where(cluster[:, None], boxes * scores[:, None], 0.0),
                     axis=0) / wsum
        wk = jnp.sum(jnp.where(cluster[:, None, None],
                               kps * scores[:, None, None], 0.0), axis=0) / wsum
        out_boxes.append(jnp.where(has, wb, jnp.nan))
        out_kps.append(jnp.where(has, wk, jnp.nan))
        out_scores.append(jnp.where(has, scores[idx], jnp.nan))
        out_valid.append(has)
        alive = alive & ~cluster

    return NMSOut(jnp.stack(out_boxes), jnp.stack(out_kps),
                  jnp.stack(out_scores),
                  jnp.sum(jnp.stack(out_valid)).astype(jnp.int32))


def sort_by_area_desc(nms: NMSOut) -> NMSOut:
    """Reference sorts detections by bbox area descending
    (inference_runner.py:112/:131/:150); NaN areas (invalid slots) sink."""
    area = (nms.boxes[:, 2] - nms.boxes[:, 0]) * (nms.boxes[:, 3] - nms.boxes[:, 1])
    order = jnp.argsort(jnp.where(jnp.isnan(area), -jnp.inf, area))[::-1]
    return NMSOut(nms.boxes[order], nms.kps[order], nms.scores[order], nms.count)
