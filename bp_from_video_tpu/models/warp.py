"""Rotated-rect geometry and image warping for the landmark pipelines.

The reference relies on MediaPipe's C++ calculators (DetectionsToRects,
RectTransformation, ImageToTensor, LandmarkProjection) hidden behind
`detect_for_video` (reference inference_runner.py:120-122).  Re-built here in
**pixel space** as pure JAX: a rect is (cx, cy, w, h, rotation) in pixels,
crops are affine bilinear gathers on-device, and landmark projection is the
exact inverse of the crop mapping — so crop→net→project is self-consistent
by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Rect(NamedTuple):
    cx: Array
    cy: Array
    w: Array
    h: Array
    rotation: Array  # radians


def normalize_radians(a: Array) -> Array:
    """Wrap to [-pi, pi) (MediaPipe NormalizeRadians)."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


def rotation_from_points(p0: Array, p1: Array, target_angle: float) -> Array:
    """Rotation aligning the p0→p1 direction to ``target_angle``
    (DetectionsToRectsCalculator::ComputeRotation, y-down image coords)."""
    return normalize_radians(
        target_angle - jnp.arctan2(-(p1[1] - p0[1]), p1[0] - p0[0]))


def detection_to_rect(box_px: Array, kp_px: Array, kp_start: int, kp_end: int,
                      target_angle: float) -> Rect:
    """Rect from a detection bbox (pixel corners) + rotation from two
    keypoints."""
    cx = (box_px[0] + box_px[2]) / 2.0
    cy = (box_px[1] + box_px[3]) / 2.0
    w = box_px[2] - box_px[0]
    h = box_px[3] - box_px[1]
    rot = rotation_from_points(kp_px[kp_start], kp_px[kp_end], target_angle)
    return Rect(cx, cy, w, h, rot)


def landmarks_to_rect(pts_px: Array, rot_start: int, rot_end: int,
                      target_angle: float) -> Rect:
    """Tracking rect from the previous frame's landmarks: their axis-aligned
    bbox + rotation from two anchor landmarks (the landmarks-to-ROI step of
    the MediaPipe tracking graphs)."""
    x0 = jnp.min(pts_px[:, 0])
    x1 = jnp.max(pts_px[:, 0])
    y0 = jnp.min(pts_px[:, 1])
    y1 = jnp.max(pts_px[:, 1])
    rot = rotation_from_points(pts_px[rot_start], pts_px[rot_end], target_angle)
    return Rect((x0 + x1) / 2.0, (y0 + y1) / 2.0, x1 - x0, y1 - y0, rot)


def rect_transform(r: Rect, scale: float, shift_x: float = 0.0,
                   shift_y: float = 0.0, square_long: bool = True) -> Rect:
    """RectTransformationCalculator: rotation-aware shift, square-long, then
    scale."""
    sx = r.w * shift_x
    sy = r.h * shift_y
    cos, sin = jnp.cos(r.rotation), jnp.sin(r.rotation)
    cx = r.cx + sx * cos - sy * sin
    cy = r.cy + sx * sin + sy * cos
    side = jnp.maximum(r.w, r.h) if square_long else None
    w = (side if square_long else r.w) * scale
    h = (side if square_long else r.h) * scale
    return Rect(cx, cy, w, h, r.rotation)


def crop_rect(frame: Array, r: Rect, out_size: int) -> Array:
    """Affine bilinear crop of the rotated rect into (out_size, out_size, C),
    zero padding outside the frame (ImageToTensor / ExtractSubRect)."""
    s = out_size
    u = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s - 0.5
    vv, uu = jnp.meshgrid(u, u, indexing="ij")  # vv: rows, uu: cols
    cos, sin = jnp.cos(r.rotation), jnp.sin(r.rotation)
    xs = r.cx + uu * r.w * cos - vv * r.h * sin
    ys = r.cy + uu * r.w * sin + vv * r.h * cos
    return bilinear_sample(frame, xs, ys)


def bilinear_sample(frame: Array, xs: Array, ys: Array) -> Array:
    """Bilinear sample at pixel centers (x+0.5 conventions folded: xs/ys are
    pixel coordinates where integer k is the center of pixel k); zero
    outside."""
    h, w = frame.shape[0], frame.shape[1]
    f = frame.astype(jnp.float32)
    x = xs - 0.5
    y = ys - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = f[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    a = gather(y0i, x0i)
    b = gather(y0i, x0i + 1)
    c = gather(y0i + 1, x0i)
    d = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def project_landmarks(norm_pts: Array, r: Rect) -> Array:
    """Map landmark-net outputs (normalized crop coords in [0,1], shape
    [L, 2+]) back to frame pixels — the exact inverse of :func:`crop_rect`'s
    grid mapping (LandmarkProjectionCalculator)."""
    u = norm_pts[:, 0] - 0.5
    v = norm_pts[:, 1] - 0.5
    cos, sin = jnp.cos(r.rotation), jnp.sin(r.rotation)
    x = r.cx + u * r.w * cos - v * r.h * sin
    y = r.cy + u * r.w * sin + v * r.h * cos
    return jnp.stack([x, y], axis=-1)


# --- detector input: centered letterbox --------------------------------------


class Letterbox(NamedTuple):
    image: Array     # (S, S, C) float
    scale: Array     # pixels per letterbox unit
    pad_x: Array     # left pad in letterbox pixels
    pad_y: Array


def letterbox(frame: Array, out_size: int) -> Letterbox:
    """Keep-aspect resize into a centered (out_size, out_size) canvas
    (ImageToTensor keep_aspect_ratio), zero padding."""
    h, w = frame.shape[0], frame.shape[1]
    s = out_size
    scale = jnp.float32(max(h, w)) / s  # frame pixels per output pixel
    pad_x = (s - w / scale) / 2.0
    pad_y = (s - h / scale) / 2.0
    j = jnp.arange(s, dtype=jnp.float32) + 0.5
    xs = (j[None, :] - pad_x) * scale
    ys = (j[:, None] - pad_y) * scale
    xs, ys = jnp.broadcast_to(xs, (s, s)), jnp.broadcast_to(ys, (s, s))
    img = bilinear_sample(frame, xs, ys)
    return Letterbox(img, scale, pad_x, pad_y)


def unletterbox_points(pts_norm: Array, lb: Letterbox, out_size: int) -> Array:
    """Map detector outputs (normalized letterbox coords) to frame pixels."""
    x = (pts_norm[..., 0] * out_size - lb.pad_x) * lb.scale
    y = (pts_norm[..., 1] * out_size - lb.pad_y) * lb.scale
    return jnp.stack([x, y], axis=-1)
