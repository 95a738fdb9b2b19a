"""On-device frame overlays (reference drawer.py:83-113 + :152-162 rebuilt
as tensor ops — BASELINE north-star config 5's "on-device drawer overlays").

Everything is rasterized branchlessly from coordinates:

  * a rectangle edge is the outer product of a one-hot row/column vector and
    a span mask — summing over K rects makes it ONE [K,H]ᵀ@[K,W] matmul;
  * a landmark point is the outer product of two (2r+1)-wide one-hot
    vectors — all P points of a model render as one [P,H]ᵀ@[P,W] matmul;
  * the segmenter confidence multiply and the final alpha blend are
    elementwise VPU work.

NaN coordinates (missing detections) produce empty one-hots and vanish,
preserving the reference's draw-nothing-when-NaN behavior for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _onehot_rows(coords: Array, size: int, radius: int = 0) -> Array:
    """[K] float coords -> [K, size] {0,1} masks, 1 within ``radius`` pixels
    of round(coord).  NaN coords produce all-zero rows."""
    c = jnp.round(coords)[..., None]
    grid = jnp.arange(size, dtype=jnp.float32)
    d = jnp.abs(grid - c)
    return jnp.where(jnp.isnan(c), 0.0, (d <= radius).astype(jnp.float32))


def _span_rows(lo: Array, hi: Array, size: int) -> Array:
    """[K] interval bounds -> [K, size] {0,1} span masks (NaN -> empty)."""
    grid = jnp.arange(size, dtype=jnp.float32)
    m = (grid >= jnp.round(lo)[..., None]) & (grid <= jnp.round(hi)[..., None])
    bad = jnp.isnan(lo) | jnp.isnan(hi)
    return jnp.where(bad[..., None], 0.0, m.astype(jnp.float32))


def rect_mask(bboxes: Array, h: int, w: int, thickness: int = 1) -> Array:
    """[K, 4] (x0, y0, x1, y1) -> [H, W] mask of the rectangle outlines.
    All four edges of all K rects are two matmuls."""
    x0, y0, x1, y1 = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]
    r = thickness // 2
    # Horizontal edges: one-hot rows at y0 and y1, spanning [x0, x1].
    oh_y = jnp.concatenate([_onehot_rows(y0, h, r), _onehot_rows(y1, h, r)])
    sp_x = jnp.tile(_span_rows(x0, x1, w), (2, 1))
    horiz = oh_y.T @ sp_x
    # Vertical edges: spans along y, one-hot columns at x0 and x1.
    sp_y = jnp.tile(_span_rows(y0, y1, h), (2, 1))
    oh_x = jnp.concatenate([_onehot_rows(x0, w, r), _onehot_rows(x1, w, r)])
    vert = sp_y.T @ oh_x
    return jnp.clip(horiz + vert, 0.0, 1.0)


def points_mask(points: Array, h: int, w: int, radius: int = 1) -> Array:
    """[..., 2] (x, y) pixel points -> [H, W] mask of (2r+1)-square dots,
    one matmul for all points."""
    pts = points.reshape(-1, 2)
    oy = _onehot_rows(pts[:, 1], h, radius)
    ox = _onehot_rows(pts[:, 0], w, radius)
    return jnp.clip(oy.T @ ox, 0.0, 1.0)


def cross_mask(centers: Array, h: int, w: int, arm: int = 5) -> Array:
    """[K, 2] (x, y) -> [H, W] cross markers (reference drawMarker
    MARKER_CROSS, drawer.py:112): a horizontal and a vertical arm."""
    x, y = centers[:, 0], centers[:, 1]
    horiz = _onehot_rows(y, h, 0).T @ _span_rows(x - arm, x + arm, w)
    vert = _span_rows(y - arm, y + arm, h).T @ _onehot_rows(x, w, 0)
    return jnp.clip(horiz + vert, 0.0, 1.0)


def composite(base_f: Array, layers) -> Array:
    """Apply ``[(mask [H, W], color)]`` in order (later wins) as ONE nested
    select chain over the float base.

    Exactly equals painting each layer onto a fresh canvas
    (``frame*(1-mask) + mask*color``) when every mask is {0, 1} — all
    masks here are clipped one-hots/spans — but where that fold
    materializes a full [H, W, 3] float canvas per layer, the select
    chain is a single fused elementwise pass: per-layer HBM round-trips
    disappear, which is most of the on-device render cost at 480×640+
    (multistream preset: one canvas re-write per model layer per stream)."""
    out = base_f
    for mask, color in layers:
        c = jnp.asarray(color, jnp.float32)
        out = jnp.where((mask > 0.5)[..., None], c, out)
    return out


def compose_overlay(frame_rgb: Array, model_layers, roi_rois: Array,
                    roi_colors, seg_conf_skin: Array | None,
                    alpha: float = 0.75) -> Array:
    """Full overlay compose (reference draw_results drawer.py:152-162):
    detections + ROI rects/crosses + segmenter mask, alpha-blended over the
    raw frame.  Returns uint8 RGB.

    model_layers: [(bboxes [K,4], points [K,P,2], color)] per enabled model.
    roi_rois: [S, 6] (x, y, x0, y0, x1, y1) integral ROIs.
    seg_conf_skin: [H, W] face-skin confidence or None.
    """
    h, w = frame_rgb.shape[0], frame_rgb.shape[1]
    base = frame_rgb.astype(jnp.float32)
    drawn = base
    if seg_conf_skin is not None:
        # reference drawer.py:99: frame *= conf_masks[3]
        drawn = drawn * seg_conf_skin[..., None]
    layers = []
    for bboxes, points, color in model_layers:
        m = jnp.clip(rect_mask(bboxes, h, w) + points_mask(points, h, w),
                     0.0, 1.0)
        layers.append((m, color))
    for s in range(roi_rois.shape[0]):
        xy = roi_rois[s, :2]
        box = roi_rois[s, 2:6]
        m = jnp.clip(rect_mask(box[None], h, w) + cross_mask(xy[None], h, w),
                     0.0, 1.0)
        layers.append((m, roi_colors[s]))
    drawn = composite(drawn, layers)
    out = alpha * drawn + (1.0 - alpha) * base
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
