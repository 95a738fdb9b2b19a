"""Pallas TPU kernel: batched ROI channel reduction.

The per-frame physiological sample is the mean of a color channel inside
each ROI rect (reference signal_processor.py:176-189).  This kernel keeps
each stream's uint8 frame resident in VMEM once and reduces every ROI from
it: span masks built in-kernel from iotas, the rectangular sum evaluated as
two MXU dot products per channel (row-mask @ frame @ col-mask), optional
per-pixel weights (the segmenter's skin-confidence mask) folded into the
same dots — the BASELINE north star's "ROI averaging as Pallas
gather+reduce kernels" without a single gather.

Returns raw (sums, denoms); the caller forms means and applies the NaN
validity semantics (shared with the XLA path in ops/roi.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _span(start, stop, size: int) -> Array:
    """Python-slice-semantics indicator row [1, size] (negative wraps,
    clamps) — mirrors ops/roi._slice_indicator."""
    def norm(i):
        return jnp.clip(jnp.where(i < 0, i + size, i), 0, size
                        ).astype(jnp.int32)
    s, e = norm(start), norm(stop)
    i = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
    return ((i >= s) & (i < e)).astype(jnp.float32)


def _kernel(rois_ref, frame_ref, *rest, num_rois, weighted):
    if weighted:
        w_ref, out_ref = rest
    else:
        (out_ref,) = rest
    h = frame_ref.shape[2]
    w = frame_ref.shape[3]
    # One (8, 128) f32 tile per stream (TPU block tiling): row r holds
    # [sum_R, sum_G, sum_B, denom, 0...] for ROI r.  Mosaic has no scatter
    # (even static-index .at.set), so writes are iota-mask selects.
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def put(tile, row, col, scalar):
        return jnp.where((ri == row) & (ci == col), scalar, tile)

    # Cast each channel plane (and fold the weight map) ONCE, outside the
    # per-ROI loop — the loop would otherwise repeat the full-frame
    # uint8->f32 cast and multiply up to 8x per stream (warp_kernel hoists
    # its plane casts the same way).
    wmap = w_ref[0] if weighted else None            # [H, W] f32
    planes = []
    for ch in range(frame_ref.shape[1]):
        f = frame_ref[0, ch].astype(jnp.int32).astype(jnp.float32)
        planes.append(f * wmap if weighted else f)

    vals = jnp.zeros((8, 128), jnp.float32)
    for r in range(num_rois):
        # Integral ROI layout (x, y, x0, y0, x1, y1); NaNs arrive as the
        # caller's sentinel row (handled by denom=0 -> invalid outside).
        x0 = rois_ref[0, r, 2]
        y0 = rois_ref[0, r, 3]
        x1 = rois_ref[0, r, 4]
        y1 = rois_ref[0, r, 5]
        rm = _span(y0, y1, h)                       # [1, H]
        cm = _span(x0, x1, w)                       # [1, W]
        if weighted:
            den = jnp.dot(jnp.dot(rm, wmap, preferred_element_type=jnp.float32),
                          cm.T, preferred_element_type=jnp.float32)[0, 0]
        else:
            den = jnp.sum(rm) * jnp.sum(cm)
        vals = put(vals, r, 3, den)
        for ch, f in enumerate(planes):
            row = jnp.dot(rm, f, preferred_element_type=jnp.float32)  # [1, W]
            vals = put(vals, r, ch,
                       jnp.dot(row, cm.T,
                               preferred_element_type=jnp.float32)[0, 0])
    out_ref[0] = vals


@functools.partial(jax.jit, static_argnames=("interpret",))
def roi_sums(frames_planar: Array, rois: Array,
             weights: Array | None = None, interpret: bool = False
             ) -> tuple[Array, Array]:
    """Rectangular channel sums for every (stream, ROI).

    frames_planar: uint8 [S, 3, H, W]; rois: f32 [S, R, 6] integral ROIs
    (x, y, x0, y0, x1, y1; non-finite entries must be pre-replaced with an
    empty rect by the caller); weights: optional f32 [S, H, W].
    Returns (sums f32 [S, R, 3], denoms f32 [S, R])."""
    s, ch, h, w = frames_planar.shape
    r = rois.shape[1]
    if r > 8:
        raise ValueError(f"roi kernel supports up to 8 ROIs, got {r}")
    in_specs = [
        pl.BlockSpec((1, r, 6), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, ch, h, w), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [rois, frames_planar]
    if weights is not None:
        in_specs.append(pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(weights.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_kernel, num_rois=r, weighted=weights is not None),
        grid=(s,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, 8, 128), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:, :r, :3], out[:, :r, 3]
