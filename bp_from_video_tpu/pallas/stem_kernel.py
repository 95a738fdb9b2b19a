"""Pallas TPU kernel: landmark-net stem from 2x2-packed crops.

The stand-in landmark nets' 3x3/stride-2 stem dominates their cost on TPU:
XLA lowers it to the MXU conv pipeline whose time scales with streamed
rows x kernel taps (~13 rows/cycle measured on this stack), and at
224 x 224 x 9 taps x 128 crops the stem alone is most of the hand-net
milliseconds while using <2% of the MXU's 128x128 cells (K = 3 input
channels).  This kernel reformulates the stem as ONE small contraction
per crop: gather the 27 (tap_y, tap_x, channel) input windows — all UNIT
shifts, because the crop arrives 2x2 space-to-depth packed — and contract
[cout, 27] x [27, S/2, S/2] in a single dot, f32 accumulation, fused
bias + ReLU.  Time then scales with the 27-deep contraction instead of
9 separate row-streamed taps.

Input: packed crops [B, 4*cin, S/2, S/2], channel order (a*2+b)*cin + c —
exactly what pallas/warp_kernel.multi_crop(pack=2) emits.  A stride-2 tap
(dy, dx) of the original image is the packed plane (dy%2, dx%2) shifted by
(dy//2, dx//2): no strided memory access anywhere.

Output: UNPACKED stem activations [B, cout, S/2, S/2] (stride 2 halves the
spatial dims, which is exactly the packed grid), ready for the rest of the
trunk (models/blaze.blaze_landmark_apply's post-stem blocks).

Weights: plain HWIO [k, k, cin, cout] with TFLite SAME padding
(lo = 0, hi = 1 at even sizes) — bit-compatible with models/blaze._conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _shifted(p: Array, sy: int, sx: int) -> Array:
    """Plane shifted UP/LEFT by (sy, sx) in {0,1}, zero-filled at the far
    edge (the conv's pad-hi) — pltpu.roll + edge mask, no strided access."""
    if sy == 0 and sx == 0:
        return p
    h, w = p.shape
    out = p
    if sy:
        # pltpu.roll takes non-negative shifts; h-1 == -1 (mod h).
        out = pltpu.roll(out, shift=h - 1, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        out = jnp.where(rows < h - 1, out, jnp.zeros_like(out))
    if sx:
        out = pltpu.roll(out, shift=w - 1, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        out = jnp.where(cols < w - 1, out, jnp.zeros_like(out))
    return out


def _stem_kernel(crop_ref, w_ref, b_ref, a_ref, out_ref, *, cin, cout, k,
                 half, use_dot):
    """One crop: packed [1, 4*cin, half, half] -> [1, cout, half, half]."""
    f32 = jnp.float32
    # The 27 tap windows (unit shifts of packed planes), gathered once and
    # shared by every output channel.  Shifts run in f32: Mosaic's vector
    # rotate requires 32-bit data, and the accumulation is f32 anyway.
    windows = []
    for dy in range(k):
        a, sy = dy % 2, dy // 2
        for dx in range(k):
            b, sx = dx % 2, dx // 2
            for c in range(cin):
                pc = (a * 2 + b) * cin + c
                windows.append(_shifted(crop_ref[0, pc].astype(f32), sy, sx))

    # Bias + per-channel PReLU applied channel-at-a-time with SMEM scalars:
    # Mosaic has no [cout] -> [cout, 1, 1] vector shape cast.
    def epilogue(co, plane):
        v = plane + b_ref[0, co]
        return jnp.where(v >= 0.0, v, v * a_ref[0, co]).astype(out_ref.dtype)

    if use_dot:
        # [cout, taps] x [taps, half, half] — one contraction, K = k*k*cin.
        # (w arrives pre-flattened/transposed: Mosaic has no in-kernel
        # multi-dim vector reshape.)  NOTE: Mosaic currently rejects the
        # internal [taps, H, W] -> [taps, H*W] flatten this lowers to
        # ("unsupported shape cast"), so the FMA path is the production
        # default; kept for when Mosaic grows the layout.
        wmat = w_ref[:].astype(f32)
        x = jnp.stack(windows)
        acc = jax.lax.dot_general(
            wmat, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        for co in range(cout):
            out_ref[0, co] = epilogue(co, acc[co])
    else:
        # VPU path: k*k*cin shifted FMAs per output channel (SMEM scalar
        # weights), f32 accumulator.
        for co in range(cout):
            acc = jnp.zeros((half, half), f32)
            for t in range(k * k * cin):
                acc = acc + windows[t] * w_ref[co, t]
            out_ref[0, co] = epilogue(co, acc)


@functools.partial(jax.jit, static_argnames=("interpret", "use_dot"))
def stem_packed(crops_packed: Array, w: Array, b: Array,
                alpha: Array | None = None,
                interpret: bool = False, use_dot: bool = False) -> Array:
    """Fused stem over a batch of packed crops.

    crops_packed: [B, 4*cin, S/2, S/2] (multi_crop pack=2 layout, already
    /255-normalized like the net input).  w: HWIO [k, k, cin, cout] stem
    weights; b: [cout]; alpha: optional per-channel PReLU slopes [cout]
    (None/zeros = plain ReLU — the real face mesh's stem is conv + PReLU,
    the blaze stand-ins' is conv + ReLU).  Returns [B, cout, S/2, S/2]
    activations in the crop dtype.
    """
    bsz, pc4, half, half2 = crops_packed.shape
    assert half == half2, crops_packed.shape
    k, k2, cin, cout = w.shape
    assert k == k2 and pc4 == 4 * cin, (w.shape, crops_packed.shape)
    # _shifted only implements the unit shifts a 3x3/2 window needs on the
    # 2x2-packed layout (sy, sx in {0, 1}); k >= 5 would need shift 2 and
    # would come out silently wrong, so reject it here.
    assert k <= 3, f"stem_packed supports k<=3 stems, got k={k}"
    if alpha is None:
        alpha = jnp.zeros((cout,), w.dtype)
    # Pre-flatten the HWIO weight to [cout, k*k*cin] on the host: taps in
    # (dy, dx, c) order, matching the kernel's window gathering.  The FMA
    # path reads them as SMEM scalars -> f32.
    wmat = jnp.transpose(w.reshape(k * k * cin, cout))
    if not use_dot:
        wmat = wmat.astype(jnp.float32)
    kern = functools.partial(_stem_kernel, cin=cin, cout=cout, k=k,
                             half=half, use_dot=use_dot)
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, pc4, half, half), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, k * k * cin), lambda i: (0, 0),
                         memory_space=(pltpu.VMEM if use_dot
                                       else pltpu.SMEM)),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, half, half),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, half, half),
                                       crops_packed.dtype),
        interpret=interpret,
    )(crops_packed, wmat, b.reshape(1, cout).astype(jnp.float32),
      alpha.reshape(1, cout).astype(jnp.float32))


def stem_packed_reference(crops_packed: Array, w: Array, b: Array,
                          alpha: Array | None = None) -> Array:
    """Pure-XLA oracle: unpack the crops and run the plain stride-2 conv
    (models/blaze._conv semantics: TFLite SAME pad, [p]relu)."""
    bsz, pc4, half, _ = crops_packed.shape
    cin = pc4 // 4
    x = crops_packed.reshape(bsz, 2, 2, cin, half, half)
    x = jnp.transpose(x, (0, 3, 4, 1, 5, 2))        # [B, c, half, 2, half, 2]
    x = x.reshape(bsz, cin, 2 * half, 2 * half)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (2, 2), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32)
    y = y + b.astype(jnp.float32).reshape(-1, 1, 1)
    if alpha is None:
        return jnp.maximum(y, 0.0).astype(crops_packed.dtype)
    a = alpha.astype(jnp.float32).reshape(-1, 1, 1)
    return jnp.where(y >= 0.0, y, y * a).astype(crops_packed.dtype)
