"""Pallas TPU kernel: fused multi-crop bilinear resampling.

The landmark stage needs several crops of the same frame every step (face
256², two hands 224² in the flagship config).  As separate XLA ops each
crop re-reads the frame from HBM and materializes its interpolation
matrices; this kernel keeps the uint8 frame resident in VMEM ONCE per
stream, builds the triangular bilinear weights on the fly with iotas, and
runs the two resampling matmuls per channel on the MXU — one HBM pass for
all crops.

Layout: frames are planar [S, 3, H, W] (channel as its own sublane block —
interleaved HWC would put channels in the lane dimension with stride 3,
which vectorizes badly).  Rects are axis-aligned (cx, cy, w, h) in SMEM —
the fast-path crop semantics (config.exact_rotation=False); weights use the
zero-pad triangular kernel, exactly warp.resample_separable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(rects_ref, frame_ref, *out_refs, sizes, dtype, scale, packs):
    # Cast each channel plane once (u8 -> i32 -> f32 -> dtype; Mosaic has no
    # direct u8->float cast) and reuse it across every crop.
    planes = [frame_ref[0, ch].astype(jnp.int32).astype(jnp.float32
                                                        ).astype(dtype)
              for ch in range(frame_ref.shape[1])]
    for c, (size, pack, out_ref) in enumerate(zip(sizes, packs, out_refs)):
        cx = rects_ref[0, c, 0]
        cy = rects_ref[0, c, 1]
        w_ = rects_ref[0, c, 2]
        h_ = rects_ref[0, c, 3]
        h = frame_ref.shape[2]
        w = frame_ref.shape[3]

        def weights(n, off, step, center, extent, g):
            """Bilinear rows for sample points off+step*i (crop pixels)."""
            # TPU iota is integer-only; cast to f32 after generation.
            u = ((jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                  .astype(jnp.float32)[:, 0] * step + off) + 0.5) / size - 0.5
            s = center + u * extent - 0.5
            nan_s = jnp.isnan(s)[:, None]
            return jnp.where(nan_s, 0.0,
                             jnp.maximum(0.0, 1.0 - jnp.abs(s[:, None] - g))
                             ).astype(dtype)

        gy = jax.lax.broadcasted_iota(jnp.int32, (size // pack, h), 1
                                      ).astype(jnp.float32)
        gx = jax.lax.broadcasted_iota(jnp.int32, (size // pack, w), 1
                                      ).astype(jnp.float32)
        if pack == 1:
            # gy/gx already have (size, ·) rows when pack == 1.
            wy = weights(size, 0, 1, cy, h_, gy)
            wx = weights(size, 0, 1, cx, w_, gx)
            for ch, f in enumerate(planes):
                # (Pixel values 0..255 are exact in bf16.)
                tmp = jnp.dot(wy, f, preferred_element_type=jnp.float32
                              ).astype(dtype)
                res = jnp.dot(tmp, wx.T, preferred_element_type=jnp.float32)
                if scale != 1.0:
                    res = res * scale
                out_ref[0, ch] = res.astype(out_ref.dtype)
        else:
            # Emit the crop 2x2 space-to-depth packed: plane (a, b, ch) of
            # the output holds crop[a::2, b::2, ch] — the packed-graph input
            # convention of tflite_compiler.space_to_depth_pack (channel
            # index (a*2+b)*C + ch).  Same total matmul work, 4 quarter
            # crops per channel instead of 1.
            nch = len(planes)
            wys = [weights(size // 2, a, 2, cy, h_, gy)
                   for a in range(2)]
            wxs = [weights(size // 2, b, 2, cx, w_, gx)
                   for b in range(2)]
            for ch, f in enumerate(planes):
                tmps = [jnp.dot(wya, f, preferred_element_type=jnp.float32
                                ).astype(dtype) for wya in wys]
                for a in range(2):
                    for b in range(2):
                        res = jnp.dot(tmps[a], wxs[b].T,
                                      preferred_element_type=jnp.float32)
                        if scale != 1.0:
                            res = res * scale
                        out_ref[0, (a * 2 + b) * nch + ch] = res.astype(
                            out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sizes", "interpret", "dtype",
                                             "out_dtype", "scale", "pack"))
def multi_crop(frames_planar: Array, rects: Array, sizes: tuple[int, ...],
               interpret: bool = False, dtype=jnp.float32,
               out_dtype=jnp.float32, scale: float = 1.0,
               pack: int | tuple[int, ...] = 1
               ) -> tuple[Array, ...]:
    """Crop ``len(sizes)`` axis-aligned rects out of each stream's frame.

    frames_planar: uint8 [S, 3, H, W]; rects: float32 [S, C, 4] as
    (cx, cy, w, h) pixel rects (NaN -> zero crop).  Returns one
    [S, 3, size, size] ``out_dtype`` array per crop, multiplied by ``scale``
    (fold the nets' /255 normalization into the kernel epilogue — with
    ``out_dtype=bfloat16`` the crops land in HBM half-sized AND
    net-ready, no separate normalize/convert pass).  ``dtype`` sets the
    matmul operand precision (bf16 when the crops feed bf16 nets — ~0.4%
    weight quantization, invisible to the landmark nets).
    """
    s, ch, h, w = frames_planar.shape
    c = rects.shape[1]
    assert c == len(sizes)
    packs = (pack,) * c if isinstance(pack, int) else tuple(pack)
    assert len(packs) == c
    assert all(p in (1, 2) and sz % p == 0 for p, sz in zip(packs, sizes))
    grid = (s,)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((s, ch * p * p, sz // p, sz // p), out_dtype)
        for p, sz in zip(packs, sizes))
    out_specs = tuple(
        pl.BlockSpec((1, ch * p * p, sz // p, sz // p),
                     lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        for p, sz in zip(packs, sizes))
    return pl.pallas_call(
        functools.partial(_kernel, sizes=sizes, dtype=dtype, scale=scale,
                          packs=packs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ch, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(rects, frames_planar)


def multi_crop_reference(frames_planar: Array, rects: Array,
                         sizes: tuple[int, ...]) -> tuple[Array, ...]:
    """Pure-XLA equivalent (used off-TPU and as the test oracle)."""
    from bp_from_video_tpu.models import warp

    outs = []
    frames_hwc = jnp.transpose(frames_planar, (0, 2, 3, 1))
    for ci, sz in enumerate(sizes):
        def one(frame, r):
            rect = warp.Rect(r[0], r[1], r[2], r[3], jnp.float32(0.0))
            crop = warp.crop_rect(frame, rect, sz, exact_rotation=False)
            return jnp.transpose(crop, (2, 0, 1))
        outs.append(jax.vmap(one)(frames_hwc, rects[:, ci]))
    return tuple(outs)
