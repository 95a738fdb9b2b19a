"""Pallas TPU kernel: fused stride-2 blaze block as ONE flat MXU matmul.

The stand-in landmark trunks (models/blaze.landmark_trunk) are chains of
stride-2 depthwise-separable blocks.  XLA lowers each dw/pw pair through
its conv pipeline, whose time scales with streamed rows x kernel taps
(~13 rows/cycle measured on this stack) — at 24..192 channels that
pipeline uses a sliver of the MXU's 128x128 cells and dominates the
inference step (the nets are ~6.3 ms of the 8.1 ms step, SKILL.md).

This kernel reformulates a whole block as one dense contraction:

  1. dw (3x3, stride 2) and pw (1x1) are linear maps with no activation
     between them, so they compose exactly into ONE dense 3x3/2 conv
     W[dy,dx,c,o] = dw[dy,dx,0,c] * pw[0,0,c,o]  (models/blaze.py:52-60).
  2. On a 2x2 space-to-depth packed input ([4C, h, w] quarter planes,
     parity-major), every tap of a stride-2 3x3 SAME conv is a packed
     plane shifted by (dy//2, dx//2) in {0,1}^2 — unit lane shifts only.
  3. Activations live FLATTENED ([4C, h*w]) so the tap windows stack into
     a 2D matrix and the whole block becomes
         acc[O, h*w] = W'[O, K] @ windows[K, h*w]
     one MXU dot per crop, f32 accumulation.  (Mosaic cannot reshape
     multi-dim vectors in-kernel, which killed the 3D-window dot in
     pallas/stem_kernel.py — 2D windows never need one.)
  4. The block's residual maxpool (2x2/2 SAME) is exactly the elementwise
     max of the four parity planes — no windowing at all on packed input.
  5. Bias + residual-add + channel-pad + [P]ReLU fuse into the epilogue.

Weight layouts (host-prepared, see pack_block_weights):
  * C % 8 == 0 ("sliced"): windows are the 9 tap slices of the 4 shifted
    plane blocks, K = 9*C (f32 sublane slicing needs 8-aligned offsets).
  * otherwise ("expanded", e.g. the stem's C=3): windows are the 4 whole
    shifted blocks concatenated, K = 16*C, and W' has zero rows for the
    7*C unused (shift, parity) pairs.  The stem's expanded K=48 still
    fits one MXU K-tile, so the padding is free.

Edge handling: TFLite SAME at even sizes pads (lo=0, hi=1); a shifted
plane's wrapped far edge is zeroed with a precomputed [4, h*w] mask
(rows: none / x / y / xy), avoiding in-kernel iota+mod.

Reference contract: models/blaze._blaze_block (stride=2) — bit-compatible
with the XLA path at bf16 inputs and f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _roll_masked(x_f32: Array, shift_flat: int, mask_row) -> Array:
    """Flat-layout shift: roll the [N, h*w] block left by ``shift_flat``
    lanes and zero the wrapped tail via ``mask_row`` ([1, h*w])."""
    if shift_flat == 0:
        return x_f32
    hw = x_f32.shape[-1]
    out = pltpu.roll(x_f32, shift=hw - shift_flat, axis=1)
    return out * mask_row


def _block_kernel(x_ref, w_ref, b_ref, a_ref, m_ref, out_ref, win_ref, *,
                  cin, cout, row, wspec, resid):
    """One crop: packed-flat [1, 4*cin, h*w] -> [1, cout, h*w].

    wspec: "sliced" (K = 9*cin) or "expanded" (K = 4*rup8(4*cin)).

    The tap windows are STORED into the ``win_ref`` VMEM scratch before
    the dot: ``pltpu.roll`` yields vectors with lazy lane-offset layouts,
    and Mosaic cannot sublane-concatenate mixed-offset vectors
    ("result/input offset mismatch on non-concat dimension") — a store
    materializes each shifted copy at the canonical layout instead.
    """
    f32 = jnp.float32
    x = x_ref[0].astype(f32)                      # [4C, hw]
    mx = m_ref[1:2].astype(f32)                   # [1, hw] lane masks
    my = m_ref[2:3].astype(f32)
    mxy = m_ref[3:4].astype(f32)
    # Shifted copies of the whole packed block (unit shifts on the packed
    # quarter grid; flat y-shift = roll by ``row``, the packed row length).
    s01 = _roll_masked(x, 1, mx)
    s10 = _roll_masked(x, row, my)
    s11 = _roll_masked(x, row + 1, mxy)
    shifts = (x, s01, s10, s11)
    wdt = win_ref.dtype
    if wspec == "sliced":
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                     for dx in range(3)):
            s = shifts[(dy // 2) * 2 + (dx // 2)]
            p = (dy % 2) * 2 + (dx % 2)
            win_ref[t * cin:(t + 1) * cin] = (
                s[p * cin:(p + 1) * cin].astype(wdt))
    else:
        pad = -(-4 * cin // 8) * 8
        for g in range(4):
            win_ref[g * pad:g * pad + 4 * cin] = shifts[g].astype(wdt)
            if pad > 4 * cin:
                # The padding rows multiply zero weight rows, but scratch
                # is uninitialized (NaN * 0 = NaN) — zero them.
                win_ref[g * pad + 4 * cin:(g + 1) * pad] = jnp.zeros(
                    (pad - 4 * cin, x.shape[-1]), wdt)
    acc = jax.lax.dot_general(
        w_ref[:], win_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)               # [O, hw]
    acc = acc + b_ref[:].astype(f32)              # [O, 1] lane broadcast
    if resid:
        pooled = jnp.maximum(
            jnp.maximum(x[0 * cin:1 * cin], x[1 * cin:2 * cin]),
            jnp.maximum(x[2 * cin:3 * cin], x[3 * cin:4 * cin]))
        top = acc[:cin] + pooled
        if cout > cin:
            acc = jnp.concatenate([top, acc[cin:]], axis=0)
        else:
            acc = top
        acc = jnp.maximum(acc, 0.0)
    else:
        alpha = a_ref[:].astype(f32)              # [O, 1]
        acc = jnp.where(acc >= 0.0, acc, acc * alpha)
    out_ref[0] = acc.astype(out_ref.dtype)


def pack_block_weights(w_dense, *, cin: int) -> tuple[np.ndarray, str]:
    """HWIO [3, 3, cin, cout] dense conv weight (HOST array) ->
    ([cout, K] bf16 numpy, wspec) matching the kernel's window row order.

    Host-side prep: input and output are NUMPY — never a device array.
    The first device-to-host transfer in a process flips the axon client
    out of its async fast path permanently (~5 min stall, then ~25 ms per
    dispatch; tools/poisonprobe.py bisect, round 3), so construction-time
    packing must not round-trip the device.  The packed weights ride in
    the params pytree and upload once with it."""
    wd = np.asarray(w_dense, np.float32)
    k = wd.shape[0]
    assert k == 3 and wd.shape[1] == 3, wd.shape
    cout = wd.shape[3]
    bf16 = jnp.bfloat16  # ml_dtypes.bfloat16 — numpy-compatible dtype
    if cin % 8 == 0:
        rows = np.zeros((9 * cin, cout), np.float32)
        i = 0
        for dy in range(3):
            for dx in range(3):
                rows[i * cin:(i + 1) * cin] = wd[dy, dx]
                i += 1
        return np.ascontiguousarray(rows.T).astype(bf16), "sliced"
    pad = -(-4 * cin // 8) * 8
    rows = np.zeros((4 * pad, cout), np.float32)
    for dy in range(3):
        for dx in range(3):
            blk = (dy // 2) * 2 + (dx // 2)
            p = (dy % 2) * 2 + (dx % 2)
            off = blk * pad + p * cin
            rows[off:off + cin] = wd[dy, dx]
    return np.ascontiguousarray(rows.T).astype(bf16), "expanded"


@functools.lru_cache(maxsize=None)
def _edge_masks(h: int, w: int) -> np.ndarray:
    """[4, h*w] f32: row 0 unused(ones), 1 = x-shift valid, 2 = y-shift
    valid, 3 = both."""
    col = np.arange(h * w) % w
    rowi = np.arange(h * w) // w
    mx = (col < w - 1).astype(np.float32)
    my = (rowi < h - 1).astype(np.float32)
    return np.stack([np.ones(h * w, np.float32), mx, my, mx * my])


@functools.partial(jax.jit, static_argnames=(
    "cin", "cout", "h", "w", "wspec", "resid", "interpret"))
def _block_call(x_flat, wmat, b, alpha, masks, *, cin, cout, h, w,
                wspec, resid, interpret):
    bsz, c4, hw = x_flat.shape
    kern = functools.partial(_block_kernel, cin=cin, cout=cout, row=w,
                             wspec=wspec, resid=resid)
    kdim = wmat.shape[1]
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, c4, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, kdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, hw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, hw), x_flat.dtype),
        scratch_shapes=[pltpu.VMEM((kdim, hw), jnp.bfloat16)],
        interpret=interpret,
    )(x_flat, wmat, b, alpha, masks)


def pack_s2d(x: Array) -> Array:
    """[B, C, H, W] -> [B, 4C, H/2, W/2], parity-major planes
    ((a*2+b)*C + c) — the multi_crop pack=2 channel order."""
    b, c, hh, ww = x.shape
    y = x.reshape(b, c, hh // 2, 2, ww // 2, 2)
    y = jnp.transpose(y, (0, 3, 5, 1, 2, 4))
    return y.reshape(b, 4 * c, hh // 2, ww // 2)


def dense_s2_block(x_packed: Array, wmat: Array, wspec: str, b: Array,
                   alpha: Array | None, *, cin: int, resid: bool,
                   interpret: bool = False) -> Array:
    """Packed input [B, 4*cin, h, w] -> [B, cout, h, w] (one stride-2
    dense-conv block; h, w are already the OUTPUT resolution).

    wmat/wspec from pack_block_weights.  resid=True applies the blaze
    residual (maxpool of parity planes + channel pad + ReLU); resid=False
    applies [P]ReLU only (alpha=None -> ReLU) — the stem flavor.
    """
    bsz, c4, h, w = x_packed.shape
    assert c4 == 4 * cin, (x_packed.shape, cin)
    cout = wmat.shape[0]
    if alpha is None:
        alpha = jnp.zeros((cout,), jnp.float32)
    masks = jnp.asarray(_edge_masks(h, w))
    y = _block_call(x_packed.reshape(bsz, c4, h * w), wmat,
                    b.reshape(cout, 1).astype(jnp.float32),
                    alpha.reshape(cout, 1).astype(jnp.float32),
                    masks, cin=cin, cout=cout, h=h, w=w, wspec=wspec,
                    resid=resid, interpret=interpret)
    return y.reshape(bsz, cout, h, w)


# -- stride-1 bottleneck (the real face-mesh residual unit) -------------------
#
# MediaPipe's face_landmarks_detector.tflite trunk is a chain of bottleneck
# units (reference/models bundle; graph ops 2..25 at 128^2 etc.):
#     y = PReLU_c( x + conv1x1_up( dw3x3( PReLU_d( conv1x1_down(x) ) ) ) )
# dw3x3 has no activation before the 1x1-up, so the pair composes exactly
# into ONE dense 3x3 D->C conv; the whole unit is then two MXU dots per
# crop on flat [C, h*w] activations, VMEM-resident end to end.


def _bottleneck_kernel(x_ref, r_ref, wd_ref, bd_ref, ad_ref, wu_ref,
                       bu_ref, au_ref, m_ref, out_ref, win_ref, *,
                       cin, cmid, row, last_act):
    """One crop: [1, C, h*w] (+ residual [1, C, h*w]) -> [1, C', h*w].

    m_ref: [8, h*w] masks for the 8 non-center unit shifts in
    (dy, dx) = (-1,-1)..(1,1) order skipping (0,0).
    """
    f32 = jnp.float32
    x = x_ref[0]                                   # [C, hw] bf16
    z = jax.lax.dot_general(
        wd_ref[:], x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                # [D, hw]
    z = z + bd_ref[:].astype(f32)
    ad = ad_ref[:].astype(f32)
    z = jnp.where(z >= 0.0, z, z * ad)             # PReLU mid
    hw = z.shape[-1]
    t = 0
    mi = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                s = z
            else:
                sh = (dy * row + dx) % hw
                s = pltpu.roll(z, shift=hw - sh, axis=1)
                s = s * m_ref[mi:mi + 1].astype(f32)
                mi += 1
            win_ref[t * cmid:(t + 1) * cmid] = s.astype(win_ref.dtype)
            t += 1
    acc = jax.lax.dot_general(
        wu_ref[:], win_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                # [C', hw]
    acc = acc + bu_ref[:].astype(f32)
    acc = acc + r_ref[0].astype(f32)
    if last_act == "prelu":
        au = au_ref[:].astype(f32)
        acc = jnp.where(acc >= 0.0, acc, acc * au)
    elif last_act == "relu":
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.lru_cache(maxsize=None)
def _shift_masks(h: int, w: int) -> np.ndarray:
    """[8, h*w] f32 validity masks for the unit shifts (dy, dx) in
    (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1) order: the
    window value read from position (y+dy, x+dx) is valid iff that
    position is inside the [h, w] grid (SAME zero padding)."""
    col = np.arange(h * w) % w
    rowi = np.arange(h * w) // w
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ok = np.ones(h * w, bool)
            if dy < 0:
                ok &= rowi > 0
            elif dy > 0:
                ok &= rowi < h - 1
            if dx < 0:
                ok &= col > 0
            elif dx > 0:
                ok &= col < w - 1
            out.append(ok.astype(np.float32))
    return np.stack(out)


def pack_bottleneck_weights(w_down, w_dw, w_up,
                            dtype=jnp.bfloat16) -> tuple[np.ndarray, np.ndarray]:
    """(1x1 down [1,1,C,D], dw [3,3,D] or [3,3,1,D], 1x1 up [1,1,D,C'])
    -> (wd [D, C], wu [C', 9D]) numpy in ``dtype`` where wu is the dw∘up
    dense composition laid out in the kernel's (dy, dx)-major window order.

    Host-side prep: NUMPY in, NUMPY out (see pack_block_weights — a
    device round-trip here poisons the axon client's dispatch path)."""
    wd = np.asarray(w_down, np.float32)[0, 0].T  # [D, C]
    dw = np.asarray(w_dw, np.float32)
    if dw.ndim == 4:
        dw = dw[:, :, 0, :] if dw.shape[2] == 1 else dw[0]
    up = np.asarray(w_up, np.float32)[0, 0]      # [D, C']
    d = up.shape[0]
    rows = np.zeros((9 * d, up.shape[1]), np.float32)
    t = 0
    for dy in range(3):
        for dx in range(3):
            # Tap (dy, dx) of the conv reads input at (y+dy-1, x+dx-1),
            # i.e. the kernel's shift (dy-1, dx-1) window slot.
            rows[t * d:(t + 1) * d] = dw[dy, dx][:, None] * up
            t += 1
    return (wd.astype(dtype), np.ascontiguousarray(rows.T).astype(dtype))


@functools.partial(jax.jit, static_argnames=(
    "cin", "cmid", "h", "w", "last_act", "interpret"))
def _bottleneck_call(x_flat, r_flat, wd, bd, ad, wu, bu, au, masks, *,
                     cin, cmid, h, w, last_act, interpret):
    bsz, c, hw = x_flat.shape
    cout = wu.shape[0]
    kern = functools.partial(_bottleneck_kernel, cin=cin, cmid=cmid,
                             row=w, last_act=last_act)
    full = lambda i: (i, 0, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, c, hw), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, hw), full, memory_space=pltpu.VMEM),
            pl.BlockSpec(wd.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wu.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hw), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, hw), full,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, hw), x_flat.dtype),
        scratch_shapes=[pltpu.VMEM((9 * cmid, hw), wu.dtype)],
        interpret=interpret,
    )(x_flat, r_flat, wd, bd, ad, wu, bu, au, masks)


def bottleneck_s1(x: Array, residual: Array, wd: Array, bd: Array,
                  ad: Array, wu: Array, bu: Array, au: Array | None, *,
                  last_act: str = "prelu", interpret: bool = False) -> Array:
    """Fused face-mesh bottleneck on flat crops.

    x: [B, C, h, w] (bf16); residual: [B, C', h, w] (the ADD's other
    operand — usually x itself, or the padded maxpool after a downsample);
    wd/wu from pack_bottleneck_weights; bd/ad: [D]; bu/au: [C'].
    Returns [B, C', h, w].
    """
    bsz, c, h, w = x.shape
    cmid = wd.shape[0]
    cout = wu.shape[0]
    if au is None:
        au = jnp.zeros((cout,), jnp.float32)
    masks = jnp.asarray(_shift_masks(h, w))
    col = lambda v, n: v.reshape(n, 1).astype(jnp.float32)
    y = _bottleneck_call(
        x.reshape(bsz, c, h * w), residual.reshape(bsz, cout, h * w),
        wd, col(bd, cmid), col(ad, cmid), wu, col(bu, cout),
        col(au, cout), masks, cin=c, cmid=cmid, h=h, w=w,
        last_act=last_act, interpret=interpret)
    return y.reshape(bsz, cout, h, w)


# -- chained bottleneck stage -------------------------------------------------
#
# The face-mesh trunk runs its bottleneck units in stages of 4 identical
# shapes.  One pallas_call per unit pays the block DMA (x in, y out) and
# the call overhead 4x per stage; at small spatials that overhead dominates
# (tools/bnprobe.py: 2^2 stage 1.25 ms pallas vs 0.55 ms XLA).  Chaining a
# whole stage into ONE call keeps the activation VMEM-resident across all
# 4 units — per-stage traffic drops to one load + one store.


def _bottleneck_chain_kernel(x_ref, wd_ref, bd_ref, ad_ref, wu_ref,
                             bu_ref, au_ref, m_ref, out_ref, win_ref, *,
                             units, cmid, row, last_act):
    """One crop through ``units`` chained same-shape bottleneck units
    ([1, C, hw] -> [1, C, hw]); each unit's residual is its own input.

    Stacked weights: wd [U, D, C], wu [U, C, 9D], biases/alphas [U, n, 1].
    """
    f32 = jnp.float32
    y = x_ref[0]                                   # [C, hw]
    hw = y.shape[-1]
    for u in range(units):
        z = jax.lax.dot_general(
            wd_ref[u], y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)            # [D, hw]
        z = z + bd_ref[u].astype(f32)
        z = jnp.where(z >= 0.0, z, z * ad_ref[u].astype(f32))
        t = 0
        mi = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    s = z
                else:
                    sh = (dy * row + dx) % hw
                    s = pltpu.roll(z, shift=hw - sh, axis=1)
                    s = s * m_ref[mi:mi + 1].astype(f32)
                    mi += 1
                win_ref[t * cmid:(t + 1) * cmid] = s.astype(win_ref.dtype)
                t += 1
        acc = jax.lax.dot_general(
            wu_ref[u], win_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)            # [C, hw]
        acc = acc + bu_ref[u].astype(f32)
        acc = acc + y.astype(f32)
        if last_act == "prelu":
            acc = jnp.where(acc >= 0.0, acc, acc * au_ref[u].astype(f32))
        elif last_act == "relu":
            acc = jnp.maximum(acc, 0.0)
        # Round once per unit, like the unchained per-call kernels.
        y = acc.astype(out_ref.dtype)
    out_ref[0] = y


@functools.partial(jax.jit, static_argnames=(
    "cmid", "h", "w", "last_act", "interpret"))
def _bottleneck_chain_call(x_flat, wd, bd, ad, wu, bu, au, masks, *,
                           cmid, h, w, last_act, interpret):
    bsz, c, hw = x_flat.shape
    units = wd.shape[0]
    kern = functools.partial(_bottleneck_chain_kernel, units=units,
                             cmid=cmid, row=w, last_act=last_act)
    full = lambda i: (i, 0, 0)
    c2 = lambda i: (0, 0, 0)
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, c, hw), full, memory_space=pltpu.VMEM),
            pl.BlockSpec(wd.shape, c2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bd.shape, c2, memory_space=pltpu.VMEM),
            pl.BlockSpec(ad.shape, c2, memory_space=pltpu.VMEM),
            pl.BlockSpec(wu.shape, c2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bu.shape, c2, memory_space=pltpu.VMEM),
            pl.BlockSpec(au.shape, c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, hw), full, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, c, hw), x_flat.dtype),
        scratch_shapes=[pltpu.VMEM((9 * cmid, hw), wu.dtype)],
        interpret=interpret,
    )(x_flat, wd, bd, ad, wu, bu, au, masks)


def _chain_group(bsz: int, hw: int, cmid: int) -> int:
    """Crops per grid step for bottleneck_chain: concatenate G crops on
    the LANE axis so small-spatial stages amortize the per-step kernel
    overhead and feed the MXU wide N (tools/bnprobe.py: per-crop calls
    floor at ~0.15 ms/unit regardless of data size below 64^2).  Bounded
    by the [9*D, G*hw] VMEM scratch (~5 MB) and one lane-tile target."""
    target = max(hw, min(8192, 5_000_000 // (18 * cmid)))
    g = max(1, min(bsz, target // hw))
    while bsz % g:
        g -= 1
    return g


def bottleneck_chain(x: Array, wd: Array, bd: Array, ad: Array, wu: Array,
                     bu: Array, au: Array, *, last_act: str = "prelu",
                     interpret: bool = False) -> Array:
    """Chained same-shape bottleneck units on flat crops.

    x: [B, C, h, w]; wd: [U, D, C]; wu: [U, C, 9D] (each unit's packed
    weights from pack_bottleneck_weights, stacked); bd/ad: [U, D];
    bu/au: [U, C].  Each unit's residual is its own input (the face-mesh
    stage chain contract).  Returns [B, C, h, w].

    Crops are processed G at a time, concatenated on the lane axis
    (_chain_group): the in-kernel rolls bleed across crop boundaries but
    the tiled shift masks zero exactly those lanes, so grouping is
    value-exact vs G=1.
    """
    bsz, c, h, w = x.shape
    u, cmid = wd.shape[0], wd.shape[1]
    hw = h * w
    g = _chain_group(bsz, hw, cmid)
    m1 = _shift_masks(h, w)
    masks = jnp.asarray(np.tile(m1, (1, g)))
    col = lambda v, n: v.reshape(u, n, 1).astype(jnp.float32)
    xg = x.reshape(bsz // g, g, c, hw)
    xg = jnp.transpose(xg, (0, 2, 1, 3)).reshape(bsz // g, c, g * hw)
    y = _bottleneck_chain_call(
        xg, wd, col(bd, cmid), col(ad, cmid),
        wu, col(bu, c), col(au, c), masks, cmid=cmid, h=h, w=w,
        last_act=last_act, interpret=interpret)
    y = y.reshape(bsz // g, c, g, hw)
    return jnp.transpose(y, (0, 2, 1, 3)).reshape(bsz, c, h, w)


# -- whole-trunk driver -------------------------------------------------------

def compose_block_params(p: dict) -> tuple[np.ndarray, np.ndarray]:
    """dw+pw blaze-block params -> the exact dense HWIO twin
    (models/blaze.py:52-60) plus its bias.  Pure NUMPY host math — the
    params must be host arrays (see pack_block_weights)."""
    dw_w = np.asarray(p["dw"]["w"], np.float32)
    pw_w = np.asarray(p["pw"]["w"], np.float32)
    w = dw_w[:, :, 0, :, None] * pw_w[0, 0][None, None]
    b = (np.asarray(p["pw"]["b"], np.float32)
         + pw_w[0, 0].T @ np.asarray(p["dw"]["b"], np.float32))
    return w, b


def prepare_trunk(params: dict) -> tuple[list, tuple]:
    """Precompute packed weights for a stand-in landmark trunk
    (models/blaze.init_blaze_landmark params, HOST arrays).  Returns
    (arrays, specs): ``arrays`` is a jit-traversable list of
    {"wmat", "b"} per block (numpy — goes into the engine's params pytree
    and uploads with it); ``specs`` is the STATIC ((wspec, cin), ...)
    tuple kept outside it.  Built once at engine construction, entirely
    host-side (no device traffic in either direction)."""
    arrays, specs = [], []
    for name in ("b1", "b2", "b3", "b4"):
        w, b = compose_block_params(params[name])
        cin = w.shape[2]
        wmat, wspec = pack_block_weights(w, cin=cin)
        arrays.append({"wmat": wmat, "b": b})
        specs.append((wspec, cin))
    return arrays, tuple(specs)


def trunk_apply(arrays: list, specs: tuple, stems: Array,
                interpret: bool = False) -> Array:
    """Stem activations [B, 24, S/2, S/2] -> SPATIAL trunk features
    [B, 192, S/32, S/32] (the four stride-2 blocks fused).  The heads
    consume the spatial map directly (blaze.landmark_heads: dense
    landmark readout + pooled presence).  XLA does the 2x2 space-to-depth
    relayout between stages."""
    y = stems
    for blk, (wspec, cin) in zip(arrays, specs):
        y = dense_s2_block(pack_s2d(y), blk["wmat"], wspec,
                           blk["b"], None, cin=cin, resid=True,
                           interpret=interpret)
    return y


def blaze_block_reference(p: dict, x: Array) -> Array:
    """XLA oracle: models/blaze._blaze_block(stride=2) on unpacked
    [B, C, H, W] input (same dtype contract as the kernel: bf16 tap
    inputs, f32 accumulation, output in the input dtype)."""
    from bp_from_video_tpu.models import blaze
    return blaze._blaze_block(p, x, stride=2)
