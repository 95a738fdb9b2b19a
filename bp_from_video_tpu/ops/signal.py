"""Fixed-shape, NaN-masked signal ring buffers — the TPU-native equivalent of
the reference's ``collections.deque``-based Signal/SignalGroup core
(reference signal_data.py:12-117).

Design: a "signal" is a pair of device arrays ``(x, y)`` whose trailing axis
is time, NaN-prefilled to capacity so every array is always "full"
(mirroring reference signal_data.py:18-19).  Validity is never stored — it is
re-derived from finiteness exactly like the reference's ``v``/``w`` masks
(signal_data.py:43-45).  A ring "push" is a roll + set of the last slot; all
analytics (mean sampling frequency, NaN-mean, windowed arg-peak) are masked
reductions, so every function here is jit/vmap/shard-friendly with static
shapes.

Groups (reference SignalGroup, signal_data.py:73-117) are just a leading
signal axis; use ``jax.vmap`` or the batched helpers below.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


def full_signal(length: int, y_shape: tuple[int, ...] = (), dtype=jnp.float32
                ) -> tuple[Array, Array]:
    """NaN-prefilled (x, y) ring pair of capacity ``length``.

    ``y_shape`` adds trailing per-sample dims (e.g. ``(6,)`` for ROI tuples,
    matching reference SignalStore sg_roi, signal_processor.py:78).
    """
    x = jnp.full((length,), jnp.nan, dtype)
    y = jnp.full((length,) + tuple(y_shape), jnp.nan, dtype)
    return x, y


def push(x: Array, y: Array, new_x: Array, new_y: Array) -> tuple[Array, Array]:
    """Ring push: drop the oldest sample, append the newest
    (reference signal_data.py:31-35: ``deque.append`` with maxlen)."""
    x = jnp.roll(x, -1, axis=0).at[-1].set(new_x)
    y = jnp.roll(y, -1, axis=0).at[-1].set(new_y)
    return x, y


def push_if(cond: Array, x: Array, y: Array, new_x: Array, new_y: Array
            ) -> tuple[Array, Array]:
    """``push`` gated on a traced scalar: the ring advances only when
    ``cond`` is true, else both arrays pass through unchanged.

    Used for duplicate-sample suppression in the multi-stream engine: the
    latest-wins feeder re-ships a stream's previous (frame, timestamp)
    whenever another stream was fresh first, and an ungated push would
    fill the fixed window with repeated rows (halving the spectral window,
    zeroing dx for the fs estimates).  The reference's per-process loop
    only ever processes fresh frames (pbp.py:21 blocks on q_in.get())."""
    px, py = push(x, y, new_x, new_y)
    return jnp.where(cond, px, x), jnp.where(cond, py, y)


def valid_x(x: Array) -> Array:
    """The ``v`` mask: finite timestamps (reference signal_data.py:44)."""
    return jnp.isfinite(x)


def valid_y(y: Array) -> Array:
    """The ``w`` mask: finite values; rows-all-finite for per-sample vectors
    (reference signal_data.py:45). Time is axis 0 of ``y`` here."""
    w = jnp.isfinite(y)
    if y.ndim >= 2:
        w = jnp.all(w.reshape(y.shape[0], -1), axis=-1)
    return w


def masked_minmax(a: Array, mask: Array) -> tuple[Array, Array]:
    """(nanmin, nanmax) over masked entries; (NaN, NaN) when fewer than two
    valid entries (reference signal_data.py:47-49 ``reset_range``)."""
    flat = a.reshape(-1)
    m = jnp.broadcast_to(mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim)),
                         a.shape).reshape(-1)
    lo = jnp.min(jnp.where(m, flat, jnp.inf))
    hi = jnp.max(jnp.where(m, flat, -jnp.inf))
    ok = jnp.sum(mask) >= 2
    nan = jnp.float32(jnp.nan)
    return jnp.where(ok, lo, nan), jnp.where(ok, hi, nan)


def mean_fs(x: Array, w: Array | None = None) -> Array:
    """Mean sampling frequency 1/mean(Δx over valid x)
    (reference signal_data.py:55-58 ``get_fs``). NaN when <2 valid samples.

    The reference compresses ``x[u]`` before differencing; because invalid
    timestamps only occur in the NaN-prefill prefix (timestamps themselves
    are always finite once pushed), differencing consecutive-valid pairs is
    equivalent. ``w=None`` uses the ``v`` mask (get_fs(only_valid=False)).
    """
    u = valid_x(x) if w is None else w
    # Pairs of consecutive valid entries. With a contiguous valid suffix this
    # matches diff-after-compress exactly.
    dx = x[1:] - x[:-1]
    pair = u[1:] & u[:-1]
    cnt = jnp.sum(pair)
    mean_dx = jnp.sum(jnp.where(pair, dx, 0.0)) / jnp.maximum(cnt, 1)
    return jnp.where(jnp.sum(u) >= 2, 1.0 / mean_dx, jnp.nan)


def masked_mean(y: Array, as_int: bool = False) -> Array:
    """NaN-mean over the time axis, falling back to the newest sample when
    nothing is valid (reference signal_data.py:60-63 ``get_mean``)."""
    w = valid_y(y)
    any_valid = jnp.any(w)
    wb = w.reshape(w.shape + (1,) * (y.ndim - 1))
    cnt = jnp.maximum(jnp.sum(w), 1)
    mean = jnp.sum(jnp.where(wb, y, 0.0), axis=0) / cnt
    out = jnp.where(any_valid, mean, y[-1])
    if as_int:
        # Reference rounds only when some sample is valid (y.round() of the
        # NaN fallback would be NaN anyway; we keep NaN to stay branchless).
        out = jnp.where(any_valid, jnp.round(out), out)
    return out


def peak(x: Array, y: Array, min_x: Array | float, max_x: Array | float
         ) -> tuple[Array, Array]:
    """Arg-max of y restricted to ``min_x <= x <= max_x`` and valid y;
    (NaN, NaN) when fewer than 2 in-window valid samples
    (reference signal_data.py:65-70 ``get_peak``)."""
    u = (x >= min_x) & (x <= max_x) & valid_y(y)
    ok = jnp.sum(u) >= 2
    yv = jnp.where(u, y, -jnp.inf)
    i = jnp.argmax(yv)
    nan = jnp.float32(jnp.nan)
    return jnp.where(ok, x[i], nan), jnp.where(ok, y[i], nan)


def peak_auto(x: Array, y: Array) -> tuple[Array, Array]:
    """get_peak with the signal's own auto x-range — the reference's
    *effective* default: SignalGroup.__init__ calls reset_ranges()
    (signal_data.py:86, :100-105) which clobbers every set_range() done in
    transform_signal/correlate_signal_pair (signal_processor.py:272, :294),
    so sg_spec.get_peaks()/sg_corr.get_peaks() (:310, :312) search the FULL
    data range, not the configured band."""
    lo, hi = masked_minmax(x, valid_x(x))
    return peak(x, y, lo, hi)


def auto_range(x: Array, y: Array) -> tuple[Array, Array, Array, Array]:
    """(min_x, max_x, min_y, max_y) auto data ranges (reference
    signal_data.py:47-49)."""
    lo_x, hi_x = masked_minmax(x, valid_x(x))
    lo_y, hi_y = masked_minmax(y, valid_y(y))
    return lo_x, hi_x, lo_y, hi_y


def group_range(los: Array, his: Array) -> tuple[Array, Array]:
    """Joint range across a group's per-signal ranges: NaN unless every
    signal has at least one finite bound (reference signal_data.py:100-105
    ``reset_ranges``)."""
    per_signal_ok = jnp.isfinite(los) | jnp.isfinite(his)
    ok = jnp.all(per_signal_ok)
    lo = jnp.min(jnp.where(jnp.isfinite(los), los, jnp.inf))
    hi = jnp.max(jnp.where(jnp.isfinite(his), his, -jnp.inf))
    nan = jnp.float32(jnp.nan)
    return jnp.where(ok, lo, nan), jnp.where(ok, hi, nan)


# --- Compaction --------------------------------------------------------------


class Compacted(NamedTuple):
    """Valid samples moved to the front of a fixed-shape array.

    The reference freely takes ``y[valid]`` (dynamic shape); on TPU we keep
    static shapes and carry ``count`` = number of valid leading entries.
    Slots at and beyond ``count`` hold ``fill``.
    """

    values: Array
    count: Array  # scalar int32


def _front_perm(mask: Array) -> Array:
    """Permutation moving valid entries to the front, stably: perm[i] = the
    original index of front slot i."""
    keys = (~mask).astype(jnp.int32)
    idx = jnp.arange(mask.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort([keys, idx], dimension=0, is_stable=True,
                           num_keys=1)
    return perm


def compact(mask: Array, values: Array, fill: float = 0.0) -> Compacted:
    """Stable-move masked entries of ``values`` (time axis 0) to the front.

    Implemented as a stable vectorized sort on the validity key (TPU sorts
    are compare-exchange networks; scatters are element-serial).
    """
    n = mask.shape[0]
    keys = (~mask).astype(jnp.int32)
    keys_b = jnp.broadcast_to(
        keys.reshape((n,) + (1,) * (values.ndim - 1)), values.shape)
    _, out = jax.lax.sort([keys_b, values], dimension=0, is_stable=True,
                          num_keys=1)
    count = jnp.sum(mask).astype(jnp.int32)
    slot = jnp.arange(n).reshape((n,) + (1,) * (values.ndim - 1))
    out = jnp.where(slot < count, out, jnp.asarray(fill, values.dtype))
    return Compacted(out, count)


def scatter_back(mask: Array, compacted: Array, original: Array) -> Array:
    """Inverse of :func:`compact`: write compacted values back into the
    masked slots of ``original`` (the reference's ``y[valid] = result``).
    Sorting the compacted values by the forward permutation realigns them to
    their original slots — two sorts instead of a serial scatter."""
    n = mask.shape[0]
    perm = _front_perm(mask)
    perm_b = jnp.broadcast_to(
        perm.reshape((n,) + (1,) * (compacted.ndim - 1)), compacted.shape)
    _, aligned = jax.lax.sort([perm_b, compacted], dimension=0,
                              is_stable=True, num_keys=1)
    m = mask.reshape(mask.shape + (1,) * (original.ndim - 1))
    return jnp.where(m, aligned, original)


def arange_mask(n: int, count: Array) -> Array:
    """Boolean mask of the first ``count`` slots of a length-``n`` axis."""
    return jnp.arange(n) < count


def bracket_matrix(cxv: Array, count: Array, queries: Array
                   ) -> tuple[Array, Array, Array]:
    """One-hot segment-bracket matrix over a compacted sorted axis.

    ``m[q, i] = 1`` iff ``cxv[i] <= queries[q] < cxv[i+1]`` with
    ``i < count - 1`` — exactly ``searchsorted(side='right') - 1`` for
    in-range queries, but as a dense [Q, n] compare instead of serial
    binary search + fancy indexing (gathers/searchsorted are
    element-serial on TPU; this pattern removed ~95% of the on-device
    plot-rasterization cost, render/plotter._trace_cols).

    Returns ``(m float32 [Q, n], x0s, x1s)`` where x0s/x1s are the segment
    endpoints with ``inf`` beyond ``count`` (zero them with
    ``jnp.where(jnp.isfinite(v), v, 0)`` before contracting against m).
    Selected quantities are then single contractions, e.g.
    ``x_lo = m @ where(isfinite(x0s), x0s, 0)``.
    """
    n = cxv.shape[0]
    inf = jnp.asarray(jnp.inf, cxv.dtype)
    x0s = jnp.where(jnp.arange(n) < count, cxv, inf)
    x1s = jnp.concatenate([x0s[1:], jnp.full((1,), inf, cxv.dtype)])
    seg_ok = jnp.arange(n) < jnp.maximum(count - 1, 0)
    m = (seg_ok[None, :] & (x0s[None, :] <= queries[:, None])
         & (queries[:, None] < x1s[None, :]))
    return m.astype(cxv.dtype), x0s, x1s


def zero_infs(v: Array) -> Array:
    """inf sentinels -> 0 before a selection contraction (0 * inf = NaN)."""
    return jnp.where(jnp.isfinite(v), v, 0.0)


def selmm(m: Array, v: Array) -> Array:
    """Selection contraction ``m @ v`` at HIGHEST matmul precision.

    The default TPU matmul truncates f32 operands to bf16; a one-hot
    selection must reproduce the selected values exactly (ring timestamps
    are seconds since capture start — bf16 granularity at t=60 s is
    0.25 s, ~8 frame intervals; tools/compactprobe.py documents the same
    hazard for the compaction sorts).  Use for every ``bracket_matrix``
    contraction; CPU (where the parity suite runs) is unaffected either
    way, which is exactly why the precision must be forced here."""
    return jnp.matmul(m, v, precision=jax.lax.Precision.HIGHEST)


def take_at(values: Array, i: Array, count: Array) -> Array:
    """``values[i]`` with negative-from-count semantics: ``i=-1`` is the last
    valid entry of a compacted array."""
    return values[jnp.where(i < 0, count + i, i)]
