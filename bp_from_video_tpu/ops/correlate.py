"""Pairwise cross-correlation for pulse-transit-time estimation
(reference signal_processor.py:280-295): full normalized cross-correlation
of each ROI-signal pair over their jointly-valid samples, with the lag axis
mapped to seconds through the actual (possibly non-uniform) timestamps.

Static-shape layout: for rings of length N the output is 2N-1 wide; entry j
corresponds to lag index j-(K-1) of the reference's dynamic-length result
(K = joint valid count), NaN beyond |lag| <= K-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bp_from_video_tpu.ops import signal as sig

Array = jax.Array


def correlate_pair(x_a: Array, y_a: Array, y_b: Array) -> tuple[Array, Array]:
    """(lags_seconds, normalized_correlation), each length 2N-1.

    Mirrors reference signal_processor.py:283-290:
      corr = correlate(a, b) / max(a·a, b·b, a·b)
      lags = (x[-1] - x[::-1])[|lag_idx|] * sign(lag_idx)
    All-NaN when fewer than 2 jointly-valid samples.
    """
    n = x_a.shape[0]
    w = sig.valid_y(y_a) & sig.valid_y(y_b)
    k = jnp.sum(w)
    ok = k >= 2

    ca = sig.compact(w, y_a)
    cb = sig.compact(w, y_b)
    cx = sig.compact(w, x_a)

    # Full correlation of the zero-padded compacted arrays: lags beyond
    # +-(K-1) are exactly zero, so the reference's 2K-1 window is the
    # centered sub-window starting at N-K.
    full = jnp.correlate(ca.values, cb.values, mode="full")  # length 2N-1
    aa = jnp.dot(ca.values, ca.values)
    bb = jnp.dot(cb.values, cb.values)
    ab = jnp.dot(ca.values, cb.values)
    denom = jnp.maximum(jnp.maximum(aa, bb), ab)
    denom = jnp.where(denom == 0, 1.0, denom)

    j = jnp.arange(2 * n - 1)
    li = j - (k - 1)                       # reference lag index
    corr = full[jnp.clip(n - k + j, 0, 2 * n - 2)] / denom

    x_last = sig.take_at(cx.values, -1, k)
    x_rev = cx.values[jnp.clip(k - 1 - jnp.abs(li), 0, n - 1)]
    lags = (x_last - x_rev) * jnp.sign(li).astype(x_a.dtype)

    valid_out = (j < 2 * k - 1) & ok
    nan = jnp.float32(jnp.nan)
    return (jnp.where(valid_out, lags, nan), jnp.where(valid_out, corr, nan))
