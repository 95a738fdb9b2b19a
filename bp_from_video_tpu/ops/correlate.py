"""Pairwise cross-correlation for pulse-transit-time estimation
(reference signal_processor.py:280-295): full normalized cross-correlation
of each ROI-signal pair over their jointly-valid samples, with the lag axis
mapped to seconds through the actual (possibly non-uniform) timestamps.

Static-shape layout: for rings of length N the output is 2N-1 wide; entry j
corresponds to lag index j-(K-1) of the reference's dynamic-length result
(K = joint valid count), NaN beyond |lag| <= K-1.

TPU-native formulation: the correlation AND the K-dependent re-alignment are
one batched FFT pipeline — the data-dependent shifts become phase ramps in
the frequency domain (a vmapped dynamic_slice with per-lane starts lowers to
an element-serial gather; an FFT phase multiply is pure VPU work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bp_from_video_tpu.ops import dft

from bp_from_video_tpu.ops import signal as sig

Array = jax.Array


def _fft_len(n: int) -> int:
    """DFT length covering circular-shift wraparound for the 2N-1 output
    window with shifts up to N (>= 3N-2).  256-lane multiple, not pow2 —
    the matmul DFT (ops/dft.py) has no radix preference."""
    return -(-(3 * n) // 256) * 256


def _shift_spectrum(spec: Array, shift: Array, length: int) -> Array:
    """Multiply an rfft spectrum by the phase ramp realizing
    ``out[j] = in[j + shift]`` (circular)."""
    f = jnp.arange(spec.shape[-1], dtype=jnp.float32)
    ang = (2.0 * jnp.pi / length) * f * shift.astype(jnp.float32)
    return spec * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def correlate_pair(x_a: Array, y_a: Array, y_b: Array) -> tuple[Array, Array]:
    """(lags_seconds, normalized_correlation), each length 2N-1.

    Mirrors reference signal_processor.py:283-290:
      corr = correlate(a, b) / max(a·a, b·b, a·b)
      lags = (x[-1] - x[::-1])[|lag_idx|] * sign(lag_idx)
    All-NaN when fewer than 2 jointly-valid samples.
    """
    n = x_a.shape[0]
    nfft = _fft_len(n)
    w = sig.valid_y(y_a) & sig.valid_y(y_b)
    k = jnp.sum(w)
    ok = k >= 2

    ca = sig.compact(w, y_a)
    cb = sig.compact(w, y_b)
    cx = sig.compact(w, x_a)

    # scipy.correlate(a, b, 'full')[j] = sum_t a[t]·b[t-(j-(n-1))]; the
    # reference layout wants entry j at lag index j-(K-1), i.e. the full
    # correlation shifted by K-1 — folded into the correlation's own phase.
    fa = dft.rfft(ca.values, nfft)
    fb = dft.rfft(cb.values, nfft)
    spec = fa * jnp.conj(fb)
    full_s = dft.irfft(_shift_spectrum(spec, -(k - 1), nfft),
                       nfft, out_len=2 * n - 1)

    # HIGHEST precision: default TPU matmul truncates f32 operands to bf16;
    # the max-of-three normalization (scalar) is peak-invariant, but keeps
    # corr magnitudes scipy-comparable.
    hi = jax.lax.Precision.HIGHEST
    aa = jnp.dot(ca.values, ca.values, precision=hi)
    bb = jnp.dot(cb.values, cb.values, precision=hi)
    ab = jnp.dot(ca.values, cb.values, precision=hi)
    denom = jnp.maximum(jnp.maximum(aa, bb), ab)
    denom = jnp.where(denom == 0, 1.0, denom)
    corr = full_s / denom

    j = jnp.arange(2 * n - 1)
    li = j - (k - 1)                       # reference lag index
    # x_rev[j] = cx[k-1-|li|].  Forward branch (li<=0) is cx[j] verbatim;
    # backward branch is flip(cx) shifted by n-1-2(k-1), done as a phase
    # ramp.  Values are centered on x_last first so FFT roundoff scales with
    # the lag magnitude, not the absolute timestamp.
    x_last = sig.take_at(cx.values, -1, k)
    centered = jnp.where(jnp.arange(n) < k, cx.values - x_last, 0.0)
    fwd = jnp.concatenate([centered, jnp.zeros((n - 1,), centered.dtype)])
    fr = dft.rfft(centered[::-1], nfft)
    bwd = dft.irfft(_shift_spectrum(fr, n - 1 - 2 * (k - 1), nfft),
                    nfft, out_len=2 * n - 1)
    x_rev_c = jnp.where(li <= 0, fwd, bwd)      # = x_rev - x_last
    lags = -x_rev_c * jnp.sign(li).astype(x_a.dtype)

    valid_out = (j < 2 * k - 1) & ok
    nan = jnp.float32(jnp.nan)
    return (jnp.where(valid_out, lags, nan), jnp.where(valid_out, corr, nan))
