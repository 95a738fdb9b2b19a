"""Least-squares FIR band-pass on TPU (reference signal_processor.py:163-170,
:231-236: ``scipy.signal.firls(taps, bands, [0,0,1,1,0,0], fs)`` +
``filtfilt(fir, 1.0, y, padlen)``).

The firls design solves a small symmetric linear system whose entries are
closed-form sinc integrals — built and solved **in-graph** so the traced
per-frame sampling frequency flows straight into the design.  The zero-phase
application uses the same odd-extension machinery as the IIR path; for an
FIR filter, scipy's steady-state initial conditions are exactly equivalent to
prepending ``numtaps-1`` copies of the first sample, which makes the whole
filtfilt two causal convolutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bp_from_video_tpu.ops import dft

from bp_from_video_tpu.ops.iir import _shifted, odd_ext, _reverse_prefix

Array = jax.Array


def _sinc(x: Array) -> Array:
    return jnp.sinc(x)  # sin(pi x)/(pi x)


def firls_bandpass(numtaps: int, bands: Array, desired: Array, fs: Array) -> Array:
    """Type-I linear-phase least-squares FIR design, matching
    ``scipy.signal.firls(numtaps, bands, desired, fs=fs)`` for piecewise-
    linear desired responses with unit weights.

    ``bands``: shape (nbands, 2) edge pairs in Hz; ``desired``: matching
    response values at the edges.  ``numtaps`` must be odd (reference default
    127, signal_processor.py:59).
    """
    if numtaps % 2 != 1:
        raise ValueError("firls requires odd numtaps")
    m_half = (numtaps - 1) // 2
    f = bands * (2.0 / fs)  # normalize: 1.0 == Nyquist
    d = desired

    # q(n) = sum over bands of [f*sinc(n f)]_{f0}^{f1}, n = 0..2*m_half.
    n_all = jnp.arange(numtaps, dtype=jnp.float32)[:, None, None]
    q = jnp.sum(jnp.diff(_sinc(f * n_all) * f, axis=2)[:, :, 0], axis=1)

    # Q = Toeplitz(q[:M+1]) + Hankel(q[:M+1], q[M:]), selected by a STATIC
    # one-hot [M+1, M+1, numtaps] matrix (constant-folded at compile) —
    # q[|i-j|] + q[i+j] as a runtime gather of the traced q lowers
    # element-serially on TPU.
    idx = jnp.arange(m_half + 1)
    n_idx = jnp.arange(numtaps)
    sel = ((jnp.abs(idx[:, None] - idx[None, :])[..., None] == n_idx)
           .astype(jnp.float32)
           + ((idx[:, None] + idx[None, :])[..., None] == n_idx)
           .astype(jnp.float32))
    # HIGHEST: the selection must reproduce q exactly (default TPU matmul
    # would truncate the f32 operand to bf16; see ops/signal.selmm).
    q_mat = jnp.matmul(sel, q, precision=jax.lax.Precision.HIGHEST)

    # b(n) with linear desired D(f) = m f + c on each band.
    n = n_all[: m_half + 1]
    slope = jnp.diff(d, axis=1) / jnp.diff(f, axis=1)
    const = d[:, :1] - f[:, :1] * slope
    b = f * (slope * f + const) * _sinc(f * n)
    b = b.at[0].add(-slope * f * f / 2.0)
    b = b.at[1:].add(slope * jnp.cos(n[1:] * jnp.pi * f) / (jnp.pi * n[1:]) ** 2)
    b_vec = jnp.sum(jnp.diff(b, axis=2)[:, :, 0], axis=1)

    # Q is SPD (the Gram matrix of the cosine basis over the bands):
    # Cholesky, not jnp.linalg.solve — LU's partial pivoting does an
    # argmax + row-swap gather per column, the slowest pattern on TPU.
    a = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(q_mat), b_vec)
    return jnp.concatenate([a[:0:-1], 2.0 * a[:1], a[1:]])


def reference_fir_bands(lo: Array, hi: Array, df: Array, fs: Array
                        ) -> tuple[Array, Array]:
    """The band layout the reference builds for FILTER_FIR
    (signal_processor.py:164-170)."""
    b1 = jnp.maximum(lo - df, df)
    b4 = jnp.minimum(hi + df, fs / 2.0 - df)
    bands = jnp.stack([jnp.stack([jnp.zeros_like(b1), b1]),
                       jnp.stack([lo, hi]),
                       jnp.stack([b4, fs / 2.0])])
    desired = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.0, 0.0]], jnp.float32)
    return bands, desired


def _causal_fir(h: Array, x: Array) -> Array:
    """Causal convolution conv(h, x)[:len(x)] via matmul real-DFT.

    The matmul DFT has no power-of-2 preference, so nfft is the linear-
    conv length rounded up to a 256-lane multiple (1280 here vs 2048
    pow2 — 1.6x less DFT work); rfft contracts h against only its 127
    basis rows, and the synthesis stops at the ``length`` samples kept."""
    length = x.shape[0]
    nfft = -(-(length + h.shape[0] - 1) // 256) * 256
    return dft.irfft(dft.rfft(x, nfft) * dft.rfft(h, nfft),
                     nfft, out_len=length).astype(x.dtype)


def filtfilt_fir(h: Array, yc: Array, count: Array, ext_cap: int) -> Array:
    """Zero-phase FIR filtering of the first ``count`` entries of compacted
    ``yc``, matching ``scipy.signal.filtfilt(h, 1.0, y, padlen)`` with
    padlen = min(3*numtaps, count-1) (reference signal_processor.py:233-235).

    scipy's lfilter_zi for an FIR filter is the steady-state of a constant
    input, so zi·x_ext[0] ≡ an infinite history of x_ext[0]; only the last
    numtaps-1 samples of that history matter, hence the constant prefix.
    ``ext_cap`` must be >= len(yc) + 2*3*numtaps + (numtaps-1).
    """
    numtaps = h.shape[0]
    pmax = 3 * numtaps
    padlen = jnp.minimum(jnp.asarray(pmax, jnp.int32), count - 1)
    nmask = jnp.arange(yc.shape[0]) < count
    yz = jnp.where(nmask, yc, 0.0)

    pre = numtaps - 1  # constant-history prefix implementing zi
    ext = odd_ext(yz, count, padlen, ext_cap - pre)
    ext_len = count + 2 * padlen

    def one_pass(sig: Array, sig_len: Array) -> Array:
        head = jnp.full((pre,), sig[0], sig.dtype)
        y = _causal_fir(h, jnp.concatenate([head, sig]))[pre:]
        return jnp.where(jnp.arange(y.shape[0]) < sig_len, y, 0.0)

    y = one_pass(ext, ext_len)
    y = _reverse_prefix(y, ext_len)
    y = one_pass(y, ext_len)
    y = _reverse_prefix(y, ext_len)
    # dynamic_slice, not an affine gather (per-lane gathers lower
    # element-serially on TPU — see iir._shifted).
    out = _shifted(y, 0, yc.shape[0], padlen, yc.shape[0])
    return jnp.where(nmask, out, 0.0)
