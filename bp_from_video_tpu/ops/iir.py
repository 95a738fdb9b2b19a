"""Zero-phase Butterworth band-pass on TPU (reference signal_processor.py:159-162,
:225-230: ``scipy.signal.butter(order, band, output='sos', fs)`` +
``sosfiltfilt`` with adaptive padlen).

TPU-native design — no sequential scans:
  * The band-pass is designed **in-graph** from a traced sampling frequency
    (closed-form Butterworth prototype → lp2bp → bilinear), so per-frame fs
    changes never leave the device.
  * Each biquad section is applied as an **exact causal FFT convolution**
    with the section's closed-form AR(2) impulse response.  Causality makes
    truncation at the buffer length exact, so the cascade equals scipy's
    ``sosfilt`` to float precision — but runs as batched FFTs/elementwise
    math on the VPU instead of a length-N sequential recurrence.
  * ``sosfiltfilt`` = odd extension (scipy's default padlen formula) +
    steady-state initial conditions + forward/backward passes, built with
    static shapes and dynamic valid counts (gather-based reversal).

Validated against scipy.signal.sosfiltfilt: exact in f64, ~1e-4 relative in
f32 after pre-centering (tests/test_dsp.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bp_from_video_tpu.ops import dft

Array = jax.Array


def butter_bandpass_poles(order: int, lo: Array, hi: Array, fs: Array
                          ) -> tuple[Array, Array]:
    """Digital poles of ``scipy.signal.butter(order, [lo, hi], 'bandpass',
    fs=fs)`` — one representative per conjugate pair (``order`` of them) —
    plus the overall real gain.

    Follows the classic design pipeline (prototype → lp2bp_zpk →
    bilinear_zpk) in closed form; all ops are elementwise complex math, so
    ``lo``/``hi``/``fs`` may be traced values.
    """
    if order % 2 != 0:
        raise ValueError("even butterworth order required (reference default 16)")
    # Prewarp band edges (scipy normalizes to fs_internal=2: warped = 4 tan(pi f / fs)).
    w_lo = 4.0 * jnp.tan(jnp.pi * lo / fs)
    w_hi = 4.0 * jnp.tan(jnp.pi * hi / fs)
    bw = w_hi - w_lo
    wo2 = w_lo * w_hi
    # Butterworth prototype poles, upper half-plane representatives.
    m = jnp.arange(1, order, 2, dtype=jnp.float32)
    p = -jnp.exp(1j * jnp.pi * m / (2 * order))
    # Low-pass -> band-pass: each prototype pole splits into two.
    p_lp = p * (bw / 2.0)
    s = jnp.sqrt(p_lp * p_lp - wo2)
    p_bp = jnp.concatenate([p_lp + s, p_lp - s])  # `order` representatives
    # Bilinear transform (fs_internal=2 → 2*fs_internal = 4).
    fs2 = 4.0
    p_d = (fs2 + p_bp) / (fs2 - p_bp)
    # Gain: k_bp = bw**order; zeros of the BP analog filter sit at 0 (order of
    # them), so prod(fs2 - z) = fs2**order; poles contribute |fs2 - p|^2 per
    # conjugate pair.
    log_prod_p = jnp.sum(jnp.log(jnp.abs(fs2 - p_bp) ** 2))
    log_k = order * (jnp.log(bw) + jnp.log(fs2)) - log_prod_p
    return p_d, jnp.exp(log_k)


def default_padlen(order: int) -> int:
    """scipy.signal.sosfiltfilt's default padlen for this construction:
    3*(2*n_sections+1) — every section here has b2=-g≠0 and a2=|q|²≠0
    (reference signal_processor.py:227 computes the same value for the
    shipped Butterworth defaults: 99 for order 16)."""
    return 3 * (2 * order + 1)


def sosfilt_conv(p_d: Array, gain: Array, x: Array, x0: Array) -> Array:
    """Causal Butterworth-cascade filter of ``x`` as ONE spectral multiply.

    Instead of convolving section by section (2·order FFT rounds for a
    forward+backward order-16 filter), the cascade's frequency response is
    evaluated analytically from the digital poles on the rfft grid and the
    whole chain — numerators, denominators, and the steady-state initial
    condition of the first section — collapses to rfft → multiply → irfft.

    Per-section structure: b_i = g·[1, 0, -1], a_i from conjugate pole pair
    (q_i, q̄_i); section 0's zi (scipy sosfilt_zi) = (-g·x0, -g·x0) enters
    the chain after section 0's numerator, i.e. its spectrum rides through
    1/A_0 and the remaining (n-1) full sections.

    Exactness note: the per-section truncated-impulse convolution was exact
    linear convolution of a truncated IR; this form is circular convolution
    with the INFINITE IR.  With nfft >= 2·length the wraparound term decays
    like r^nfft (pole radius r<1) and sits far below f32 noise for the HR
    band designs used here (validated against scipy in tests/test_dsp.py).
    """
    length = x.shape[0]
    n_sec = p_d.shape[0]
    g = jnp.exp(jnp.log(gain) / n_sec)  # distribute gain for f32 stability
    # Any nfft >= 2*length keeps the r^nfft wraparound bound; the matmul
    # DFT has no pow2 preference, so round to a 256-lane multiple.
    nfft = -(-(2 * length) // 256) * 256

    w = 2.0 * jnp.pi * jnp.arange(nfft // 2 + 1, dtype=jnp.float32) / nfft
    z1 = jnp.exp(-1j * w)          # e^{-jω}
    z2 = z1 * z1
    b = g * (1.0 - z2)                                       # [F]
    a = (1.0 - 2.0 * jnp.real(p_d)[:, None] * z1[None, :]
         + (jnp.abs(p_d) ** 2)[:, None] * z2[None, :])        # [n_sec, F]
    inv_a = jnp.prod(1.0 / a, axis=0)                         # Π 1/A_i
    h_all = (b ** n_sec) * inv_a
    # zi spectrum: [-g·x0, -g·x0, 0, ...] -> -g·x0·(1 + z1), through 1/A_0
    # and sections 1..n-1 (their B and A are already inside h_zi's factors).
    h_zi = (b ** (n_sec - 1)) * inv_a
    xf = dft.rfft(x, nfft)
    yf = h_all * xf + h_zi * (-g * x0 * (1.0 + z1))
    return dft.irfft(yf, nfft, out_len=length).astype(x.dtype)


def _shifted(a: Array, left_pad: int, right_pad: int, start: Array,
             out_len: int) -> Array:
    """``out[i] = a[start + i]`` with ``start`` possibly negative, as one
    dynamic_slice of a statically padded buffer (gathers with affine indices
    are element-serial on TPU; shifted slices are vector copies)."""
    buf = jnp.concatenate([jnp.zeros((left_pad,), a.dtype), a,
                           jnp.zeros((right_pad,), a.dtype)])
    return jax.lax.dynamic_slice(buf, (left_pad + start,), (out_len,))


def odd_ext(yc: Array, count: Array, padlen: Array, ext_cap: int) -> Array:
    """Odd extension of the first ``count`` entries of compacted ``yc`` by a
    *dynamic* ``padlen`` on each side, into a static length-``ext_cap``
    buffer (zeros beyond ``count + 2*padlen``) — scipy's ``odd_ext``."""
    n = yc.shape[0]
    i = jnp.arange(ext_cap)
    p = padlen
    y0 = yc[0]
    y_last = _shifted(yc, 0, 1, count - 1, 1)[0]
    ycf = yc[::-1]
    # left[i] = 2*y0 - yc[p-i]   (i < p):       yc[p-i] = ycf[n-1-p+i]
    left = 2.0 * y0 - _shifted(ycf, n, ext_cap, n - 1 - p, ext_cap)
    # mid[i] = yc[i-p]           (p <= i < p+count)
    mid = _shifted(yc, n, ext_cap, -p, ext_cap)
    # right[i] = 2*y_last - yc[2*count-2+p-i]:  = ycf[n-1-(2*count-2+p)+i]
    right = 2.0 * y_last - _shifted(ycf, 2 * n, ext_cap,
                                    n - 1 - (2 * count - 2 + p), ext_cap)
    ext = jnp.where(i < p, left, jnp.where(i < p + count, mid,
                    jnp.where(i < 2 * p + count, right, 0.0)))
    return ext


def _reverse_prefix(a: Array, length: Array) -> Array:
    """Reverse the first ``length`` entries of ``a`` (zeros elsewhere)."""
    n = a.shape[0]
    i = jnp.arange(n)
    # a[length-1-i] = flip(a)[n-length+i]
    rev = _shifted(a[::-1], 0, n, n - length, n)
    return jnp.where(i < length, rev, 0.0)


def sosfiltfilt(order: int, lo: Array, hi: Array, fs: Array,
                yc: Array, count: Array, ext_cap: int) -> Array:
    """Zero-phase Butterworth band-pass of the first ``count`` entries of
    compacted ``yc``; mirrors ``scipy.signal.sosfiltfilt(butter(...), y,
    padlen=min(3*(2*nsec+1), count-1))`` (reference signal_processor.py:225-230).

    Returns a compacted array (first ``count`` entries valid).
    ``ext_cap`` must be >= len(yc) + 2*default_padlen(order).
    """
    p_d, gain = butter_bandpass_poles(order, lo, hi, fs)
    pmax = default_padlen(order)
    padlen = jnp.minimum(jnp.asarray(pmax, jnp.int32), count - 1)
    # Pre-center: H(DC)=0 exactly, so subtracting the mean leaves the result
    # unchanged mathematically but removes the large DC term from the f32
    # intermediate sums.
    nmask = jnp.arange(yc.shape[0]) < count
    mean = jnp.sum(jnp.where(nmask, yc, 0.0)) / jnp.maximum(count, 1)
    yz = jnp.where(nmask, yc - mean, 0.0)

    ext = odd_ext(yz, count, padlen, ext_cap)
    ext_len = count + 2 * padlen
    y = sosfilt_conv(p_d, gain, ext, ext[0])
    y = _reverse_prefix(y, ext_len)
    y = sosfilt_conv(p_d, gain, y, y[0])
    y = _reverse_prefix(y, ext_len)
    # Slice out [padlen : padlen+count] (dynamic start -> dynamic_slice).
    out = _shifted(y, 0, yc.shape[0], padlen, yc.shape[0])
    return jnp.where(nmask, out, 0.0)
