"""Spectral estimators (reference signal_processor.py:248-273): rFFT
magnitude spectrum, Welch periodogram, and the generalized (floating-mean,
normalized) Lomb-Scargle periodogram — the recommended default for the
non-uniformly sampled rPPG signal (reference signal_processor.py:62).

TPU-native shape: the valid-sample count K is dynamic, so all transforms are
expressed as **masked dense projections** — (freq × sample) trig matrices
contracted against the samples — rather than FFTs of dynamic length.  At
N=250 these are tiny MXU matmuls; the Lomb-Scargle path follows scipy 1.17's
Zechmeister–Kürster formulation term for term.

All functions return fixed-length (freqs, mags) arrays NaN-padded beyond the
valid bins, mirroring the reference's dynamic-length Signal outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bp_from_video_tpu.config import SignalConfig, SignalSpectrumTransform as T
from bp_from_video_tpu.ops import dft
from bp_from_video_tpu.ops import signal as sig

Array = jax.Array

_F32_EPSNEG = float(jnp.finfo(jnp.float32).epsneg)


def _masked_dft(yc: Array, k: Array) -> tuple[Array, Array]:
    """DFT of the first ``k`` entries of compacted ``yc`` at bins 0..N-1 of
    an implicit length-``k`` transform: X_b = sum_n y_n e^{-2πi b n / k}.

    HIGHEST matmul precision: the default TPU precision truncates the f32
    trig operands to bf16 (the hazard ops/dft.py documents) — near-tie
    spectral peaks would flip bins TPU-only while CPU tests stay green."""
    n = yc.shape[0]
    i = jnp.arange(n, dtype=jnp.float32)
    ang = (2.0 * jnp.pi / jnp.maximum(k, 1)) * (i[:, None] * i[None, :])
    m = (jnp.arange(n) < k).astype(yc.dtype)
    ym = yc * m
    with jax.default_matmul_precision("highest"):
        re = jnp.cos(ang) @ ym
        im = -(jnp.sin(ang) @ ym)
    return re, im


def dft_rfft(x: Array, y: Array, fs: Array) -> tuple[Array, Array]:
    """freqs = rfftfreq(K, 1/fs); mags = 2|rfft(y_valid)|/K
    (reference signal_processor.py:253-258)."""
    n = x.shape[0]
    w = sig.valid_y(y)
    cy = sig.compact(w, y)
    k = cy.count
    re, im = _masked_dft(cy.values, k)
    mags = 2.0 * jnp.sqrt(re * re + im * im) / jnp.maximum(k, 1)
    bins = jnp.arange(n, dtype=jnp.float32)
    freqs = bins * fs / jnp.maximum(k, 1)
    out_mask = jnp.arange(n) < (k // 2 + 1)
    nan = jnp.float32(jnp.nan)
    return (jnp.where(out_mask, freqs, nan), jnp.where(out_mask, mags, nan))


_WELCH_NPERSEG = 256  # scipy.signal.welch default nperseg


def welch(x: Array, y: Array, fs: Array) -> tuple[Array, Array]:
    """scipy.signal.welch(y_valid, fs) (reference signal_processor.py:259-261).

    Two regimes, matching scipy exactly:
      * K <= 256: nperseg clamps to K — one hann-windowed,
        constant-detrended, density-scaled segment of dynamic length K.
      * K > 256 (possible whenever ``signal_max_samples`` > 256): the
        default nperseg=256 with 50% overlap — frame into static length-256
        segments at stride 128, constant-detrend + periodic-hann each,
        average the periodograms of the (K-128)//128 valid segments.
    Both regimes are masked dense projections; selection is a traced
    ``where`` on K (cheap at these sizes, keeps the program shape static).
    """
    n = x.shape[0]
    w = sig.valid_y(y)
    cy = sig.compact(w, y)
    k = cy.count
    freqs1, pxx1 = _welch_single(n, cy.values, k, fs)
    if n <= _WELCH_NPERSEG:
        return freqs1, pxx1
    freqs2, pxx2 = _welch_segmented(n, cy.values, k, fs)
    seg = k > _WELCH_NPERSEG
    return (jnp.where(seg, freqs2, freqs1), jnp.where(seg, pxx2, pxx1))


def _welch_single(n: int, yv: Array, k: Array, fs: Array
                  ) -> tuple[Array, Array]:
    """One segment of dynamic length K (scipy's nperseg-clamped branch)."""
    kf = jnp.maximum(k, 1).astype(jnp.float32)
    m = (jnp.arange(n) < k).astype(yv.dtype)
    mean = jnp.sum(yv * m) / kf
    yd = (yv - mean) * m
    # Periodic hann window of dynamic length K.
    i = jnp.arange(n, dtype=jnp.float32)
    win = (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * i / kf)) * m
    re, im = _masked_dft(yd * win, k)
    scale = 1.0 / (fs * jnp.sum(win * win))
    pxx = (re * re + im * im) * scale
    # One-sided doubling: all bins except DC, and except Nyquist when K even.
    bins = jnp.arange(n)
    is_nyq = (k % 2 == 0) & (bins == k // 2)
    pxx = jnp.where((bins > 0) & ~is_nyq, 2.0 * pxx, pxx)
    freqs = bins.astype(jnp.float32) * fs / jnp.maximum(k, 1)
    out_mask = bins < (k // 2 + 1)
    nan = jnp.float32(jnp.nan)
    return (jnp.where(out_mask, freqs, nan), jnp.where(out_mask, pxx, nan))


def _welch_segmented(n: int, yv: Array, k: Array, fs: Array
                     ) -> tuple[Array, Array]:
    """scipy's multi-segment branch: nperseg=256, noverlap=128 (50%),
    periodic hann, constant detrend per segment, mean of periodograms.
    Segment length is STATIC, so the per-segment transform is a batched
    fixed-size DFT matmul; only the number of valid segments is traced."""
    nps = _WELCH_NPERSEG
    step = nps // 2
    max_segs = (n - step) // step  # (K - nps)//step + 1 at K = n
    # Frame with static strides; tail beyond K is already zero-filled.
    segs = jnp.stack([yv[s * step:s * step + nps] for s in range(max_segs)])
    # Valid segment s needs s*step + nps <= K; count = (K - step) // step.
    nseg = jnp.maximum((k - step) // step, 1)
    seg_ok = (jnp.arange(max_segs) < nseg).astype(jnp.float32)
    # Constant detrend per segment (all nps entries of a valid segment are
    # real samples, so the plain mean is exact).
    segs = segs - jnp.mean(segs, axis=1, keepdims=True)
    i = jnp.arange(nps, dtype=jnp.float32)
    win = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * i / nps)
    spec = dft.rfft(segs * win[None, :], nps)       # (max_segs, nps//2+1)
    scale = 1.0 / (fs * jnp.sum(win * win))
    pxx = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2) * scale
    bins = jnp.arange(nps // 2 + 1)
    pxx = jnp.where((bins > 0) & (bins < nps // 2), 2.0 * pxx, pxx)
    pxx = jnp.sum(pxx * seg_ok[:, None], axis=0) / jnp.sum(seg_ok)
    freqs = bins.astype(jnp.float32) * fs / nps
    nan = jnp.float32(jnp.nan)
    out_mask = jnp.arange(n) < (nps // 2 + 1)
    pad = (0, n - (nps // 2 + 1))
    return (jnp.where(out_mask, jnp.pad(freqs, pad), nan),
            jnp.where(out_mask, jnp.pad(pxx, pad), nan))


def lombscargle(x: Array, y: Array, min_freq: float, max_freq: float
                ) -> tuple[Array, Array]:
    """Generalized Lomb-Scargle periodogram on the raw (non-uniform)
    timestamps, matching scipy.signal.lombscargle(..., floating_mean=True,
    normalize=True) over freqs = linspace(min_freq, max_freq, K)
    (reference signal_processor.py:262-266).

    Pure masked matmuls over a (freq × sample) trig matrix — MXU-shaped.
    """
    n = x.shape[0]
    w = sig.valid_y(y) & sig.valid_x(x)
    k = jnp.sum(w)
    kf = jnp.maximum(k, 1).astype(jnp.float32)
    wt = w.astype(jnp.float32) / kf  # uniform weights summing to 1
    xs = jnp.where(w, x, 0.0)
    ys = jnp.where(w, y, 0.0)

    i = jnp.arange(n, dtype=jnp.float32)
    freqs = min_freq + i * (max_freq - min_freq) / jnp.maximum(kf - 1.0, 1.0)
    omega = 2.0 * jnp.pi * freqs

    ang = omega[:, None] * xs[None, :]        # (F, N)
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)

    # HIGHEST matmul precision for every contraction below: the default TPU
    # precision truncates the f32 trig matrices to bf16 (ops/dft.py:60's
    # documented hazard), and PGRAM_LS is the default BPM path — a ~0.4%
    # per-entry error flips near-tie peak bins TPU-only.
    with jax.default_matmul_precision("highest"):
        y_mean = jnp.sum(wt * ys)                  # Eq. 7
        cc = cos * cos @ wt                        # Eq. 13
        cs = cos * sin @ wt                        # Eq. 15
        c1 = cos @ wt                              # Eq. 8
        s1 = sin @ wt                              # Eq. 9
        ss = 1.0 - cc - s1 * s1                    # Eq. 14 with floating mean
        cc = cc - c1 * c1
        cs = cs - c1 * s1

        tau = 0.5 * jnp.arctan2(2.0 * cs, cc - ss)  # Eq. 19
        # Angle subtraction instead of re-evaluating trig over the full
        # (F, N) grid: halves the transcendental count (cos/sin of tau are
        # length-F).
        cos_tau = jnp.cos(tau)[:, None]
        sin_tau = jnp.sin(tau)[:, None]
        cos_t = cos * cos_tau + sin * sin_tau
        sin_t = sin * cos_tau - cos * sin_tau

        wy = wt * ys
        yc_ = cos_t @ wy                           # Eq. 11
        ys_ = sin_t @ wy                           # Eq. 12
        cc_t = cos_t * cos_t @ wt
        c_t = cos_t @ wt
        s_t = sin_t @ wt
        ss_t = 1.0 - cc_t - s_t * s_t
        cc_t = cc_t - c_t * c_t
        yc_ = yc_ - y_mean * c_t
        ys_ = ys_ - y_mean * s_t

    cc_t = jnp.maximum(cc_t, _F32_EPSNEG)
    ss_t = jnp.maximum(ss_t, _F32_EPSNEG)
    a = yc_ / cc_t
    b = ys_ / ss_t
    pgram = 2.0 * (a * yc_ + b * ys_)
    yy = jnp.sum(wy * ys) - y_mean * y_mean    # Eq. 10
    pgram = pgram * (0.5 / yy)                 # normalize=True (Eq. 20)

    out_mask = jnp.arange(n) < k
    nan = jnp.float32(jnp.nan)
    return (jnp.where(out_mask, freqs, nan), jnp.where(out_mask, pgram, nan))


def transform_signal(cfg: SignalConfig, x: Array, y: Array
                     ) -> tuple[Array, Array]:
    """Dispatch on the configured transform; all-NaN output when fewer than
    two valid samples or non-finite fs (reference signal_processor.py:252,
    :269-270)."""
    w = sig.valid_y(y)
    fs = sig.mean_fs(x)
    ok = (jnp.sum(w) >= 2) & jnp.isfinite(fs)
    fs_safe = jnp.where(jnp.isfinite(fs), fs, 1.0)
    if cfg.spectrum_transform is T.DFT_RFFT:
        freqs, mags = dft_rfft(x, y, fs_safe)
    elif cfg.spectrum_transform is T.PGRAM_WELCH:
        freqs, mags = welch(x, y, fs_safe)
    elif cfg.spectrum_transform is T.PGRAM_LS:
        freqs, mags = lombscargle(x, y, cfg.min_freq, cfg.max_freq)
    else:  # pragma: no cover
        raise NotImplementedError(cfg.spectrum_transform)
    nan = jnp.float32(jnp.nan)
    return jnp.where(ok, freqs, nan), jnp.where(ok, mags, nan)
