"""The per-frame DSP chain (reference signal_processor.py:196-241):
derivatives, linear/cubic interpolation onto a uniform grid, constant/linear
detrending, and Butterworth/FIR zero-phase band-pass — applied in configured
order over the valid samples of a NaN-masked ring.

Everything is static-shape: dynamic valid counts are carried as scalars over
compacted arrays (ops.signal.compact), so the whole chain traces into one
XLA program per static SignalConfig.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bp_from_video_tpu.config import SignalConfig, SignalProcessingMethod as M
from bp_from_video_tpu.ops import fir, iir, tridiag
from bp_from_video_tpu.ops import signal as sig

Array = jax.Array


class ChainState(NamedTuple):
    """Mutable view the chain threads through methods (the reference mutates
    x, y, valid, fs in place — signal_processor.py:197-236)."""

    x: Array       # [N] timestamps (rewritten by interpolation)
    y: Array       # [N] values, NaN at invalid slots
    valid: Array   # [N] current valid mask (reference `valid`)
    block: Array   # [N] x-finite mask (reference `block`)
    fs: Array      # scalar sampling frequency


def _safe(v: Array, fallback: float = 1.0) -> Array:
    return jnp.where(jnp.isfinite(v), v, fallback)


# --- individual methods -------------------------------------------------------


def diff1(st: ChainState) -> ChainState:
    """y[valid] = diff(y[valid], n=1, prepend=y[valid][0])
    (reference signal_processor.py:203-204)."""
    c = sig.compact(st.valid, st.y)
    prev = jnp.concatenate([c.values[:1], c.values[:-1]])
    d = c.values - prev
    return st._replace(y=sig.scatter_back(st.valid, d, st.y))


def diff2(st: ChainState) -> ChainState:
    """y[valid] = diff(y[valid], n=2, prepend=y[valid][:2])
    (reference signal_processor.py:205)."""
    c = sig.compact(st.valid, st.y)
    z = jnp.concatenate([c.values[:2], c.values])  # prepend first two samples
    d1 = z[1:] - z[:-1]
    d2 = (d1[1:] - d1[:-1])[: c.values.shape[0]]
    return st._replace(y=sig.scatter_back(st.valid, d2, st.y))


def _block_grid(st: ChainState) -> tuple[Array, Array, Array]:
    """Uniform grid spanning x[block], with block.sum() points
    (reference: np.linspace(x[block][0], x[block][-1], block.sum(),
    retstep=True), signal_processor.py:207, :214)."""
    n = st.x.shape[0]
    cb = sig.compact(st.block, st.x)
    kb = cb.count
    x0 = cb.values[0]
    x1 = sig.take_at(cb.values, -1, kb)
    ts = (x1 - x0) / jnp.maximum(kb - 1, 1)
    grid = x0 + jnp.arange(n, dtype=st.x.dtype) * ts
    return grid, ts, kb


def interp_linear(st: ChainState) -> ChainState:
    """np.interp of valid samples onto the uniform block grid; valid:=block,
    fs:=1/step (reference signal_processor.py:206-211).

    Gather-free: per-query segment selection is a bracket-matrix
    contraction (sig.bracket_matrix) instead of searchsorted + fancy
    indexing — both element-serial on TPU."""
    grid, ts, kb = _block_grid(st)
    cx = sig.compact(st.valid, st.x)
    cy = sig.compact(st.valid, st.y)
    k = cx.count
    mf, x0s, x1s = sig.bracket_matrix(cx.values, k, grid)
    y1s = jnp.concatenate([cy.values[1:], cy.values[-1:]])
    x_j = sig.selmm(mf, sig.zero_infs(x0s))
    x_j1 = sig.selmm(mf, sig.zero_infs(x1s))
    y_j = sig.selmm(mf, cy.values)
    y_j1 = sig.selmm(mf, y1s)
    t = (grid - x_j) / jnp.where(x_j1 == x_j, 1.0, x_j1 - x_j)
    y_new = y_j + jnp.clip(t, 0.0, 1.0) * (y_j1 - y_j)  # np.interp clamps
    # Clamp outside the valid x-range to the endpoint values (this also
    # covers grid == x_last, which the half-open brackets don't hit).
    y_new = jnp.where(grid <= cx.values[0], cy.values[0], y_new)
    y_last = sig.take_at(cy.values, -1, k)
    x_last = sig.take_at(cx.values, -1, k)
    y_new = jnp.where(grid >= x_last, y_last, y_new)
    x_out = sig.scatter_back(st.block, grid, st.x)
    y_out = sig.scatter_back(st.block, y_new, st.y)
    return ChainState(x_out, y_out, st.block, st.block, 1.0 / ts)


def _notaknot_m(xc: Array, yc: Array, k: Array) -> Array:
    """Second derivatives of the not-a-knot cubic spline through the first
    ``k`` points of (xc, yc).  Handles k==2 (line) and k==3 (parabola)
    like scipy.

    Solved in scipy's SLOPE (first-derivative) formulation
    (scipy/interpolate/_cubic.py): there the not-a-knot boundary rows are
    themselves tridiagonal, so the whole system is a strict tridiagonal
    solved by log-depth cyclic reduction (ops/tridiag.pcr_solve) — the
    second-derivative formulation needed corner entries outside the band
    and went through ``jnp.linalg.solve``'s dense pivoted LU, which
    dominated the whole chain stage on TPU (column-serial factorization
    + pivot gathers).  Interior rows are strictly diagonally dominant
    (factor 2), boundary rows weakly — PCR is stable here.  Slopes
    convert back to knot second derivatives so _spline_eval is unchanged:
    on segment j, y''(x_j) = (6·slope_j − 4·s_j − 2·s_{j+1})/h_j, and the
    last knot takes segment k−2's right end."""
    n = xc.shape[0]
    seg = jnp.arange(n - 1) < k - 1
    hs = jnp.where(seg, xc[1:] - xc[:-1], 1.0)
    hs = jnp.where(hs == 0, 1.0, hs)
    slope = jnp.where(seg, (yc[1:] - yc[:-1]) / hs, 0.0)
    # Per-knot views: h_j/s_j = segment starting at knot j; h_jm1/s_jm1 =
    # segment ending at knot j (identity/zero pad at the ends).
    one = jnp.ones((1,), xc.dtype)
    zero = jnp.zeros((1,), xc.dtype)
    h_j = jnp.concatenate([hs, one])
    h_jm1 = jnp.concatenate([one, hs])
    s_j = jnp.concatenate([slope, zero])
    s_jm1 = jnp.concatenate([zero, slope])
    idx = jnp.arange(n)
    interior = (idx >= 1) & (idx <= k - 2)

    # Interior rows (scipy's i=1..k-2): h_i·s_{i-1} + 2(h_{i-1}+h_i)·s_i
    # + h_{i-1}·s_{i+1} = 3(h_i·slope_{i-1} + h_{i-1}·slope_i).
    a = jnp.where(interior, h_j, 0.0)
    b = jnp.where(interior, 2.0 * (h_jm1 + h_j), 1.0)
    c = jnp.where(interior, h_jm1, 0.0)
    d = jnp.where(interior, 3.0 * (h_j * s_jm1 + h_jm1 * s_j), 0.0)

    h0, h1 = hs[0], hs[1]
    s0, s1 = slope[0], slope[1]
    hk2 = sig.take_at(hs, -1, k - 1)      # h_{k-2} (last segment)
    hk3 = sig.take_at(hs, -2, k - 1)
    sk2 = sig.take_at(slope, -1, k - 1)
    sk3 = sig.take_at(slope, -2, k - 1)

    big = k > 3
    # k>3 not-a-knot rows; k==3 collapses to scipy's parabola rows
    # (s0 + s1 = 2·slope0 and s_{k-2} + s_{k-1} = 2·slope_{k-2}).
    d0f = h0 + h1
    b_f = jnp.where(big, h1, 1.0)
    c_f = jnp.where(big, d0f, 1.0)
    d_f = jnp.where(big,
                    ((h0 + 2.0 * d0f) * h1 * s0 + h0 * h0 * s1) / d0f,
                    2.0 * s0)
    dlf = hk3 + hk2
    a_l = jnp.where(big, dlf, 1.0)
    b_l = jnp.where(big, hk3, 1.0)
    d_l = jnp.where(big,
                    (hk2 * hk2 * sk3 + (2.0 * dlf + hk2) * hk3 * sk2) / dlf,
                    2.0 * sk2)
    # k==2: both boundary rows read s = slope0 (a line); k<=1: identity.
    small = k <= 2
    b_f = jnp.where(small, 1.0, b_f)
    c_f = jnp.where(small, 0.0, c_f)
    d_f = jnp.where(small, jnp.where(k == 2, s0, 0.0), d_f)
    a_l = jnp.where(small, 0.0, a_l)
    b_l = jnp.where(small, 1.0, b_l)
    d_l = jnp.where(small, jnp.where(k == 2, s0, 0.0), d_l)

    is_first = idx == 0
    is_last = idx == k - 1
    a = jnp.where(is_first, 0.0, jnp.where(is_last, a_l, a))
    b = jnp.where(is_first, b_f, jnp.where(is_last, b_l, b))
    c = jnp.where(is_first, c_f, jnp.where(is_last, 0.0, c))
    d = jnp.where(is_first, d_f, jnp.where(is_last, d_l, d))

    s_knots = tridiag.pcr_solve(a, b, c, d)

    # Slopes -> knot second derivatives (Hermite segment ends).
    sj1 = jnp.concatenate([s_knots[1:], s_knots[-1:]])
    m2_left = (6.0 * s_j - 4.0 * s_knots - 2.0 * sj1) / h_j
    m2_last = ((-6.0 * sig.take_at(s_j, -2, k)
                + 2.0 * sig.take_at(s_knots, -2, k)
                + 4.0 * sig.take_at(sj1, -2, k)) / sig.take_at(h_j, -2, k))
    m2 = jnp.where(idx == k - 1, m2_last, m2_left)
    return jnp.where(k <= 2, 0.0, m2)


def _spline_eval(xc: Array, yc: Array, m2: Array, k: Array, t: Array) -> Array:
    """Evaluate the cubic with second derivatives ``m2`` at points ``t``
    (extrapolates with the end polynomials, like scipy CubicSpline).

    Segment selection is a bracket-matrix contraction extended with the
    two extrapolation rows: queries left of the data use segment 0,
    queries at/right of the last knot use segment k-2 (the old
    ``clip(searchsorted - 1, 0, k-2)`` behavior, gather-free)."""
    n = xc.shape[0]
    mf, x0s, x1s = sig.bracket_matrix(xc, k, t)
    first = jnp.arange(n) == 0
    last_seg = jnp.arange(n) == jnp.maximum(k - 2, 0)
    x_last = sig.take_at(xc, -1, k)
    mf = (mf
          + jnp.outer((t < x0s[0]).astype(mf.dtype), first.astype(mf.dtype))
          + jnp.outer((t >= x_last).astype(mf.dtype),
                      last_seg.astype(mf.dtype)))
    y1s = jnp.concatenate([yc[1:], yc[-1:]])
    m2n = jnp.concatenate([m2[1:], m2[-1:]])
    xj = sig.selmm(mf, sig.zero_infs(x0s))
    xj1 = sig.selmm(mf, sig.zero_infs(x1s))
    # The k-2 extrapolation segment's right knot is x_last itself (x1s has
    # the inf sentinel at and beyond count-1): rebuild it from the data.
    xj1 = jnp.where(t >= x_last, x_last, xj1)
    yj = sig.selmm(mf, yc)
    yj1 = sig.selmm(mf, y1s)
    m2j = sig.selmm(mf, m2)
    m2j1 = sig.selmm(mf, m2n)
    h = jnp.where(xj1 == xj, 1.0, xj1 - xj)
    dr = xj1 - t
    dl = t - xj
    return (m2j * dr**3 / (6.0 * h) + m2j1 * dl**3 / (6.0 * h)
            + (yj / h - m2j * h / 6.0) * dr
            + (yj1 / h - m2j1 * h / 6.0) * dl)


def interp_cubic(st: ChainState) -> ChainState:
    """Not-a-knot cubic spline of valid samples onto the uniform block grid
    (reference signal_processor.py:212-218, scipy.interpolate.CubicSpline)."""
    grid, ts, kb = _block_grid(st)
    cx = sig.compact(st.valid, st.x)
    cy = sig.compact(st.valid, st.y)
    m2 = _notaknot_m(cx.values, cy.values, cx.count)
    y_new = _spline_eval(cx.values, cy.values, m2, cx.count, grid)
    x_out = sig.scatter_back(st.block, grid, st.x)
    y_out = sig.scatter_back(st.block, y_new, st.y)
    return ChainState(x_out, y_out, st.block, st.block, 1.0 / ts)


def detrend_const(st: ChainState) -> ChainState:
    """Subtract the mean of the valid samples (reference :219-221)."""
    cnt = jnp.maximum(jnp.sum(st.valid), 1)
    mean = jnp.sum(jnp.where(st.valid, st.y, 0.0)) / cnt
    return st._replace(y=jnp.where(st.valid, st.y - mean, st.y))


def detrend_linear(st: ChainState) -> ChainState:
    """Subtract the least-squares line over the sample index (matching
    scipy.signal.detrend(type='linear'), reference :222-224)."""
    c = sig.compact(st.valid, st.y)
    n = c.values.shape[0]
    k = jnp.maximum(c.count, 1)
    i = jnp.arange(n, dtype=st.y.dtype)
    m = jnp.arange(n) < c.count
    kf = k.astype(st.y.dtype)
    si = jnp.sum(jnp.where(m, i, 0.0))
    sii = jnp.sum(jnp.where(m, i * i, 0.0))
    sy = jnp.sum(jnp.where(m, c.values, 0.0))
    siy = jnp.sum(jnp.where(m, i * c.values, 0.0))
    det = kf * sii - si * si
    det = jnp.where(det == 0, 1.0, det)
    slope = (kf * siy - si * sy) / det
    icept = (sy - slope * si) / kf
    resid = c.values - (slope * i + icept)
    return st._replace(y=sig.scatter_back(st.valid, resid, st.y))


def make_filter_butter(cfg: SignalConfig, st: ChainState) -> ChainState:
    """Butterworth band-pass, Nyquist-clamped band (reference :159-162,
    :225-230).

    At sampling rates too low to fit the clamped band (lo <= 0 or
    hi <= lo — e.g. a ~2-4 fps stream), the pole math would silently
    produce a divergent filter where the reference's scipy.butter raises;
    the samples degrade to NaN instead (the pipeline's pervasive masked
    degradation, SURVEY §5.3), surfacing as "NaN" vitals on the HUD."""
    fs = _safe(st.fs, 100.0)
    lo = jnp.minimum(cfg.min_freq, fs / 2.0 - 2.0 * cfg.butter_min_bw)
    hi = jnp.minimum(cfg.max_freq, fs / 2.0 - cfg.butter_min_bw)
    band_ok = (lo > 0.0) & (hi > lo)
    lo_s = jnp.where(band_ok, lo, 0.1)
    hi_s = jnp.where(band_ok, hi, 0.2)
    fs_s = jnp.where(band_ok, fs, 100.0)
    c = sig.compact(st.valid, st.y)
    ext_cap = st.y.shape[0] + 2 * iir.default_padlen(cfg.butter_order)
    out = iir.sosfiltfilt(cfg.butter_order, lo_s, hi_s, fs_s, c.values,
                          jnp.maximum(c.count, 2), ext_cap)
    out = jnp.where(band_ok, out, jnp.float32(jnp.nan))
    return st._replace(y=sig.scatter_back(st.valid, out, st.y))


def make_filter_fir(cfg: SignalConfig, st: ChainState) -> ChainState:
    """Least-squares FIR band-pass (reference :163-170, :231-236).

    When the sampling rate can't hold the reference's band layout
    (overlapping/non-monotonic edges, e.g. fs < 2*(max_freq + fir_df)),
    the firls normal equations go singular and scipy would raise; the
    samples degrade to NaN instead (masked degradation, SURVEY §5.3)."""
    fs = _safe(st.fs, 100.0)
    bands, desired = fir.reference_fir_bands(
        jnp.float32(cfg.min_freq), jnp.float32(cfg.max_freq),
        jnp.float32(cfg.fir_df), fs)
    # Monotone non-overlapping edges: 0 < b1 <= lo < hi <= b4 < fs/2.
    edges = bands.reshape(-1)
    band_ok = jnp.all(edges[1:] >= edges[:-1]) & (edges[1] > 0.0)
    bands_s = jnp.where(band_ok, bands,
                        jnp.asarray([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]],
                                    jnp.float32))
    fs_s = jnp.where(band_ok, fs, 100.0)
    h = fir.firls_bandpass(cfg.fir_taps, bands_s, desired, fs_s)
    c = sig.compact(st.valid, st.y)
    ext_cap = st.y.shape[0] + 2 * 3 * cfg.fir_taps + cfg.fir_taps - 1
    out = fir.filtfilt_fir(h, c.values, jnp.maximum(c.count, 2), ext_cap)
    out = jnp.where(band_ok, out, jnp.float32(jnp.nan))
    return st._replace(y=sig.scatter_back(st.valid, out, st.y))


_METHOD_FNS = {
    M.DIFF_1: lambda cfg, st: diff1(st),
    M.DIFF_2: lambda cfg, st: diff2(st),
    M.INTERP_LINEAR: lambda cfg, st: interp_linear(st),
    M.INTERP_CUBIC: lambda cfg, st: interp_cubic(st),
    M.DETREND_CONST: lambda cfg, st: detrend_const(st),
    M.DETREND_LINEAR: lambda cfg, st: detrend_linear(st),
    M.FILTER_BUTTER: make_filter_butter,
    M.FILTER_FIR: make_filter_fir,
}


def process_signal(cfg: SignalConfig, x: Array, y: Array) -> tuple[Array, Array]:
    """Run the configured chain over one signal ring; returns the processed
    (x, y) with NaNs preserved at invalid slots (the device analog of
    reference signal_processor.py:196-241 ``process_signal``).

    The chain only runs when >=2 valid samples exist and fs is finite
    (reference :200); otherwise (x, y) pass through untouched.
    """
    st = ChainState(x=x, y=y, valid=sig.valid_y(y), block=sig.valid_x(x),
                    fs=sig.mean_fs(x))
    ok = (jnp.sum(st.valid) >= 2) & jnp.isfinite(st.fs)
    out = st
    for method in cfg.processing_methods:
        out = _METHOD_FNS[method](cfg, out)
    x_out = jnp.where(ok, out.x, x)
    y_out = jnp.where(ok, out.y, y)
    return x_out, y_out
