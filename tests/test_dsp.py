"""DSP chain / spectra / correlation parity vs the reference implementation
(driven through scipy in float64) on NaN-masked, non-uniformly sampled
signals."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.signal

from bp_from_video_tpu.config import (
    SignalConfig, SignalProcessingMethod as M, SignalSpectrumTransform as T)
from bp_from_video_tpu.ops import chain, correlate, iir, fir, spectrum

from tests.ref_oracle import ref_signal_processor

import functools


# The suite is trace/compile-bound on a 1-CPU box; these tests used to
# execute the DSP ops EAGERLY (per-op dispatch, DFT basis matrices built
# per call).  Jitted-with-reuse: each distinct config compiles once (and
# lands in the persistent test cache for later runs) while the 3-4 size/
# seed parametrizations per config share the executable.
@functools.lru_cache(maxsize=None)
def jit_chain(cfg):
    return jax.jit(lambda x, y: chain.process_signal(cfg, x, y))


@functools.lru_cache(maxsize=None)
def jit_spectrum(cfg):
    return jax.jit(lambda x, y: spectrum.transform_signal(cfg, x, y))


jit_correlate = jax.jit(correlate.correlate_pair)
jit_sosfiltfilt = jax.jit(iir.sosfiltfilt, static_argnums=(0, 6))
jit_filtfilt_fir = jax.jit(fir.filtfilt_fir, static_argnums=(3,))


def make_signal(n=250, n_valid=200, fs=25.0, jitter=0.3, nan_prob=0.1,
                seed=0, offset=100.0):
    """A NaN-prefilled ring like the live pipeline produces: n_valid newest
    slots hold samples at jittered timestamps; some y are NaN (lost ROI)."""
    rng = np.random.RandomState(seed)
    x = np.full(n, np.nan, np.float64)
    y = np.full(n, np.nan, np.float64)
    t = 0.0
    for i in range(n - n_valid, n):
        t += (1.0 / fs) * (1.0 + jitter * rng.uniform(-1, 1))
        x[i] = t
        if rng.uniform() > nan_prob:
            y[i] = (np.sin(2 * np.pi * 1.25 * t)
                    + 0.4 * np.sin(2 * np.pi * 0.3 * t)
                    + 0.1 * rng.normal() + offset)
    # Round to f32 so oracle (f64) and device (f32) see identical inputs.
    return x.astype(np.float32).astype(np.float64), y.astype(np.float32).astype(np.float64)


def run_oracle(cfg_methods, transform, x, y):
    sp = ref_signal_processor.SignalProcessor(
        selected_roi_configs=[None, None],
        processing_methods=[getattr(ref_signal_processor.SignalProcessingMethod,
                                    m.name) for m in cfg_methods],
        spectrum_transform=getattr(ref_signal_processor.SignalSpectrumTransform,
                                   transform.name))
    s = ref_signal_processor.signal_data.Signal(list(x), list(y), len(x))
    return sp, sp.process_signal(s)


def _assert_masked_close(mine, ref, atol, what=""):
    mine, ref = np.asarray(mine, np.float64), np.asarray(ref, np.float64)
    assert mine.shape == ref.shape
    both_nan = np.isnan(mine) & np.isnan(ref)
    assert (np.isnan(mine) == np.isnan(ref)).all(), f"{what}: NaN mask differs"
    m = ~both_nan
    if m.any():
        err = np.abs(mine[m] - ref[m]).max()
        assert err < atol, f"{what}: max err {err} >= {atol}"


CHAINS = [
    (M.DETREND_CONST,),
    (M.DETREND_LINEAR,),
    (M.DIFF_1,),
    (M.DIFF_2,),
    (M.INTERP_LINEAR,),
    (M.INTERP_CUBIC,),
    (M.FILTER_BUTTER,),
    (M.FILTER_FIR,),
    (M.INTERP_CUBIC, M.DETREND_LINEAR, M.FILTER_FIR),
    (M.DIFF_1, M.INTERP_LINEAR, M.FILTER_BUTTER),
]


@pytest.mark.parametrize("methods", CHAINS, ids=lambda ms: "+".join(m.value for m in ms))
@pytest.mark.parametrize("n_valid,nan_prob", [(200, 0.1), (250, 0.0), (40, 0.2)])
def test_chain_parity(methods, n_valid, nan_prob):
    x, y = make_signal(n_valid=n_valid, nan_prob=nan_prob,
                       seed=hash((methods, n_valid)) % 2**31)
    cfg = SignalConfig(processing_methods=methods)
    _, ref_sig = run_oracle(methods, T.PGRAM_LS, x, y)
    ref_y = np.array(ref_sig.y, np.float64)
    ref_x = np.array(ref_sig.x, np.float64)
    mx, my = jit_chain(cfg)(jnp.asarray(x, jnp.float32),
                            jnp.asarray(y, jnp.float32))
    scale = np.nanmax(np.abs(ref_y)) + 1e-9
    has_filter = M.FILTER_BUTTER in methods or M.FILTER_FIR in methods
    # f32 vs the oracle's f64: filters and long chains accumulate more error.
    # The filter slack also covers run-to-run variance from nondeterministic
    # reduction order in XLA:CPU multithreaded matmuls/FFTs.
    atol = (1e-3 + 4e-3 * has_filter + 2e-3 * (len(methods) > 2)) * scale
    _assert_masked_close(my, ref_y, atol, f"y {methods}")
    _assert_masked_close(mx, ref_x, 1e-4, f"x {methods}")


def test_chain_skips_when_too_few_valid():
    x, y = make_signal(n_valid=5, nan_prob=1.0)  # all y NaN
    cfg = SignalConfig(processing_methods=(M.FILTER_BUTTER,))
    mx, my = chain.process_signal(cfg, jnp.asarray(x, jnp.float32),
                                  jnp.asarray(y, jnp.float32))
    np.testing.assert_array_equal(np.isnan(np.asarray(my)), np.isnan(y))


def test_butter_design_matches_scipy():
    lo, hi, fs = 0.8, 4.0, 27.7
    p_mine, k_mine = iir.butter_bandpass_poles(16, lo, hi, fs)
    _, p_ref, k_ref = scipy.signal.butter(16, [lo, hi], btype="bandpass",
                                          output="zpk", fs=fs)
    p_all = np.concatenate([np.asarray(p_mine), np.conj(np.asarray(p_mine))])
    np.testing.assert_allclose(np.sort_complex(p_all), np.sort_complex(p_ref),
                               atol=2e-6)
    np.testing.assert_allclose(float(k_mine), k_ref, rtol=1e-4)


@pytest.mark.parametrize("k", [20, 99, 100, 250])
def test_sosfiltfilt_matches_scipy(k):
    rng = np.random.RandomState(k)
    fs = 25.0
    t = np.arange(k) / fs
    y = np.sin(2 * np.pi * 1.3 * t) + 0.2 * rng.normal(size=k) + 50.0
    y = y.astype(np.float32).astype(np.float64)
    sos = scipy.signal.butter(16, [0.8, 4.0], btype="bandpass", output="sos", fs=fs)
    dflt = 3 * (2 * len(sos) + 1 - min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum()))
    padlen = k - 1 if k <= dflt else dflt
    ref = scipy.signal.sosfiltfilt(sos, y, padlen=padlen)
    n = 250
    yc = np.zeros(n, np.float32)
    yc[:k] = y
    mine = jit_sosfiltfilt(16, jnp.float32(0.8), jnp.float32(4.0),
                           jnp.float32(fs), jnp.asarray(yc), jnp.int32(k),
                           n + 2 * iir.default_padlen(16))
    err = np.abs(np.asarray(mine)[:k] - ref).max()
    assert err < 2e-3 * (np.abs(ref).max() + 1e-9), err


def test_firls_design_matches_scipy():
    fs = 25.0
    lo, hi, df, taps = 0.8, 4.0, 0.3, 127
    bands = [0, max(lo - df, df), lo, hi, min(hi + df, fs / 2 - df), fs / 2]
    ref = scipy.signal.firls(taps, bands, [0, 0, 1, 1, 0, 0], fs=fs)
    b, d = fir.reference_fir_bands(jnp.float32(lo), jnp.float32(hi),
                                   jnp.float32(df), jnp.float32(fs))
    mine = np.asarray(fir.firls_bandpass(taps, b, d, jnp.float32(fs)))
    np.testing.assert_allclose(mine, ref, atol=5e-4)


@pytest.mark.parametrize("k", [50, 250, 400])
def test_filtfilt_fir_matches_scipy(k):
    rng = np.random.RandomState(k)
    fs = 25.0
    t = np.arange(k) / fs
    y = (np.sin(2 * np.pi * 1.1 * t) + 0.2 * rng.normal(size=k)).astype(
        np.float32).astype(np.float64)
    taps = 127
    bands = [0, 0.5, 0.8, 4.0, 4.3, fs / 2]
    h = scipy.signal.firls(taps, bands, [0, 0, 1, 1, 0, 0], fs=fs)
    padlen = k - 1 if k <= 3 * taps else 3 * taps
    ref = scipy.signal.filtfilt(h, 1.0, y, padlen=padlen)
    n = max(k, 250)
    yc = np.zeros(n, np.float32)
    yc[:k] = y
    mine = jit_filtfilt_fir(jnp.asarray(h, jnp.float32), jnp.asarray(yc),
                            jnp.int32(k), n + 2 * 3 * taps + taps - 1)
    err = np.abs(np.asarray(mine)[:k] - ref).max()
    assert err < 2e-3 * (np.abs(ref).max() + 1e-9), err


@pytest.mark.parametrize("transform", [T.DFT_RFFT, T.PGRAM_WELCH, T.PGRAM_LS])
@pytest.mark.parametrize("n_valid,nan_prob", [(200, 0.1), (250, 0.0), (10, 0.3)])
def test_spectrum_parity(transform, n_valid, nan_prob):
    x, y = make_signal(n_valid=n_valid, nan_prob=nan_prob, offset=0.0,
                       seed=n_valid)
    sp, _ = run_oracle((M.DETREND_CONST,), transform, x, y)
    s = ref_signal_processor.signal_data.Signal(list(x), list(y), len(x))
    ref_spec = sp.transform_signal(s)
    ref_f = np.array(ref_spec.x, np.float64)
    ref_m = np.array(ref_spec.y, np.float64)
    cfg = SignalConfig(spectrum_transform=transform)
    mf, mm = jit_spectrum(cfg)(jnp.asarray(x, jnp.float32),
                               jnp.asarray(y, jnp.float32))
    mf, mm = np.asarray(mf, np.float64), np.asarray(mm, np.float64)
    kv = np.isfinite(mf).sum()
    assert kv == len(ref_f), (kv, len(ref_f))
    if kv:
        np.testing.assert_allclose(mf[:kv], ref_f, atol=1e-4)
        scale = np.abs(ref_m).max() + 1e-12
        np.testing.assert_allclose(mm[:kv], ref_m, atol=2e-3 * scale)


@pytest.mark.parametrize("n_valid", [250, 256, 257, 300, 384, 512])
def test_welch_segmented_matches_scipy(n_valid):
    """signal_max_samples > 256 crosses into scipy's multi-segment Welch
    (nperseg=256, 50% overlap, mean of periodograms) — parity at ring size
    512 across the clamp boundary (VERDICT.md Weak #3)."""
    n = 512
    x, y = make_signal(n=n, n_valid=n_valid, nan_prob=0.05, offset=0.0,
                       seed=n_valid)
    w = np.isfinite(y)
    u = np.isfinite(x)
    pair = u[1:] & u[:-1]
    fs = 1.0 / np.mean((x[1:] - x[:-1])[pair])
    ref_f, ref_p = scipy.signal.welch(y[w], fs)
    cfg = SignalConfig(signal_max_samples=n, spectrum_transform=T.PGRAM_WELCH)
    mf, mm = jit_spectrum(cfg)(jnp.asarray(x, jnp.float32),
                               jnp.asarray(y, jnp.float32))
    mf, mm = np.asarray(mf, np.float64), np.asarray(mm, np.float64)
    kv = np.isfinite(mf).sum()
    assert kv == len(ref_f), (kv, len(ref_f))
    np.testing.assert_allclose(mf[:kv], ref_f, atol=1e-3)
    scale = np.abs(ref_p).max() + 1e-12
    np.testing.assert_allclose(mm[:kv], ref_p, atol=2e-3 * scale)


def test_spectrum_peak_bpm_parity():
    """The acceptance metric: spectral-peak HR within ±1 BPM (it is in fact
    exactly the same bin)."""
    from bp_from_video_tpu.ops import signal as sig
    for seed in range(5):
        x, y = make_signal(n_valid=220, nan_prob=0.1, seed=seed, offset=0.0)
        for transform in [T.PGRAM_LS, T.PGRAM_WELCH, T.DFT_RFFT]:
            sp, _ = run_oracle((M.DETREND_CONST,), transform, x, y)
            s = ref_signal_processor.signal_data.Signal(list(x), list(y), len(x))
            ref_spec = sp.transform_signal(s)
            ref_spec.set_range((0.8, 4.0), (0.0, 1.0))
            f_ref, _ = ref_spec.get_peak()
            cfg = SignalConfig(spectrum_transform=transform)
            mf, mm = jit_spectrum(cfg)(
                jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
            f_mine, _ = sig.peak(mf, mm, 0.8, 4.0)
            bpm_ref = 60 * f_ref
            bpm_mine = 60 * float(f_mine)
            assert abs(bpm_mine - bpm_ref) <= 1.0, (transform, bpm_mine, bpm_ref)


@pytest.mark.parametrize("n_valid,nan_prob", [(200, 0.1), (250, 0.0), (30, 0.4)])
def test_correlation_parity(n_valid, nan_prob):
    x, ya = make_signal(n_valid=n_valid, nan_prob=nan_prob, seed=7, offset=0.0)
    _, yb = make_signal(n_valid=n_valid, nan_prob=nan_prob, seed=8, offset=0.0)
    sp, _ = run_oracle((M.DETREND_CONST,), T.PGRAM_LS, x, ya)
    sa = ref_signal_processor.signal_data.Signal(list(x), list(ya), len(x))
    sb = ref_signal_processor.signal_data.Signal(list(x), list(yb), len(x))
    ref_corr = sp.correlate_signal_pair(sa, sb)
    ref_l = np.array(ref_corr.x, np.float64)
    ref_c = np.array(ref_corr.y, np.float64)
    ml, mc = jit_correlate(jnp.asarray(x, jnp.float32),
                           jnp.asarray(ya, jnp.float32),
                           jnp.asarray(yb, jnp.float32))
    ml, mc = np.asarray(ml, np.float64), np.asarray(mc, np.float64)
    kv = np.isfinite(mc).sum()
    assert kv == len(ref_c)
    if kv:
        np.testing.assert_allclose(ml[:kv], ref_l, atol=1e-4)
        scale = np.abs(ref_c).max() + 1e-12
        np.testing.assert_allclose(mc[:kv], ref_c, atol=1e-3 * scale)


@pytest.mark.parametrize("method,fs", [
    ("filter_butter", 0.3),   # fs/2 - 2*min_bw < 0: no clamped band fits
    ("filter_fir", 6.0),      # b4 = fs/2 - df < max_freq: bands overlap
])
def test_filters_degrade_to_nan_at_too_low_fs(method, fs):
    """Sampling rates that cannot hold the band layout must degrade to
    NaN samples (masked out downstream, SURVEY §5.3) — the silent
    alternative was a divergent filter (butter poles outside the unit
    circle / singular firls normal equations) emitting garbage vitals
    where the reference's scipy would raise."""
    from bp_from_video_tpu.config import SignalConfig, SignalProcessingMethod
    from bp_from_video_tpu.ops import chain

    n = 64
    cfg = SignalConfig(
        processing_methods=(SignalProcessingMethod(method),),
        signal_max_samples=n)
    x = jnp.arange(n, dtype=jnp.float32) / fs
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0.0, 1.0, (n,)).astype(np.float32))
    _, y_out = chain.process_signal(cfg, x, y)
    assert np.isnan(np.asarray(y_out)).all()

    # Sanity: a normal rate through the same config stays finite.
    x_ok = jnp.arange(n, dtype=jnp.float32) / 30.0
    _, y_ok = chain.process_signal(cfg, x_ok, y)
    assert np.isfinite(np.asarray(y_ok)).all()


@pytest.mark.parametrize("n", [197, 250, 256, 1024, 2048])
def test_in_graph_dft_bases_match_f64_numpy(n):
    """The in-graph basis construction (ops/dft.py:_angles — int32 (r*c)
    mod n reduction feeding f32 sin/cos) must match f64-built-then-cast
    numpy bases to ~1 ulp, at every size the engine instantiates
    (nfft=2048 is the largest: correlate.py).  Guards the round-2 rewrite
    that moved the bases in-graph to stop embedding them as multi-MB HLO
    constants (remote-compile payload: 37.7 MB -> 4.15 MB)."""
    from bp_from_video_tpu.ops import dft

    nf = n // 2 + 1
    k = np.arange(n)[:, None].astype(np.float64)
    f = np.arange(nf)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * f / n
    c_ref = np.cos(ang).astype(np.float32)
    s_ref = -np.sin(ang).astype(np.float32)

    c, s = jax.jit(dft._rfft_mats, static_argnums=0)(n)
    # A few f32 ulp: the angle is exact post-reduction but carries one
    # f32 rounding, and sin/cos add ~1 ulp each (bound is 8e-7 ≈ 7 ulp
    # at magnitude 1 — vs the ~1e-4 error of unreduced k*f angles).
    np.testing.assert_allclose(np.asarray(c), c_ref, rtol=0, atol=8e-7)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=0, atol=8e-7)

    # Round-trip through the synthesis bases: irfft(rfft(x)) == x.
    rng = np.random.default_rng(1)
    x = rng.normal(0.0, 1.0, (3, n)).astype(np.float32)
    y = dft.irfft(dft.rfft(jnp.asarray(x), n), n)
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-5)


def test_in_graph_dft_rejects_overflowing_n():
    """(r*c) must stay exact in int32 — sizes past _MAX_N must refuse
    rather than silently wrap."""
    from bp_from_video_tpu.ops import dft
    with pytest.raises(AssertionError):
        dft._rfft_mats(dft._MAX_N + 2)


def test_pcr_tridiagonal_solve():
    """ops/tridiag.pcr_solve vs a dense solve on random diagonally
    dominant systems, batched, including identity-padded (masked) rows —
    the padding contract interp_cubic relies on."""
    from bp_from_video_tpu.ops import tridiag

    rng = np.random.default_rng(3)
    for n in (2, 3, 7, 250):
        a = rng.uniform(0.1, 1.0, (4, n))
        c = rng.uniform(0.1, 1.0, (4, n))
        a[:, 0] = 0.0
        c[:, -1] = 0.0
        b = 2.0 * (a + c) + rng.uniform(0.5, 1.0, (4, n))
        d = rng.normal(0.0, 1.0, (4, n))
        if n == 250:  # identity-pad the tail like a masked spline system
            k = 101
            a[:, k:] = 0.0
            c[:, k - 1:] = 0.0
            b[:, k:] = 1.0
            d[:, k:] = 0.0
        x = np.asarray(jax.jit(tridiag.pcr_solve)(
            jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
            jnp.asarray(c, jnp.float32), jnp.asarray(d, jnp.float32)))
        for i in range(4):
            full = np.diag(b[i]) + np.diag(a[i][1:], -1) + np.diag(c[i][:-1], 1)
            ref = np.linalg.solve(full, d[i])
            np.testing.assert_allclose(x[i], ref, rtol=0, atol=5e-5)
