"""Signal ring-buffer core vs a numpy/deque oracle re-deriving the reference
semantics (reference signal_data.py:12-117)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.ops import signal as sig


class OracleSignal:
    """Numpy re-derivation of reference Signal (signal_data.py:12-70)."""

    def __init__(self, maxlen):
        self.x = collections.deque([np.nan] * maxlen, maxlen)
        self.y = collections.deque([np.nan] * maxlen, maxlen)

    def add(self, xp, yp):
        self.x.append(xp)
        self.y.append(yp)

    @property
    def v(self):
        return np.isfinite(self.x)

    @property
    def w(self):
        y = np.array(self.y)
        return np.isfinite(y).all(axis=1) if y.ndim == 2 else np.isfinite(y)

    def get_fs(self):
        x = np.array(self.x)
        u = self.v
        return 1 / np.nanmean(np.diff(x[u])) if u.sum() >= 2 else np.nan

    def get_mean(self):
        y = np.array(self.y)
        return np.squeeze(np.nanmean(y, axis=0)) if self.w.any() else y[-1]

    def get_peak(self, min_x, max_x):
        x, y = np.array(self.x), np.array(self.y)
        u = (min_x <= x) & (x <= max_x) & self.w
        if u.sum() >= 2:
            return x[u][np.argmax(y[u])], np.max(y[u])
        return np.nan, np.nan


def _drive(n_push, maxlen, rng, nan_prob=0.2):
    """Push a random stream (with NaN dropouts) into both implementations."""
    oracle = OracleSignal(maxlen)
    x, y = sig.full_signal(maxlen)
    push = jax.jit(sig.push)
    t = 0.0
    for _ in range(n_push):
        t += float(rng.uniform(0.02, 0.06))
        # Round inputs to f32 so the f64 oracle and the f32 device rings see
        # bit-identical samples (window-edge comparisons are exact).
        tf = float(np.float32(t))
        val = float(np.float32(rng.normal())) if rng.uniform() > nan_prob else np.nan
        oracle.add(tf, val)
        x, y = push(x, y, tf, val)
    return oracle, np.asarray(x), np.asarray(y)


@pytest.mark.parametrize("n_push", [0, 1, 3, 30, 80])
def test_ring_contents_match_deque(n_push):
    rng = np.random.RandomState(n_push)
    oracle, x, y = _drive(n_push, maxlen=32, rng=rng)
    np.testing.assert_allclose(x, np.array(oracle.x), rtol=1e-6)
    np.testing.assert_allclose(y, np.array(oracle.y), rtol=1e-6)


@pytest.mark.parametrize("n_push", [0, 1, 2, 5, 40, 100])
def test_fs_mean_peak(n_push):
    rng = np.random.RandomState(100 + n_push)
    oracle, x, y = _drive(n_push, maxlen=32, rng=rng)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    fs = float(sig.mean_fs(xj))
    fs_ref = oracle.get_fs()
    if np.isnan(fs_ref):
        assert np.isnan(fs)
    else:
        np.testing.assert_allclose(fs, fs_ref, rtol=1e-4)

    mean = float(sig.masked_mean(yj))
    mean_ref = oracle.get_mean()
    np.testing.assert_allclose(mean, mean_ref, rtol=1e-5, equal_nan=True)

    if n_push >= 2:
        lo, hi = float(np.nanmin(x)), float(np.nanmax(x))
        px, py = sig.peak(xj, yj, lo, hi)
        px_ref, py_ref = oracle.get_peak(lo, hi)
        np.testing.assert_allclose(float(px), px_ref, rtol=1e-5, equal_nan=True)
        np.testing.assert_allclose(float(py), py_ref, rtol=1e-5, equal_nan=True)


def test_vector_valued_ring_and_mean():
    # ROI rings hold 6-vectors (reference signal_processor.py:78).
    maxlen = 4
    x, y = sig.full_signal(maxlen, y_shape=(6,))
    vals = [np.arange(6.0), np.arange(6.0) + 1, np.full(6, np.nan)]
    for i, v in enumerate(vals):
        x, y = sig.push(x, y, float(i), jnp.asarray(v))
    w = sig.valid_y(y)
    np.testing.assert_array_equal(np.asarray(w), [False, True, True, False])
    mean = np.asarray(sig.masked_mean(y))
    np.testing.assert_allclose(mean, np.arange(6.0) + 0.5)
    mean_int = np.asarray(sig.masked_mean(y, as_int=True))
    np.testing.assert_allclose(mean_int, np.round(np.arange(6.0) + 0.5))


def test_compact_scatter_roundtrip():
    rng = np.random.RandomState(0)
    vals = rng.normal(size=24).astype(np.float32)
    mask = rng.uniform(size=24) > 0.4
    c = sig.compact(jnp.asarray(mask), jnp.asarray(vals))
    k = int(c.count)
    assert k == mask.sum()
    np.testing.assert_allclose(np.asarray(c.values)[:k], vals[mask], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c.values)[k:], 0.0)
    back = sig.scatter_back(jnp.asarray(mask), c.values,
                            jnp.full(24, jnp.nan, jnp.float32))
    out = np.asarray(back)
    np.testing.assert_allclose(out[mask], vals[mask], rtol=1e-6)
    assert np.isnan(out[~mask]).all()


def test_compact_2d_and_take_at():
    vals = jnp.arange(12.0).reshape(6, 2)
    mask = jnp.asarray([True, False, True, True, False, True])
    c = sig.compact(mask, vals, fill=np.nan)
    np.testing.assert_allclose(np.asarray(c.values)[:4],
                               [[0, 1], [4, 5], [6, 7], [10, 11]])
    last = sig.take_at(c.values, -1, c.count)
    np.testing.assert_allclose(np.asarray(last), [10, 11])


def test_group_range():
    los = jnp.asarray([1.0, jnp.nan])
    his = jnp.asarray([2.0, 5.0])
    lo, hi = sig.group_range(los, his)
    assert float(lo) == 1.0 and float(hi) == 5.0
    # One signal with no finite bound at all -> NaN joint range.
    lo, hi = sig.group_range(jnp.asarray([1.0, jnp.nan]),
                             jnp.asarray([2.0, jnp.nan]))
    assert np.isnan(float(lo)) and np.isnan(float(hi))


def test_bracket_matrix_matches_searchsorted():
    """sig.bracket_matrix == searchsorted(side='right')-1 segment selection
    for in-range queries; out-of-range and beyond-count rows are all-zero."""
    import numpy as np

    rng = np.random.default_rng(3)
    for k in [0, 1, 2, 5, 17]:
        n = 20
        xv = np.sort(rng.uniform(0, 10, n)).astype(np.float32)
        q = rng.uniform(-1, 12, 31).astype(np.float32)
        m, x0s, x1s = sig.bracket_matrix(jnp.asarray(xv), jnp.int32(k),
                                         jnp.asarray(q))
        m = np.asarray(m)
        assert (m.sum(axis=1) <= 1).all()
        for c, g in enumerate(q):
            hits = np.where(m[c] > 0)[0]
            if k >= 2 and xv[0] <= g < xv[k - 1]:
                j = np.searchsorted(xv[:k], g, side="right") - 1
                assert hits.tolist() == [j], (k, c, g)
            else:
                assert hits.size == 0, (k, c, g)
        # Sentinel layout: x0s finite exactly on the first k slots.
        assert np.isfinite(np.asarray(x0s)).sum() == k
