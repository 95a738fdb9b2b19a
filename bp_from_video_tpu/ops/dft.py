"""Small-size real FFTs as MXU matmuls.

XLA's TPU FFT is built for large transforms; at this pipeline's sizes
(nfft = 512..1024, batch = streams x signals) a dense DFT is a pair of
[B, n] x [n, n/2+1] matmuls — a few hundred MFLOPs that the MXU absorbs for
free, versus milliseconds of poorly-shaped FFT kernels (measured: the
Butterworth chain's rfft/irfft pair dominated the whole DSP stage).

Drop-in signatures mirror ``jnp.fft.rfft`` / ``jnp.fft.irfft`` for real
inputs over the LAST axis, with the basis matrices built once per ``n`` on
the host and closed over as constants (f32, ~4 MB at n=1024).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _rfft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)[:, None].astype(np.float64)
    f = np.arange(n // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * f / n
    return (np.cos(ang).astype(np.float32),
            -np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _irfft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    # x[k] = (1/n) * sum_f w_f * (Re Y_f cos(2pi f k / n) - Im Y_f sin(...)),
    # w_f = 1 for f in {0, n/2}, else 2 (conjugate-symmetric completion).
    f = np.arange(n // 2 + 1)[:, None].astype(np.float64)
    k = np.arange(n)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * f * k / n
    w = np.full((n // 2 + 1, 1), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    return ((w * np.cos(ang) / n).astype(np.float32),
            (-w * np.sin(ang) / n).astype(np.float32))


def rfft(x: Array, n: int) -> Array:
    """``jnp.fft.rfft(x, n)`` for real ``x`` over the last axis, as two
    matmuls (zero-padding/truncating to ``n`` like numpy)."""
    c, s = _rfft_mats(n)
    ln = x.shape[-1]
    if ln < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - ln)]
        x = jnp.pad(x, pad)
    elif ln > n:
        x = x[..., :n]
    x = x.astype(jnp.float32)
    # HIGHEST: TPU default matmul precision truncates f32 operands to bf16
    # before the MXU — an FFT replacement must keep f32 accuracy (the MACs
    # here are microseconds either way).
    hp = jax.lax.Precision.HIGHEST
    re = jnp.matmul(x, jnp.asarray(c), precision=hp)
    im = jnp.matmul(x, jnp.asarray(s), precision=hp)
    return jax.lax.complex(re, im)


def irfft(y: Array, n: int) -> Array:
    """``jnp.fft.irfft(y, n)`` over the last axis as two matmuls.  ``y``
    must carry n//2+1 spectral bins (the usual rfft companion)."""
    c, s = _irfft_mats(n)
    re = jnp.real(y).astype(jnp.float32)
    im = jnp.imag(y).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    return (jnp.matmul(re, jnp.asarray(c), precision=hp)
            + jnp.matmul(im, jnp.asarray(s), precision=hp))
