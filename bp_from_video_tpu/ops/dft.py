"""Small-size real FFTs as MXU matmuls.

XLA's TPU FFT is built for large transforms; at this pipeline's sizes
(nfft = 512..1024, batch = streams x signals) a dense DFT is a pair of
[B, n] x [n, n/2+1] matmuls — a few hundred MFLOPs that the MXU absorbs for
free, versus milliseconds of poorly-shaped FFT kernels (measured: the
Butterworth chain's rfft/irfft pair dominated the whole DSP stage).

Drop-in signatures mirror ``jnp.fft.rfft`` / ``jnp.fft.irfft`` for real
inputs over the LAST axis.  The basis matrices are built IN-GRAPH (iota
outer product, angle reduced mod n in int32 so f32 sin/cos never sees a
large argument): numpy-built bases became 8 MB embedded HLO constants per
instance (a dozen per program at nfft=2048), which blew past the remote-
compile request limit; as traced computations they are a few ops that XLA
CSEs across call sites and hoists out of the per-frame scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (r*c) must stay exact in int32: r < n, c <= n//2 -> product < n^2/2.
_MAX_N = 46340


def _angles(rows: int, cols: int, n: int) -> Array:
    """2*pi*(r*c mod n)/n as an [rows, cols] f32 array.  The mod-n
    reduction happens on exact int32 products, so the f32 angle is in
    [0, 2*pi) with ~1 ulp error — matching f64-built-then-cast bases
    (a raw f32 k*f angle would carry ~1e-4 rad of reduction error)."""
    assert n <= _MAX_N, f"DFT size {n} overflows int32 angle reduction"
    r = jax.lax.iota(jnp.int32, rows)[:, None]
    c = jax.lax.iota(jnp.int32, cols)[None, :]
    m = (r * c) % n
    return jnp.float32(2.0 * np.pi / n) * m.astype(jnp.float32)


def _rfft_mats(n: int, rows: int | None = None) -> tuple[Array, Array]:
    """Analysis bases [rows, n//2+1].  ``rows < n`` builds only the first
    ``rows`` time rows — the contraction for an input that would be
    zero-padded to ``n`` (padding rows contribute nothing, so skip both
    the pad and their basis)."""
    ang = _angles(n if rows is None else rows, n // 2 + 1, n)
    return jnp.cos(ang), -jnp.sin(ang)


def _irfft_mats(n: int, out_len: int | None = None) -> tuple[Array, Array]:
    # x[k] = (1/n) * sum_f w_f * (Re Y_f cos(2pi f k / n) - Im Y_f sin(...)),
    # w_f = 1 for f in {0, n/2}, else 2 (conjugate-symmetric completion).
    # ``out_len`` truncates to the first out_len time columns — for callers
    # that slice ``irfft(...)[..., :out_len]`` (FFT convolution keeps only
    # the linear-conv prefix).
    nf = n // 2 + 1
    ang = _angles(nf, n if out_len is None else out_len, n)
    w = jnp.full((nf, 1), 2.0, jnp.float32)
    w = w.at[0].set(1.0)
    if n % 2 == 0:
        w = w.at[-1].set(1.0)
    return (w * jnp.cos(ang) / n), (-w * jnp.sin(ang) / n)


def rfft(x: Array, n: int) -> Array:
    """``jnp.fft.rfft(x, n)`` for real ``x`` over the last axis, as two
    matmuls (zero-padding/truncating to ``n`` like numpy).  Shorter-than-n
    inputs contract against only their own basis rows instead of being
    zero-padded (16x less DFT work for a 127-tap filter at nfft=2048)."""
    ln = x.shape[-1]
    if ln > n:
        x = x[..., :n]
        ln = n
    c, s = _rfft_mats(n, ln)
    x = x.astype(jnp.float32)
    # HIGHEST: TPU default matmul precision truncates f32 operands to bf16
    # before the MXU — an FFT replacement must keep f32 accuracy (the MACs
    # here are microseconds either way).
    hp = jax.lax.Precision.HIGHEST
    re = jnp.matmul(x, c, precision=hp)
    im = jnp.matmul(x, s, precision=hp)
    return jax.lax.complex(re, im)


def irfft(y: Array, n: int, out_len: int | None = None) -> Array:
    """``jnp.fft.irfft(y, n)`` over the last axis as two matmuls.  ``y``
    must carry n//2+1 spectral bins (the usual rfft companion).
    ``out_len`` synthesizes only the first ``out_len`` samples —
    equivalent to ``irfft(y, n)[..., :out_len]`` without the dead tail."""
    c, s = _irfft_mats(n, out_len)
    re = jnp.real(y).astype(jnp.float32)
    im = jnp.imag(y).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    return (jnp.matmul(re, c, precision=hp)
            + jnp.matmul(im, s, precision=hp))
