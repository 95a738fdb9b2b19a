"""Tridiagonal solves on TPU via parallel cyclic reduction (PCR).

``jnp.linalg.solve`` lowers a dense pivoted LU — a column-serial
factorization with argmax+row-swap gathers, the worst possible shape for
the TPU's vector unit (measured: it dominated the cubic-spline
interpolation stage, ops/chain.interp_cubic).  A tridiagonal system
solves in ``ceil(log2 n)`` *elementwise* reduction levels instead: each
level eliminates every row's neighbors at distance ``s`` simultaneously
(Hockney/Golub cyclic reduction, the classic vector-machine formulation),
doubling ``s`` until the system is diagonal.  No pivoting — stable for
the diagonally dominant systems DSP produces (spline / smoothing
matrices); each level is a handful of multiply-adds over the full row
vector, so 250 unknowns cost 8 vector-sized levels.

Padding contract: embed a size-``k`` system in size ``n`` by writing
identity rows (``a=c=d=0, b=1``) beyond ``k``.  Real rows never read
padding values scaled by anything but 0 (their own ``a``/``c`` are 0 at
the boundary), so masked systems solve exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pcr_solve(a: Array, b: Array, c: Array, d: Array) -> Array:
    """Solve the tridiagonal system over the LAST axis.

    ``a`` = sub-diagonal (``a[..., 0]`` must be 0), ``b`` = diagonal,
    ``c`` = super-diagonal (``c[..., -1]`` must be 0), ``d`` = rhs.
    Leading axes broadcast (vmap-free batching).  Returns ``x`` with
    ``tridiag(a, b, c) @ x = d``.
    """
    n = a.shape[-1]
    s = 1
    while s < n:
        def up(v, fill):   # v[i-s], identity fill out of range
            return jnp.concatenate(
                [jnp.full(v.shape[:-1] + (s,), fill, v.dtype),
                 v[..., :-s]], axis=-1)

        def dn(v, fill):   # v[i+s]
            return jnp.concatenate(
                [v[..., s:],
                 jnp.full(v.shape[:-1] + (s,), fill, v.dtype)], axis=-1)

        alpha = -a / up(b, 1.0)
        beta = -c / dn(b, 1.0)
        a, b, c, d = (alpha * up(a, 0.0),
                      b + alpha * up(c, 0.0) + beta * dn(a, 0.0),
                      beta * dn(c, 0.0),
                      d + alpha * up(d, 0.0) + beta * dn(d, 0.0))
        s *= 2
    return d / b
