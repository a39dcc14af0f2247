"""Closed-form small-matrix inverses/solves (batched).

The hot GN kernels invert per-item 2x2 and 3x3 normal-equation matrices.
``jnp.linalg.inv``/``solve`` lower to LU custom-calls on TPU (one serial
kernel launch per batch, ~0.3-0.5 ms per call site in the fused step);
adjugate formulas are pure VPU math and fuse into the surrounding
elementwise work.  All systems here are damped (+eps*I) by the callers,
so pivoting is unnecessary.
"""

from __future__ import annotations

import jax.numpy as jnp


def det2x2(A: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., 2, 2)."""
    return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]


def inv2x2(A: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Adjugate inverse of (..., 2, 2)."""
    d = det2x2(A)
    d = jnp.where(jnp.abs(d) < eps, eps, d)
    adj = jnp.stack([
        jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1),
        jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1),
    ], axis=-2)
    return adj / d[..., None, None]


def inv3x3(A: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Adjugate inverse of (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    C00 = e * i - f * h
    C01 = -(d * i - f * g)
    C02 = d * h - e * g
    C10 = -(b * i - c * h)
    C11 = a * i - c * g
    C12 = -(a * h - b * g)
    C20 = b * f - c * e
    C21 = -(a * f - c * d)
    C22 = a * e - b * d
    det = a * C00 + b * C01 + c * C02
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    adj = jnp.stack([
        jnp.stack([C00, C10, C20], axis=-1),
        jnp.stack([C01, C11, C21], axis=-1),
        jnp.stack([C02, C12, C22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (..., 3, 3) x (..., 3) via the adjugate inverse."""
    return jnp.einsum("...ij,...j->...i", inv3x3(A), b)


def solve2x2(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", inv2x2(A), b)


def cholesky6x6(A: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky factor of a (6, 6) SPD matrix (lower L)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # no clamp: an indefinite/degenerate system yields NaN, matching
        # the LU behavior the GN rollback logic keys on
        Ljj = jnp.sqrt(s)
        L[j][j] = Ljj
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / Ljj
    rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros_like(A[0, 0])
                       for j in range(n)]) for i in range(n)]
    return jnp.stack(rows)


def solve6x6_spd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a damped-SPD 6x6 system by unrolled Cholesky (no custom-call;
    fuses into the surrounding GN iteration instead of a serial LU
    kernel launch)."""
    L = cholesky6x6(A)
    # forward substitution L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i, k] * y[k]
        y[i] = s / L[i, i]
    # back substitution L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k, i] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x)
