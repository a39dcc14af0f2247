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
    """Unrolled Cholesky factor of a (6, 6) SPD matrix (lower L).

    Vector form: each column is built as a masked (6,) vector and added
    into L with an outer product — everything fuses into a handful of
    elementwise kernels.  [The earlier scalar form stacked 6 scalars per
    row (jnp.stack = a concatenate kernel with 6 producers): those
    concatenates stalled the TPU scalar pipeline ~3.7 us each and were
    the largest single inter-kernel-gap source of the fused VO step —
    0.36 ms/frame of gaps before concatenates in the GN loop.]

    An indefinite/degenerate system yields NaN (sqrt of a negative),
    matching the LU behavior the GN rollback logic keys on."""
    n = A.shape[-1]
    idx = jnp.arange(n)
    L = jnp.zeros_like(A)
    for j in range(n):
        s = A[:, j] - jnp.sum(L[:, :j] * L[j, :j][None, :], axis=-1) \
            if j > 0 else A[:, j]
        d = jnp.sqrt(s[j])
        col = jnp.where(idx == j, d,
                        jnp.where(idx > j, s / d, jnp.zeros_like(s)))
        L = L + col[:, None] * (idx == j).astype(A.dtype)[None, :]
    return L


def solve6x6_spd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a damped-SPD 6x6 system by unrolled Cholesky (no custom-call;
    fuses into the surrounding GN iteration instead of a serial LU
    kernel launch).  Substitutions are masked (6,)-vector updates — no
    scalar stacks (see cholesky6x6)."""
    L = cholesky6x6(A)
    n = b.shape[-1]
    idx = jnp.arange(n)
    y = jnp.zeros_like(b)
    for i in range(n):
        # y[k] = 0 for k >= i, so the full row dot only sums k < i
        yi = (b[i] - jnp.sum(L[i, :] * y)) / L[i, i]
        y = y + yi * (idx == i).astype(b.dtype)
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        # x[k] = 0 for k <= i, so the full column dot only sums k > i
        xi = (y[i] - jnp.sum(L[:, i] * x)) / L[i, i]
        x = x + xi * (idx == i).astype(b.dtype)
    return x


def onehot_gather_rows(table: jnp.ndarray, idx: jnp.ndarray):
    """table[idx] for a SMALL table via a one-hot MXU matmul.

    Scattered gathers cost ~9-14 ns/ELEMENT on TPU; for per-item rows
    from a small pool (keyframe poses per seed/observation) the one-hot
    contraction is 1-2 orders of magnitude faster (measured: the per-seed
    T_kf gather in has_update_work alone was 0.42 ms/frame of the fast
    preset; BA's R[cam] gathers were ~8 ms per KF-frame).  idx (...,);
    table (K, ...) with K <= a few hundred.  HIGHEST precision keeps the
    gathered values exact (one-hot rows are exact in bf16; the TABLE
    operand would otherwise be truncated)."""
    import jax
    K = table.shape[0]
    flat = table.reshape(K, -1)
    E = jax.nn.one_hot(idx.reshape(-1), K, dtype=flat.dtype)
    out = jnp.einsum("nk,kd->nd", E, flat,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + table.shape[1:])
