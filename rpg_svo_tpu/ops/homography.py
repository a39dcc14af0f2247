"""Homography estimation (RANSAC + DLT) and Faugeras decomposition.

TPU-native replacement for vikit's Homography class used by the
reference's two-view bootstrap (svo/src/initialization.cpp:171-195):
estimate H between unit-plane correspondences, decompose into
(R, t, n) hypotheses, and pick the one consistent with the
correspondences (positive triangulated depths).

RANSAC is a fixed-size batch: all S minimal samples are solved at once
(batched SVD of S 8x9 systems), all N points scored against all S
hypotheses in one (S, N) pass — no data-dependent loops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.triangulation import depth_from_triangulation


def _dlt_rows(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """DLT constraint rows for point pairs: (..., N, 2, 9)."""
    x, y = uv1[..., 0], uv1[..., 1]
    xp, yp = uv2[..., 0], uv2[..., 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero,
                    x * xp, y * xp, xp], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one,
                    x * yp, y * yp, yp], axis=-1)
    return jnp.stack([r1, r2], axis=-2)


def _solve_h(uv1: jnp.ndarray, uv2: jnp.ndarray,
             w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Least-squares homography from correspondences (..., N, 2) pairs.
    Returns (..., 3, 3) with unit Frobenius norm."""
    rows = _dlt_rows(uv1, uv2)                       # (..., N, 2, 9)
    A = rows.reshape(rows.shape[:-3] + (-1, 9))
    if w is not None:
        ww = jnp.repeat(w, 2, axis=-1)[..., None]
        A = A * ww
    # null vector via smallest singular vector of A^T A (9x9 eigh)
    M = jnp.swapaxes(A, -1, -2) @ A
    evals, evecs = jnp.linalg.eigh(M)
    h = evecs[..., 0]
    H = h.reshape(h.shape[:-1] + (3, 3))
    return H / jnp.linalg.norm(H, axis=(-2, -1), keepdims=True)


def _transfer_error(H: jnp.ndarray, uv1: jnp.ndarray,
                    uv2: jnp.ndarray) -> jnp.ndarray:
    """One-way transfer error |H uv1 - uv2| on the unit plane (..., N)."""
    ones = jnp.ones_like(uv1[..., :1])
    p = jnp.concatenate([uv1, ones], axis=-1)
    q = jnp.einsum("...ij,...nj->...ni", H, p)
    z = jnp.where(jnp.abs(q[..., 2:3]) < 1e-12, 1e-12, q[..., 2:3])
    return jnp.linalg.norm(q[..., :2] / z - uv2, axis=-1)


class HomographyResult(NamedTuple):
    H: jnp.ndarray            # (3, 3)
    inliers: jnp.ndarray      # (N,)
    n_inliers: jnp.ndarray    # scalar
    T_cur_ref: SE3            # selected decomposition
    decomp_ok: jnp.ndarray    # scalar bool


@functools.partial(jax.jit, static_argnames=("n_ransac",))
def estimate_homography(uv_ref: jnp.ndarray, uv_cur: jnp.ndarray,
                        valid: jnp.ndarray, key: jnp.ndarray,
                        thresh: jnp.ndarray,
                        n_ransac: int = 256) -> HomographyResult:
    """RANSAC homography on unit-plane correspondences + decomposition.

    thresh: inlier threshold on the unit plane (reproj_thresh / focal).
    """
    N = uv_ref.shape[0]
    # sample minimal sets only among valid indices: sample from the valid
    # pool via categorical over the mask
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits[None, :],
                                 shape=(n_ransac, 4))      # (S, 4)
    s_ref = uv_ref[idx]                                    # (S, 4, 2)
    s_cur = uv_cur[idx]
    Hs = _solve_h(s_ref, s_cur)                            # (S, 3, 3)
    err = _transfer_error(Hs, uv_ref[None], uv_cur[None])  # (S, N)
    inl = (err < thresh) & valid[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    # refit on the best consensus set
    w = inl[best].astype(jnp.float32)
    H = _solve_h(uv_ref, uv_cur, w)
    err_f = _transfer_error(H, uv_ref, uv_cur)
    inliers = (err_f < thresh) & valid
    f_ref = _unit(jnp.concatenate([uv_ref, jnp.ones((N, 1))], -1))
    f_cur = _unit(jnp.concatenate([uv_cur, jnp.ones((N, 1))], -1))
    T, ok = decompose_homography(H, f_ref, f_cur, inliers)
    return HomographyResult(H, inliers, jnp.sum(inliers), T, ok)


def _unit(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def decompose_homography(H: jnp.ndarray, f_ref: jnp.ndarray,
                         f_cur: jnp.ndarray, inliers: jnp.ndarray):
    """Faugeras-Lustman decomposition of a unit-plane homography into
    (R, t); the 8 hypotheses are scored by positive triangulated depth
    over the inlier correspondences.  Returns (T_cur_ref, ok).

    Translation is up to scale (normalized to |t| = 1 when nonzero).
    """
    U, S, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    # normalize by middle singular value
    safe = jnp.maximum(d2, 1e-12)
    d1n, d3n = d1 / safe, d3 / safe
    denom = jnp.maximum(d1n * d1n - d3n * d3n, 1e-12)
    x1 = jnp.sqrt(jnp.clip((d1n * d1n - 1.0) / denom, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((1.0 - d3n * d3n) / denom, 0.0, None))

    Ts = []
    # case d' = +d2: R' is rotation about y by theta
    sin_t = (d1n - d3n) * x1 * x3
    cos_t = jnp.clip((d1n * x3 * x3 + d3n * x1 * x1), -1.0, 1.0)
    nrm = jnp.sqrt(jnp.maximum(sin_t ** 2 + cos_t ** 2, 1e-12))
    sin_t, cos_t = sin_t / nrm, cos_t / nrm
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * sin_t
            Rp = jnp.array([[1.0, 0.0, 0.0],
                            [0.0, 1.0, 0.0],
                            [0.0, 0.0, 1.0]])
            Rp = jnp.stack([
                jnp.stack([cos_t, jnp.float32(0.0), -st]),
                jnp.array([0.0, 1.0, 0.0]),
                jnp.stack([st, jnp.float32(0.0), cos_t]),
            ])
            tp = (d1n - d3n) * jnp.stack(
                [e1 * x1, jnp.float32(0.0), -e3 * x3])
            R = s * U @ Rp @ Vt
            t = U @ tp
            Ts.append((R, t))
    # case d' = -d2: R' is symmetry about y by phi
    sin_p = (d1n + d3n) * x1 * x3
    cos_p = jnp.clip((d3n * x1 * x1 - d1n * x3 * x3), -1.0, 1.0)
    nrm = jnp.sqrt(jnp.maximum(sin_p ** 2 + cos_p ** 2, 1e-12))
    sin_p, cos_p = sin_p / nrm, cos_p / nrm
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            sp = e1 * e3 * sin_p
            Rp = jnp.stack([
                jnp.stack([cos_p, jnp.float32(0.0), sp]),
                jnp.array([0.0, -1.0, 0.0]),
                jnp.stack([sp, jnp.float32(0.0), -cos_p]),
            ])
            tp = (d1n + d3n) * jnp.stack(
                [e1 * x1, jnp.float32(0.0), e3 * x3])
            R = -s * U @ Rp @ Vt
            t = U @ tp
            Ts.append((R, t))

    Rs = jnp.stack([r for r, _ in Ts])                     # (8, 3, 3)
    ts = jnp.stack([t for _, t in Ts])                     # (8, 3)
    tn = jnp.linalg.norm(ts, axis=-1, keepdims=True)
    ts = ts / jnp.maximum(tn, 1e-12)
    cand = SE3(Rs, ts)

    # score: count inlier correspondences with positive depth both views
    def score_one(T):
        d_ref, d_cur, ok = depth_from_triangulation(
            T, f_ref, f_cur)
        good = inliers & ok & (d_ref > 0) & (d_cur > 0)
        return jnp.sum(good)

    scores = jax.vmap(score_one)(cand)
    best = jnp.argmax(scores)
    T = SE3(Rs[best], ts[best])
    ok = scores[best] > 0.7 * jnp.maximum(jnp.sum(inliers), 1)
    return T, ok
