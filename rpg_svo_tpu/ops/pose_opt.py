"""Motion-only bundle adjustment (pose refinement).

TPU-native equivalent of pose_optimizer::optimizeGaussNewton
(svo/src/pose_optimizer.cpp:28-161).  One Gauss-Newton solve over the 6-DoF
pose with all feature observations batched; reproduced semantics:

- unit-plane residuals e = project2d(f_meas) − project2d(T_f_w · p_w),
  scaled by sqrt-inv covariance 1/2^level;
- Tukey robust weights with MAD scale from the initial residuals;
- scale override at iteration 5: 0.85 / focal (reference line 66-67);
- chi2-increase rollback + NaN guard, early stop at norm_max(dT) < EPS;
- left-multiplicative update T ← exp(dT) · T;
- pose covariance = (A · fx²)^{-1} (inverse Fisher, "optimistic");
- outlier pruning at reproj_thresh / fx on final residuals;
- returns median initial/final px errors and surviving observation count.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.cameras import project2d
from rpg_svo_tpu.geometry.triangulation import jacobian_xyz2uv
from rpg_svo_tpu.ops.robust import tukey_weight, mad_scale, masked_median
from rpg_svo_tpu.geometry.linalg import solve6x6_spd

EPS = 1e-10


class PoseOptResult(NamedTuple):
    T_f_w: SE3
    cov: jnp.ndarray          # (6, 6) pose covariance
    inliers: jnp.ndarray      # (N,) surviving observations
    n_obs: jnp.ndarray        # scalar int32 after pruning
    error_init: jnp.ndarray   # median initial error, px
    error_final: jnp.ndarray  # median final error, px
    estimated_scale: jnp.ndarray  # MAD scale in px


def _residuals(T: SE3, p_w, f_meas, sqrt_inv_cov, valid):
    p_cam = T.apply(p_w)
    e = (project2d(f_meas) - project2d(p_cam)) * sqrt_inv_cov[:, None]
    e = jnp.where(valid[:, None], e, 0.0)
    return e, p_cam


@functools.partial(jax.jit, static_argnames=("n_iter",))
def optimize_pose(T_init: SE3,
                  p_w: jnp.ndarray,       # (N, 3) world points
                  f_meas: jnp.ndarray,    # (N, 3) measured bearings
                  level: jnp.ndarray,     # (N,) feature pyramid level
                  valid: jnp.ndarray,     # (N,)
                  fx: jnp.ndarray,        # focal (error multiplier)
                  reproj_thresh: float = 2.0,
                  n_iter: int = 10) -> PoseOptResult:
    sqrt_inv_cov = 1.0 / (2.0 ** level.astype(jnp.float32))

    e0, _ = _residuals(T_init, p_w, f_meas, sqrt_inv_cov, valid)
    enorm0 = jnp.linalg.norm(e0, axis=-1)
    est_scale = mad_scale(enorm0, valid)
    error_init = jnp.sqrt(masked_median(jnp.sum(e0 * e0, -1), valid)) * fx

    def gn_system(T, scale):
        e, p_cam = _residuals(T, p_w, f_meas, sqrt_inv_cov, valid)
        J = jacobian_xyz2uv(p_cam) * sqrt_inv_cov[:, None, None]
        w = tukey_weight(jnp.linalg.norm(e, axis=-1)
                         / jnp.maximum(scale, 1e-12))
        w = jnp.where(valid, w, 0.0)
        Jw = J * w[:, None, None]
        A = jnp.sum(J[:, :, :, None] * Jw[:, :, None, :], axis=(0, 1))
        b = -jnp.sum(Jw * e[:, :, None], axis=(0, 1))
        chi2 = jnp.sum(jnp.sum(e * e, -1) * w)
        return A, b, chi2

    def body(i, carry):
        T, T_old, chi2_prev, A_prev, done = carry
        scale = jnp.where(i >= 5, 0.85 / fx, est_scale)
        A, b, new_chi2 = gn_system(T, scale)
        dT = solve6x6_spd(A + 1e-12 * jnp.eye(6), b)
        fail = (~done) & (((i > 0) & (new_chi2 > chi2_prev))
                          | jnp.isnan(dT[0]))
        upd = (~done) & (~fail)
        # fail -> roll back to T_old and stop; done -> frozen; else step
        T_next = jax.tree.map(
            lambda old, cur, new: jnp.where(
                fail, old, jnp.where(upd, new, cur)),
            T_old, T, SE3.exp(dT) * T)
        T_old_next = jax.tree.map(
            lambda old, cur: jnp.where(upd, cur, old), T_old, T)
        converged = jnp.max(jnp.abs(dT)) <= EPS
        return (T_next, T_old_next,
                jnp.where(upd, new_chi2, chi2_prev),
                jnp.where(upd, A, A_prev),
                done | fail | (upd & converged))

    # unrolled fixed trip count: sequential lax loops pay per-iteration
    # dispatch on this backend; unrolling lets XLA fuse the chain
    A0 = jnp.eye(6)
    carry = (T_init, T_init, jnp.float32(0.0), A0, jnp.bool_(False))
    for i in range(n_iter):
        carry = body(jnp.int32(i), carry)
    T, _, _, A, _ = carry

    # covariance: (A * fx^2)^{-1}
    cov = jnp.linalg.inv(A * (fx * fx) + 1e-12 * jnp.eye(6))

    # prune outliers on final residuals
    e1, _ = _residuals(T, p_w, f_meas, sqrt_inv_cov, valid)
    enorm1 = jnp.linalg.norm(e1, axis=-1)
    inliers = valid & (enorm1 <= reproj_thresh / fx)
    error_final = jnp.sqrt(masked_median(jnp.sum(e1 * e1, -1), valid)) * fx
    return PoseOptResult(T, cov, inliers, jnp.sum(inliers).astype(jnp.int32),
                         error_init, error_final, est_scale * fx)
