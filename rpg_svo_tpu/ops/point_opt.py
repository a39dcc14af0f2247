"""Structure-only refinement: per-point 3-DoF Gauss-Newton.

TPU-native equivalent of Point::optimize (svo/src/point.cpp:119-177) and
the pipeline's optimizeStructure scheduling (frame_handler_base.cpp:178-196).
The reference optimizes ~20 points x 5 iterations sequentially per frame;
here ALL selected points run as one batched GN with per-point convergence
masks and chi2 rollback.

Layout: K points, each with up to M observation slots —
  obs_R (K, M, 3, 3), obs_t (K, M, 3): T_f_w of the observing keyframes,
  obs_f (K, M, 3): measured unit bearings, obs_mask (K, M).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.linalg import solve3x3
from rpg_svo_tpu.geometry.cameras import project2d

EPS = 1e-10


def _point_system(p_w, obs_R, obs_t, obs_f, obs_mask):
    """Batched 3x3 normal equations for all points at once.

    p_w (K, 3) -> A (K, 3, 3), b (K, 3), chi2 (K,).
    """
    p_cam = jnp.sum(obs_R * p_w[:, None, None, :], axis=-1) \
        + obs_t                                              # (K, M, 3)
    e = project2d(obs_f) - project2d(p_cam)                   # (K, M, 2)
    x, y = p_cam[..., 0], p_cam[..., 1]
    z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-10, 1e-10, p_cam[..., 2])
    zi = 1.0 / z
    zero = jnp.zeros_like(x)
    # J = -d proj/d p_w = -(Jproj @ R)  (Point::jacobian_xyz2uv sign)
    Jproj = jnp.stack([
        jnp.stack([zi, zero, -x * zi * zi], axis=-1),
        jnp.stack([zero, zi, -y * zi * zi], axis=-1),
    ], axis=-2)                                               # (K, M, 2, 3)
    J = -jnp.sum(Jproj[..., :, :, None] * obs_R[..., None, :, :],
                 axis=-2)
    m = obs_mask.astype(e.dtype)
    e = e * m[..., None]
    Jm = J * m[..., None, None]
    A = jnp.sum(J[..., :, :, None] * Jm[..., :, None, :], axis=(1, 2))
    b = -jnp.sum(Jm * e[..., None], axis=(1, 2))
    chi2 = jnp.sum(jnp.sum(e * e, -1), axis=-1)
    return A, b, chi2


@functools.partial(jax.jit, static_argnames=("n_iter",))
def optimize_points(p_w: jnp.ndarray,       # (K, 3)
                    obs_R: jnp.ndarray,     # (K, M, 3, 3) T_f_w rotations
                    obs_t: jnp.ndarray,     # (K, M, 3) T_f_w translations
                    obs_f: jnp.ndarray,     # (K, M, 3) measured bearings
                    obs_mask: jnp.ndarray,  # (K, M)
                    point_valid: jnp.ndarray,  # (K,)
                    n_iter: int = 5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (p_w_optimized (K, 3), final chi2 (K,))."""

    def body(_, state):
        p, p_old, chi2_old, frozen = state
        A, b, chi2 = _point_system(p, obs_R, obs_t, obs_f, obs_mask)
        dp = solve3x3(A + 1e-10 * jnp.eye(3), b)
        bad = (chi2 > chi2_old) | jnp.isnan(dp[:, 0])
        # rollback per point; once rolled back, freeze (reference breaks)
        p_next = jnp.where((bad | frozen | ~point_valid)[:, None],
                           jnp.where(bad[:, None], p_old, p),
                           p + dp)
        conv = jnp.max(jnp.abs(dp), axis=-1) <= EPS
        return (p_next, jnp.where(bad[:, None], p_old, p),
                jnp.where(bad, chi2_old, chi2),
                frozen | bad | conv)

    chi2_init = jnp.full((p_w.shape[0],), jnp.inf, dtype=jnp.float32)
    # unrolled fixed small trip count (see pose_opt: per-iteration lax
    # loop dispatch costs more than the fused unrolled chain here)
    carry = (p_w, p_w, chi2_init, jnp.zeros(p_w.shape[0], bool))
    for i in range(n_iter):
        carry = body(i, carry)
    p, _, chi2, _ = carry
    return p, chi2


def observations_struct(n_points: int, max_obs: int):
    """Empty observation SoA block for `optimize_points`."""
    return dict(
        obs_R=jnp.tile(jnp.eye(3), (n_points, max_obs, 1, 1)),
        obs_t=jnp.zeros((n_points, max_obs, 3)),
        obs_f=jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n_points, max_obs, 1)),
        obs_mask=jnp.zeros((n_points, max_obs), bool),
    )
