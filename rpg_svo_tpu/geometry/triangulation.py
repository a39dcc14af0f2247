"""Triangulation and projection Jacobians.

Equivalents of the reference's closed-form geometry helpers:
- ``Matcher::depthFromTriangulation`` (svo/src/matcher.cpp:109-122)
- ``Frame::jacobian_xyz2uv`` 2x6 (svo/include/svo/frame.h:116-138)
- ``Point::jacobian_xyz2uv`` 2x3 (svo/include/svo/point.h:89-103)

All functions are pure, broadcast over leading batch dims, and are safe
under jit/vmap (no data-dependent branches).
"""

from __future__ import annotations

import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3, hat


def jacobian_xyz2uv(p_cam: jnp.ndarray) -> jnp.ndarray:
    """d(residual)/d(twist) for unit-plane residual r = meas − proj(T·p).

    Twist ordering (v, w); matches the reference's Frame::jacobian_xyz2uv
    sign convention. p_cam (..., 3) -> (..., 2, 6).
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([-zi, zero, x * zi2,
                      y * x * zi2, -(1.0 + x * x * zi2), y * zi], axis=-1)
    row1 = jnp.stack([zero, -zi, y * zi2,
                      1.0 + y * y * zi2, -x * y * zi2, -x * zi], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def jacobian_proj_point(p_cam: jnp.ndarray, R_f_w: jnp.ndarray) -> jnp.ndarray:
    """d(unit-plane projection)/d(world point) (..., 2, 3).

    Equivalent of Point::jacobian_xyz2uv but WITHOUT the residual sign flip:
    this is the raw projection Jacobian chained through R_f_w.
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    Jproj = jnp.stack([
        jnp.stack([zi, zero, -x * zi2], axis=-1),
        jnp.stack([zero, zi, -y * zi2], axis=-1),
    ], axis=-2)
    return Jproj @ R_f_w


def depth_from_triangulation(T_cur_ref: SE3, f_ref: jnp.ndarray,
                             f_cur: jnp.ndarray):
    """Depth of a ray correspondence via a 2x2 linear solve.

    Solves d_ref * (R·f_ref) − d_cur * f_cur = −t for (d_ref, d_cur),
    where T_cur_ref maps ref-frame coords to cur-frame coords.
    Returns (d_ref, d_cur, ok) — ok is False when rays are near-parallel.
    """
    Rf = T_cur_ref.rotate(f_ref)                    # (..., 3)
    A0, A1 = Rf, -f_cur
    # normal equations for A = [Rf, -f_cur], b = -t
    a = jnp.sum(A0 * A0, axis=-1)
    b = jnp.sum(A0 * A1, axis=-1)
    c = jnp.sum(A1 * A1, axis=-1)
    rhs0 = -jnp.sum(A0 * T_cur_ref.t, axis=-1)
    rhs1 = -jnp.sum(A1 * T_cur_ref.t, axis=-1)
    det = a * c - b * b
    ok = jnp.abs(det) > 1e-12
    det_safe = jnp.where(ok, det, 1.0)
    d_ref = (c * rhs0 - b * rhs1) / det_safe
    d_cur = (a * rhs1 - b * rhs0) / det_safe
    return d_ref, d_cur, ok


def triangulate_midpoint(T_w_ref: SE3, T_w_cur: SE3, f_ref: jnp.ndarray,
                         f_cur: jnp.ndarray):
    """World point from two bearing rays (midpoint of closest approach).

    Used by the two-view bootstrap (ref: initialization.cpp:79-97 uses
    vk::triangulate — same geometry, different parameterization).
    Returns (p_world, ok).
    """
    T_cur_ref = T_w_cur.inverse() * T_w_ref
    d_ref, d_cur, ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    p_ref = f_ref * d_ref[..., None]
    p_cur = f_cur * d_cur[..., None]
    p_w = 0.5 * (T_w_ref.apply(p_ref) + T_w_cur.apply(p_cur))
    return p_w, ok & (d_ref > 0) & (d_cur > 0)


def reprojection_error_unitplane(p_cam: jnp.ndarray,
                                 f_meas: jnp.ndarray) -> jnp.ndarray:
    """Unit-plane residual between a camera-frame point and a measured
    bearing vector (..., 2): project both to z=1 and subtract."""
    z = jnp.where(jnp.abs(p_cam[..., 2:3]) < 1e-10, 1e-10, p_cam[..., 2:3])
    zf = jnp.where(jnp.abs(f_meas[..., 2:3]) < 1e-10, 1e-10, f_meas[..., 2:3])
    return f_meas[..., :2] / zf - p_cam[..., :2] / z


__all__ = [
    "jacobian_xyz2uv", "jacobian_proj_point", "depth_from_triangulation",
    "triangulate_midpoint", "reprojection_error_unitplane", "hat",
]
