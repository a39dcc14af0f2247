import jax
import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.triangulation import (
    jacobian_xyz2uv, jacobian_proj_point, depth_from_triangulation,
    triangulate_midpoint,
)


def test_depth_from_triangulation_exact():
    key = jax.random.PRNGKey(0)
    p_ref = jax.random.uniform(key, (64, 3), minval=-1.0, maxval=1.0) \
        + jnp.array([0.0, 0.0, 3.0])
    T_cur_ref = SE3.exp(jnp.tile(
        jnp.array([[0.3, 0.0, 0.05, 0.0, 0.1, 0.0]]), (64, 1)))
    p_cur = T_cur_ref.apply(p_ref)
    f_ref = p_ref / jnp.linalg.norm(p_ref, axis=-1, keepdims=True)
    f_cur = p_cur / jnp.linalg.norm(p_cur, axis=-1, keepdims=True)
    d_ref, d_cur, ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(d_ref),
                               np.asarray(jnp.linalg.norm(p_ref, axis=-1)),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_cur),
                               np.asarray(jnp.linalg.norm(p_cur, axis=-1)),
                               rtol=1e-3)


def test_triangulate_midpoint_world():
    T_w_ref = SE3.identity((4,))
    T_w_cur = SE3.exp(jnp.tile(jnp.array([[0.5, 0.0, 0.0, 0.0, 0.0, 0.0]]),
                               (4, 1)))
    p_w = jnp.array([[0.2, -0.1, 2.0], [1.0, 0.5, 4.0],
                     [-0.5, 0.3, 3.0], [0.0, 0.0, 5.0]])
    f_ref = T_w_ref.inverse().apply(p_w)
    f_ref = f_ref / jnp.linalg.norm(f_ref, axis=-1, keepdims=True)
    f_cur = T_w_cur.inverse().apply(p_w)
    f_cur = f_cur / jnp.linalg.norm(f_cur, axis=-1, keepdims=True)
    p_est, ok = triangulate_midpoint(T_w_ref, T_w_cur, f_ref, f_cur)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(p_est), np.asarray(p_w),
                               rtol=1e-3, atol=1e-4)


def test_jacobian_xyz2uv_finite_diff():
    """J must equal d(residual)/d(twist) for r = meas − proj(exp(xi)·p)."""
    p = jnp.array([0.4, -0.3, 2.5])
    meas = p[:2] / p[2]

    def residual(xi):
        p2 = SE3.exp(xi).apply(p)
        return meas - p2[:2] / p2[2]

    J_analytic = jacobian_xyz2uv(p)
    J_fd = jax.jacfwd(residual)(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(J_analytic), np.asarray(J_fd),
                               rtol=1e-4, atol=1e-5)


def test_jacobian_proj_point_finite_diff():
    T = SE3.exp(jnp.array([0.1, -0.2, 0.3, 0.05, -0.02, 0.1]))
    p_w = jnp.array([0.5, 0.2, 3.0])

    def proj(pw):
        pc = T.apply(pw)
        return pc[:2] / pc[2]

    J = jacobian_proj_point(T.apply(p_w), T.R)
    J_fd = jax.jacfwd(proj)(p_w)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_fd),
                               rtol=1e-4, atol=1e-5)
