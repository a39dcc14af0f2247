import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.geometry.se3 import SE3, quat_to_rot, rot_to_quat


def random_twists(key, n, scale=1.0):
    return jax.random.normal(key, (n, 6)) * scale


def test_exp_log_roundtrip():
    xi = random_twists(jax.random.PRNGKey(0), 64)
    T = SE3.exp(xi)
    xi2 = T.log()
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2),
                               rtol=1e-4, atol=1e-4)


def test_exp_small_angle():
    xi = random_twists(jax.random.PRNGKey(1), 16, scale=1e-6)
    T = SE3.exp(xi)
    np.testing.assert_allclose(np.asarray(T.log()), np.asarray(xi),
                               rtol=1e-3, atol=1e-9)
    # near-identity rotation
    np.testing.assert_allclose(np.asarray(T.R[0]), np.eye(3), atol=1e-5)


def test_compose_inverse():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    A = SE3.exp(random_twists(k1, 8))
    B = SE3.exp(random_twists(k2, 8))
    C = A * B
    I = C * C.inverse()
    np.testing.assert_allclose(np.asarray(I.R),
                               np.broadcast_to(np.eye(3), (8, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), np.zeros((8, 3)), atol=1e-5)


def test_apply_matches_matrix():
    T = SE3.exp(random_twists(jax.random.PRNGKey(3), 4))
    p = jax.random.normal(jax.random.PRNGKey(4), (4, 3))
    ph = jnp.concatenate([p, jnp.ones((4, 1))], axis=-1)
    expect = jnp.einsum("bij,bj->bi", T.matrix(), ph)[:, :3]
    np.testing.assert_allclose(np.asarray(T.apply(p)), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_rotation_orthonormal():
    T = SE3.exp(random_twists(jax.random.PRNGKey(5), 32))
    RtR = jnp.einsum("bji,bjk->bik", T.R, T.R)
    np.testing.assert_allclose(np.asarray(RtR),
                               np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    det = jnp.linalg.det(T.R)
    np.testing.assert_allclose(np.asarray(det), np.ones(32), atol=1e-5)


def test_adjoint_identity():
    """Adjoint: T * exp(xi) == exp(Adj(T) xi) * T."""
    T = SE3.exp(random_twists(jax.random.PRNGKey(6), 4, scale=0.5))
    xi = random_twists(jax.random.PRNGKey(7), 4, scale=0.1)
    lhs = T * SE3.exp(xi)
    adj_xi = jnp.einsum("bij,bj->bi", T.adjoint(), xi)
    rhs = SE3.exp(adj_xi) * T
    np.testing.assert_allclose(np.asarray(lhs.R), np.asarray(rhs.R),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(lhs.t), np.asarray(rhs.t),
                               atol=1e-4)


def test_quat_roundtrip():
    T = SE3.exp(random_twists(jax.random.PRNGKey(8), 32, scale=2.0))
    q = rot_to_quat(T.R)
    R2 = quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(T.R), np.asarray(R2), atol=1e-4)


def test_jit_and_vmap():
    f = jax.jit(lambda xi: (SE3.exp(xi) * SE3.exp(xi).inverse()).log())
    out = f(random_twists(jax.random.PRNGKey(9), 8))
    np.testing.assert_allclose(np.asarray(out), np.zeros((8, 6)), atol=1e-4)


def test_normalize():
    T = SE3.exp(random_twists(jax.random.PRNGKey(10), 4))
    noisy = SE3(T.R + 1e-3, T.t)
    Tn = noisy.normalize()
    RtR = jnp.einsum("bji,bjk->bik", Tn.R, Tn.R)
    np.testing.assert_allclose(np.asarray(RtR),
                               np.broadcast_to(np.eye(3), (4, 3, 3)),
                               atol=1e-5)
