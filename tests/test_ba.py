"""Bundle adjustment tests: synthetic multi-view problems with known
ground truth — noise in poses+points must be jointly optimized away
(ref behavior: bundle_adjustment.cpp twoViewBA / localBA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ba.schur import BAProblem, solve_ba


def make_problem(key, K=4, P=64, M=4, pose_noise=0.02, point_noise=0.02,
                 fix_first_two=True):
    """Cameras on a line looking at a point cloud; every point observed by
    M random cameras (here: first M cams for determinism)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p_gt = jax.random.uniform(k1, (P, 3), minval=-1.0, maxval=1.0) \
        + jnp.array([0.0, 0.0, 4.0])
    Ts_gt = []
    for i in range(K):
        Ts_gt.append(SE3.exp(jnp.array(
            [0.4 * i, 0.02 * i, 0.0, 0.0, 0.05 * i, 0.0])))
    R_gt = jnp.stack([T.R for T in Ts_gt])
    t_gt = jnp.stack([T.t for T in Ts_gt])

    obs_cam = jnp.tile(jnp.arange(M, dtype=jnp.int32)[None], (P, 1))
    p_cam = jnp.einsum("pmij,pj->pmi", R_gt[obs_cam], p_gt) + t_gt[obs_cam]
    f = p_cam / jnp.linalg.norm(p_cam, axis=-1, keepdims=True)
    mask = p_cam[..., 2] > 0.1

    # perturb
    noise_xi = jax.random.normal(k2, (K, 6)) * pose_noise
    if fix_first_two:
        noise_xi = noise_xi.at[:2].set(0.0)
    T_noisy = SE3.exp(noise_xi) * SE3(R_gt, t_gt)
    p_noisy = p_gt + jax.random.normal(k3, (P, 3)) * point_noise

    var = jnp.ones((K,), bool)
    if fix_first_two:
        var = var.at[:2].set(False)
    prob = BAProblem(T_noisy.R, T_noisy.t, var, p_noisy,
                     jnp.ones((P,), bool), obs_cam, f,
                     jnp.zeros((P, M), jnp.int32), mask)
    return prob, (R_gt, t_gt, p_gt)


def test_ba_reduces_chi2_and_recovers_geometry():
    prob, (R_gt, t_gt, p_gt) = make_problem(jax.random.PRNGKey(0))
    res = solve_ba(prob, n_iter=15)
    assert float(res.chi2_final) < 0.01 * float(res.chi2_init), \
        (float(res.chi2_init), float(res.chi2_final))
    # variable cameras converge to GT
    terr = np.linalg.norm(np.asarray(res.t - t_gt), axis=-1)
    assert terr[2:].max() < 2e-3, terr
    perr = np.linalg.norm(np.asarray(res.p_w - p_gt), axis=-1)
    assert np.median(perr) < 2e-3, np.median(perr)


def test_ba_fixed_cameras_stay_fixed():
    prob, (R_gt, t_gt, p_gt) = make_problem(jax.random.PRNGKey(1))
    res = solve_ba(prob, n_iter=10)
    np.testing.assert_allclose(np.asarray(res.t[:2]),
                               np.asarray(prob.t[:2]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.R[:2]),
                               np.asarray(prob.R[:2]), atol=1e-7)


def test_ba_two_view():
    """twoViewBA equivalent: cam0 fixed AT GROUND TRUTH, cam1 + points
    perturbed and jointly refined (scale gauge remains free)."""
    prob, (R_gt, t_gt, p_gt) = make_problem(
        jax.random.PRNGKey(2), K=2, M=2, fix_first_two=True)
    # fix_first_two zeroes the noise on cams 0-1; perturb cam1 manually
    T1 = SE3.exp(jnp.array([0.03, -0.02, 0.01, 0.01, 0.015, -0.01])) \
        * SE3(prob.R[1], prob.t[1])
    prob = prob._replace(
        R=prob.R.at[1].set(T1.R), t=prob.t.at[1].set(T1.t),
        cam_variable=jnp.array([False, True]))
    res = solve_ba(prob, n_iter=15, huber_width=0.01)
    assert float(res.chi2_final) < 0.05 * float(res.chi2_init)
    t_est = np.asarray(res.t[1])
    t_ref = np.asarray(t_gt[1])
    cos = np.dot(t_est, t_ref) / (np.linalg.norm(t_est)
                                  * np.linalg.norm(t_ref))
    assert cos > 0.9999, cos
    ang = np.arccos(np.clip(
        (np.trace(np.asarray(res.R[1].T @ R_gt[1])) - 1) / 2, -1, 1))
    assert ang < 2e-3, ang


def test_ba_robust_to_outliers():
    prob, (R_gt, t_gt, p_gt) = make_problem(jax.random.PRNGKey(3))
    # corrupt ONE observation of each of the first 6 points (per-obs
    # outliers; corrupting every obs of a point identically would just
    # move the free point — undetectable by any robustifier)
    f = prob.obs_f
    noise = jax.random.normal(jax.random.PRNGKey(9), (6, 3)) * 0.1
    bad = f[:6, 0] + noise
    f = f.at[:6, 0].set(bad / jnp.linalg.norm(bad, axis=-1,
                                              keepdims=True))
    prob = prob._replace(obs_f=f)
    res = solve_ba(prob, n_iter=15, huber_width=0.01)
    terr = np.linalg.norm(np.asarray(res.t - t_gt), axis=-1)
    assert terr[2:].max() < 0.01, terr
    # corrupted observations flagged as outliers, clean ones kept
    inl = np.asarray(res.obs_inlier)
    assert inl[:6, 0].mean() < 0.5
    assert inl[10:].mean() > 0.9
