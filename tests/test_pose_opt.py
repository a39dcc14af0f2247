"""Pose-optimizer tests (ref: svo/test/test_pose_optimizer.cpp — recovery
from a 0.2m pose disturbance with 1px feature noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.pose_opt import optimize_pose
from rpg_svo_tpu.ops.point_opt import optimize_points
from rpg_svo_tpu.utils.synthetic import SyntheticDataset, reference_test_camera


@pytest.fixture(scope="module")
def scene():
    """World points on the textured plane + a camera with GT pose."""
    ds = SyntheticDataset(n_frames=1)
    cam = ds.cam
    img, depth, T_w_c = ds.frame(0)
    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (150, 2)) \
        * jnp.array([700.0, 430.0]) + jnp.array([26.0, 25.0])
    f = cam.cam2world(px)
    xi = px[:, 0].astype(jnp.int32)
    yi = px[:, 1].astype(jnp.int32)
    d = depth[yi, xi]
    p_w = T_w_c.apply(f * d[:, None])
    T_f_w = T_w_c.inverse()
    return cam, p_w, f, T_f_w


def test_pose_recovery_with_noise(scene):
    cam, p_w, f, T_f_w_gt = scene
    key = jax.random.PRNGKey(1)
    # 1px-equivalent noise on bearings (like the reference's test)
    noise = jax.random.normal(key, f[:, :2].shape) / cam.fx
    f_noisy = f.at[:, :2].add(noise)
    f_noisy = f_noisy / jnp.linalg.norm(f_noisy, axis=-1, keepdims=True)
    # disturb pose by 0.2m translation + small rotation
    T_init = SE3.exp(jnp.array([0.15, -0.1, 0.08, 0.02, -0.02, 0.01])) \
        * T_f_w_gt
    level = jnp.zeros(p_w.shape[0], jnp.int32)
    valid = jnp.ones(p_w.shape[0], bool)
    res = optimize_pose(T_init, p_w, f_noisy, level, valid, cam.fx)
    t_err = float(jnp.linalg.norm(res.T_f_w.t - T_f_w_gt.t))
    assert t_err < 0.01, f"translation error {t_err:.4f} m"
    assert float(res.error_final) < float(res.error_init)
    assert int(res.n_obs) > 90
    # covariance is SPD-ish and small
    cov = np.asarray(res.cov)
    assert np.all(np.isfinite(cov))
    assert np.all(np.linalg.eigvalsh((cov + cov.T) / 2) > -1e-8)


def test_pose_noise_free_exact(scene):
    cam, p_w, f, T_f_w_gt = scene
    T_init = SE3.exp(jnp.array([0.1, 0.05, -0.05, 0.01, 0.01, -0.01])) \
        * T_f_w_gt
    res = optimize_pose(T_init, p_w, f,
                        jnp.zeros(p_w.shape[0], jnp.int32),
                        jnp.ones(p_w.shape[0], bool), cam.fx)
    t_err = float(jnp.linalg.norm(res.T_f_w.t - T_f_w_gt.t))
    assert t_err < 1e-3, f"translation error {t_err}"
    assert float(res.error_final) < 0.05  # px


def test_pose_outlier_pruning(scene):
    cam, p_w, f, T_f_w_gt = scene
    # corrupt 20 observations badly
    f_bad = f.at[:20, :2].add(30.0 / cam.fx)
    f_bad = f_bad / jnp.linalg.norm(f_bad, axis=-1, keepdims=True)
    res = optimize_pose(T_f_w_gt, p_w, f_bad,
                        jnp.zeros(p_w.shape[0], jnp.int32),
                        jnp.ones(p_w.shape[0], bool), cam.fx)
    inl = np.asarray(res.inliers)
    assert inl[:20].sum() == 0, "outliers must be pruned"
    assert inl[20:].mean() > 0.95
    t_err = float(jnp.linalg.norm(res.T_f_w.t - T_f_w_gt.t))
    assert t_err < 5e-3, f"outliers dragged the pose: {t_err}"


def test_structure_optimization_recovers_points(scene):
    cam, p_w, f, T_f_w_gt = scene
    K = 32
    p = p_w[:K]
    # two observing cameras: GT frame and one displaced
    T2 = SE3.exp(jnp.array([0.3, 0.1, 0.05, 0.05, 0.0, 0.02])) * T_f_w_gt
    f1 = T_f_w_gt.apply(p)
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = T2.apply(p)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)
    obs_R = jnp.stack([jnp.tile(T_f_w_gt.R, (K, 1, 1)),
                       jnp.tile(T2.R, (K, 1, 1))], axis=1)
    obs_t = jnp.stack([jnp.tile(T_f_w_gt.t, (K, 1)),
                       jnp.tile(T2.t, (K, 1))], axis=1)
    obs_f = jnp.stack([f1, f2], axis=1)
    obs_mask = jnp.ones((K, 2), bool)
    key = jax.random.PRNGKey(2)
    p_noisy = p + 0.02 * jax.random.normal(key, p.shape)
    p_opt, chi2 = optimize_points(p_noisy, obs_R, obs_t, obs_f, obs_mask,
                                  jnp.ones(K, bool), n_iter=8)
    err_before = np.linalg.norm(np.asarray(p_noisy - p), axis=-1)
    err_after = np.linalg.norm(np.asarray(p_opt - p), axis=-1)
    assert np.median(err_after) < 0.1 * np.median(err_before), (
        np.median(err_before), np.median(err_after))
