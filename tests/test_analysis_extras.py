"""Tests for hand-eye calibration, GT smoothing, stats, and comparisons."""

import os

import numpy as np

from rpg_svo_tpu.analysis.hand_eye import (
    hand_eye_calib, hand_eye_residuals, _quat_to_rot, _rot_to_quat,
)
from rpg_svo_tpu.analysis.smoothing import (
    smooth_groundtruth, smooth_orientation, dataset_stats,
)
from rpg_svo_tpu.analysis.compare import (
    compare_experiments, error_curve, load_tum, plot_comparison,
)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def test_quat_rot_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        q2 = _rot_to_quat(_quat_to_rot(q))
        assert np.allclose(q2, q, atol=1e-8) or np.allclose(q2, -q, atol=1e-8)


def test_hand_eye_recovers_known_transform():
    """Build gt/es trajectories related by a known hand-eye (R, b)."""
    rng = np.random.default_rng(1)
    R_he = _rot_z(0.4) @ _rot_x(-0.2)
    b_he = np.array([0.05, -0.02, 0.1])
    n = 120
    p_gt = np.zeros((n, 3))
    q_gt = np.zeros((n, 4))
    p_es = np.zeros((n, 3))
    q_es = np.zeros((n, 4))
    for i in range(n):
        # smooth, rotating ground-truth body trajectory
        Rb = _rot_z(0.05 * i) @ _rot_x(0.3 * np.sin(0.07 * i))
        tb = np.array([np.cos(0.05 * i), np.sin(0.05 * i), 0.1 * i / n])
        q_gt[i] = _rot_to_quat(Rb)
        p_gt[i] = tb
        # estimate frame: X = (R_he, b_he); T_es = T_gt * X
        Re = Rb @ R_he
        te = Rb @ b_he + tb
        q_es[i] = _rot_to_quat(Re)
        p_es[i] = te
    idx = rng.integers(0, n - 20, size=60)
    R, b = hand_eye_calib(q_gt, q_es, p_gt, p_es, idx, delta=15)
    # A X = X B with A from estimate, B from gt: our solver returns the
    # transform making the relative motions consistent
    err = hand_eye_residuals(q_gt, q_es, p_gt, p_es, R, b, delta=15)
    assert np.median(err) < 1e-6


def test_smoothing_reduces_noise_preserves_signal():
    n = 400
    t = np.arange(n) / 200.0
    rpy_clean = np.stack([0.3 * np.sin(2 * np.pi * 1.0 * t),
                          0.2 * np.cos(2 * np.pi * 0.5 * t),
                          0.1 * t], axis=-1)
    rng = np.random.default_rng(2)
    noise = 0.05 * rng.normal(size=(n, 3))
    from rpg_svo_tpu.analysis.smoothing import _rpy_to_quat, _quat_to_rpy
    q_noisy = _rpy_to_quat(rpy_clean + noise)
    q_s = smooth_orientation(q_noisy, f_sensor=200.0, f_cut=10.0)
    rpy_s = _quat_to_rpy(q_s)
    err_noisy = np.abs(_quat_to_rpy(q_noisy) - rpy_clean).mean()
    err_smooth = np.abs(rpy_s - rpy_clean)[20:-20].mean()
    assert err_smooth < 0.5 * err_noisy


def test_dataset_stats():
    n = 101
    t = np.linspace(0.0, 10.0, n)
    data = np.zeros((n, 8))
    data[:, 0] = t
    data[:, 1] = np.linspace(0.0, 5.0, n)   # 5 m straight line in x
    data[:, 3] = 2.0                        # constant height
    s = dataset_stats(data, stepsize=1)
    assert abs(s["trajectory_length_m"] - 5.0) < 1e-6
    assert abs(s["height_mean_m"] - 2.0) < 1e-9
    assert abs(s["duration_s"] - 10.0) < 1e-9
    assert abs(s["speed_m_per_s"] - 0.5) < 1e-6


def test_compare_experiments(tmp_path):
    n = 60
    t = np.arange(n) * 0.1
    gt = np.zeros((n, 8))
    gt[:, 0] = t
    gt[:, 1] = np.linspace(0, 3, n)
    gt[:, 7] = 1.0
    for j, drift in enumerate([0.0, 0.02]):
        d = tmp_path / f"exp{j}"
        os.makedirs(d)
        est = gt.copy()
        # sinusoidal perturbation: not absorbable by a similarity transform
        est[:, 2] += drift * np.sin(np.linspace(0, 6 * np.pi, n))
        np.savetxt(d / "groundtruth.txt", gt)
        np.savetxt(d / "traj_estimate.txt", est)
    res = compare_experiments([str(tmp_path / "exp0"), str(tmp_path / "exp1")])
    assert res["exp0"]["trans_error_rmse"] < 1e-9
    assert res["exp1"]["trans_error_rmse"] > 1e-6
    assert abs(res["exp0"]["distance_m"] - 3.0) < 1e-6
    plot_comparison(res, str(tmp_path / "cmp.pdf"))
    assert (tmp_path / "cmp.pdf").exists()
