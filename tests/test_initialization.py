"""Bootstrap tests: LK tracking, homography, full two-view init
(ref: svo/src/initialization.cpp thresholds at :48-66)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.cameras import project2d
from rpg_svo_tpu.ops.pyramid import build_pyramid
from rpg_svo_tpu.ops.detector import detect_features, grid_dims
from rpg_svo_tpu.ops.lk import track_klt
from rpg_svo_tpu.ops.homography import (
    estimate_homography, decompose_homography, _solve_h,
)
from rpg_svo_tpu.core.initialization import (
    KltHomographyInit, RESULT_SUCCESS, RESULT_NO_KEYFRAME,
)
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def two_view():
    # camera over a plane moving sideways: ideal homography scene
    ds = SyntheticDataset(n_frames=12, trajectory="line", speed=0.03)
    img0, depth0, T0 = ds.frame(0)
    img1, depth1, T1 = ds.frame(10)   # ~0.3m baseline -> ~60px disparity
    return ds, img0, depth0, T0, img1, T1


def test_klt_tracks_known_motion(two_view):
    ds, img0, depth0, T0, img1, T1 = two_view
    pyr0 = build_pyramid(img0, 5)
    pyr1 = build_pyramid(img1, 5)
    ncx, ncy = grid_dims(752, 480, 25)
    det = detect_features(pyr0, jnp.zeros((ncx * ncy,), bool), 25)
    px_cur, ok = track_klt(pyr0, pyr1, det["px"], det["valid"],
                           halfwin=7, max_level=4)
    tracked = det["valid"] & ok
    assert int(tracked.sum()) > 0.5 * int(det["valid"].sum())
    # ground-truth correspondence via GT depth + poses
    f = ds.cam.cam2world(det["px"])
    xi = jnp.clip(det["px"][:, 0].astype(jnp.int32), 0, 751)
    yi = jnp.clip(det["px"][:, 1].astype(jnp.int32), 0, 479)
    d = depth0[yi, xi]
    p_w = T0.apply(f * d[:, None])
    px_gt = ds.cam.world2cam(T1.inverse().apply(p_w))
    err = np.linalg.norm(np.asarray(px_cur - px_gt), axis=-1)
    m = np.asarray(tracked) & np.isfinite(err) \
        & np.asarray(ds.cam.is_in_frame(px_gt, 10.0))
    assert np.median(err[m]) < 0.5, np.median(err[m])


def test_homography_dlt_exact():
    """Synthetic exact homography must be recovered by the DLT."""
    H_true = jnp.array([[1.1, 0.02, 0.01], [-0.03, 0.95, -0.02],
                        [0.05, -0.04, 1.0]])
    key = jax.random.PRNGKey(0)
    uv1 = jax.random.uniform(key, (64, 2), minval=-0.5, maxval=0.5)
    p = jnp.concatenate([uv1, jnp.ones((64, 1))], -1) @ H_true.T
    uv2 = p[:, :2] / p[:, 2:3]
    H_est = _solve_h(uv1, uv2)
    H_n = np.asarray(H_est / H_est[2, 2] * (H_true[2, 2]))
    np.testing.assert_allclose(H_n, np.asarray(H_true), atol=2e-3)


def test_homography_ransac_rejects_outliers():
    H_true = jnp.array([[1.0, 0.0, 0.05], [0.0, 1.0, -0.03],
                        [0.02, 0.01, 1.0]])
    key = jax.random.PRNGKey(1)
    uv1 = jax.random.uniform(key, (128, 2), minval=-0.5, maxval=0.5)
    p = jnp.concatenate([uv1, jnp.ones((128, 1))], -1) @ H_true.T
    uv2 = p[:, :2] / p[:, 2:3]
    # corrupt 30 correspondences
    uv2 = uv2.at[:30].add(
        jax.random.normal(jax.random.PRNGKey(2), (30, 2)) * 0.2)
    res = estimate_homography(uv1, uv2, jnp.ones(128, bool),
                              jax.random.PRNGKey(3),
                              thresh=jnp.float32(0.005))
    inl = np.asarray(res.inliers)
    assert inl[30:].mean() > 0.9
    assert inl[:30].mean() < 0.3


def test_decompose_planar_motion():
    """H built from known (R, t, n): decomposition recovers the motion
    direction (up to the homography scale ambiguity)."""
    T_gt = SE3.exp(jnp.array([0.2, 0.05, 0.02, 0.02, -0.03, 0.01]))
    n = jnp.array([0.0, 0.0, 1.0])   # plane z = d in ref frame
    d = 2.0
    H = T_gt.R + jnp.outer(T_gt.t, n) / d
    key = jax.random.PRNGKey(4)
    # synthetic correspondences on the plane
    uv1 = jax.random.uniform(key, (96, 2), minval=-0.4, maxval=0.4)
    p_ref = jnp.concatenate([uv1 * d, jnp.full((96, 1), d)], -1)
    p_cur = T_gt.apply(p_ref)
    uv2 = p_cur[:, :2] / p_cur[:, 2:3]
    f_ref = p_ref / jnp.linalg.norm(p_ref, axis=-1, keepdims=True)
    f_cur = p_cur / jnp.linalg.norm(p_cur, axis=-1, keepdims=True)
    T_est, ok = decompose_homography(H / jnp.linalg.norm(H),
                                     f_ref, f_cur, jnp.ones(96, bool))
    assert bool(ok)
    # rotation must match closely
    ang = np.arccos(np.clip(
        (np.trace(np.asarray(T_est.R.T @ T_gt.R)) - 1) / 2, -1, 1))
    assert ang < 0.01, f"rotation error {ang} rad"
    # translation direction matches (scale is unobservable)
    t_dir_gt = np.asarray(T_gt.t / jnp.linalg.norm(T_gt.t))
    t_dir = np.asarray(T_est.t / jnp.maximum(
        jnp.linalg.norm(T_est.t), 1e-9))
    assert abs(float(np.dot(t_dir, t_dir_gt))) > 0.99


def test_full_two_view_init(two_view):
    ds, img0, depth0, T0, img1, T1 = two_view
    cfg = fast_preset(grid_size=25)
    ncx, ncy = grid_dims(752, 480, 25)
    init = KltHomographyInit(ds.cam, cfg, ncx * ncy)
    assert init.add_first_frame(build_pyramid(img0, 5)) == RESULT_SUCCESS
    res, tv = init.add_second_frame(build_pyramid(img1, 5))
    assert res == RESULT_SUCCESS
    assert int(tv.inlier.sum()) >= cfg.init_min_inliers
    # relative pose direction vs ground truth (scale fixed by map_scale)
    T_gt = T1.inverse() * T0
    t_est = np.asarray(tv.T_cur_ref.t)
    t_gt = np.asarray(T_gt.t)
    cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est)
                                 * np.linalg.norm(t_gt))
    assert cos > 0.99, f"translation direction cos {cos}"
    ang = np.arccos(np.clip(
        (np.trace(np.asarray(tv.T_cur_ref.R.T @ T_gt.R)) - 1) / 2, -1, 1))
    assert ang < 0.02, f"rotation error {ang}"
    # triangulated points lie near the GT plane (z=0 world = plane)
    p_w = np.asarray(tv.p_w)[np.asarray(tv.inlier)]
    # in ref-frame coords the plane is at depth ~ GT depths * scale
    assert np.isfinite(p_w).all()


def test_second_frame_too_close_is_no_keyframe(two_view):
    ds, img0, depth0, T0, img1, T1 = two_view
    cfg = fast_preset(grid_size=25)
    ncx, ncy = grid_dims(752, 480, 25)
    init = KltHomographyInit(ds.cam, cfg, ncx * ncy)
    init.add_first_frame(build_pyramid(img0, 5))
    img_close, _, _ = ds.frame(1)   # tiny disparity
    res, _ = init.add_second_frame(build_pyramid(img_close, 5))
    assert res == RESULT_NO_KEYFRAME
