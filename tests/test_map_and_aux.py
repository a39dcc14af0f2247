"""Map validators, checkpoint/resume, public API parity, viz helpers."""

import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core.map_debug import validate_map, map_statistics
from rpg_svo_tpu.core.checkpoint import (
    save_map, load_map, save_handler, load_handler,
)
from rpg_svo_tpu.core import map as svomap
from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.utils.synthetic import SyntheticDataset
from rpg_svo_tpu.viz import Info, draw_features, status_line, InfoStream


@pytest.fixture(scope="module")
def tracked_handler():
    ds = SyntheticDataset(n_frames=16, trajectory="circle", radius=0.25,
                          revolutions=0.25)
    fh = FrameHandler(ds.cam, fast_preset(grid_size=25))
    img0, depth0, T0 = ds.frame(0)
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
    for i in range(1, 16):
        fh.add_image(ds.frame(i)[0], timestamp=i / 50.0)
    return ds, fh


def test_map_is_consistent_after_tracking(tracked_handler):
    ds, fh = tracked_handler
    errors = validate_map(fh.map)
    assert errors == [], errors
    stats = map_statistics(fh.map)
    assert stats["n_keyframes"] >= 1
    assert stats["n_points"] > 100
    assert stats["n_observations"] > 100


def test_validator_catches_corruption(tracked_handler):
    ds, fh = tracked_handler
    m = fh.map
    # corrupt: point observation pointing at an inactive keyframe slot
    pt = m.pt
    live = np.flatnonzero(np.asarray(pt.ptype) >= svomap.TYPE_UNKNOWN)
    p = int(live[0])
    bad_pt = pt._replace(
        obs_kf=pt.obs_kf.at[p, 0].set(m.kf.active.shape[0] - 1),
        obs_valid=pt.obs_valid.at[p, 0].set(True))
    errors = validate_map(m._replace(pt=bad_pt))
    assert errors, "validator missed a dangling observation"


def test_checkpoint_map_roundtrip(tmp_path, tracked_handler):
    ds, fh = tracked_handler
    path = str(tmp_path / "map.npz")
    save_map(path, fh.map)
    m2 = load_map(path, fh.map)
    np.testing.assert_allclose(np.asarray(fh.map.pt.pos),
                               np.asarray(m2.pt.pos))
    assert int(m2.kf_counter) == int(fh.map.kf_counter)


def test_checkpoint_resume_tracking(tmp_path, tracked_handler):
    ds, fh = tracked_handler
    path = str(tmp_path / "handler.npz")
    save_handler(path, fh)
    fh2 = FrameHandler(ds.cam, fh.cfg)
    load_handler(path, fh2)
    # resumed handler keeps tracking the next frame without failure
    info = fh2.add_image(ds.frame(15)[0], timestamp=0.5)
    assert info["result"] != "failure"
    T_est = fh2.last_frame.T_f_w.inverse()
    err = float(jnp.linalg.norm(T_est.t - ds.poses[15].t))
    assert err < 0.02, err


def test_relocalize_at_pose_api(tracked_handler):
    ds, fh = tracked_handler
    kf_ids = np.asarray(fh.map.kf.frame_id)[np.asarray(fh.map.kf.active)]
    kf_id = int(kf_ids[0])
    # find the GT pose of that keyframe's frame index: it was frame kf_id
    img, _, T_gt = ds.frame(min(kf_id + 1, 15))
    ok = fh.relocalize_frame_at_pose(kf_id, SE3.identity(), img, 0.9)
    assert ok
    assert fh.stage == "default"


def test_dense_input_and_seed_snapshot(tracked_handler):
    ds, fh = tracked_handler
    slot = int(np.flatnonzero(np.asarray(fh.map.kf.active))[0])
    d = fh.dense_input(slot)
    assert d is not None
    assert d["image"].shape == fh.img_shape
    assert 0 < d["min_depth"] <= d["max_depth"]
    snap = fh.get_seeds_snapshot()
    assert (snap["sigma2"] >= 0).all()


def test_viz_helpers():
    img = np.zeros((32, 32), np.float32)
    out = draw_features(img, np.array([[5.0, 5.0], [30.0, 30.0]]),
                        np.array([True, True]))
    assert out.max() == 255.0
    assert img.max() == 0.0  # copy, not in place
    info = Info.from_frame_info(
        {"frame_id": 3, "timestamp": 0.1, "proc_time": 0.002,
         "repr_n_new_references": 99, "stage": "default"})
    line = status_line(info, fps=432.1)
    assert "99" in line and "default" in line
    s = InfoStream()
    s.push(info)
    s.push(info)
    assert s.fps is not None and s.fps > 0


def test_pose_with_covariance_adjoint():
    from rpg_svo_tpu.viz import pose_with_covariance, dense_input_from_frame
    from rpg_svo_tpu.geometry.se3 import SE3
    import jax.numpy as jnp
    T = SE3.exp(jnp.array([0.1, -0.2, 0.3, 0.05, -0.02, 0.1]))
    Cov = np.diag([1e-4, 2e-4, 3e-4, 1e-5, 2e-5, 3e-5])
    # world_in_cam: unchanged
    T1, C1 = pose_with_covariance(T, Cov, world_in_cam=True)
    assert np.allclose(C1, Cov)
    # cam-in-world: transformed by adjoint, still symmetric PSD
    T2, C2 = pose_with_covariance(T, Cov, world_in_cam=False)
    assert np.allclose(C2, C2.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(C2) > 0)
    assert np.allclose(np.asarray(T2.t), np.asarray(T.inverse().t))

    d = dense_input_from_frame(
        7, 0.5, np.zeros((8, 8)), T,
        np.array([[0.0, 0.0, 1.5], [0.1, 0.1, 3.0], [0, 0, -1.0]]))
    assert d.min_depth == 1.5 and d.max_depth == 3.0 and d.frame_id == 7


def test_transform_map_consistency():
    """Global Sim3 transform (Map::transform): reprojection of any point
    into any keyframe is invariant."""
    import jax.numpy as jnp
    from rpg_svo_tpu.core import map as svomap
    from rpg_svo_tpu.geometry.se3 import SE3
    from rpg_svo_tpu.core.map import transform_map

    m = svomap.init_map(n_kfs=4, n_feats=8, n_points=16, n_obs=4,
                        n_seeds=8, pyr_shape=(1, 64))
    rng = np.random.default_rng(0)
    # two keyframes with distinct poses, some points
    T0 = SE3.exp(jnp.asarray(rng.normal(size=6) * 0.2, dtype=jnp.float32))
    pts = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32)) \
        + jnp.array([0.0, 0.0, 4.0])
    kf = m.kf._replace(
        R=m.kf.R.at[0].set(T0.R), t=m.kf.t.at[0].set(T0.t),
        active=m.kf.active.at[0].set(True))
    m = m._replace(kf=kf, pt=m.pt._replace(
        pos=pts, ptype=jnp.full_like(m.pt.ptype, 3)))
    p_cam_before = T0.apply(pts)

    R = SE3.exp(jnp.array([0, 0, 0, 0.3, -0.2, 0.5], jnp.float32)).R
    t = jnp.array([1.0, -2.0, 0.5], jnp.float32)
    s = jnp.float32(2.5)
    m2 = transform_map(m, R, t, s)
    T0n = SE3(m2.kf.R[0], m2.kf.t[0])
    p_cam_after = T0n.apply(m2.pt.pos)
    # camera-frame coordinates scale by s, directions unchanged
    np.testing.assert_allclose(np.asarray(p_cam_after),
                               np.asarray(p_cam_before) * 2.5,
                               rtol=1e-4, atol=1e-4)
