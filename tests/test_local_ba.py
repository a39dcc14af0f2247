"""Local BA integration: the accurate preset (loba_num_iter > 0) must
run through the pipeline and not degrade tracking."""

import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.config import accurate_preset
from rpg_svo_tpu.core.pipeline import FrameHandler, RESULT_FAILURE
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


def test_accurate_preset_with_local_ba():
    ds = SyntheticDataset(n_frames=30, trajectory="circle", radius=0.25,
                          revolutions=0.4)
    cfg = accurate_preset(grid_size=25, max_points=8192, max_kfs_pool=16,
                          max_n_kfs=10, loba_num_iter=8)
    fh = FrameHandler(ds.cam, cfg)
    img0, depth0, T0 = ds.frame(0)
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
    errs = []
    n_kf = 0
    for i in range(1, 30):
        img, _, T_gt = ds.frame(i)
        info = fh.add_image(img, timestamp=i / 50.0)
        assert info["result"] != RESULT_FAILURE, f"frame {i}: {info}"
        n_kf += int(bool(info.get("is_keyframe")))
        T_est = fh.last_frame.T_f_w.inverse()
        errs.append(float(jnp.linalg.norm(T_est.t - T_gt.t)))
    errs = np.array(errs)
    assert n_kf >= 2, "local BA path never exercised"
    assert np.median(errs) < 0.01, f"median {np.median(errs):.4f} m"
    assert errs[-1] < 0.02, f"final {errs[-1]:.4f} m"


def test_two_view_and_global_ba():
    """Bootstrap with BA enabled (two-view BA runs), then global BA."""
    import jax.numpy as jnp
    import numpy as np
    from rpg_svo_tpu.config import accurate_preset
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=14, trajectory="line", speed=0.04)
    cfg = accurate_preset(grid_size=25, loba_num_iter=5)
    fh = FrameHandler(ds.cam, cfg)
    fh.set_start()
    for i in range(10):
        info = fh.add_image(ds.frame(i)[0], timestamp=i / 50)
        if fh.stage == "default":
            break
    assert fh.stage == "default", "bootstrap failed"
    # a couple of tracked frames
    errs = []
    for j in range(i + 1, i + 4):
        fh.add_image(ds.frame(j)[0], timestamp=j / 50)
    # global BA should keep the map consistent and poses finite
    before = np.asarray(fh.map.kf.t).copy()
    fh.global_ba()
    after = np.asarray(fh.map.kf.t)
    assert np.isfinite(after).all()
    # active KFs should not move wildly (already near-optimal)
    act = np.asarray(fh.map.kf.active)
    assert np.linalg.norm(after[act] - before[act], axis=-1).max() < 0.2
