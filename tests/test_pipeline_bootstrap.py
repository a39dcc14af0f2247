"""Self-bootstrapped pipeline: no ground-truth seeding at all — the
two-view KLT/homography init creates the map, then tracking continues.
Scale is unobservable in monocular VO, so pose errors are checked after
Sim(3)-style scale alignment on the trajectory."""

import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import (
    FrameHandler, RESULT_FAILURE, STAGE_DEFAULT_FRAME,
)
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


def test_bootstrap_and_track():
    ds = SyntheticDataset(n_frames=40, trajectory="line", speed=0.012)
    cfg = fast_preset(grid_size=25)
    fh = FrameHandler(ds.cam, cfg)

    est = {}
    boot_frame = None
    for i in range(40):
        img, _, T_gt = ds.frame(i)
        info = fh.add_image(img, timestamp=i / 50.0)
        if fh.stage == STAGE_DEFAULT_FRAME and boot_frame is None:
            boot_frame = i
        if fh.stage == STAGE_DEFAULT_FRAME:
            est[i] = np.asarray(fh.last_frame.T_f_w.inverse().t)
        assert info["result"] != RESULT_FAILURE or i < 2, \
            f"tracking failed at frame {i}: {info}"

    assert boot_frame is not None, "bootstrap never completed"
    assert boot_frame < 35, f"bootstrap too late: frame {boot_frame}"
    assert len(est) > 3

    # align estimated trajectory to GT with scale + offset (monocular):
    # world frame of the estimate = camera-0 frame
    idx = sorted(est.keys())
    T0 = ds.poses[0]
    gt = np.stack([np.asarray((T0.inverse() * ds.poses[i]).t) for i in idx])
    ev = np.stack([est[i] for i in idx])
    # the estimate's world frame is camera-0's frame: same origin; solve scale
    num = (gt * ev).sum()
    den = np.maximum((ev * ev).sum(), 1e-12)
    s = num / den
    err = np.linalg.norm(s * ev - gt, axis=-1)
    motion = np.linalg.norm(gt[-1])
    assert err.max() < 0.1 * max(motion, 0.05), \
        f"aligned error {err.max():.4f} over {motion:.3f}m motion"
