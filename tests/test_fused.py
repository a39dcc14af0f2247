"""Fused single-program VO step: correctness vs ground truth and
scan/step consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core import fused
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def boot():
    ds = SyntheticDataset(n_frames=36, trajectory="circle", radius=0.25,
                          revolutions=0.45)
    cfg = fast_preset(grid_size=25)
    fh = FrameHandler(ds.cam, cfg)
    img0, depth0, T0 = ds.frame(0)
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
    state = fused.state_from_handler(fh)
    return ds, fh, state


def test_fused_step_tracks(boot):
    ds, fh, state = boot
    errs = []
    outs = []
    for i in range(1, 30):
        img, _, T_gt = ds.frame(i)
        state, out = fused.vo_step(state, img, ds.cam, fh.cfg,
                                   fh.ncx, fh.ncy, fh.img_shape)
        outs.append(jax.tree.map(np.asarray, out))
        errs.append(float(jnp.linalg.norm(out.t_wc - T_gt.t)))
    errs = np.array(errs)
    fails = sum(int(o.failed) for o in outs)
    kfs = sum(int(o.is_keyframe) for o in outs)
    assert fails == 0, f"{fails} failures"
    assert kfs >= 2
    assert np.median(errs) < 0.01, f"median err {np.median(errs):.4f} m"
    assert errs[-1] < 0.02, f"final err {errs[-1]:.4f} m"


def test_vo_scan_matches_step_loop(boot):
    ds, fh, state0 = boot
    imgs = jnp.stack([ds.frame(i)[0] for i in range(1, 9)])
    # loop of steps
    s = state0
    loop_pos = []
    for i in range(8):
        s, out = fused.vo_step(s, imgs[i], ds.cam, fh.cfg,
                               fh.ncx, fh.ncy, fh.img_shape)
        loop_pos.append(np.asarray(out.t_wc))
    # one scan
    s2, outs = fused.vo_scan(state0, imgs, ds.cam, fh.cfg,
                             fh.ncx, fh.ncy, fh.img_shape)
    scan_pos = np.asarray(outs.t_wc)
    np.testing.assert_allclose(np.stack(loop_pos), scan_pos,
                               rtol=1e-4, atol=1e-5)
    # final map states agree
    np.testing.assert_allclose(np.asarray(s.m.pt.pos),
                               np.asarray(s2.m.pt.pos), atol=1e-4)


def test_fused_black_frame_fails_gracefully(boot):
    ds, fh, state = boot
    img, _, _ = ds.frame(1)
    state, out = fused.vo_step(state, img, ds.cam, fh.cfg,
                               fh.ncx, fh.ncy, fh.img_shape)
    state, out = fused.vo_step(state, jnp.zeros(fh.img_shape), ds.cam,
                               fh.cfg, fh.ncx, fh.ncy, fh.img_shape)
    assert bool(out.failed)
    assert int(out.stage) == fused.STAGE_RELOC
    # recovery on the next good frame
    img2, _, T_gt = ds.frame(2)
    state, out = fused.vo_step(state, img2, ds.cam, fh.cfg,
                               fh.ncx, fh.ncy, fh.img_shape)
    assert not bool(out.failed)
    assert int(out.stage) == fused.STAGE_DEFAULT
    err = float(jnp.linalg.norm(out.t_wc - T_gt.t))
    assert err < 0.05, f"relocalization error {err}"


def test_vo_scan_occlusion_segment_recovers_in_scan():
    """End-to-end loss-and-recovery INSIDE one vo_scan program: a
    multi-frame occlusion segment (blank frames) must flip the traced
    stage machine to RELOCALIZING mid-scan, and tracking must recover
    against the closest keyframe once texture returns — all with zero
    host intervention (ref: frame_handler_mono.cpp:237-265 +
    benchmark_node noise/dropout protocol).

    Camera motion is ~1.5 deg/frame; motion continues during the outage,
    so recovery must re-align against a keyframe from a stale held pose
    (the reference relocalizer's exact situation — at much faster motion
    the held pose leaves the alignment basin and the reference's >30
    tracked / >=50 matches gates would equally never pass)."""
    ds = SyntheticDataset(n_frames=36, trajectory="circle", radius=0.25,
                          revolutions=0.15)
    cfg = fast_preset(grid_size=25)
    fh = FrameHandler(ds.cam, cfg)
    img0, depth0, T0 = ds.frame(0)
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
    state = fused.state_from_handler(fh)
    imgs = []
    for i in range(1, 22):
        img, _, _ = ds.frame(i)
        # frames 8..11 fully occluded
        if 8 <= i <= 11:
            img = jnp.zeros_like(img)
        imgs.append(img)
    imgs = jnp.stack(imgs)
    state2, outs = fused.vo_scan(state, imgs, ds.cam, cfg,
                                 fh.ncx, fh.ncy, fh.img_shape)
    failed = np.asarray(outs.failed)
    stage = np.asarray(outs.stage)
    # occluded frames fail and enter/hold RELOCALIZING
    assert failed[7:11].all(), failed
    assert (stage[7:11] == fused.STAGE_RELOC).all(), stage
    # recovery happens within a few frames of texture returning
    assert not failed[-1], "never recovered from the occlusion segment"
    assert stage[-1] == fused.STAGE_DEFAULT
    rec = int(np.flatnonzero(~failed[11:])[0]) + 11
    assert rec <= 14, f"recovery took until scan index {rec}"
    # post-recovery accuracy: within 5 mm of ground truth
    for k in range(rec, len(imgs)):
        if failed[k]:
            continue
        T_gt = ds.poses[k + 1]
        err = float(np.linalg.norm(np.asarray(outs.t_wc[k]) - T_gt.t))
        assert err < 0.005, f"frame {k}: post-recovery error {err}"
