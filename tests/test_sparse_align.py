"""Sparse image alignment tests, modeled on svo/test/test_sparse_img_align.cpp:
track frame-to-frame with ground-truth depth on the reference frame and
check translation error against ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.pyramid import build_pyramid
from rpg_svo_tpu.ops.detector import detect_features, grid_dims
from rpg_svo_tpu.ops.sparse_align import sparse_img_align
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticDataset(n_frames=8, trajectory="circle", radius=0.3,
                          revolutions=0.15)
    img0, depth0, T0 = ds.frame(0)
    pyr0 = build_pyramid(img0, 5)
    ncx, ncy = grid_dims(752, 480, 25)
    feats = detect_features(pyr0, jnp.zeros((ncx * ncy,), bool), 25)
    f = ds.cam.cam2world(feats["px"])
    # ground-truth depth at feature pixels (distance along bearing)
    xi = jnp.clip(feats["px"][:, 0].astype(jnp.int32), 0, 751)
    yi = jnp.clip(feats["px"][:, 1].astype(jnp.int32), 0, 479)
    d = depth0[yi, xi]
    valid = feats["valid"] & jnp.isfinite(d)
    return ds, pyr0, T0, feats["px"], f, d, valid


def run_align(ds, pyr0, T0, px, f, d, valid, i, min_level=0):
    img_i, _, T_i = ds.frame(i)
    pyr_i = build_pyramid(img_i, 5)
    T_cur_ref_gt = T_i.inverse() * T0
    # init from identity relative motion
    res = sparse_img_align(pyr0, pyr_i, ds.cam, SE3.identity(),
                           px, f, d, valid,
                           max_level=4, min_level=min_level)
    t_err = jnp.linalg.norm(res.T_cur_ref.t - T_cur_ref_gt.t)
    ang_err = jnp.arccos(jnp.clip(
        (jnp.trace(res.T_cur_ref.R.T @ T_cur_ref_gt.R) - 1) / 2, -1, 1))
    return float(t_err), float(ang_err), int(res.n_tracked)


def test_align_adjacent_frame(setup):
    ds, pyr0, T0, px, f, d, valid = setup
    t_err, ang_err, n = run_align(ds, pyr0, T0, px, f, d, valid, 1,
                                  min_level=0)
    # reference achieves ~mm-level on this kind of data (test_sparse_img_align)
    assert n > 80, f"tracked only {n}"
    assert t_err < 0.01, f"translation error {t_err:.4f} m"
    assert ang_err < 0.01, f"rotation error {ang_err:.4f} rad"


def test_align_larger_baseline(setup):
    ds, pyr0, T0, px, f, d, valid = setup
    t_err, ang_err, n = run_align(ds, pyr0, T0, px, f, d, valid, 3,
                                  min_level=0)
    assert n > 60
    assert t_err < 0.02, f"translation error {t_err:.4f} m"


def test_align_default_levels_coarse(setup):
    """Default klt levels 4..2 (as the pipeline runs it) still converge."""
    ds, pyr0, T0, px, f, d, valid = setup
    t_err, _, n = run_align(ds, pyr0, T0, px, f, d, valid, 1, min_level=2)
    assert n > 80
    assert t_err < 0.02, f"translation error {t_err:.4f} m"


def test_align_identity_is_fixed_point(setup):
    """Aligning a frame against itself from identity stays at identity."""
    ds, pyr0, T0, px, f, d, valid = setup
    res = sparse_img_align(pyr0, pyr0, ds.cam, SE3.identity(),
                           px, f, d, valid, max_level=4, min_level=0)
    assert float(jnp.linalg.norm(res.T_cur_ref.t)) < 1e-4
    assert float(res.chi2) < 1e-4


def test_align_robust_weights_resist_occlusion(setup):
    """The optional Tukey/MAD robust weighting (the reference's
    vk::NLLSSolver weight-function hook, sparse_img_align.cpp:82-83,
    default-off) must (a) keep accuracy on clean frames and (b) beat the
    unweighted solver when part of the current image is occluded."""
    ds, pyr0, T0, px, f, d, valid = setup
    img_i, _, T_i = ds.frame(1)
    T_gt = T_i.inverse() * T0
    # occlude a quadrant of the current image (gross photometric outliers)
    img_occ = np.asarray(img_i).copy()
    img_occ[:200, :300] = 0.0
    pyr_occ = build_pyramid(jnp.asarray(img_occ), 5)

    errs = {}
    for robust in (False, True):
        res = sparse_img_align(pyr0, pyr_occ, ds.cam, SE3.identity(),
                               px, f, d, valid, max_level=4, min_level=0,
                               robust=robust)
        errs[robust] = float(jnp.linalg.norm(res.T_cur_ref.t - T_gt.t))
    assert errs[True] < errs[False] * 0.8, errs
    assert errs[True] < 0.01, errs

    # clean-frame sanity: robust mode stays accurate
    pyr_i = build_pyramid(img_i, 5)
    res = sparse_img_align(pyr0, pyr_i, ds.cam, SE3.identity(),
                           px, f, d, valid, max_level=4, min_level=0,
                           robust=True)
    err = float(jnp.linalg.norm(res.T_cur_ref.t - T_gt.t))
    assert err < 2e-3, err
