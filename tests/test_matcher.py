"""Matcher tests, modeled on svo/test/test_matcher.cpp: direct matching and
epipolar search between two ground-truth-posed synthetic frames, errors
checked against ground-truth depth."""

import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.pyramid import build_pyramid
from rpg_svo_tpu.ops.interp import FlatPyramid
from rpg_svo_tpu.ops.detector import detect_features, grid_dims
from rpg_svo_tpu.ops.matcher import (
    warp_matrix_affine, best_search_level, epipolar_match,
    find_match_direct, zmssd,
)
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def two_frames():
    ds = SyntheticDataset(n_frames=6, trajectory="line", speed=0.03)
    img0, depth0, T0 = ds.frame(0)
    img1, depth1, T1 = ds.frame(4)       # ~12cm baseline at 1.5m depth
    pyr0 = build_pyramid(img0, 5)
    pyr1 = build_pyramid(img1, 5)
    ncx, ncy = grid_dims(752, 480, 25)
    feats = detect_features(pyr0, jnp.zeros((ncx * ncy,), bool), 25)
    f = ds.cam.cam2world(feats["px"])
    xi = jnp.clip(feats["px"][:, 0].astype(jnp.int32), 0, 751)
    yi = jnp.clip(feats["px"][:, 1].astype(jnp.int32), 0, 479)
    d = depth0[yi, xi]
    valid = feats["valid"] & jnp.isfinite(d)
    T_cur_ref = T1.inverse() * T0
    return (ds, FlatPyramid(pyr0), FlatPyramid(pyr1), T_cur_ref,
            feats["px"], f, feats["level"], d, valid)


def test_zmssd_properties():
    a = jnp.arange(64.0)
    assert float(zmssd(a, a)) == 0.0
    assert float(zmssd(a, a + 17.0)) < 1e-3          # mean-invariant
    b = a.at[0].set(100.0)
    assert float(zmssd(a, b)) > 1.0


def test_warp_matrix_is_near_identity_for_pure_translation(two_frames):
    ds, p0, p1, T_cur_ref, px, f, lvl, d, valid = two_frames
    A = warp_matrix_affine(ds.cam, ds.cam, px, f, d, T_cur_ref, lvl)
    # fronto-parallel plane + lateral translation => warp ~ identity
    Av = np.asarray(A)[np.asarray(valid)]
    err = np.abs(Av - np.eye(2)).max(axis=(1, 2))
    assert np.median(err) < 0.05
    # near-identity warp => search level equals the feature's own level
    sl = np.asarray(best_search_level(A, lvl, 4))[np.asarray(valid)]
    lv = np.asarray(lvl)[np.asarray(valid)]
    assert np.median(np.abs(sl - lv)) <= 1


def test_find_match_direct_recovers_projection(two_frames):
    ds, p0, p1, T_cur_ref, px, f, lvl, d, valid = two_frames
    p_cur = T_cur_ref.apply(f * d[:, None])
    px_gt = ds.cam.world2cam(p_cur)
    in_img = ds.cam.is_in_frame(px_gt, boundary=10.0)
    valid2 = valid & in_img
    px_init = px_gt + jnp.array([2.0, -1.5])     # perturbed projection
    res = find_match_direct(p1, p0, ds.cam, T_cur_ref, px, f, lvl, d,
                            px_init, valid2)
    ok = np.asarray(res.success & valid2)
    assert ok.sum() > 0.6 * np.asarray(valid2).sum()
    err = np.linalg.norm(np.asarray(res.px_cur - px_gt), axis=-1)[ok]
    assert np.median(err) < 0.3, np.median(err)


def test_epipolar_match_depth_accuracy(two_frames):
    """Reference golden values (test_matcher.cpp:117-127): p50 depth err
    ~0.08cm on its dataset; we check our synthetic equivalent converges
    with sub-1% median depth error."""
    ds, p0, p1, T_cur_ref, px, f, lvl, d, valid = two_frames
    res = epipolar_match(p1, p0, ds.cam, T_cur_ref, px, f, lvl,
                         d_estimate=d * 1.1,
                         d_min=d * 0.7, d_max=d * 1.4, valid=valid)
    ok = np.asarray(res.success & valid)
    n_valid = np.asarray(valid).sum()
    assert ok.sum() > 0.5 * n_valid, f"{ok.sum()}/{n_valid} matched"
    derr = np.abs(np.asarray(res.depth_ref) - np.asarray(d))[ok] \
        / np.asarray(d)[ok]
    assert np.median(derr) < 0.01, f"median rel depth err {np.median(derr)}"
    # px match error vs ground-truth projection
    p_cur = T_cur_ref.apply(f * d[:, None])
    px_gt = np.asarray(ds.cam.world2cam(p_cur))
    perr = np.linalg.norm(np.asarray(res.px_cur) - px_gt, axis=-1)[ok]
    assert np.median(perr) < 0.5, f"median px err {np.median(perr)}"


def test_epipolar_match_rejects_bad_range(two_frames):
    """Searching a depth range that EXCLUDES the truth must mostly fail or
    return scores filtered by the ZMSSD threshold."""
    ds, p0, p1, T_cur_ref, px, f, lvl, d, valid = two_frames
    res = epipolar_match(p1, p0, ds.cam, T_cur_ref, px, f, lvl,
                         d_estimate=d * 0.3,
                         d_min=d * 0.2, d_max=d * 0.4, valid=valid)
    ok = np.asarray(res.success & valid)
    if ok.sum() > 0:
        derr = np.abs(np.asarray(res.depth_ref) - np.asarray(d))[ok] \
            / np.asarray(d)[ok]
        # matches found in a wrong range should be rare or inaccurate;
        # the key invariant: far fewer successes than the correct range
        assert ok.sum() < 0.5 * np.asarray(valid).sum()


def test_epipolar_two_tier_matches_single_tier(two_frames):
    """With a long budget covering every long segment, the two-tier scan
    (short strip in place + compacted full-width longs) must reproduce
    the single-tier scan exactly: same matches, same depths."""
    ds, p0, p1, T_cur_ref, px, f, lvl, d, valid = two_frames
    kw = dict(d_estimate=d * 1.1, d_min=d * 0.7, d_max=d * 1.4,
              valid=valid)
    ref = epipolar_match(p1, p0, ds.cam, T_cur_ref, px, f, lvl, **kw)
    two = epipolar_match(p1, p0, ds.cam, T_cur_ref, px, f, lvl,
                         short_steps=24, long_k=px.shape[0], **kw)
    assert bool(jnp.all(two.scanned))
    assert np.array_equal(np.asarray(ref.success), np.asarray(two.success))
    ok = np.asarray(ref.success)
    assert np.allclose(np.asarray(ref.px_cur)[ok],
                       np.asarray(two.px_cur)[ok])
    assert np.allclose(np.asarray(ref.depth_ref)[ok],
                       np.asarray(two.depth_ref)[ok])
    # tiny long budget: unscanned longs are flagged, not failed
    small = epipolar_match(p1, p0, ds.cam, T_cur_ref, px, f, lvl,
                           short_steps=8, long_k=8, **kw)
    unscanned = ~np.asarray(small.scanned)
    assert not np.asarray(small.success)[unscanned].any()
