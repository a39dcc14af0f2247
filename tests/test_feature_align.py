"""Feature alignment tests (ref: svo/test/test_feature_alignment.cpp —
known-offset recovery with subpixel accuracy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.ops.feature_align import (
    align2d, align1d, extract_patch_with_border,
)
from rpg_svo_tpu.ops.pyramid import build_pyramid
from rpg_svo_tpu.ops.interp import FlatPyramid
from rpg_svo_tpu.ops.detector import detect_features, grid_dims
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def frame_and_corners():
    ds = SyntheticDataset(n_frames=1)
    img, _, _ = ds.frame(0)
    pyr = build_pyramid(img, 5)
    ncx, ncy = grid_dims(752, 480, 25)
    out = detect_features(pyr, jnp.zeros((ncx * ncy,), bool), 25)
    # keep level-0 corners away from the border
    m = np.asarray(out["valid"]) & (np.asarray(out["level"]) == 0)
    px = np.asarray(out["px"])[m]
    inside = ((px[:, 0] > 20) & (px[:, 0] < 732) &
              (px[:, 1] > 20) & (px[:, 1] < 460))
    px = px[inside][:64]
    return img, jnp.asarray(px)


def test_align2d_recovers_known_offset(frame_and_corners):
    img, px = frame_and_corners
    ref_patches, ok = extract_patch_with_border(img, px)
    assert bool(jnp.all(ok))
    true_offset = jnp.array([1.7, -1.3])
    px_init = px + true_offset
    px_out, conv = align2d(img, ref_patches, px_init,
                           jnp.ones(px.shape[0], bool), n_iter=20)
    conv_np = np.asarray(conv)
    assert conv_np.mean() > 0.9, f"only {conv_np.mean():.0%} converged"
    err = np.linalg.norm(np.asarray(px_out) - np.asarray(px), axis=-1)
    # reference achieves ~0.015px mean on its synthetic patch
    assert np.median(err[conv_np]) < 0.05, np.median(err[conv_np])


def test_align2d_illumination_invariance(frame_and_corners):
    """mean_diff term must absorb a constant intensity offset."""
    img, px = frame_and_corners
    ref_patches, _ = extract_patch_with_border(img, px)
    img_bright = img + 25.0
    px_out, conv = align2d(img_bright, ref_patches, px + jnp.array([1.5, 0.5]),
                           jnp.ones(px.shape[0], bool), n_iter=20)
    conv_np = np.asarray(conv)
    assert conv_np.mean() > 0.9
    err = np.linalg.norm(np.asarray(px_out) - np.asarray(px), axis=-1)
    assert np.median(err[conv_np]) < 0.08


def test_align1d_recovers_offset_along_direction(frame_and_corners):
    img, px = frame_and_corners
    ref_patches, _ = extract_patch_with_border(img, px)
    d = jnp.tile(jnp.array([[0.6, 0.8]]), (px.shape[0], 1))
    px_init = px + 1.8 * d
    px_out, conv = align1d(img, ref_patches, px_init, d,
                           jnp.ones(px.shape[0], bool), n_iter=20)
    conv_np = np.asarray(conv)
    assert conv_np.mean() > 0.8
    err = np.linalg.norm(np.asarray(px_out) - np.asarray(px), axis=-1)
    assert np.median(err[conv_np]) < 0.1


def test_align2d_flat_pyramid_per_level(frame_and_corners):
    """Same alignment through FlatPyramid with per-item levels."""
    img, px = frame_and_corners
    pyr = build_pyramid(img, 3)
    fp = FlatPyramid(pyr)
    # half the items at level 0, half at level 1 (coords halved)
    n = px.shape[0]
    lv = jnp.array([0, 1] * (n // 2) + [0] * (n % 2), dtype=jnp.int32)
    scale = 2.0 ** lv.astype(jnp.float32)
    px_lvl = px / scale[:, None]
    # build ref patches per level via the flat pyramid sampler
    from rpg_svo_tpu.ops.feature_align import BORDERED, HALFPATCH
    r = jnp.arange(BORDERED, dtype=jnp.float32) - (HALFPATCH + 1)
    ys, xs = jnp.meshgrid(r, r, indexing="ij")
    grid = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)
    ref_patches, ok = fp.bilinear(lv[:, None],
                                  px_lvl[:, None, :] + grid[None])
    px_out, conv = align2d(fp, ref_patches, px_lvl + jnp.array([1.2, -0.8]),
                           ok.all(-1), n_iter=20, level=lv)
    conv_np = np.asarray(conv)
    assert conv_np.mean() > 0.8
    err = np.linalg.norm(np.asarray(px_out - px_lvl), axis=-1)
    assert np.median(err[conv_np]) < 0.08


def test_align2d_invalid_stays_put(frame_and_corners):
    img, px = frame_and_corners
    ref_patches, _ = extract_patch_with_border(img, px)
    valid = jnp.zeros(px.shape[0], bool)
    px_out, conv = align2d(img, ref_patches, px + 2.0, valid, n_iter=5)
    assert not bool(conv.any())
    np.testing.assert_allclose(np.asarray(px_out), np.asarray(px + 2.0))


def test_align_features_mixed_1d_2d(frame_and_corners):
    """Unified aligner: 2-D items recover both axes; 1-D items recover
    only the along-direction component of a known offset."""
    from rpg_svo_tpu.ops.feature_align import align_features
    img, px = frame_and_corners
    ref_patches, ok = extract_patch_with_border(img, px)
    n = px.shape[0]
    direction = jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32), (n, 1))
    offset = jnp.array([1.4, 0.9])
    is_1d = jnp.arange(n) % 2 == 0
    px_out, conv = align_features(
        img, ref_patches, px + offset, jnp.ones((n,), bool),
        n_iter=20, direction=direction, is_1d=is_1d)
    err = np.asarray(px_out - px)
    conv = np.asarray(conv)
    # 2-D items: both components recovered
    e2 = np.abs(err[~np.asarray(is_1d) & conv])
    assert e2.shape[0] >= 1 and np.median(e2[:, 0]) < 0.05 \
        and np.median(e2[:, 1]) < 0.05
    # 1-D items: x (along dir) recovered, y offset untouched
    e1 = err[np.asarray(is_1d) & conv]
    assert e1.shape[0] >= 1
    assert np.median(np.abs(e1[:, 1] - 0.9)) < 1e-5


def test_edgelet_epipolar_prefilter():
    """Edgelets with gradient orthogonal to the epipolar line are
    rejected (matcher.cpp:204-211); parallel gradients may match."""
    from rpg_svo_tpu.ops.matcher import (
        epipolar_match, FEATURE_EDGELET, FEATURE_CORNER,
    )
    from rpg_svo_tpu.geometry.se3 import SE3
    ds = SyntheticDataset(n_frames=2, trajectory="line", speed=0.05)
    img0, depth0, T0 = ds.frame(0)
    img1, _, T1 = ds.frame(1)
    fp0 = FlatPyramid(build_pyramid(img0, 5))
    fp1 = FlatPyramid(build_pyramid(img1, 5))
    rng = np.random.default_rng(3)
    n = 32
    px = jnp.asarray(rng.uniform([100, 100], [650, 380], (n, 2))
                     .astype(np.float32))
    f = ds.cam.cam2world(px)
    d = depth0[px[:, 1].astype(jnp.int32), px[:, 0].astype(jnp.int32)]
    T_cur_ref = T1.inverse() * T0
    Tb = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape), T_cur_ref)
    lvl = jnp.zeros((n,), jnp.int32)
    ok = jnp.ones((n,), bool)
    # motion is +x: epipolar dir is x; grad (0, 1) is orthogonal
    grad_orth = jnp.tile(jnp.array([[0.0, 1.0]], jnp.float32), (n, 1))
    types = jnp.full((n,), FEATURE_EDGELET, jnp.int32)
    m_orth = epipolar_match(fp1, fp0, ds.cam, Tb, px, f, lvl,
                            d * 1.0, d * 0.7, d * 1.4, ok,
                            ftr_type=types, ftr_grad=grad_orth)
    assert not bool(jnp.any(m_orth.success))
    # parallel gradient passes the filter; corners unaffected by grad
    grad_par = jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32), (n, 1))
    m_par = epipolar_match(fp1, fp0, ds.cam, Tb, px, f, lvl,
                           d * 1.0, d * 0.7, d * 1.4, ok,
                           ftr_type=types, ftr_grad=grad_par)
    m_corner = epipolar_match(fp1, fp0, ds.cam, Tb, px, f, lvl,
                              d * 1.0, d * 0.7, d * 1.4, ok,
                              ftr_type=jnp.full((n,), FEATURE_CORNER,
                                                jnp.int32),
                              ftr_grad=grad_orth)
    assert int(jnp.sum(m_par.success)) > 0
    assert int(jnp.sum(m_corner.success)) > 0
