import jax
import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.ops.pyramid import build_pyramid, half_sample
from rpg_svo_tpu.ops.interp import bilinear, extract_patches, patch_grid
from rpg_svo_tpu.ops.detector import (
    fast_corner_mask, shi_tomasi_score, detect_features, grid_dims,
)
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


def test_half_sample():
    img = jnp.arange(16.0).reshape(4, 4)
    h = half_sample(img)
    np.testing.assert_allclose(np.asarray(h),
                               [[2.5, 4.5], [10.5, 12.5]])


def test_pyramid_shapes():
    img = jnp.zeros((480, 752))
    pyr = build_pyramid(img, 5)
    assert [p.shape for p in pyr] == [
        (480, 752), (240, 376), (120, 188), (60, 94), (30, 47)]


def test_padded_pyramid_matmul_parity():
    """The TPU matmul construction of build_padded_pyramid (pair-average
    0/0.5 matrices, bf16 hi/lo split) must agree with the reshape-mean
    reference on every level — exercised on CPU via force_matmul so the
    production halfsample path has coverage outside the TPU bench."""
    from rpg_svo_tpu.ops.pyramid import build_padded_pyramid
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, size=(480, 752)), jnp.float32)
    ref = build_pyramid(img, 5)
    pad = build_padded_pyramid(img, 5, force_matmul=True)
    levels = pad.levels()
    assert len(levels) == 5
    for lv, (r, m) in enumerate(zip(ref, levels)):
        assert r.shape == m.shape
        # bf16 hi/lo split: exact up to the split rounding of the
        # operand — ~1e-5 relative on [0, 255] pixels (see _mm_exact)
        np.testing.assert_allclose(np.asarray(m), np.asarray(r),
                                   atol=5e-3, rtol=1e-5,
                                   err_msg=f"level {lv}")
    # padded extents outside the true (h, w) must be zero (tile loads
    # read through them)
    stack = np.asarray(pad.stack)
    lvl0 = np.asarray(levels[0])
    assert stack.shape[1] >= 752 and np.all(
        stack[:480, 752:] == 0.0) and np.allclose(stack[:480, :752], lvl0)


def test_bilinear_exact_on_grid():
    img = jnp.arange(24.0).reshape(4, 6)
    xy = jnp.array([[2.0, 1.0], [0.0, 0.0], [4.0, 2.0]])
    vals, ok = bilinear(img, xy)
    np.testing.assert_allclose(np.asarray(vals), [8.0, 0.0, 16.0])
    assert bool(jnp.all(ok))


def test_bilinear_interpolates():
    img = jnp.array([[0.0, 10.0], [20.0, 30.0]])
    vals, ok = bilinear(img, jnp.array([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(vals), [15.0])


def test_bilinear_out_of_range_masked():
    img = jnp.zeros((8, 8))
    _, ok = bilinear(img, jnp.array([[-1.0, 2.0], [7.5, 2.0], [3.0, 3.0]]))
    np.testing.assert_array_equal(np.asarray(ok), [False, False, True])


def test_extract_patches():
    img = jnp.arange(100.0).reshape(10, 10)
    vals, ok = extract_patches(img, jnp.array([[5.0, 5.0]]), halfsize=2)
    assert vals.shape == (1, 16)
    # top-left sample of the 4x4 patch centered at (5,5) is (3,3) = 33
    np.testing.assert_allclose(np.asarray(vals[0, 0]), 33.0)
    assert bool(ok[0])


def test_fast_corner_on_synthetic_corner():
    """A bright square on dark background: its corners fire, flats don't."""
    img = jnp.zeros((32, 32))
    img = img.at[10:20, 10:20].set(255.0)
    mask = fast_corner_mask(img, threshold=20.0)
    m = np.asarray(mask)
    assert m[10, 10] or m[9, 9] or m[10, 9] or m[9, 10]  # corner region fires
    assert not m[15, 15]  # interior flat
    assert not m[15, 5]   # exterior flat
    assert not m[15, 10]  # straight edge midpoint must NOT be a FAST corner


def test_shi_tomasi_corner_beats_edge():
    img = jnp.zeros((32, 32))
    img = img.at[10:20, 10:20].set(255.0)
    s = np.asarray(shi_tomasi_score(img))
    assert s[10, 10] > 10 * max(s[15, 10], 1e-9)  # corner >> edge
    assert s[15, 15] < 1e-6  # flat ~ 0


def test_detect_features_on_rendered_frame():
    ds = SyntheticDataset(n_frames=1)
    img, _, _ = ds.frame(0)
    pyr = build_pyramid(img, 5)
    ncx, ncy = grid_dims(752, 480, 25)
    occ = jnp.zeros((ncx * ncy,), bool)
    out = detect_features(pyr, occ, 25)
    n = int(out["valid"].sum())
    assert n >= 100, f"textured frame should fill >=100 cells, got {n}"
    # all valid features inside image bounds, level-0 coords
    px = np.asarray(out["px"])[np.asarray(out["valid"])]
    assert (px[:, 0] >= 0).all() and (px[:, 0] < 752).all()
    assert (px[:, 1] >= 0).all() and (px[:, 1] < 480).all()
    # occupancy respected
    occ2 = jnp.ones((ncx * ncy,), bool)
    out2 = detect_features(pyr, occ2, 25)
    assert int(out2["valid"].sum()) == 0
    # features land in the cell they claim (spot check grid consistency)
    lv = np.asarray(out["level"])[np.asarray(out["valid"])]
    assert lv.min() >= 0 and lv.max() <= 4
