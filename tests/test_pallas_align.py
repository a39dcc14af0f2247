"""Pallas whole-level GN kernel (ops/pallas_align) vs the XLA GN loop.

Both implement the same _level_gn semantics (svo/src/sparse_img_align.cpp
iteration rules); the kernel runs in interpret mode on CPU.  Poses from
the two paths must agree to float-accumulation tolerance, and both must
track the synthetic ground truth."""

import jax.numpy as jnp
import pytest

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.pyramid import build_pyramid
from rpg_svo_tpu.ops.detector import detect_features, grid_dims
from rpg_svo_tpu.ops.sparse_align import sparse_img_align
from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticDataset(n_frames=4, trajectory="circle", radius=0.3,
                          revolutions=0.1)
    img0, depth0, T0 = ds.frame(0)
    pyr0 = build_pyramid(img0, 5)
    pad0 = PaddedPyramid(pyr0)
    ncx, ncy = grid_dims(752, 480, 25)
    feats = detect_features(pyr0, jnp.zeros((ncx * ncy,), bool), 25)
    f = ds.cam.cam2world(feats["px"])
    xi = jnp.clip(feats["px"][:, 0].astype(jnp.int32), 0, 751)
    yi = jnp.clip(feats["px"][:, 1].astype(jnp.int32), 0, 479)
    d = depth0[yi, xi]
    valid = feats["valid"] & jnp.isfinite(d)
    return ds, pyr0, pad0, T0, feats["px"], f, d, valid


def _run(setup, i, use_kernel):
    ds, pyr0, pad0, T0, px, f, d, valid = setup
    img_i, _, T_i = ds.frame(i)
    pyr_i = build_pyramid(img_i, 5)
    pad_i = PaddedPyramid(pyr_i)
    res = sparse_img_align(pyr0, pyr_i, ds.cam, SE3.identity(),
                           px, f, d, valid, max_level=4, min_level=2,
                           cur_pad=pad_i, ref_pad=pad0,
                           use_kernel=use_kernel)
    T_gt = T_i.inverse() * T0
    return res, float(jnp.linalg.norm(res.T_cur_ref.t - T_gt.t))


def test_kernel_matches_xla_path(setup):
    res_x, err_x = _run(setup, 1, use_kernel=False)
    res_k, err_k = _run(setup, 1, use_kernel=True)
    # both paths track ground truth at the coarse klt levels
    assert err_x < 0.02 and err_k < 0.02, (err_x, err_k)
    # pose parity between the two implementations
    dt = float(jnp.linalg.norm(res_x.T_cur_ref.t - res_k.T_cur_ref.t))
    assert dt < 2e-3, dt
    dR = float(jnp.abs(res_x.T_cur_ref.R - res_k.T_cur_ref.R).max())
    assert dR < 2e-3, dR
    # measurement count parity (identical masks modulo fp drift of pose)
    assert abs(int(res_x.n_tracked) - int(res_k.n_tracked)) <= 3, \
        (int(res_x.n_tracked), int(res_k.n_tracked))
    # Hessian used for the Fisher-information covariance stays close
    rel = float(jnp.abs(res_x.H - res_k.H).max() /
                (jnp.abs(res_x.H).max() + 1e-9))
    assert rel < 0.05, rel


def test_kernel_identity_fixed_point(setup):
    ds, pyr0, pad0, T0, px, f, d, valid = setup
    res = sparse_img_align(pyr0, pyr0, ds.cam, SE3.identity(),
                           px, f, d, valid, max_level=4, min_level=2,
                           cur_pad=pad0, ref_pad=pad0, use_kernel=True)
    assert float(jnp.linalg.norm(res.T_cur_ref.t)) < 1e-4
    assert float(res.chi2) < 1e-4
