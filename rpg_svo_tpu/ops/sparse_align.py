"""Sparse model-based image alignment (the tracking hot kernel).

TPU-native equivalent of SparseImgAlign (svo/src/sparse_img_align.cpp:43-258)
— coarse-to-fine inverse-compositional Gauss-Newton on 4x4-patch photometric
residuals of all tracked features, estimating the relative pose T_cur_ref.

Reference behavior reproduced:
- patch 4x4 with 1px interpolation border (sparse_img_align.h:35-37);
- pyramid loop from klt_max_level down to klt_min_level
  (sparse_img_align.cpp:61-69);
- per-level precompute of reference patches + per-pixel Jacobians, with the
  2x6 pose Jacobian evaluated once per feature center
  (precomputeReferencePatches, :84-145);
- GN iterations with chi2 rollback and eps-convergence (vikit NLLSSolver
  semantics: implemented here as a lax.while_loop with carried best state);
- update T <- T * exp(-x) (:253-258);
- n_tracked = #pixels with valid projections / patch area (:73-74).

TPU design: all N features x 16 patch pixels form one batched program —
the reference's per-feature scalar loops become a (N, 16) gather + einsum
reduction to the 6x6 normal equations.  The whole coarse-to-fine schedule
compiles into a single XLA program per pyramid-shape signature.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.triangulation import jacobian_xyz2uv
from rpg_svo_tpu.geometry.linalg import solve6x6_spd
from rpg_svo_tpu.ops.interp import bilinear, patch_grid

PATCH_HALFSIZE = 2
PATCH_SIZE = 2 * PATCH_HALFSIZE
PATCH_AREA = PATCH_SIZE * PATCH_SIZE
# the Pallas whole-level GN kernel mirrors this geometry; keep in sync
from rpg_svo_tpu.ops import pallas_align as _pk
assert (_pk.PATCH_HALFSIZE, _pk.PATCH_SIZE) == (PATCH_HALFSIZE, PATCH_SIZE)
# Per-feature tile slack (px at the working level): the tile around each
# feature's initial projection is gathered ONCE per level; every GN
# iteration samples the moving 4x4 window from it with dense one-hot
# selection matmuls instead of fresh scattered gathers.  Projections
# drifting more than SLACK px from the initial pose at that level drop
# out of the residual (the inter-level coarse-to-fine schedule keeps
# per-level motion small).
SLACK = 6
TILE = PATCH_SIZE + 1 + 2 * SLACK   # 17


def _gather_tile(img, uv0, cur_pad=None, level: int = 0):
    """(TILE, TILE) integer tile per feature around uv0 (N, 2) level px.

    With a PaddedPyramid (cur_pad), tiles come from the Pallas aligned-
    load kernel with origins clamped inside the level (always fully
    backed); otherwise XLA gathers with per-pixel validity."""
    base = jnp.floor(uv0).astype(jnp.int32) - PATCH_HALFSIZE - SLACK
    if cur_pad is not None:
        from rpg_svo_tpu.ops.pallas_tiles import gather_tiles
        lv = jnp.full((uv0.shape[0],), level, jnp.int32)
        vals, x0c, y0c = gather_tiles(cur_pad, lv, base[:, 0], base[:, 1],
                                      TILE, TILE)
        basec = jnp.stack([x0c, y0c], axis=-1).astype(jnp.float32)
        return basec, vals, jnp.ones(vals.shape, jnp.float32)
    r = jnp.arange(TILE, dtype=jnp.int32)
    xg = base[:, 0, None, None] + r[None, None, :]
    yg = base[:, 1, None, None] + r[None, :, None]
    H, W = img.shape
    ok = (xg >= 0) & (yg >= 0) & (xg < W) & (yg < H)
    idx = jnp.clip(yg, 0, H - 1) * W + jnp.clip(xg, 0, W - 1)
    vals = jnp.where(ok, img.reshape(-1)[idx], 0.0)
    return base.astype(jnp.float32), vals, ok.astype(jnp.float32)


def _window(tile, okf, o, full_ok: bool = False):
    """Bilinear 4x4 window at float tile-offset o; (N, 16) + usable (N,).

    full_ok=True (tiles from the Pallas aligned loader: always fully
    backed) skips the 4-tap support reduction."""
    oi = jnp.floor(o).astype(jnp.int32)
    w = o - oi
    iP = jnp.arange(PATCH_SIZE, dtype=jnp.int32)[None, :, None]
    jT = jnp.arange(TILE, dtype=jnp.int32)[None, None, :]

    def sel(oid, wd):
        a = (jT == iP + oid[:, None, None])
        b = (jT == iP + oid[:, None, None] + 1)
        m = a.astype(jnp.float32) * (1.0 - wd)[:, None, None] \
            + b.astype(jnp.float32) * wd[:, None, None]
        return m, (a | b).astype(jnp.float32) if not full_ok else None

    Px, PxB = sel(oi[:, 0], w[:, 0])
    Py, PyB = sel(oi[:, 1], w[:, 1])
    # broadcast-multiply-reduce (not einsum/dot_general): fuses into one
    # kernel with the surrounding elementwise ops — see ops/feature_align
    cy = jnp.sum(Py[:, :, :, None] * tile[:, None, :, :], axis=2)
    cur = jnp.sum(cy[:, :, None, :] * Px[:, None, :, :], axis=3)
    inb = (oi[:, 0] >= 0) & (oi[:, 1] >= 0) \
        & (oi[:, 0] <= TILE - PATCH_SIZE - 1) \
        & (oi[:, 1] <= TILE - PATCH_SIZE - 1)
    if full_ok:
        usable = inb
    else:
        sy = jnp.sum(PyB[:, :, :, None] * okf[:, None, :, :], axis=2)
        sup = jnp.sum(sy[:, :, None, :] * PxB[:, None, :, :],
                      axis=(1, 2, 3))
        usable = inb & (sup >= 4.0 * PATCH_AREA - 0.5)
    return cur.reshape(-1, PATCH_AREA), usable


class AlignResult(NamedTuple):
    T_cur_ref: SE3
    n_tracked: jnp.ndarray   # scalar int32: tracked features (meas/16)
    H: jnp.ndarray           # (6, 6) final-level GN Hessian (Fisher info base)
    chi2: jnp.ndarray        # final mean squared residual


def _precompute_level(ref_img, cam_fx, feats_px, feats_f, feats_depth,
                      feats_valid, level: int, ref_pad=None):
    """Reference patches + fixed IC Jacobians at one pyramid level.

    Returns ref_patch (N, A), jac (N, A, 6), valid (N,).

    With ref_pad (PaddedPyramid of the reference frame) the bordered
    patch comes from ONE Pallas aligned tile load per feature plus a
    4-tap static-shift bilinear blend (the fractional offset is shared
    by all samples of a feature) instead of per-sample XLA gathers.
    """
    scale = 1.0 / (2.0 ** level)
    uv = feats_px * scale                         # level-l float px coords
    B = PATCH_SIZE + 2
    if ref_pad is not None:
        from rpg_svo_tpu.ops.pallas_tiles import gather_tiles
        fx0 = jnp.floor(uv).astype(jnp.int32)
        want = fx0 - (PATCH_HALFSIZE + 1)          # tile origin (N, 2)
        lv = jnp.full((uv.shape[0],), level, jnp.int32)
        t, x0c, y0c = gather_tiles(ref_pad, lv, want[:, 0], want[:, 1],
                                   B + 2, B + 2)
        # a clamped origin means the bordered patch leaves the level
        okb_all = (x0c == want[:, 0]) & (y0c == want[:, 1])
        frac = uv - fx0.astype(jnp.float32)
        wx = frac[:, 0][:, None, None]
        wy = frac[:, 1][:, None, None]
        v = ((1 - wy) * (1 - wx) * t[:, 0: B + 1, 0: B + 1]
             + (1 - wy) * wx * t[:, 0: B + 1, 1: B + 2]
             + wy * (1 - wx) * t[:, 1: B + 2, 0: B + 1]
             + wy * wx * t[:, 1: B + 2, 1: B + 2])
        pb = v[:, :B, :B]
        okb = okb_all[:, None] & jnp.ones((1, B * B), bool)
    else:
        # one bordered (P+2)^2 bilinear sample set gives the patch AND its
        # central-difference gradients (identical values to sampling the 4
        # shifted patches, at ~half the gathers)
        grid_b = patch_grid(PATCH_HALFSIZE, border=1)     # ((P+2)^2, 2)
        coords = uv[:, None, :] + grid_b[None]
        vals_b, okb = bilinear(ref_img, coords)
        pb = vals_b.reshape(-1, B, B)
    vals = pb[:, 1:-1, 1:-1].reshape(-1, PATCH_AREA)
    dx = (0.5 * (pb[:, 1:-1, 2:] - pb[:, 1:-1, :-2])).reshape(
        -1, PATCH_AREA)
    dy = (0.5 * (pb[:, 2:, 1:-1] - pb[:, :-2, 1:-1])).reshape(
        -1, PATCH_AREA)
    valid = feats_valid & (feats_depth > 1e-6) & jnp.all(okb, -1)
    p_ref = feats_f * feats_depth[:, None]        # (N, 3) camera-frame point
    fjac = jacobian_xyz2uv(p_ref)                 # (N, 2, 6)
    jac = (dx[..., None] * fjac[:, None, 0, :]
           + dy[..., None] * fjac[:, None, 1, :]) * (cam_fx * scale)
    return vals, jac, valid


def _level_gn(cur_img, cam, T_init: SE3, p_ref, ref_patch, jac, valid,
              level: int, n_iter: int, eps: float, cur_pad=None,
              unroll: int = 3, robust: bool = False):
    """GN iterations at one level; carries best (lowest-chi2) pose."""
    scale = 1.0 / (2.0 ** level)
    uv0 = cam.world2cam(T_init.apply(p_ref)) * scale
    base, tile, okf = _gather_tile(cur_img, uv0, cur_pad, level)
    full_ok = cur_pad is not None   # Pallas tiles: always fully backed

    def residuals(T: SE3):
        p_cur = T.apply(p_ref)                    # (N, 3)
        behind = p_cur[..., 2] <= 1e-6
        uv_cur = cam.world2cam(p_cur) * scale     # (N, 2) level-l coords
        o = uv_cur - PATCH_HALFSIZE - base
        vals, usable = _window(tile, okf, o, full_ok)  # (N, A), (N,)
        m = (valid & usable & (~behind))[:, None] \
            & jnp.ones((1, PATCH_AREA), bool)
        res = jnp.where(m, vals - ref_patch, 0.0)
        return res, m

    def normal_eqs(res, m):
        mf = m.astype(res.dtype)
        if robust:
            # vk::NLLSSolver's optional robustification (default-off in
            # the reference too): Tukey weights on per-pixel photometric
            # residuals, scaled by the MAD estimate
            # (sparse_img_align.cpp:82-83, 213-219)
            from rpg_svo_tpu.ops.robust import mad_scale, tukey_weight
            sigma = jnp.maximum(mad_scale(res.ravel(), m.ravel()), 1e-3)
            mf = mf * tukey_weight(jnp.abs(res) / sigma)
        # Jres = -sum J r  (reference: Jres_[k] -= res*J[k])
        rm = res * mf
        Jres = -jnp.sum(rm[:, :, None] * jac, axis=(0, 1))
        jm = jac * mf[:, :, None]
        H = jnp.sum(jac[:, :, :, None] * jm[:, :, None, :], axis=(0, 1))
        chi2 = jnp.sum(res * res) / jnp.maximum(jnp.sum(mf), 1.0)
        return H, Jres, chi2

    res0, m0 = residuals(T_init)
    H0, J0, chi20 = normal_eqs(res0, m0)

    def one_iter(carry):
        i, T, best_T, best_chi2, H_last, done = carry
        res, m = residuals(T)
        H, Jres, chi2 = normal_eqs(res, m)
        # damped solve for safety at coarse levels
        x = solve6x6_spd(H + 1e-8 * jnp.eye(6, dtype=H.dtype), Jres)
        bad = jnp.any(jnp.isnan(x)) | (chi2 > best_chi2 * 1.0)
        # chi2 plateau: this iteration's evaluation improved on the
        # best-so-far by < 0.01% — the level is at its noise floor
        plateau = (i > 0) & (chi2 > best_chi2 * (1.0 - 1e-4))
        T_new = T * SE3.exp(-x)
        # rollback semantics: keep best pose seen so far
        better = (~done) & (chi2 <= best_chi2)
        best_T = jax.tree.map(lambda a, b: jnp.where(better, a, b), T, best_T)
        best_chi2 = jnp.where(better, chi2, best_chi2)
        # done -> frozen; bad after first step -> roll back to best
        T_next = jax.tree.map(
            lambda cur, bst, new: jnp.where(
                done, cur, jnp.where(bad & (i > 0), bst, new)),
            T, best_T, T_new)
        # eps step test + the plateau stop: without the latter the eps
        # test almost never fires and every level burns its full
        # 30-iteration budget (measured: the GN loop was 687 of the
        # ~3000 kernels/frame of the fused step, pure dispatch load)
        converged = (jnp.max(jnp.abs(x)) < eps) | plateau
        # reference semantics (vk::NLLSSolver Gauss-Newton): a chi2
        # increase rolls back AND STOPS the level — without this the
        # loop burns the full 30-iteration budget every level
        stopped = bad & (i > 0)
        return (jnp.where(done, i, i + 1), T_next, best_T, best_chi2,
                jnp.where(done, H_last, H),
                done | converged | stopped)

    # chunked loop: `unroll` masked iterations per while_loop step — the
    # sequential lax loop pays per-iteration dispatch on this backend, so
    # amortize it over `unroll` fused iterations; eps early-exit still
    # bounds the total at ~n_iter.  unroll >= n_iter drops the while_loop
    # entirely (straight-line masked iterations, zero loop overhead).
    init = (jnp.int32(0), T_init, T_init, jnp.float32(jnp.inf),
            H0, jnp.bool_(False))
    if unroll >= n_iter:
        carry = init
        for _ in range(n_iter):
            carry = one_iter(carry)
        _, T, best_T, best_chi2, H, _ = carry
    else:
        def cond(carry):
            i, _, _, _, _, done = carry
            return (i < n_iter) & (~done)

        def body(carry):
            for _ in range(unroll):
                carry = one_iter(carry)
            return carry

        _, T, best_T, best_chi2, H, _ = jax.lax.while_loop(
            cond, body, init)
    # final evaluation to pick best
    res, m = residuals(T)
    _, _, chi2 = normal_eqs(res, m)
    better = chi2 <= best_chi2
    T_out = jax.tree.map(lambda a, b: jnp.where(better, a, b), T, best_T)
    chi2_out = jnp.minimum(chi2, best_chi2)
    n_meas = jnp.sum(m)
    return T_out, n_meas, H, chi2_out


@functools.partial(jax.jit, static_argnames=("max_level", "min_level",
                                             "n_iter", "eps", "unroll",
                                             "robust", "use_kernel"))
def sparse_img_align(ref_pyr: Tuple[jnp.ndarray, ...],
                     cur_pyr: Tuple[jnp.ndarray, ...],
                     cam,
                     T_cur_ref_init: SE3,
                     feats_px: jnp.ndarray,     # (N, 2) level-0 px in ref
                     feats_f: jnp.ndarray,      # (N, 3) unit bearings in ref
                     feats_depth: jnp.ndarray,  # (N,) depth along bearing
                     feats_valid: jnp.ndarray,  # (N,) bool
                     max_level: int = 4,
                     min_level: int = 2,
                     n_iter: int = 30,
                     eps: float = 1e-7,
                     cur_pad=None, ref_pad=None,
                     unroll: int = 3, robust: bool = False,
                     use_kernel=None) -> AlignResult:
    """Coarse-to-fine sparse image alignment. Returns refined T_cur_ref.

    robust=True enables the reference's optional (default-off) Tukey/MAD
    weighting of the photometric residuals (vk::NLLSSolver weight
    function hook, sparse_img_align.cpp:82-83).

    use_kernel: None = auto (Pallas whole-level GN kernel on TPU for
    pinhole cameras, XLA loop otherwise); True/False forces a path
    (True uses interpret mode off-TPU — for tests)."""
    from rpg_svo_tpu.ops import pallas_align
    if use_kernel is None:
        use_kernel = pallas_align.use_align_kernel(cam, cur_pad, robust)
    interp = jax.default_backend() == "cpu"
    T = T_cur_ref_init
    p_ref = feats_f * feats_depth[:, None]
    n_meas = jnp.int32(0)
    H = jnp.zeros((6, 6), dtype=jnp.float32)
    chi2 = jnp.float32(0.0)
    for level in range(max_level, min_level - 1, -1):
        ref_patch, jac, valid = _precompute_level(
            ref_pyr[level], cam.fx, feats_px, feats_f, feats_depth,
            feats_valid, level, ref_pad=ref_pad)
        if use_kernel:
            T, n_meas, H, chi2 = pallas_align.level_gn_kernel(
                cur_pad, cam, T, p_ref, ref_patch, jac, valid,
                level, n_iter, eps, interpret=interp)
        else:
            T, n_meas, H, chi2 = _level_gn(
                cur_pyr[level], cam, T, p_ref, ref_patch, jac, valid,
                level, n_iter, eps, cur_pad=cur_pad, unroll=unroll,
                robust=robust)
    n_tracked = (n_meas // PATCH_AREA).astype(jnp.int32)
    return AlignResult(T, n_tracked, H, chi2)
