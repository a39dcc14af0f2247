"""Bundle adjustment as a batched Gauss-Newton Schur-complement solve.

TPU-native replacement for the reference's g2o backend
(svo/src/bundle_adjustment.cpp): twoViewBA (:41-120), localBA (:122-251)
and setupG2o's Schur marginalization of points (:345-375, 406-408 —
``setSchur`` / BlockSolver_6_3).  Instead of a sparse graph library, the
problem is SoA arrays with masks:

- cameras: (K,) SE3 blocks with a `variable` mask (non-core keyframes are
  fixed, bundle_adjustment.cpp:180-189);
- points: (P, 3) with a valid mask, every point observed by the cameras;
- observations: per point up to M rows (cam index, unit-plane measurement,
  pyramid level), masked.

Each GN iteration builds the camera blocks U (K, 6, 6), point blocks
V (P, 3, 3), couplings W (P, M, 6, 3) with batched einsums, forms the
dense reduced camera system S = U − W V⁻¹ Wᵀ (K·6 is small: tens of
cameras), solves it, and back-substitutes the point updates.  Huber
robust weights with per-level information 1/2^level match the reference's
edge setup; chi2-increase rollback matches its conservative behavior.

The same einsums run under shard_map with the POINT dimension sharded
and psum over the mesh axis assembling S — that is the distributed local
BA (see rpg_svo_tpu.parallel.ba).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.cameras import project2d
from rpg_svo_tpu.ops.robust import huber_weight

# TPU matmul precision: XLA's DEFAULT truncates einsum operands to
# bfloat16 on the MXU.  The one-hot Schur assembly contracts over
# P*M ~ 3e5 observation rows, and bf16-truncated Jacobian products
# put ~2e-4 relative error into U/S/rhs (measured on-device; the
# exact segment_sum path was 3e-6) — enough to regress the accurate
# preset's median trajectory error ~1 mm.  HIGHEST restores f32
# accumulation at ~12%% extra time on the assembly matmuls.
_ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class BAProblem(NamedTuple):
    R: jnp.ndarray          # (K, 3, 3) T_f_w per camera
    t: jnp.ndarray          # (K, 3)
    cam_variable: jnp.ndarray   # (K,) bool — optimize this camera
    p_w: jnp.ndarray        # (P, 3)
    p_valid: jnp.ndarray    # (P,)
    obs_cam: jnp.ndarray    # (P, M) int32 camera index
    obs_f: jnp.ndarray      # (P, M, 3) measured unit bearings
    obs_level: jnp.ndarray  # (P, M) int32
    obs_mask: jnp.ndarray   # (P, M) bool


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    p_w: jnp.ndarray
    chi2_init: jnp.ndarray
    chi2_final: jnp.ndarray
    obs_inlier: jnp.ndarray  # (P, M) after final outlier check


def _residuals_jacobians(prob: BAProblem, R, t, p_w, huber_k):
    """Residuals + per-observation Jacobian blocks.

    Returns r (P, M, 2), Jc (P, M, 2, 6), Jp (P, M, 2, 3), w (P, M).
    """
    K = R.shape[0]
    cam = jnp.clip(prob.obs_cam, 0, K - 1)
    Rc = R[cam]                              # (P, M, 3, 3)
    tc = t[cam]
    p_cam = _ein("pmij,pj->pmi", Rc, p_w) + tc
    r = project2d(prob.obs_f) - project2d(p_cam)        # (P, M, 2)
    x, y = p_cam[..., 0], p_cam[..., 1]
    z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-10, 1e-10, p_cam[..., 2])
    zi = 1.0 / z
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    # d(residual)/d(cam twist), left-multiplicative (v, w) — the same sign
    # convention as jacobian_xyz2uv
    row0 = jnp.stack([-zi, zero, x * zi2,
                      y * x * zi2, -(1.0 + x * x * zi2), y * zi], axis=-1)
    row1 = jnp.stack([zero, -zi, y * zi2,
                      1.0 + y * y * zi2, -x * y * zi2, -x * zi], axis=-1)
    Jc = jnp.stack([row0, row1], axis=-2)               # (P, M, 2, 6)
    Jproj = jnp.stack([
        jnp.stack([zi, zero, -x * zi2], axis=-1),
        jnp.stack([zero, zi, -y * zi2], axis=-1),
    ], axis=-2)
    Jp = -_ein("pmij,pmjl->pmil", Jproj, Rc)      # (P, M, 2, 3)
    # information: 1/2^level, robust Huber on the weighted residual norm
    sinfo = 1.0 / (2.0 ** prob.obs_level.astype(jnp.float32))
    rn = jnp.linalg.norm(r, axis=-1) * sinfo
    w = huber_weight(rn / jnp.maximum(huber_k, 1e-12)) * sinfo * sinfo
    w = jnp.where(prob.obs_mask & prob.p_valid[:, None], w, 0.0)
    return r, Jc, Jp, w


def _chi2(prob: BAProblem, R, t, p_w, huber_k):
    """Robust chi2 without building the Jacobian stacks (the rollback /
    init evaluations only need residuals and weights — the (P, M, 2, 6)
    Jc stack pads to (8, 128) on TPU and is the bulk of a full
    _residuals_jacobians call)."""
    K = R.shape[0]
    cam = jnp.clip(prob.obs_cam, 0, K - 1)
    p_cam = _ein("pmij,pj->pmi", R[cam], p_w) + t[cam]
    r = project2d(prob.obs_f) - project2d(p_cam)
    sinfo = 1.0 / (2.0 ** prob.obs_level.astype(jnp.float32))
    rn = jnp.linalg.norm(r, axis=-1) * sinfo
    w = huber_weight(rn / jnp.maximum(huber_k, 1e-12)) * sinfo * sinfo
    w = jnp.where(prob.obs_mask & prob.p_valid[:, None], w, 0.0)
    return jnp.sum(w * jnp.sum(r * r, -1))


def _gn_step(prob: BAProblem, R, t, p_w, huber_k, damping):
    """One Schur GN step. Returns (R', t', p_w', chi2)."""
    K = R.shape[0]
    r, Jc, Jp, w = _residuals_jacobians(prob, R, t, p_w, huber_k)
    chi2 = jnp.sum(w * jnp.sum(r * r, -1))
    camPM = jnp.clip(prob.obs_cam, 0, K - 1)
    # per-observation camera one-hot: EVERY per-camera reduction below is
    # an MXU matmul against it.  [segment_sum over the P*M rows scattered
    # at the gather/scatter latency floor — 7.5 ms/frame across U, b_c
    # and the rhs correction at the accurate preset — and the (P*M, 6, 6)
    # segment operand padded its (6, 6) minors to (8, 128): 1.1 GB.]
    E = jax.nn.one_hot(camPM, K, dtype=Jc.dtype)         # (P, M, K)

    # camera blocks U (K, 6, 6) and rhs b_c (K, 6)
    JcW = Jc * w[..., None, None]
    G = _ein("pmia,pmib->abpm", JcW, Jc)           # (6, 6, P, M)
    U = _ein("abpm,pmk->kab", G, E)
    b_c = -_ein("pmia,pmi,pmk->ka", JcW, r, E)

    # point blocks V (P, 3, 3), b_p (P, 3), couplings W (P, M, 6, 3)
    V = _ein("pmia,pmib,pm->pab", Jp, Jp, w)
    b_p = -_ein("pmia,pmi,pm->pa", Jp, r, w)
    Wc = _ein("pmia,pmib,pm->pmab", Jc, Jp, w)    # (P, M, 6, 3)
    Vinv = jnp.linalg.inv(V + (1e-6 + damping) * jnp.eye(3))
    Vinv = jnp.where(prob.p_valid[:, None, None], Vinv, 0.0)

    # Schur: S = U - sum_p Y_pk Vinv_p Y_plᵀ with per-point per-camera
    # couplings Y_pk = Σ_{m: cam_m=k} W_pm aggregated by one-hot matmuls.
    # [The earlier pairwise formulation materialized a (P, M, M, 6, 6)
    # cross tensor whose (6, 6) minor dims pad to (8, 128) under TPU
    # tiling — 19.4 GB at the accurate preset (P=16384, M=17) — and fed a
    # P*M^2-row scatter.  This form is O(P*K*18) with the big axes minor
    # ((6, 3, P, K) layouts) and contracts on the MXU instead.]
    WV = _ein("pmab,pbc->pmac", Wc, Vinv)          # (P, M, 6, 3)
    A = _ein("pmk,pmac->acpk", E, WV)              # (6, 3, P, K)
    B = _ein("pmk,pmbc->bcpk", E, Wc)              # (6, 3, P, K)
    S = -_ein("acpk,bcpl->klab", A, B)             # (K, K, 6, 6)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(U)
    rhs = b_c - _ein("pmac,pc,pmk->ka", WV, b_p, E)

    # fixed cameras: identity rows/cols, zero rhs
    var = prob.cam_variable
    eye6 = jnp.eye(6)
    mask_kk = (var[:, None] & var[None, :])[:, :, None, None]
    S = jnp.where(mask_kk, S, 0.0)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.where(var[:, None, None], damping * eye6, eye6))
    rhs = jnp.where(var[:, None], rhs, 0.0)

    # dense solve of the reduced camera system (6K x 6K)
    Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dx_c = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(K, 6)
    dx_c = jnp.where(var[:, None], dx_c, 0.0)

    # back-substitute point updates
    dxc_obs = dx_c[camPM]                                # (P, M, 6)
    Wt_dxc = _ein("pmab,pma->pb", Wc, dxc_obs)     # (P, 3)
    dx_p = _ein("pab,pb->pa", Vinv, b_p - Wt_dxc)
    dx_p = jnp.where(prob.p_valid[:, None], dx_p, 0.0)

    T_new = SE3.exp(dx_c) * SE3(R, t)
    return T_new.R, T_new.t, p_w + dx_p, chi2


@functools.partial(jax.jit, static_argnames=("n_iter",))
def solve_ba(prob: BAProblem, n_iter: int = 10,
             huber_width: float = 1.0,
             reproj_thresh_unitplane: float = 0.005) -> BAResult:
    """Robust GN with chi2 rollback; prunes outlier observations at the
    end like the reference's edge removal (bundle_adjustment.cpp:96-116,
    222-250)."""
    chi2_init = _chi2(prob, prob.R, prob.t, prob.p_w,
                      jnp.float32(huber_width))

    def make_body(pb):
        def body(_, carry):
            R, t, p, best, damping = carry
            Rn, tn, pn, chi2 = _gn_step(pb, R, t, p,
                                        jnp.float32(huber_width), damping)
            bad = jnp.isnan(chi2) | jnp.any(jnp.isnan(tn)) \
                | jnp.any(jnp.isnan(pn))
            chi2_new = _chi2(pb, Rn, tn, pn, jnp.float32(huber_width))
            improve = (chi2_new < best) & (~bad)
            R = jnp.where(improve, Rn, R)
            t = jnp.where(improve, tn, t)
            p = jnp.where(improve, pn, p)
            best = jnp.where(improve, chi2_new, best)
            damping = jnp.where(improve, damping * 0.5, damping * 8.0)
            return R, t, p, best, jnp.clip(damping, 1e-8, 1e2)
        return body

    # phase 1: robust GN on all observations
    n1 = max(n_iter // 2, 1)
    R, t, p, chi2_mid, _ = jax.lax.fori_loop(
        0, n1, make_body(prob),
        (prob.R, prob.t, prob.p_w, chi2_init, jnp.float32(1e-4)))

    # prune outlier edges (reference: remove edges with chi2 > thresh
    # mid-way, bundle_adjustment.cpp:96-116) and re-solve on inliers
    cam_m = jnp.clip(prob.obs_cam, 0, R.shape[0] - 1)
    p_cam_m = _ein("pmij,pj->pmi", R[cam_m], p) + t[cam_m]
    res_m = project2d(prob.obs_f) - project2d(p_cam_m)
    keep = prob.obs_mask & (jnp.linalg.norm(res_m, axis=-1)
                            < 3.0 * reproj_thresh_unitplane)
    prob2 = prob._replace(obs_mask=keep)
    chi2_1 = _chi2(prob2, R, t, p, jnp.float32(huber_width))
    R, t, p, chi2_final, _ = jax.lax.fori_loop(
        0, n_iter - n1, make_body(prob2),
        (R, t, p, chi2_1, jnp.float32(1e-4)))

    # final outlier pruning on unit-plane residual norm
    cam = jnp.clip(prob.obs_cam, 0, R.shape[0] - 1)
    p_cam = _ein("pmij,pj->pmi", R[cam], p) + t[cam]
    res = project2d(prob.obs_f) - project2d(p_cam)
    inlier = prob.obs_mask & (jnp.linalg.norm(res, axis=-1)
                              < reproj_thresh_unitplane) \
        & (p_cam[..., 2] > 0)
    return BAResult(R, t, p, chi2_init, chi2_final, inlier)
