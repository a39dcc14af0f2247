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

Each GN iteration builds the camera blocks U, point blocks V (P, 3, 3)
and couplings W (P, M, 6, 3), forms the dense reduced camera system
S = U − W V⁻¹ Wᵀ, solves it, and back-substitutes the point updates.
Huber robust weights with per-level information 1/2^level match the
reference's edge setup; chi2-increase rollback matches its conservative
behavior.

TPU layout/precision rules (measured on device):
- VARIABLE-CAMERA COMPACTION: only the core keyframes move (≤6 of a
  64-slot pool in the accurate preset), so the reduced system is built
  over the ≤n_var_max compacted variable cams, not the pool — the S
  assembly shrinks ~(K/Vn)^2.  Fixed cameras contribute to points only
  (V, b_p), exactly like the reference's fixed vertices.
- One-hot MXU matmuls aggregate per-camera sums, at Precision.HIGHEST:
  XLA's DEFAULT truncates operands to bfloat16, which put ~2e-4 relative
  error into S (measured; the exact segment_sum path was 3e-6) and
  regressed the accurate preset's trajectory error ~1 mm.
- Small-contraction products (projection, V, W, back-substitution) are
  broadcast-multiply-reduce on the VPU — exact f32 AND faster than
  HIGHEST dot_generals (a 6-pass tiny matmul wastes the MXU).
- V⁻¹ is the closed-form adjugate (geometry/linalg.inv3x3):
  jnp.linalg.inv lowers to a serial LU custom-call (~5.4 ms for the
  16384-point pool vs VPU math that fuses with the neighbors).

The same block builder runs under shard_map with the POINT dimension
sharded and psum over the mesh axis assembling S — that is the
distributed local BA (see rpg_svo_tpu.parallel.ba).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.cameras import project2d
from rpg_svo_tpu.geometry.linalg import inv3x3
from rpg_svo_tpu.ops.robust import huber_weight

# f32 MXU accumulation for the big one-hot aggregations (see module doc).
# SVO_BA_PRECISION=high selects bf16x3 (3-pass) instead of the 6-pass
# f32 decomposition — measurement/bisect hook only.
import os as _os
_PRECISION = {"high": jax.lax.Precision.HIGH,
              "highest": jax.lax.Precision.HIGHEST,
              "default": jax.lax.Precision.DEFAULT}[
    _os.environ.get("SVO_BA_PRECISION", "highest")]
_ein = functools.partial(jnp.einsum, precision=_PRECISION)


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


def obs_cam_onehot(obs_cam, K: int):
    """(P, M, K) one-hot of the clipped camera index — built ONCE per
    solve (the index table is iteration-invariant) and contracted on the
    MXU wherever per-observation camera rows are needed: R[cam]-style
    scattered gathers over the P*M observation rows cost ~10 ns/element
    (~8 ms per BA iteration at the accurate preset).  float32: the
    contractions that read it feed geometry and run at
    Precision.HIGHEST (see _cam_rows)."""
    cam = jnp.clip(obs_cam, 0, K - 1)
    return jax.nn.one_hot(cam, K, dtype=jnp.float32), cam


def _cam_rows(E, R, t):
    """Per-observation camera rotation (P, M, 3, 3) + translation.

    ONE (P,M,K)·(K,12) contraction instead of per-entry einsums: the
    "pmk,kij->pmij" form re-read the one-hot buffer once per output
    entry (9x ≈ 320 MB/call at accurate shapes).  Runs as a single f32
    dot_general at Precision.HIGHEST — see the inline note below for
    why the cheaper bf16 hi/lo-split scheme was rejected."""
    K = R.shape[0]
    Rt9 = jnp.concatenate([R.reshape(K, 9), t], axis=1)   # (K, 12)
    # f32 HIGHEST: bf16 hi/lo splits (2- and 3-term) are selection-exact
    # on CPU but measurably NOT on the TPU MXU — the accurate preset's
    # 400-frame median terr regressed 1.95 -> 2.40 mm before this was
    # pinned back to the full-precision contraction.
    out = jax.lax.dot_general(
        E, Rt9, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)               # (P, M, 12)
    Rc = out[..., :9].reshape(out.shape[0], out.shape[1], 3, 3)
    tc = out[..., 9:]
    return Rc, tc


def _apply_cams(R, t, E, p_w):
    """p_cam (P, M, 3) = R[cam] @ p + t[cam]; E = obs_cam_onehot."""
    Rc, tc = _cam_rows(E, R, t)
    return jnp.sum(Rc * p_w[:, None, None, :], axis=-1) + tc


def _residuals_jacobians(prob: BAProblem, R, t, p_w, huber_k, E):
    """Residuals + per-observation Jacobian blocks; E = obs_cam_onehot.

    Returns r (P, M, 2), Jc (P, M, 2, 6), Jp (P, M, 2, 3), w (P, M).
    """
    K = R.shape[0]
    Rc, tc = _cam_rows(E, R, t)              # (P, M, 3, 3), (P, M, 3)
    p_cam = jnp.sum(Rc * p_w[:, None, None, :], axis=-1) + tc
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
    # Jp = -Jproj @ Rc, contraction over the 3 point coords
    Jp = -jnp.sum(Jproj[..., :, :, None] * Rc[..., None, :, :], axis=-2)
    # information: 1/2^level, robust Huber on the weighted residual norm
    sinfo = 1.0 / (2.0 ** prob.obs_level.astype(jnp.float32))
    rn = jnp.linalg.norm(r, axis=-1) * sinfo
    w = huber_weight(rn / jnp.maximum(huber_k, 1e-12)) * sinfo * sinfo
    w = jnp.where(prob.obs_mask & prob.p_valid[:, None], w, 0.0)
    return r, Jc, Jp, w


def _chi2(prob: BAProblem, R, t, p_w, huber_k, E):
    """Robust chi2 without building the Jacobian stacks (the rollback /
    init evaluations only need residuals and weights)."""
    p_cam = _apply_cams(R, t, E, p_w)
    r = project2d(prob.obs_f) - project2d(p_cam)
    sinfo = 1.0 / (2.0 ** prob.obs_level.astype(jnp.float32))
    rn = jnp.linalg.norm(r, axis=-1) * sinfo
    w = huber_weight(rn / jnp.maximum(huber_k, 1e-12)) * sinfo * sinfo
    w = jnp.where(prob.obs_mask & prob.p_valid[:, None], w, 0.0)
    return jnp.sum(w * jnp.sum(r * r, -1))


def variable_compaction(variable: jnp.ndarray, n_var: int):
    """Compact the variable-camera set to n_var slots.

    Returns (vsel (n_var,) slot ids, vok (n_var,) bool, inv_map (K,)
    mapping camera slot -> compact index, n_var for non-variable)."""
    from rpg_svo_tpu.core.map import mask_compact
    K = variable.shape[0]
    vsel, vok = mask_compact(variable, n_var)
    tgt = jnp.where(vok, vsel, K)
    # overflow region padded to 128 rows (odd-length 1-D scatters are in
    # the TPU layout-miscompile class, see CLAUDE.md)
    inv_map = jnp.full((K + 128,), n_var, jnp.int32).at[tgt].set(
        jnp.where(vok, jnp.arange(n_var, dtype=jnp.int32), n_var))[:K]
    return vsel, vok, inv_map


def var_onehot(obs_cam, inv_map, n_var: int):
    """(P, M, n_var) one-hot of the compact VARIABLE-camera index —
    iteration-invariant; build once per solve (rebuilding it per GN
    iteration re-materializes a lane-padded (P*M, n_var->128) buffer)."""
    K = inv_map.shape[0]
    vidx = inv_map[jnp.clip(obs_cam, 0, K - 1)]
    return jax.nn.one_hot(vidx, n_var, dtype=jnp.float32)


def build_system(prob: BAProblem, R, t, p_w, huber_k, damping,
                 inv_map, n_var: int, E=None, Ev=None):
    """One GN iteration's blocks over the compacted variable cameras.

    Returns (U (Vn,6,6), b_c (Vn,6), S_corr (Vn,Vn,6,6), rhs_corr
    (Vn,6), aux=(Vinv, b_p, Y), chi2).  Shared by the single-device
    solver and the point-sharded distributed one (the four leading
    outputs are what the mesh psums; aux is what point_backsub needs
    locally per shard)."""
    K = R.shape[0]
    if E is None:
        E, _ = obs_cam_onehot(prob.obs_cam, K)
    r, Jc, Jp, w = _residuals_jacobians(prob, R, t, p_w, huber_k, E)
    chi2 = jnp.sum(w * jnp.sum(r * r, -1))
    # observation -> compact-variable one-hot; fixed cams get a zero row
    # (they constrain points only, like the reference's fixed vertices)
    E = Ev if Ev is not None else var_onehot(prob.obs_cam, inv_map,
                                             n_var)    # (P, M, Vn)

    JcW = Jc * w[..., None, None]
    G = jnp.sum(JcW[..., :, :, None] * Jc[..., :, None, :], axis=-3)
    U = _ein("pmab,pmv->vab", G, E)
    rm = jnp.sum(JcW * r[..., None], axis=-2)           # (P, M, 6)
    b_c = -_ein("pma,pmv->va", rm, E)

    # point blocks V (P, 3, 3), b_p (P, 3), couplings W (P, M, 6, 3)
    V = jnp.sum(Jp[..., :, :, None] * Jp[..., :, None, :]
                * w[..., None, None, None], axis=(1, 2))
    b_p = -jnp.sum(Jp * (r * w[..., None])[..., None], axis=(1, 2))
    Wc = jnp.sum(JcW[..., :, :, None] * Jp[..., :, None, :], axis=-3)
    Vinv = inv3x3(V + (1e-6 + damping) * jnp.eye(3))
    Vinv = jnp.where(prob.p_valid[:, None, None], Vinv, 0.0)

    # Schur correction: S_corr[v,w] = sum_p Y_pv Vinv_p Y_pwᵀ with
    # Y_pv = Σ_{m: cam_m=v} W_pm aggregated by one-hot matmuls.
    # LAYOUT RULE (measured, r4): every intermediate keeps the big P axis
    # MINOR-MOST.  The earlier (6,3,P,Vn) ordering put Vn (≤17) in the
    # lane dim — XLA padded it to 128 lanes (≈150 MB per operand) and
    # inserted ~0.9 ms/frame of pure relayout copies before the final
    # contraction.
    Vn_ = E.shape[-1]
    if Vn_ <= 16:
        # per-v unrolled multiply-reduce: the einsum form lowers to a
        # per-point batched (M,Vn)x(M,18) dot plus layout copies
        # (measured 8.6 -> 6.3 ms/solve, tools_ba_bench.py); Vn reads
        # of Wc on the VPU beat it at local-BA sizes.  Two-view/global
        # solves (Vn up to K) keep the einsum.
        Ys = [jnp.sum(E[:, :, v, None, None] * Wc, axis=1)  # (P, 6, 3)
              for v in range(Vn_)]
        Y = jnp.stack([y.transpose(1, 2, 0) for y in Ys])   # (Vn,6,3,P)
    else:
        Y = _ein("pmv,pmac->vacp", E, Wc)               # (Vn, 6, 3, P)
    # YV[v,a,d,p] = Σ_c Y[v,a,c,p]·Vinv[p,c,d] as a P-minor broadcast
    # multiply-reduce on the VPU: the einsum form lowered to a per-p
    # batched (…,3)x(3,3) dot — 0.25 ms/iter of strided traffic.
    Vinv_t = jnp.transpose(Vinv, (1, 2, 0))             # (3, 3, P)
    YV = jnp.sum(Y[:, :, :, None, :] * Vinv_t[None, None, :, :, :],
                 axis=2)                                # (Vn, 6, 3, P)
    Vn = Y.shape[0]
    P3 = Y.shape[2] * Y.shape[3]
    # (Vn·6, 3P) @ (3P, Vn·6) — ZERO-PAD the 36-row axes to 128 so XLA
    # lowers an honest MXU matmul: the 36-output-lane dot lowered to a
    # VPU reduce fusion with strided reads (0.54 ms/iter measured; the
    # padded form is ~20 µs and the extra rows are zeros).
    def pad128(x):
        tgt = -(-x.shape[0] // 128) * 128   # two-view/global: Vn·6 > 128
        if tgt == x.shape[0]:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((tgt - x.shape[0], x.shape[1]), x.dtype)])
    S128 = jax.lax.dot(pad128(YV.reshape(Vn * 6, P3)),
                       pad128(Y.reshape(Vn * 6, P3)).T,
                       precision=jax.lax.Precision.HIGHEST)
    S_flat = S128[:Vn * 6, :Vn * 6]
    S_corr = S_flat.reshape(Vn, 6, Vn, 6).transpose(0, 2, 1, 3)
    rhs_corr = _ein("vacp,pc->va", YV, b_p)             # (Vn, 6)
    return U, b_c, S_corr, rhs_corr, (Vinv, b_p, Y), chi2


def assemble_solve(U, b_c, S_corr, rhs_corr, vok, damping):
    """Dense solve of the compacted reduced camera system (6Vn x 6Vn)."""
    Vn = U.shape[0]
    S = -S_corr
    S = S.at[jnp.arange(Vn), jnp.arange(Vn)].add(U)
    eye6 = jnp.eye(6)
    mask_kk = (vok[:, None] & vok[None, :])[:, :, None, None]
    S = jnp.where(mask_kk, S, 0.0)
    S = S.at[jnp.arange(Vn), jnp.arange(Vn)].add(
        jnp.where(vok[:, None, None], damping * eye6, eye6))
    rhs = jnp.where(vok[:, None], b_c - rhs_corr, 0.0)
    Sd = S.transpose(0, 2, 1, 3).reshape(Vn * 6, Vn * 6)
    dx_v = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(Vn, 6)
    return jnp.where(vok[:, None], dx_v, 0.0)


def expand_dx(dx_v, vsel, vok, K: int):
    """Scatter compact camera updates back to the (K, 6) pool layout."""
    tgt = jnp.where(vok, vsel, K)
    return jnp.zeros((K + 128, 6), dx_v.dtype).at[tgt].set(dx_v)[:K]


def point_backsub(Vinv, b_p, Y, dx_v, p_valid):
    """dx_p = V⁻¹ (b_p − Wᵀ dx_c[cam]) — local to each point (shard).

    Uses the aggregated coupling tensor Y (Vn, 6, 3, P) from
    build_system: Wᵀdx_c[p, c] = Σ_{v,a} Y[v,a,c,p]·dx_v[v,a] (fixed
    cams have zero dx and zero Y rows).  The earlier dx_c[camPM]
    scattered gather materialized a (P·M, 6) array whose 6-lane minor
    dim padded to 128 — ~0.25 ms/frame of pure write traffic."""
    Vn = Y.shape[0]
    P3 = Y.shape[2] * Y.shape[3]
    Wt_dxc = jax.lax.dot(
        dx_v.reshape(1, Vn * 6), Y.reshape(Vn * 6, P3),
        precision=jax.lax.Precision.HIGHEST).reshape(
            Y.shape[2], Y.shape[3]).T                    # (P, 3)
    dx_p = jnp.sum(Vinv * (b_p - Wt_dxc)[:, None, :], axis=-1)
    return jnp.where(p_valid[:, None], dx_p, 0.0)


def _gn_step(prob: BAProblem, R, t, p_w, huber_k, damping,
             vsel, vok, inv_map, n_var: int, E=None, Ev=None):
    """One Schur GN step. Returns (R', t', p_w', chi2)."""
    K = R.shape[0]
    U, b_c, S_corr, rhs_corr, (Vinv, b_p, Y), chi2 = build_system(
        prob, R, t, p_w, huber_k, damping, inv_map, n_var, E=E, Ev=Ev)
    dx_v = assemble_solve(U, b_c, S_corr, rhs_corr, vok, damping)
    dx_c = expand_dx(dx_v, vsel, vok, K)
    dx_p = point_backsub(Vinv, b_p, Y, dx_v, prob.p_valid)
    T_new = SE3.exp(dx_c) * SE3(R, t)
    return T_new.R, T_new.t, p_w + dx_p, chi2


@functools.partial(jax.jit, static_argnames=("n_iter", "n_var_max"))
def solve_ba(prob: BAProblem, n_iter: int = 10,
             huber_width: float = 1.0,
             reproj_thresh_unitplane: float = 0.005,
             n_var_max: int = 0) -> BAResult:
    """Robust GN with chi2 rollback; prunes outlier observations at the
    end like the reference's edge removal (bundle_adjustment.cpp:96-116,
    222-250).

    n_var_max > 0 bounds the number of variable cameras (static): the
    reduced camera system is built over that many compacted slots
    instead of the whole pool.  0 = all K slots may be variable."""
    K = prob.R.shape[0]
    n_var = K if not n_var_max else min(K, n_var_max)
    vsel, vok, inv_map = variable_compaction(prob.cam_variable, n_var)
    E, _ = obs_cam_onehot(prob.obs_cam, K)   # iteration-invariant
    Ev = var_onehot(prob.obs_cam, inv_map, n_var)
    chi2_init = _chi2(prob, prob.R, prob.t, prob.p_w,
                      jnp.float32(huber_width), E)

    def run_phase(pb, n: int, R, t, p, chi2_0):
        """Up to n GN steps with chi2-plateau early exit.

        Each iteration of the reduced-system build + solve costs ~0.55 ms
        device time at accurate shapes, and the solve typically plateaus
        well before the reference's fixed 10-iteration budget
        (bundle_adjustment.cpp:248 runs a fixed count too — the early
        exit is the adaptive-iteration ask of VERDICT r4 #1a).  Exit at
        stall count 4: an ACCEPTED step improving best chi2 by less
        than 0.01% adds 2 (two consecutive tiny steps = plateau), a
        rolled-back step adds 1 (four consecutive rollbacks mean the
        8x damping ladder climbed 4096x without an acceptable step —
        hopeless; fewer retries would abort ill-conditioned post-
        bootstrap solves that the old fixed-count loop still rescued
        by damping up)."""
        if n <= 0:
            return R, t, p, chi2_0

        def cond(carry):
            i, _, _, _, _, _, stall = carry
            return (i < n) & (stall < 4)

        def body(carry):
            i, R, t, p, best, damping, stall = carry
            Rn, tn, pn, chi2 = _gn_step(pb, R, t, p,
                                        jnp.float32(huber_width), damping,
                                        vsel, vok, inv_map, n_var, E=E,
                                        Ev=Ev)
            bad = jnp.isnan(chi2) | jnp.any(jnp.isnan(tn)) \
                | jnp.any(jnp.isnan(pn))
            chi2_new = _chi2(pb, Rn, tn, pn, jnp.float32(huber_width),
                             E)
            improve = (chi2_new < best) & (~bad)
            progress = improve & (best - chi2_new
                                  > 1e-4 * jnp.maximum(best, 1e-30))
            R = jnp.where(improve, Rn, R)
            t = jnp.where(improve, tn, t)
            p = jnp.where(improve, pn, p)
            best = jnp.where(improve, chi2_new, best)
            damping = jnp.where(improve, damping * 0.5, damping * 8.0)
            stall = jnp.where(progress, 0,
                              stall + jnp.where(improve, 2, 1))
            return (i + 1, R, t, p, best,
                    jnp.clip(damping, 1e-8, 1e2), stall)

        _, R, t, p, best, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), R, t, p, chi2_0,
                         jnp.float32(1e-4), jnp.int32(0)))
        return R, t, p, best

    # phase 1: robust GN on all observations
    n1 = max(n_iter // 2, 1)
    R, t, p, chi2_mid = run_phase(prob, n1, prob.R, prob.t, prob.p_w,
                                  chi2_init)

    # prune outlier edges (reference: remove edges with chi2 > thresh
    # mid-way, bundle_adjustment.cpp:96-116) and re-solve on inliers
    p_cam_m = _apply_cams(R, t, E, p)
    res_m = project2d(prob.obs_f) - project2d(p_cam_m)
    keep = prob.obs_mask & (jnp.linalg.norm(res_m, axis=-1)
                            < 3.0 * reproj_thresh_unitplane)
    prob2 = prob._replace(obs_mask=keep)
    chi2_1 = _chi2(prob2, R, t, p, jnp.float32(huber_width), E)
    R, t, p, chi2_final = run_phase(prob2, n_iter - n1, R, t, p, chi2_1)

    # final outlier pruning on unit-plane residual norm
    p_cam = _apply_cams(R, t, E, p)
    res = project2d(prob.obs_f) - project2d(p_cam)
    inlier = prob.obs_mask & (jnp.linalg.norm(res, axis=-1)
                              < reproj_thresh_unitplane) \
        & (p_cam[..., 2] > 0)
    return BAResult(R, t, p, chi2_init, chi2_final, inlier)
