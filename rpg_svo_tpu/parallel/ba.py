"""Distributed Schur-complement bundle adjustment over a device mesh.

The scaling story of the framework (BASELINE.json north star): keyframe
camera blocks are replicated, POINT blocks and their observations are
sharded across devices on the `sp` mesh axis; each device builds the
partial reduced camera system from its point shard, a psum over ICI
assembles S and the rhs, the tiny dense solve is replicated, and the
point back-substitution stays local to each shard.  Communication per GN
iteration is exactly one psum of (K*6)^2 + K*6 floats — independent of
the number of points.

Correctness contract: bitwise-equivalent (up to reduction order) to the
single-device rpg_svo_tpu.ba.schur solver; tested against it on a
virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import functools as _ft
# f32 MXU accumulation (see ba/schur.py precision note)
_ein = _ft.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.cameras import project2d
from rpg_svo_tpu.ba.schur import BAProblem, _residuals_jacobians, _chi2


def _local_blocks(prob_shard: BAProblem, R, t, p_w, huber_k, damping):
    """Per-shard U, b_c, S-correction and rhs-correction contributions +
    the local point-step precomputations. Mirrors ba.schur._gn_step."""
    K = R.shape[0]
    r, Jc, Jp, w = _residuals_jacobians(prob_shard, R, t, p_w, huber_k)
    chi2 = jnp.sum(w * jnp.sum(r * r, -1))
    cam = jnp.clip(prob_shard.obs_cam, 0, K - 1)
    # every per-camera reduction is a matmul against the observation
    # one-hot (same layout reasoning as ba.schur._gn_step: segment_sum
    # scatters P*M rows at the scatter latency floor, and its (.., 6, 6)
    # operand pads to (8, 128))
    E = jax.nn.one_hot(cam, K, dtype=Jc.dtype)           # (P, M, K)

    JcW = Jc * w[..., None, None]
    G = _ein("pmia,pmib->abpm", JcW, Jc)           # (6, 6, P, M)
    U = _ein("abpm,pmk->kab", G, E)
    b_c = -_ein("pmia,pmi,pmk->ka", JcW, r, E)

    V = _ein("pmia,pmib,pm->pab", Jp, Jp, w)
    b_p = -_ein("pmia,pmi,pm->pa", Jp, r, w)
    Wc = _ein("pmia,pmib,pm->pmab", Jc, Jp, w)
    Vinv = jnp.linalg.inv(V + (1e-6 + damping) * jnp.eye(3))
    Vinv = jnp.where(prob_shard.p_valid[:, None, None], Vinv, 0.0)

    # per-point per-camera couplings via one-hot matmuls (no
    # (P, M, M, 6, 6) cross tensor)
    WV = _ein("pmab,pbc->pmac", Wc, Vinv)
    A_ = _ein("pmk,pmac->acpk", E, WV)             # (6, 3, P, K)
    B_ = _ein("pmk,pmbc->bcpk", E, Wc)             # (6, 3, P, K)
    S_corr = _ein("acpk,bcpl->klab", A_, B_)       # (K, K, 6, 6)
    rhs_corr = _ein("pmac,pc,pmk->ka", WV, b_p, E)
    return U, b_c, S_corr, rhs_corr, (Wc, Vinv, b_p, cam), chi2


def _assemble_solve(U, b_c, S_corr, rhs_corr, variable, damping):
    K = U.shape[0]
    S = -S_corr
    S = S.at[jnp.arange(K), jnp.arange(K)].add(U)
    eye6 = jnp.eye(6)
    mask_kk = (variable[:, None] & variable[None, :])[:, :, None, None]
    S = jnp.where(mask_kk, S, 0.0)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.where(variable[:, None, None], damping * eye6, eye6))
    rhs = jnp.where(variable[:, None], b_c - rhs_corr, 0.0)
    Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dx_c = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(K, 6)
    return jnp.where(variable[:, None], dx_c, 0.0)


def distributed_ba_solve(mesh: Mesh, prob: BAProblem, n_iter: int = 10,
                         huber_width: float = 0.01, axis: str = "sp"):
    """Run GN+Schur BA with points sharded over `axis` of `mesh`.

    prob fields p_w/p_valid/obs_* must have leading dim divisible by the
    axis size.  Returns (R, t, p_w) like the single-device solver.
    """

    def local(R, t, var, p_w, p_valid, obs_cam, obs_f, obs_level,
              obs_mask):
        shard = BAProblem(R, t, var, p_w, p_valid, obs_cam, obs_f,
                          obs_level, obs_mask)

        def body(i, carry):
            R, t, p, best, damping = carry
            U, b_c, S_corr, rhs_corr, aux, _ = _local_blocks(
                shard._replace(p_w=p), R, t, p,
                jnp.float32(huber_width), damping)
            U = jax.lax.psum(U, axis)
            b_c = jax.lax.psum(b_c, axis)
            S_corr = jax.lax.psum(S_corr, axis)
            rhs_corr = jax.lax.psum(rhs_corr, axis)
            dx_c = _assemble_solve(U, b_c, S_corr, rhs_corr, var, damping)
            Wc, Vinv, b_p, cam = aux
            dxc_obs = dx_c[cam]
            Wt_dxc = _ein("pmab,pma->pb", Wc, dxc_obs)
            dx_p = _ein("pab,pb->pa", Vinv, b_p - Wt_dxc)
            dx_p = jnp.where(p_valid[:, None], dx_p, 0.0)
            T_new = SE3.exp(dx_c) * SE3(R, t)
            p_new = p + dx_p
            # chi2 rollback (global reduction)
            chi2_new = jax.lax.psum(
                _chi2(shard._replace(p_w=p_new), T_new.R, T_new.t,
                      p_new, jnp.float32(huber_width)), axis)
            ok = (chi2_new < best) & jnp.isfinite(chi2_new)
            R = jnp.where(ok, T_new.R, R)
            t = jnp.where(ok, T_new.t, t)
            p = jnp.where(ok, p_new, p)
            best = jnp.where(ok, chi2_new, best)
            damping = jnp.clip(
                jnp.where(ok, damping * 0.5, damping * 8.0), 1e-8, 1e2)
            return R, t, p, best, damping

        chi2_0 = jax.lax.psum(
            _chi2(shard, R, t, p_w, jnp.float32(huber_width)), axis)
        R, t, p, chi2, _ = jax.lax.fori_loop(
            0, n_iter, body, (R, t, p_w, chi2_0, jnp.float32(1e-4)))
        return R, t, p, chi2

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis)),
        out_specs=(P(), P(), P(axis), P()),
        check_vma=False))
    return fn(prob.R, prob.t, prob.cam_variable, prob.p_w, prob.p_valid,
              prob.obs_cam, prob.obs_f, prob.obs_level, prob.obs_mask)
