"""Distributed Schur-complement bundle adjustment over a device mesh.

The scaling story of the framework (BASELINE.json north star): keyframe
camera blocks are replicated, POINT blocks and their observations are
sharded across devices on the `sp` mesh axis; each device builds the
partial reduced camera system from its point shard (the SAME block
builder as the single-device solver — ba/schur.build_system, including
its variable-camera compaction and f32-accumulation rules), a psum over
ICI assembles S and the rhs, the tiny dense solve is replicated, and
the point back-substitution stays local to each shard.  Communication
per GN iteration is exactly one psum of (Vn*6)^2 + Vn*6 floats — Vn the
compacted variable-camera count, independent of the number of points.

Correctness contract: bitwise-equivalent (up to reduction order) to the
single-device rpg_svo_tpu.ba.schur solver; tested against it on a
virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ba.schur import (
    BAProblem, _chi2, assemble_solve, build_system, expand_dx,
    obs_cam_onehot, point_backsub, var_onehot, variable_compaction,
)


def distributed_ba_solve(mesh: Mesh, prob: BAProblem, n_iter: int = 10,
                         huber_width: float = 0.01, axis: str = "sp",
                         n_var_max: int = 0):
    """Run GN+Schur BA with points sharded over `axis` of `mesh`.

    prob fields p_w/p_valid/obs_* must have leading dim divisible by the
    axis size.  Returns (R, t, p_w, chi2) like the single-device solver.
    """
    K = prob.R.shape[0]
    n_var = K if not n_var_max else min(K, n_var_max)

    def local(R, t, var, p_w, p_valid, obs_cam, obs_f, obs_level,
              obs_mask):
        shard = BAProblem(R, t, var, p_w, p_valid, obs_cam, obs_f,
                          obs_level, obs_mask)
        # replicated: every device computes the same compaction
        vsel, vok, inv_map = variable_compaction(var, n_var)
        E, _ = obs_cam_onehot(obs_cam, K)    # iteration-invariant
        Ev = var_onehot(obs_cam, inv_map, n_var)

        def body(i, carry):
            R, t, p, best, damping = carry
            U, b_c, S_corr, rhs_corr, aux, _ = build_system(
                shard._replace(p_w=p), R, t, p,
                jnp.float32(huber_width), damping, inv_map, n_var,
                E=E, Ev=Ev)
            U = jax.lax.psum(U, axis)
            b_c = jax.lax.psum(b_c, axis)
            S_corr = jax.lax.psum(S_corr, axis)
            rhs_corr = jax.lax.psum(rhs_corr, axis)
            dx_v = assemble_solve(U, b_c, S_corr, rhs_corr, vok, damping)
            dx_c = expand_dx(dx_v, vsel, vok, K)
            Vinv, b_p, Y = aux
            dx_p = point_backsub(Vinv, b_p, Y, dx_v, p_valid)
            T_new = SE3.exp(dx_c) * SE3(R, t)
            p_new = p + dx_p
            # chi2 rollback (global reduction)
            chi2_new = jax.lax.psum(
                _chi2(shard._replace(p_w=p_new), T_new.R, T_new.t,
                      p_new, jnp.float32(huber_width), E), axis)
            ok = (chi2_new < best) & jnp.isfinite(chi2_new)
            R = jnp.where(ok, T_new.R, R)
            t = jnp.where(ok, T_new.t, t)
            p = jnp.where(ok, p_new, p)
            best = jnp.where(ok, chi2_new, best)
            damping = jnp.clip(
                jnp.where(ok, damping * 0.5, damping * 8.0), 1e-8, 1e2)
            return R, t, p, best, damping

        chi2_0 = jax.lax.psum(
            _chi2(shard, R, t, p_w, jnp.float32(huber_width), E), axis)
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
