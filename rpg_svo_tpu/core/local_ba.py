"""Local bundle adjustment over the keyframe map.

Equivalent of ba::localBA (svo/src/bundle_adjustment.cpp:122-251): the
core keyframes (new KF + the closest ``core_n_kfs``) are variable, all
other keyframes observing their points stay fixed, points are variable,
outlier observations are pruned, starved points deleted.

The problem extraction is trivial because the map is already SoA: the
point store's (P, M) observation table IS the BAProblem layout, with the
keyframe pool as the camera set and a `variable` mask for the core.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ba.schur import BAProblem, solve_ba
from rpg_svo_tpu.core.map import (
    MapState, TYPE_DELETED, TYPE_UNKNOWN, kf_positions,
)


@functools.partial(jax.jit, static_argnames=("n_iter", "core_n_kfs"))
def run_local_ba(m: MapState, new_kf_slot: jnp.ndarray,
                 huber_width_px: jnp.ndarray, reproj_thresh_px: jnp.ndarray,
                 fx: jnp.ndarray, n_iter: int = 10,
                 core_n_kfs: int = 3) -> MapState:
    """Run local BA around `new_kf_slot`; returns the updated map."""
    kf = m.kf
    pt = m.pt
    K = kf.R.shape[0]
    P = pt.pos.shape[0]
    M = pt.obs_kf.shape[1]

    # --- core selection: new KF + closest core_n_kfs active KFs ---------
    new_pos = kf_positions(kf)[new_kf_slot]
    d = jnp.linalg.norm(kf_positions(kf) - new_pos, axis=-1)
    d = jnp.where(kf.active, d, jnp.inf)
    d = d.at[new_kf_slot].set(jnp.inf)
    order = jnp.argsort(d)[:core_n_kfs]
    variable = jnp.zeros((K,), bool).at[order].set(
        jnp.isfinite(d[order])).at[new_kf_slot].set(True)
    variable = variable & kf.active

    # --- observations: the point obs table + the origin observation -----
    kfs = jnp.clip(pt.obs_kf, 0, K - 1)
    fts = jnp.clip(pt.obs_feat, 0, kf.feat_f.shape[1] - 1)
    obs_f = kf.feat_f[kfs, fts]
    obs_level = kf.feat_level[kfs, fts]
    obs_mask = pt.obs_valid
    okf = jnp.clip(pt.orig_kf, 0, K - 1)
    obs_cam = jnp.concatenate([kfs, okf[:, None]], axis=1)
    obs_f = jnp.concatenate([obs_f, pt.orig_f[:, None]], axis=1)
    obs_level = jnp.concatenate([obs_level, pt.orig_level[:, None]],
                                axis=1)
    obs_mask = jnp.concatenate(
        [obs_mask, (pt.orig_kf >= 0)[:, None]], axis=1)
    # only observations on active keyframes count
    obs_mask = obs_mask & kf.active[jnp.clip(obs_cam, 0, K - 1)]

    # points: active, with >= 2 obs, observed by at least one core KF
    n_obs = jnp.sum(obs_mask, axis=1)
    in_core = jnp.any(obs_mask & variable[jnp.clip(obs_cam, 0, K - 1)],
                      axis=1)
    p_valid = (pt.ptype != TYPE_DELETED) & (n_obs >= 2) & in_core

    prob = BAProblem(kf.R, kf.t, variable, pt.pos, p_valid,
                     obs_cam, obs_f, obs_level, obs_mask)
    res = solve_ba(prob, n_iter=n_iter,
                   huber_width=huber_width_px / fx,
                   reproj_thresh_unitplane=reproj_thresh_px / fx)

    # --- write back ------------------------------------------------------
    kf = kf._replace(R=jnp.where(variable[:, None, None], res.R, kf.R),
                     t=jnp.where(variable[:, None], res.t, kf.t))
    pos = jnp.where(p_valid[:, None], res.p_w, pt.pos)
    # prune outlier observations (only the table part, not the origin col)
    new_obs_valid = jnp.where(p_valid[:, None],
                              pt.obs_valid & res.obs_inlier[:, :M],
                              pt.obs_valid)
    n_obs_after = jnp.sum(new_obs_valid, axis=1) \
        + (pt.orig_kf >= 0).astype(jnp.int32)
    starved = p_valid & (n_obs_after < 2) & (pt.ptype >= TYPE_UNKNOWN)
    ptype = jnp.where(starved, TYPE_DELETED, pt.ptype)
    pt = pt._replace(pos=pos, obs_valid=new_obs_valid, ptype=ptype)
    return m._replace(kf=kf, pt=pt)
