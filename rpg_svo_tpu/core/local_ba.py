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


from rpg_svo_tpu.ba.schur import BAProblem, solve_ba
from rpg_svo_tpu.core.map import (
    MapState, TYPE_DELETED, TYPE_UNKNOWN, kf_positions,
)


def _extract_observations_rows(kf, obs_kf, obs_feat, obs_valid,
                               orig_kf, orig_f, orig_level):
    """Obs table rows + origin column as BAProblem arrays:
    (obs_cam, obs_f, obs_level, obs_mask), each (rows, M+1).  Row-sliced
    so local BA can compact its point set BEFORE the per-observation
    keyframe feature lookups (the gathers scale with rows)."""
    K = kf.R.shape[0]
    F = kf.feat_f.shape[1]
    kfs = jnp.clip(obs_kf, 0, K - 1)
    fts = jnp.clip(obs_feat, 0, F - 1)
    # flat 1-D row gathers: the 2-axis form kf.feat_f[kfs, fts] is the
    # measured ~20x-slower TPU gather class (CLAUDE.md); 0.67 ms/solve
    # of the accurate-preset extraction was exactly these two lookups
    row = kfs * F + fts
    obs_f = kf.feat_f.reshape(K * F, 3)[row]
    obs_level = kf.feat_level.reshape(K * F)[row]
    obs_mask = obs_valid
    okf = jnp.clip(orig_kf, 0, K - 1)
    obs_cam = jnp.concatenate([kfs, okf[:, None]], axis=1)
    obs_f = jnp.concatenate([obs_f, orig_f[:, None]], axis=1)
    obs_level = jnp.concatenate([obs_level, orig_level[:, None]],
                                axis=1)
    obs_mask = jnp.concatenate(
        [obs_mask, (orig_kf >= 0)[:, None]], axis=1)
    # only observations on active keyframes count
    obs_mask = obs_mask & kf.active[jnp.clip(obs_cam, 0, K - 1)]
    return obs_cam, obs_f, obs_level, obs_mask


def _extract_observations(m: MapState):
    """The point store's obs table + origin column as BAProblem arrays:
    (obs_cam, obs_f, obs_level, obs_mask), each (P, M+1)."""
    pt = m.pt
    return _extract_observations_rows(
        m.kf, pt.obs_kf, pt.obs_feat, pt.obs_valid,
        pt.orig_kf, pt.orig_f, pt.orig_level)


def build_local_ba_problem(m: MapState, new_kf_slot: jnp.ndarray,
                           core_n_kfs: int = 3,
                           max_core_points: int = 4096):
    """Core selection + point compaction + obs extraction of localBA.

    Returns (prob: BAProblem, sel, selok, variable) — shared by
    run_local_ba and the iteration-count instrumentation
    (tools; callable outside jit on a concrete MapState)."""
    kf = m.kf
    pt = m.pt
    K = kf.R.shape[0]
    P = pt.pos.shape[0]

    # --- core selection: new KF + closest core_n_kfs active KFs ---------
    new_pos = kf_positions(kf)[new_kf_slot]
    d = jnp.linalg.norm(kf_positions(kf) - new_pos, axis=-1)
    d = jnp.where(kf.active, d, jnp.inf)
    d = d.at[new_kf_slot].set(jnp.inf)
    order = jnp.argsort(d)[:core_n_kfs]
    variable = jnp.zeros((K,), bool).at[order].set(
        jnp.isfinite(d[order])).at[new_kf_slot].set(True)
    variable = variable & kf.active
    # gauge anchor: the reference keeps every non-core OBSERVING keyframe
    # fixed (bundle_adjustment.cpp:180-189), which normally anchors the
    # solve.  Early in a sequence ALL active keyframes are core, the
    # problem is gauge-free, and the damped GN drifts the whole map along
    # the flat directions (measured 0.57 -> 1.92 mm median pose error on
    # the noiseless synthetic circle).  Anchor by fixing the OLDEST
    # variable keyframe whenever no active fixed keyframe remains.
    has_fixed = jnp.any(kf.active & ~variable)
    age = jnp.where(variable, kf.frame_id, jnp.iinfo(jnp.int32).max)
    oldest = jnp.argmin(age)
    variable = variable.at[oldest].set(variable[oldest] & has_fixed)

    # points: active, with >= 2 obs, observed by at least one core KF —
    # computed from the raw obs table (no feature lookups yet)
    kfs_full = jnp.clip(pt.obs_kf, 0, K - 1)
    okf_full = jnp.clip(pt.orig_kf, 0, K - 1)
    mask_full = jnp.concatenate(
        [pt.obs_valid, (pt.orig_kf >= 0)[:, None]], axis=1)
    cam_full = jnp.concatenate([kfs_full, okf_full[:, None]], axis=1)
    mask_full = mask_full & kf.active[cam_full]
    n_obs = jnp.sum(mask_full, axis=1)
    in_core = jnp.any(mask_full & variable[cam_full], axis=1)
    p_valid = (pt.ptype != TYPE_DELETED) & (n_obs >= 2) & in_core

    # COMPACT the point set to the core-observed rows before any dense
    # per-observation work (the reference's localBA likewise only loads
    # points seen by core keyframes, bundle_adjustment.cpp:156-170).
    # Cap rationale: steady-state keyframes carry at most F (per-frame
    # budget, <=256) valid features each, so the reachable core set is
    # ~(core_n_kfs+1)*F plus the two detector-dense bootstrap keyframes
    # (<=C cells each) plus origin-only rows (<=max_seeds_per_kf per core
    # KF) — measured populations sit at 1.5-3k across presets, well under
    # 4096.  The PROVABLE worst case ((core_n_kfs+1)*(C+seed_cap), ~5.2k
    # at accurate shapes) is only approachable if every core KF is
    # detector-dense, which only bootstrap frames are; paying for those
    # phantom rows every solve costs real ms.  Instead of truncating
    # arbitrarily on overflow, compaction is PRIORITIZED by observation
    # count: if the population ever exceeds the cap, the least-constrained
    # points are the ones left out of this solve (they keep their
    # positions and get optimized by structure-opt / later solves), never
    # a silent bias against well-tracked geometry.
    from rpg_svo_tpu.core.map import mask_compact_priority
    Pc = min(P, max_core_points)
    sel, selok = mask_compact_priority(p_valid, Pc, n_obs)
    obs_cam, obs_f, obs_level, obs_mask = _extract_observations_rows(
        kf, pt.obs_kf[sel], pt.obs_feat[sel], pt.obs_valid[sel],
        jnp.where(selok, pt.orig_kf[sel], -1), pt.orig_f[sel],
        pt.orig_level[sel])
    obs_mask = obs_mask & selok[:, None]

    prob = BAProblem(kf.R, kf.t, variable, pt.pos[sel], selok,
                     obs_cam, obs_f, obs_level, obs_mask)
    return prob, sel, selok, variable


@functools.partial(jax.jit, static_argnames=("n_iter", "core_n_kfs",
                                             "shard_axis",
                                             "max_core_points"))
def run_local_ba(m: MapState, new_kf_slot: jnp.ndarray,
                 huber_width_px: jnp.ndarray, reproj_thresh_px: jnp.ndarray,
                 fx: jnp.ndarray, n_iter: int = 10,
                 core_n_kfs: int = 3, shard_axis: str = "",
                 max_core_points: int = 4096) -> MapState:
    """Run local BA around `new_kf_slot`; returns the updated map."""
    kf = m.kf
    pt = m.pt
    P = pt.pos.shape[0]
    M = pt.obs_kf.shape[1]
    prob, sel, selok, variable = build_local_ba_problem(
        m, new_kf_slot, core_n_kfs, max_core_points)
    if shard_axis:
        # mesh mode: shard the point blocks of the Schur solve (the P-dim
        # einsums of ba/schur.py) over the seed/point-parallel axis; the
        # reduced camera system assembly becomes a psum placed by XLA
        from rpg_svo_tpu.parallel.gspmd import shard_dim0
        prob = prob._replace(
            p_w=shard_dim0(prob.p_w, shard_axis),
            p_valid=shard_dim0(prob.p_valid, shard_axis),
            obs_cam=shard_dim0(prob.obs_cam, shard_axis),
            obs_f=shard_dim0(prob.obs_f, shard_axis),
            obs_level=shard_dim0(prob.obs_level, shard_axis),
            obs_mask=shard_dim0(prob.obs_mask, shard_axis))
    # variable cams: new KF + core_n_kfs closest (bounded statically; the
    # reduced camera system is built over this compacted set, ba/schur.py)
    res = solve_ba(prob, n_iter=n_iter,
                   huber_width=huber_width_px / fx,
                   reproj_thresh_unitplane=reproj_thresh_px / fx,
                   n_var_max=core_n_kfs + 1)

    # --- write back (compacted rows -> pool rows) ------------------------
    kf = kf._replace(R=jnp.where(variable[:, None, None], res.R, kf.R),
                     t=jnp.where(variable[:, None], res.t, kf.t))
    # overflow-padded row scatters: invalid rows land in [P, P+128)
    # (odd-length scatter buffers are in the TPU fault class, CLAUDE.md)
    tgt = jnp.where(selok, sel, P)

    def scat(pool, vals):
        pad = jnp.zeros((128,) + pool.shape[1:], pool.dtype)
        return jnp.concatenate([pool, pad], 0).at[tgt].set(vals)[:P]

    pos = scat(pt.pos, res.p_w)
    # prune outlier observations (only the table part, not the origin col)
    ov_rows = pt.obs_valid[sel] & res.obs_inlier[:, :M]
    obs_valid = scat(pt.obs_valid, ov_rows)
    n_obs_after = jnp.sum(ov_rows, axis=1) \
        + (pt.orig_kf[sel] >= 0).astype(jnp.int32)
    starved = selok & (n_obs_after < 2) & (pt.ptype[sel] >= TYPE_UNKNOWN)
    ptype = scat(pt.ptype, jnp.where(starved, TYPE_DELETED,
                                     pt.ptype[sel]))
    pt = pt._replace(pos=pos, obs_valid=obs_valid, ptype=ptype)
    return m._replace(kf=kf, pt=pt)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def run_two_view_ba(m: MapState, slot_fixed: jnp.ndarray,
                    slot_var: jnp.ndarray,
                    huber_width: jnp.ndarray,
                    reproj_thresh_px: jnp.ndarray,
                    fx: jnp.ndarray, n_iter: int = 10) -> MapState:
    """ba::twoViewBA (bundle_adjustment.cpp:41-120): after bootstrap,
    frame 1 fixed, frame 2 + all triangulated points variable; points
    with any outlier edge (chi2 above the unit-plane threshold) are
    deleted entirely (safeDeletePoint semantics)."""
    kf = m.kf
    pt = m.pt
    K = kf.R.shape[0]
    variable = jnp.zeros((K,), bool).at[slot_var].set(True) & kf.active

    obs_cam, obs_f, obs_level, obs_mask = _extract_observations(m)
    on = lambda s: jnp.any(obs_mask & (obs_cam == s), axis=1)
    p_valid = (pt.ptype != TYPE_DELETED) & on(slot_fixed) & on(slot_var)

    prob = BAProblem(kf.R, kf.t, variable, pt.pos, p_valid,
                     obs_cam, obs_f, obs_level, obs_mask)
    res = solve_ba(prob, n_iter=n_iter,
                   huber_width=huber_width / fx,
                   reproj_thresh_unitplane=reproj_thresh_px / fx,
                   n_var_max=8)

    kf = kf._replace(R=jnp.where(variable[:, None, None], res.R, kf.R),
                     t=jnp.where(variable[:, None], res.t, kf.t))
    pos = jnp.where(p_valid[:, None], res.p_w, pt.pos)
    # any outlier edge kills the whole point (reference deletes the point)
    bad = p_valid & jnp.any(obs_mask & ~res.obs_inlier, axis=1)
    ptype = jnp.where(bad, TYPE_DELETED, pt.ptype)
    return m._replace(kf=kf, pt=pt._replace(pos=pos, ptype=ptype))


@functools.partial(jax.jit, static_argnames=("n_iter",))
def run_global_ba(m: MapState, huber_width_px: jnp.ndarray,
                  loba_thresh_px: jnp.ndarray,
                  poseoptim_thresh_px: jnp.ndarray,
                  fx: jnp.ndarray, n_iter: int = 10) -> MapState:
    """ba::globalBA (bundle_adjustment.cpp:253-343): every active
    keyframe and observed point is variable.  Observations whose CURRENT
    reprojection error already exceeds the pose-optimizer threshold are
    excluded up front and removed from the map (stale references after
    point merging); after the solve, observations with chi2 above the
    local-BA threshold are removed too (removePtFrameRef semantics)."""
    from rpg_svo_tpu.geometry.cameras import project2d
    kf = m.kf
    pt = m.pt
    K = kf.R.shape[0]
    M = pt.obs_kf.shape[1]
    variable = kf.active

    obs_cam, obs_f, obs_level, obs_mask = _extract_observations(m)
    # pre-filter: current reprojection error vs poseoptim threshold
    from rpg_svo_tpu.ba.schur import _apply_cams, obs_cam_onehot
    E_pre, _ = obs_cam_onehot(obs_cam, K)
    p_c = _apply_cams(kf.R, kf.t, E_pre, pt.pos)
    err = project2d(obs_f) - project2d(p_c)
    err2 = jnp.sum(err * err, axis=-1)
    thresh1 = (poseoptim_thresh_px / fx) ** 2
    stale = obs_mask & (err2 > thresh1)
    obs_mask = obs_mask & ~stale

    p_valid = (pt.ptype != TYPE_DELETED) & (jnp.sum(obs_mask, 1) >= 2)
    prob = BAProblem(kf.R, kf.t, variable, pt.pos, p_valid,
                     obs_cam, obs_f, obs_level, obs_mask)
    res = solve_ba(prob, n_iter=n_iter,
                   huber_width=huber_width_px / fx,
                   reproj_thresh_unitplane=loba_thresh_px / fx)

    kf = kf._replace(R=jnp.where(variable[:, None, None], res.R, kf.R),
                     t=jnp.where(variable[:, None], res.t, kf.t))
    pos = jnp.where(p_valid[:, None], res.p_w, pt.pos)
    # prune: stale obs + post-solve outliers (table part only)
    keep = ~stale[:, :M] & jnp.where(p_valid[:, None],
                                     res.obs_inlier[:, :M], True)
    pt = pt._replace(pos=pos, obs_valid=pt.obs_valid & keep)
    return m._replace(kf=kf, pt=pt)
