"""Map reprojection: project points into the frame, match one per cell.

TPU-native equivalent of Reprojector (svo/src/reprojector.cpp:40-220).
Reference behavior reproduced with batched semantics:

- every map point (incl. depth-filter candidates) projects into the frame;
  out-of-frame candidate projections cost n_fail += 3, > 30 deletes the
  candidate (reprojector.cpp:107-127);
- grid cells of `grid_size` px each try ONE point, preferring
  GOOD > UNKNOWN > CANDIDATE (pointQualityComparator, :146-149) — selection
  here is a segment-max over cell ids instead of per-cell sorted lists;
- the reference feature-aligns cell-by-cell in shuffled order and stops at
  max_fts matches; here ALL selected cells align in one batched
  find_match_direct (matches are capped only by the cell count — on TPU the
  extra matches are ~free and only help accuracy);
- match bookkeeping: n_succ/n_fail counters, UNKNOWN deleted at
  n_fail > 15, CANDIDATE at > 30, UNKNOWN promoted to GOOD at
  n_succ > 10 (:129-180);
- the reference observation for warping is the point's closest-view
  observation (Point::getCloseViewObs, 60 deg cutoff) with the seed origin
  observation as fallback.

The pass is organized as composable stages mirroring the reference's
trace boundaries (frame_handler_base.cpp:51-57): point projection + grid
selection (its ``reproject_kfs`` timer), candidate bookkeeping
(``reproject_candidates``) and the batched per-cell matcher
(``feature_align``).  ``reproject_map`` composes all three inside one jit
(the fused step's single-program path); the host pipeline calls the
staged jits individually so each trace column gets an honest sync
boundary.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.interp import FlatPyramid
from rpg_svo_tpu.ops.matcher import find_match_direct_tiles
from rpg_svo_tpu.core.map import (
    MapState, TYPE_DELETED, TYPE_CANDIDATE, TYPE_UNKNOWN, TYPE_GOOD,
    kf_positions,
)


class ReprojectResult(NamedTuple):
    # frame feature table, one slot per grid cell
    feat_px: jnp.ndarray       # (C, 2) matched level-0 px
    feat_level: jnp.ndarray    # (C,)
    feat_point: jnp.ndarray    # (C,) point id
    feat_valid: jnp.ndarray    # (C,) match success
    feat_type: jnp.ndarray     # (C,) FEATURE_* (from the ref observation)
    feat_grad: jnp.ndarray     # (C, 2) warped gradient dir (edgelets)
    n_matches: jnp.ndarray     # scalar
    n_trials: jnp.ndarray      # scalar


def attempt_budget(C: int, max_fts: int,
                   factor: float = 2.0) -> int:
    """Static attempt count A: the reference attempts cells until maxFts
    MATCHES succeed (reprojector.cpp:195-201), so attempts > maxFts when
    matching is hard.  Statically: best max(factor*maxFts, 256) cells
    (factor 2.0 covers a 50% match failure rate; steady-state success
    is ~90%, so 1.5 is usually enough — a Config knob via
    reproj_attempt_factor)."""
    if max_fts and max_fts < C:
        return min(C, -(-max(int(factor * max_fts), 256) // 8) * 8)
    return C


def project_points(pt, T_cur: SE3, cam):
    """Project the whole point pool; visibility mask (reprojectMap's
    per-point projection, the ``reproject_kfs`` work)."""
    p_cur = T_cur.apply(pt.pos)
    px = cam.world2cam(p_cur)
    vis0 = pt.active & (p_cur[..., 2] > 0.0) \
        & cam.is_in_frame(px, boundary=8.0)
    return px, vis0


def candidate_bookkeeping(pt, vis0):
    """Candidates that fail to project: n_fail += 3, delete > 30
    (reprojectMap's candidate pass, the ``reproject_candidates`` work)."""
    cand_miss = pt.active & (pt.ptype == TYPE_CANDIDATE) & ~vis0
    n_fail = pt.n_fail + jnp.where(cand_miss, 3, 0)
    ptype = jnp.where((pt.ptype == TYPE_CANDIDATE) & (n_fail > 30),
                      TYPE_DELETED, pt.ptype)
    visible = vis0 & (ptype != TYPE_DELETED)
    return n_fail, ptype, visible


def grid_select(px, visible, ptype, grid_size: int, ncx: int, ncy: int,
                max_fts: int, attempt_factor: float = 2.0):
    """Per-cell best point by quality + the shuffled attempt budget."""
    P = px.shape[0]
    C = ncx * ncy
    cx = jnp.clip((px[:, 0] // grid_size).astype(jnp.int32), 0, ncx - 1)
    cy = jnp.clip((px[:, 1] // grid_size).astype(jnp.int32), 0, ncy - 1)
    cell = cy * ncx + cx
    comp = jnp.where(visible, ptype * P + jnp.arange(P, dtype=jnp.int32),
                     -1)
    best = jax.ops.segment_max(comp, cell, num_segments=C)
    has = best >= 0
    sel_pt = jnp.where(has, best % P, 0)            # (C,) selected point id

    A = attempt_budget(C, max_fts, attempt_factor)
    if A < C:
        import numpy as _np
        perm = jnp.asarray(_np.random.default_rng(0).permutation(C)
                           .astype(_np.int32))
        tier = jnp.clip(best // P, 0, 3)
        key = jnp.where(has, tier * C + perm, -1)
        _, cell_sel = jax.lax.top_k(key, A)
        has = has[cell_sel]
        sel_pt = sel_pt[cell_sel]
    return has, sel_pt


def match_cells(m: MapState, cur_pyr: FlatPyramid, T_cur: SE3, cam,
                n_fail, ptype, has, sel_pt,
                max_level: int, cur_pad, max_fts: int):
    """Closest-view reference observation + batched direct matching +
    counters/promotions (the reference's reprojectCell loop — its
    ``feature_align`` timer).  Returns (PointStore, ReprojectResult)."""
    pt = m.pt

    # ---- reference observation: closest view among obs + origin --------
    sel_pos = pt.pos[sel_pt]                                   # (C, 3)
    cam_pos_w = T_cur.inverse().t
    dir_cur = sel_pos - cam_pos_w
    dir_cur = dir_cur / jnp.maximum(
        jnp.linalg.norm(dir_cur, axis=-1, keepdims=True), 1e-12)
    obs_kf = pt.obs_kf[sel_pt]                                  # (C, M)
    obs_feat = pt.obs_feat[sel_pt]
    obs_ok = pt.obs_valid[sel_pt]
    kf_pos = kf_positions(m.kf)                                 # (K, 3)
    obs_kf_safe = jnp.clip(obs_kf, 0, kf_pos.shape[0] - 1)
    dir_obs = sel_pos[:, None, :] - kf_pos[obs_kf_safe]         # (C, M, 3)
    dir_obs = dir_obs / jnp.maximum(
        jnp.linalg.norm(dir_obs, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.sum(dir_obs * dir_cur[:, None, :], axis=-1)
    cosang = jnp.where(obs_ok, cosang, -jnp.inf)
    # origin observation as an extra column
    orig_kf = pt.orig_kf[sel_pt]
    orig_ok = orig_kf >= 0
    okf_safe = jnp.clip(orig_kf, 0, kf_pos.shape[0] - 1)
    dir_orig = sel_pos - kf_pos[okf_safe]
    dir_orig = dir_orig / jnp.maximum(
        jnp.linalg.norm(dir_orig, axis=-1, keepdims=True), 1e-12)
    cos_orig = jnp.where(orig_ok,
                         jnp.sum(dir_orig * dir_cur, -1), -jnp.inf)
    all_cos = jnp.concatenate([cosang, cos_orig[:, None]], axis=1)
    best_obs = jnp.argmax(all_cos, axis=1)                      # (C,)
    best_cos = jnp.max(all_cos, axis=1)
    M = obs_kf.shape[1]
    use_orig = best_obs == M
    bo = jnp.clip(best_obs, 0, M - 1)
    take = lambda a: jnp.take_along_axis(a, bo[:, None], axis=1)[:, 0]
    ref_kf = jnp.where(use_orig, orig_kf, take(obs_kf))
    ref_feat = take(obs_feat)
    kf_safe = jnp.clip(ref_kf, 0, kf_pos.shape[0] - 1)
    ft_safe = jnp.clip(ref_feat, 0, m.kf.feat_px.shape[1] - 1)
    # NOTE on gather form: these five lookups read only A(~512) rows, so
    # the flat-row trick (reshape to (K*F, .)) LOSES here — the non-
    # multiple-of-8 C-column tables pay a full relayout copy (measured
    # 0.013 -> 0.059 ms on feat_px) that dwarfs the 2-axis gather cost
    # at this row count.  local_ba's extraction (70k rows) is where the
    # flat form wins.  Keep 2-axis gathers for the small lookups.
    Kk, Ff = m.kf.feat_tile.shape[:2]
    ref_px = jnp.where(use_orig[:, None], pt.orig_px[sel_pt],
                       m.kf.feat_px[kf_safe, ft_safe])
    ref_f = jnp.where(use_orig[:, None], pt.orig_f[sel_pt],
                      m.kf.feat_f[kf_safe, ft_safe])
    ref_level = jnp.where(use_orig, pt.orig_level[sel_pt],
                          m.kf.feat_level[kf_safe, ft_safe])
    ref_type = jnp.where(use_orig, pt.orig_type[sel_pt],
                         m.kf.feat_type[kf_safe, ft_safe])
    ref_grad = jnp.where(use_orig[:, None], pt.orig_grad[sel_pt],
                         m.kf.feat_grad[kf_safe, ft_safe])
    # creation-time tiles of the chosen observation (no pyramid reads);
    # the tile pool's F axis IS padded to a multiple of 8 — flat rows
    row = kf_safe * Ff + ft_safe
    kf_tile_rows = m.kf.feat_tile.reshape(Kk * Ff, *m.kf.feat_tile.shape[2:])
    kf_xy0_rows = m.kf.feat_tile_xy0.reshape(Kk * Ff, 2)
    ref_tile = jnp.where(use_orig[:, None], pt.orig_tile[sel_pt],
                         kf_tile_rows[row])
    ref_xy0 = jnp.where(use_orig[:, None], pt.orig_tile_xy0[sel_pt],
                        kf_xy0_rows[row])
    # 60 deg cutoff (point.cpp:97-117)
    view_ok = best_cos > 0.5
    attempt = has & view_ok & (ref_kf >= 0)

    # ---- batched direct matching ---------------------------------------
    T_kf_w = SE3(m.kf.R[kf_safe], m.kf.t[kf_safe])
    T_cur_ref = T_cur * T_kf_w.inverse()
    p_ref = T_kf_w.apply(sel_pos)
    depth_ref = jnp.linalg.norm(p_ref, axis=-1)
    px_init = cam.world2cam(T_cur.apply(sel_pos))
    match = find_match_direct_tiles(
        cur_pyr, ref_tile, ref_xy0, cam, T_cur_ref, ref_px, ref_f,
        ref_level, depth_ref, px_init, attempt, max_level=max_level,
        ftr_type=ref_type, ftr_grad=ref_grad, cur_pad=cur_pad)
    success = attempt & match.success \
        & cam.is_in_frame(match.px_cur, boundary=2.0)

    # ---- counters / promotions (scattered back to the point pool) ------
    n_succ = pt.n_succ.at[sel_pt].add(jnp.where(success, 1, 0))
    n_fail = n_fail.at[sel_pt].add(jnp.where(attempt & ~success, 1, 0))
    ptype = jnp.where((ptype == TYPE_UNKNOWN) & (n_fail > 15),
                      TYPE_DELETED, ptype)
    ptype = jnp.where((ptype == TYPE_CANDIDATE) & (n_fail > 30),
                      TYPE_DELETED, ptype)
    ptype = jnp.where((ptype == TYPE_UNKNOWN) & (n_succ > 10),
                      TYPE_GOOD, ptype)
    success = success & (ptype[sel_pt] != TYPE_DELETED)

    pt = pt._replace(n_succ=n_succ, n_fail=n_fail, ptype=ptype)
    A = has.shape[0]
    if max_fts and max_fts < A:
        # keep the first max_fts successes (attempt order = quality tier
        # then shuffled cells, like the reference's loop that stops at
        # maxFts matches)
        from rpg_svo_tpu.core.map import mask_compact
        fsel, fok = mask_compact(success, max_fts)
        res = ReprojectResult(
            feat_px=match.px_cur[fsel],
            feat_level=match.level_cur[fsel],
            feat_point=jnp.where(fok, sel_pt[fsel], -1),
            feat_valid=fok,
            feat_type=ref_type[fsel],
            feat_grad=match.grad_cur[fsel],
            n_matches=jnp.sum(fok).astype(jnp.int32),
            n_trials=jnp.sum(attempt).astype(jnp.int32),
        )
        return pt, res
    res = ReprojectResult(
        feat_px=match.px_cur,
        feat_level=match.level_cur,
        feat_point=jnp.where(success, sel_pt, -1),
        feat_valid=success,
        feat_type=ref_type,
        feat_grad=match.grad_cur,
        n_matches=jnp.sum(success).astype(jnp.int32),
        n_trials=jnp.sum(attempt).astype(jnp.int32),
    )
    return pt, res


@functools.partial(jax.jit, static_argnames=("grid_size", "ncx", "ncy",
                                             "max_level", "max_fts",
                                             "attempt_factor"))
def reproject_map(m: MapState, cur_pyr: FlatPyramid, T_cur: SE3, cam,
                  grid_size: int, ncx: int, ncy: int,
                  max_level: int = 4, cur_pad=None, max_fts: int = 0,
                  attempt_factor: float = 2.0):
    """Returns (PointStore with updated counters/types, ReprojectResult).

    max_fts > 0 caps the match attempts at that many cells (the
    reference's maxFts budget, reprojector.cpp:138,195-201): cells are
    ranked by their best candidate's quality (GOOD > UNKNOWN > CANDIDATE,
    pointQualityComparator) with a fixed shuffled order breaking ties —
    the reference's shuffled cell iteration (reprojector.cpp:44-55).
    All downstream per-feature work then batches over max_fts slots
    instead of every grid cell."""
    px, vis0 = project_points(m.pt, T_cur, cam)
    n_fail, ptype, visible = candidate_bookkeeping(m.pt, vis0)
    has, sel_pt = grid_select(px, visible, ptype, grid_size, ncx, ncy,
                              max_fts, attempt_factor)
    return match_cells(m, cur_pyr, T_cur, cam, n_fail, ptype, has,
                       sel_pt, max_level, cur_pad, max_fts)


# staged jits for the host pipeline's per-stage trace timers
project_points_jit = jax.jit(project_points)
candidate_bookkeeping_jit = jax.jit(candidate_bookkeeping)
grid_select_jit = functools.partial(
    jax.jit, static_argnames=("grid_size", "ncx", "ncy", "max_fts",
                              "attempt_factor"))(grid_select)
match_cells_jit = functools.partial(
    jax.jit, static_argnames=("max_level", "max_fts"))(match_cells)
