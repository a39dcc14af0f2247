"""Fully-fused VO step: the whole per-frame pipeline as ONE device program.

The host-driven pipeline (core/pipeline.py) mirrors the reference's
control flow with Python branching, which costs one host<->device
round-trip per stage — fatal for throughput when the device is remote.
This module compiles the ENTIRE per-frame update (pyramid, sparse
alignment, reprojection+matching, pose and structure refinement, quality
gates, keyframe policy, keyframe insertion, depth-filter update and seed
initialization, map-size cap, relocalization) into a single jitted
function with traced control flow:

- failure/keyframe/relocalization decisions are lax.cond / masked scatters
  (the reference's branches: frame_handler_mono.cpp:129-235, 237-265);
- tracking N frames is a host loop of async one-dispatch steps, or one
  lax.scan over an image stack (`vo_scan`) — zero host synchronization.

State is a single pytree `VOState` carrying the map pools and the last
frame, so the step is also the unit that vmaps across camera streams and
shards across device meshes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.config import Config
from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.pyramid import build_padded_pyramid, pyramid_shapes
from rpg_svo_tpu.ops.detector import cell_index, detect_features
from rpg_svo_tpu.ops.sparse_align import sparse_img_align
from rpg_svo_tpu.ops.pose_opt import optimize_pose
from rpg_svo_tpu.ops.interp import FlatPyramid
from rpg_svo_tpu.ops.robust import masked_median
from rpg_svo_tpu.ops.patches import extract_tiles, empty_tiles
from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid
from rpg_svo_tpu.core import map as svomap
from rpg_svo_tpu.core.map import MapState, TYPE_CANDIDATE, TYPE_UNKNOWN
from rpg_svo_tpu.core.reprojector import reproject_map
from rpg_svo_tpu.core import depth_filter as df

STAGE_DEFAULT = 0
STAGE_RELOC = 1


class VOState(NamedTuple):
    m: MapState
    # last frame (arrays only); the pyramid is carried as ONE padded
    # stack (ops/pallas_tiles.PaddedPyramid) — the layout every sampler
    # reads directly, so no per-step relayout of the reference frame
    pad: PaddedPyramid
    R: jnp.ndarray
    t: jnp.ndarray
    frame_id: jnp.ndarray
    feat_px: jnp.ndarray
    feat_f: jnp.ndarray
    feat_level: jnp.ndarray
    feat_point: jnp.ndarray
    feat_valid: jnp.ndarray
    stage: jnp.ndarray          # int32 STAGE_*
    num_obs_last: jnp.ndarray   # int32
    # True when a pass that can delete points ran after the last
    # scrub_dead_references (KF-frame local BA / delete_keyframe), so the
    # next step must scrub even if its own reprojection deleted nothing
    scrub_pending: jnp.ndarray  # bool


class StepOut(NamedTuple):
    n_matches: jnp.ndarray
    n_edges: jnp.ndarray
    is_keyframe: jnp.ndarray
    failed: jnp.ndarray
    stage: jnp.ndarray
    t_wc: jnp.ndarray           # (3,) camera position in world
    R_fw: jnp.ndarray           # (3, 3) rotation of T_f_w


def state_from_handler(fh) -> VOState:
    """Build a VOState from a host FrameHandler (after bootstrap)."""
    lf = fh.last_frame
    return VOState(
        m=fh.map, pad=lf.pad, R=lf.R, t=lf.t, frame_id=lf.frame_id,
        feat_px=lf.feat_px, feat_f=lf.feat_f, feat_level=lf.feat_level,
        feat_point=lf.feat_point, feat_valid=lf.feat_valid,
        stage=jnp.int32(STAGE_DEFAULT),
        num_obs_last=jnp.int32(fh.num_obs_last),
        scrub_pending=jnp.bool_(True))


def _vo_step(state: VOState, img: jnp.ndarray, cam, cfg: Config,
             ncx: int, ncy: int,
             img_shape: Tuple[int, int]) -> Tuple[VOState, StepOut]:
    """One fused tracking+mapping step (DEFAULT or RELOCALIZING stage)."""
    C = ncx * ncy
    # per-frame feature budget: the reference's maxFts cap
    # (reprojector.cpp:138) — every per-feature stage batches over F
    # slots instead of one per grid cell
    F = min(-(-C // 8) * 8, -(-cfg.max_fts // 128) * 128)
    n_levels = cfg.n_levels_total
    shapes = pyramid_shapes(img_shape, n_levels)
    # lay the pyramid out ONCE per frame: the padded stack feeds the
    # Pallas tile kernels directly, backs the strided flat sampler, is
    # what gets stored into the keyframe pool, and is carried in VOState
    # as next frame's alignment reference — no relayouts downstream.
    # Levels are produced IN the padded layout by MXU pair-averaging
    # matmuls (ops/pyramid.build_padded_pyramid); `pyr` views the stack.
    pad = build_padded_pyramid(img, n_levels)
    pyr = pad.levels()
    flat = pad.flat_view()
    # cfg.ablate: stages stubbed out at trace time, for device-time
    # attribution by differencing (tools_stage_timing.py). () in production.
    abl = frozenset(cfg.ablate)
    m = state.m
    P = m.pt.pos.shape[0]

    reloc = state.stage == STAGE_RELOC
    # --- choose alignment reference: last frame, or closest KF when
    # relocalizing (frame_handler_mono.cpp:237-265)
    kf_slot = svomap.closest_kf(m.kf, SE3(state.R, state.t).inverse().t)
    kf_slot = jnp.maximum(kf_slot, 0)

    def ref_from_kf(_):
        # keyframe rows hold up to C features (detector/bootstrap
        # density); compact the valid ones into the F-slot frame table
        kok = m.kf.feat_valid[kf_slot] & (m.kf.feat_point[kf_slot] >= 0)
        sel, sv = svomap.mask_compact(kok, F)
        return (m.kf.R[kf_slot], m.kf.t[kf_slot],
                m.kf.feat_px[kf_slot][sel], m.kf.feat_f[kf_slot][sel],
                m.kf.feat_point[kf_slot][sel], sv)

    def ref_from_last(_):
        return (state.R, state.t, state.feat_px, state.feat_f,
                state.feat_point,
                state.feat_valid & (state.feat_point >= 0))

    (ref_R, ref_t, ref_px, ref_f, ref_pid, ref_ok) = jax.lax.cond(
        reloc, ref_from_kf, ref_from_last, None)
    # the reference pyramid: last frame's carried stack, or (relocalizing
    # only) the closest keyframe's stored stack.  Both are already in the
    # padded layout; the cond's one output buffer is a single stack.
    ref_stack = jax.lax.cond(
        reloc,
        lambda _: m.kf.flat_pyr[kf_slot],
        lambda _: state.pad.stack, None)
    ref_pad = PaddedPyramid.from_stack(ref_stack, shapes)
    ref_pyr = ref_pad.levels()
    T_ref = SE3(ref_R, ref_t)
    pid_safe = jnp.clip(ref_pid, 0, P - 1)
    depth = jnp.linalg.norm(T_ref.apply(m.pt.pos[pid_safe]), axis=-1)
    ref_ok = ref_ok & (m.pt.ptype[pid_safe] != svomap.TYPE_DELETED)

    # --- sparse image alignment -----------------------------------------
    if "align" in abl:
        align = None
        T_cur = T_ref
        reloc_fail = jnp.bool_(False)
    else:
        align = sparse_img_align(
            ref_pyr, pyr, cam, SE3.identity(), ref_px, ref_f, depth, ref_ok,
            max_level=cfg.klt_max_level, min_level=cfg.klt_min_level,
            n_iter=cfg.img_align_n_iter, eps=cfg.img_align_eps, cur_pad=pad,
            ref_pad=ref_pad, unroll=cfg.img_align_unroll,
            robust=cfg.img_align_robust)
        T_cur = align.T_cur_ref * T_ref
        # relocalization gate: need > 30 tracked to accept the alignment
        reloc_fail = reloc & (align.n_tracked <= 30)

    # --- reprojection + matching ----------------------------------------
    if "reproject" in abl:
        from rpg_svo_tpu.core.reprojector import ReprojectResult
        nF = F - ref_px.shape[0]
        padF = lambda a, fill=0: jnp.concatenate(
            [a, jnp.full((nF,) + a.shape[1:], fill, a.dtype)]) \
            if nF > 0 else a[:F]
        rep = ReprojectResult(
            feat_px=padF(ref_px.astype(jnp.float32)),
            feat_level=padF(jnp.zeros((ref_px.shape[0],), jnp.int32)),
            feat_point=padF(ref_pid, -1),
            feat_valid=padF(ref_ok, False),
            feat_type=padF(jnp.zeros((ref_px.shape[0],), jnp.int32)),
            feat_grad=padF(jnp.zeros((ref_px.shape[0], 2), jnp.float32)),
            n_matches=jnp.sum(ref_ok).astype(jnp.int32),
            n_trials=jnp.int32(0))
    else:
        ptype_before = m.pt.ptype
        pt2, rep = reproject_map(m, flat, T_cur, cam, cfg.grid_size, ncx,
                                 ncy, max_level=cfg.n_pyr_levels - 1,
                                 cur_pad=pad, max_fts=F,
                                 attempt_factor=cfg.reproj_attempt_factor)
        m = m._replace(pt=pt2)
        # scrub only when something was actually deleted since the last
        # scrub (this frame's candidate pruning, or a pending KF-frame
        # local-BA / delete_keyframe pass): the kf-table part of the
        # scrub is a (K*F,)-row ptype gather every frame otherwise.
        # Invariant (core/map.py): scrub must land between any point
        # deletion and the next alloc_points — apply_seed_update below is
        # the only allocation site in this step.
        need_scrub = state.scrub_pending \
            | jnp.any(pt2.ptype != ptype_before)

        def do_scrub(_):
            ms = svomap.scrub_dead_references(m)
            return ms.kf.feat_valid, ms.kf.feat_point, ms.pt.obs_valid

        def no_scrub(_):
            return m.kf.feat_valid, m.kf.feat_point, m.pt.obs_valid

        sfv, sfp, sov = jax.lax.cond(need_scrub, do_scrub, no_scrub, None)
        m = m._replace(kf=m.kf._replace(feat_valid=sfv, feat_point=sfp),
                       pt=m.pt._replace(obs_valid=sov))
    enough = rep.n_matches >= cfg.quality_min_fts

    # --- pose optimization -----------------------------------------------
    feat_f = cam.cam2world(rep.feat_px)
    pid = jnp.clip(rep.feat_point, 0, P - 1)
    if "pose" in abl:
        from rpg_svo_tpu.ops.pose_opt import PoseOptResult
        pres = PoseOptResult(
            T_cur, jnp.eye(6), rep.feat_valid & enough,
            rep.n_matches.astype(jnp.int32), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(1.0))
    else:
        pres = optimize_pose(
            T_cur, m.pt.pos[pid], feat_f, rep.feat_level,
            rep.feat_valid & enough, cam.fx,
            reproj_thresh=cfg.poseoptim_thresh,
            n_iter=cfg.poseoptim_num_iter)
    enough_edges = pres.n_obs >= 20

    # --- quality gates (frame_handler_base.cpp:157-171) ------------------
    insufficient = pres.n_obs < cfg.quality_min_fts
    dropped = (state.num_obs_last - pres.n_obs) > cfg.quality_max_drop_fts
    failed = reloc_fail | (~enough) | (~enough_edges) | insufficient

    T_out = jax.tree.map(
        lambda a, b: jnp.where(failed, a, b),
        SE3(state.R, state.t), pres.T_f_w)
    feat_valid = pres.inliers & (~failed)

    frame_like = _FrameView(
        T_out, state.frame_id + 1, rep.feat_px, feat_f, rep.feat_level,
        jnp.where(feat_valid, rep.feat_point, -1), feat_valid)

    # --- structure optimization (skipped on failure via masks) ----------
    if "struct" not in abl:
        m = _structure_opt_fused(m, frame_like, cfg.structureoptim_max_pts,
                                 cfg.structureoptim_num_iter, ~failed)

    # --- scene depth + keyframe policy -----------------------------------
    p_feat = T_out.apply(m.pt.pos[pid])
    z = p_feat[..., 2]
    zok = feat_valid & (z > 0)
    depth_mean = masked_median(z, zok, default=1.0)
    depth_min_ = jnp.min(jnp.where(zok, z, jnp.inf))
    depth_min_ = jnp.where(jnp.isfinite(depth_min_), depth_min_,
                           depth_mean)
    overlap = svomap.overlapping_kfs(m.kf, T_out, cam)
    relpos = T_out.apply(svomap.kf_positions(m.kf))
    near = (jnp.abs(relpos[:, 0]) / depth_mean < cfg.kfselect_mindist) \
        & (jnp.abs(relpos[:, 1]) / depth_mean < cfg.kfselect_mindist * 0.8) \
        & (jnp.abs(relpos[:, 2]) / depth_mean < cfg.kfselect_mindist * 1.3)
    need_kf = ~jnp.any(overlap & near)
    is_kf = (~failed) & need_kf & (~dropped)
    if "kf" in abl:
        # constant-false predicate: XLA folds every is_kf cond/scatter away
        is_kf = jnp.bool_(False)

    # --- depth filter: update all seeds against this frame ---------------
    # (every df_update_every-th frame; keyframe frames always update —
    # the reference's queue-drop behavior, depth_filter.cpp:82-97).
    # The cond carries only (seed, pt): big read-only state (the keyframe
    # pyramid pool) enters as an operand but is NOT an output, so skipping
    # frames never copies it.
    # skip frames are gated by a MASK (exact no-op), not a lax.cond: the
    # update's cost is already data-dependent (the Pallas scan walks only
    # live segments), and the Pallas kernels misbehaved under a cond
    if cfg.df_update_every > 1:
        due = ((frame_like.frame_id % cfg.df_update_every) == 0) | is_kf
    else:
        due = jnp.bool_(True)
    if "df" not in abl:
        mm = m

        def do_update(_):
            # the whole field update (visibility, epipolar match, tau,
            # Bayesian update) — its outputs are S-sized field deltas
            # (~100 KB), cheap as cond outputs; the pools stay outside
            return df.update_seeds_fields(
                mm, flat, T_out, cam, max_n_kfs=cfg.df_max_kf_age,
                conv_thresh=cfg.seed_convergence_sigma2_thresh,
                max_steps=cfg.epi_max_steps, update_k=cfg.df_update_k,
                cur_pad=pad, enable=True,
                short_steps=cfg.epi_short_steps, long_k=cfg.epi_long_k,
                max_level=cfg.n_pyr_levels - 1,
                shard_axis=cfg.shard_axis,
                scan_rows=cfg.epi_scan_rows)

        # gate on actual work, not just cadence: with every seed
        # converged (long stretches of steady-state tracking) the
        # K-compacted scan is a full-cost no-op — its shapes are static
        due_work = due & df.has_update_work(mm, T_out, cam,
                                            max_n_kfs=cfg.df_max_kf_age)
        upd = jax.lax.cond(
            due_work, do_update,
            lambda _: df.identity_seed_update(mm.seed), None)
        m = df.apply_seed_update(m, upd)

    # --- keyframe insertion ------------------------------------------------
    # All pool mutations are masked scatters gated on is_kf (an exact no-op
    # otherwise) rather than a lax.cond over the MapState: a cond's outputs
    # are fresh buffers, which forced a copy of the keyframe pyramid pool
    # (hundreds of MB/s of pure data movement) every single frame.  Only
    # feature DETECTION (big compute, tiny outputs) and local BA run under
    # conds.
    kf_depth = jnp.linalg.norm(T_out.apply(m.pt.pos[pid]), axis=-1)
    # creation-time feature tiles (ops/patches.py), extracted only on
    # keyframe frames (cond outputs are small: C tiles)
    ftile, fxy0 = jax.lax.cond(
        is_kf,
        lambda _: extract_tiles(pad,
                                rep.feat_px, rep.feat_level),
        lambda _: empty_tiles(F), None)
    # pad the F-slot frame table to the keyframe row capacity (C slots:
    # bootstrap/first-frame rows are detector-dense) with invalid slots
    padC = lambda a, fill: a if a.shape[0] == C else jnp.concatenate(
        [a, jnp.full((C - a.shape[0],) + a.shape[1:], fill, a.dtype)])
    m2, slot = svomap.add_keyframe(
        m, pad.stack, T_out, frame_like.frame_id,
        padC(rep.feat_px, 0), padC(feat_f, 0), padC(rep.feat_level, 0),
        padC(frame_like.feat_point, -1), padC(feat_valid, False),
        padC(kf_depth, 1.0),
        feat_type=padC(rep.feat_type, 0),
        feat_grad=padC(rep.feat_grad, 0), enable=is_kf,
        feat_tile=padC(ftile, 0), feat_tile_xy0=padC(fxy0, -1))
    # observation binding + candidate promotion under the is_kf cond:
    # the (pid, slot) 2-axis scatters cost ~0.05 ms/frame run masked
    # every frame, while the cond-boundary copy of the obs table +
    # ptype (~2.6 MB) is bandwidth-priced (~4 us)
    def do_bind(_):
        ptb = svomap.add_point_observations(
            m2.pt, frame_like.feat_point,
            jnp.full((F,), slot, jnp.int32),
            jnp.arange(F, dtype=jnp.int32), feat_valid)
        hit = jnp.zeros((P,), bool).at[pid].set(
            feat_valid & (frame_like.feat_point >= 0))
        ptyb = jnp.where(hit & (ptb.ptype == TYPE_CANDIDATE),
                         TYPE_UNKNOWN, ptb.ptype)
        return ptb.obs_kf, ptb.obs_feat, ptb.obs_valid, ptyb

    okf_n, ofe_n, ova_n, pty_n = jax.lax.cond(
        is_kf, do_bind,
        lambda _: (m2.pt.obs_kf, m2.pt.obs_feat, m2.pt.obs_valid,
                   m2.pt.ptype), None)
    m2 = m2._replace(pt=m2.pt._replace(
        obs_kf=okf_n, obs_feat=ofe_n, obs_valid=ova_n, ptype=pty_n))
    if cfg.loba_num_iter > 0:
        from rpg_svo_tpu.core.local_ba import run_local_ba

        def do_loba(_):
            mb = run_local_ba(
                m2, slot, jnp.float32(cfg.loba_robust_huber_width),
                jnp.float32(cfg.loba_thresh), cam.fx,
                n_iter=cfg.loba_num_iter, core_n_kfs=cfg.core_n_kfs,
                shard_axis=cfg.shard_axis)
            return mb.kf.R, mb.kf.t, mb.pt.pos, mb.pt.ptype, mb.pt.obs_valid

        def no_loba(_):
            return (m2.kf.R, m2.kf.t, m2.pt.pos, m2.pt.ptype,
                    m2.pt.obs_valid)

        Rk, tk, ppos, pty, pobs = jax.lax.cond(is_kf, do_loba, no_loba,
                                               None)
        m2 = m2._replace(kf=m2.kf._replace(R=Rk, t=tk),
                         pt=m2.pt._replace(pos=ppos, ptype=pty,
                                           obs_valid=pobs))
    occupied = jnp.zeros((C,), bool).at[
        cell_index(rep.feat_px, cfg.grid_size, ncx, ncy)].max(feat_valid)

    nD = min(C, cfg.max_seeds_per_kf)

    def do_detect(_):
        # detection runs on the first n_pyr_levels levels only (ref:
        # FastDetector gets Config::nPyrLevels()=3, frame_handler_mono.
        # cpp:46) — the deeper levels exist for the coarse alignment.
        # Detections compact from the C-cell table to nD rows BEFORE
        # tile extraction: the seed-init scatters below run EVERY frame
        # (masked), and their cost scales with rows.
        det = detect_features(pyr[:cfg.n_pyr_levels], occupied,
                              cfg.grid_size)
        good = det["valid"] & (det["score"] > cfg.triang_min_corner_score)
        sel, ok = svomap.mask_compact(good, nD)
        px = det["px"][sel]
        level = det["level"][sel]
        tile, txy0 = extract_tiles(pad, px, level)
        return px, det["score"][sel], level, ok, tile, txy0

    def no_detect(_):
        tile, txy0 = empty_tiles(nD)
        return (jnp.zeros((nD, 2), jnp.float32),
                jnp.zeros((nD,), jnp.float32),
                jnp.zeros((nD,), jnp.int32),
                jnp.zeros((nD,), bool), tile, txy0)

    dpx, dscore, dlevel, dvalid, dtile, dtxy0 = jax.lax.cond(
        is_kf, do_detect, no_detect, None)
    # seed allocation under the is_kf cond: the ~17 masked pool scatters
    # cost 0.114 ms/frame when run unconditionally, while carrying the
    # seed store (≈5 MB incl. the tile pool) through the cond outputs is
    # a ~10 µs bandwidth-priced copy.  (The df UPDATE cond above still
    # returns field deltas only — its operand set spans far more state.)
    def do_seed_init(_):
        mi = df.init_seeds_from_detection(
            m2, slot, {"px": dpx, "score": dscore, "level": dlevel,
                       "valid": dvalid, "tile": dtile,
                       "tile_xy0": dtxy0},
            cam, depth_mean, 0.5 * depth_min_,
            min_score=cfg.triang_min_corner_score, enable=True)
        return mi.seed, mi.kf_counter

    seed_new, kfc_new = jax.lax.cond(
        is_kf, do_seed_init, lambda _: (m2.seed, m2.kf_counter), None)
    m2 = m2._replace(seed=seed_new, kf_counter=kfc_new)
    # map cap: drop the furthest KF (but never the one just added)
    if cfg.max_n_kfs > 2:
        over = svomap.n_active_kfs(m2) > cfg.max_n_kfs
        far = svomap.furthest_kf(m2.kf, T_out.inverse().t)
        drop = jnp.where(is_kf & over & (far != slot), far, -1)
        m2 = svomap.delete_keyframe(m2, drop)
    m = m2

    # --- stage transition -------------------------------------------------
    # DEFAULT + failure -> RELOC; RELOC + success -> DEFAULT
    new_stage = jnp.where(failed, STAGE_RELOC, STAGE_DEFAULT)
    num_obs = jnp.where(failed, state.num_obs_last, pres.n_obs)

    new_state = VOState(
        m=m, pad=pad, R=T_out.R, t=T_out.t,
        frame_id=frame_like.frame_id,
        feat_px=rep.feat_px, feat_f=feat_f, feat_level=rep.feat_level,
        feat_point=frame_like.feat_point, feat_valid=feat_valid,
        stage=jnp.int32(new_stage),
        num_obs_last=num_obs.astype(jnp.int32),
        # KF frames may delete points late in the step (local BA pruning,
        # map-cap delete_keyframe) — force a scrub next step
        scrub_pending=jnp.asarray(is_kf, bool))
    T_wc = T_out.inverse()
    out = StepOut(rep.n_matches, pres.n_obs,
                  is_kf, failed, new_stage,
                  T_wc.t, T_out.R)
    return new_state, out


# public entry points: `vo_step` keeps the input state alive (safe for
# callers that reuse states, e.g. tests); `vo_step_donated` donates it so
# XLA updates the map pools in place — the throughput path (bench,
# pipeline): without donation every step pays a full copy of every
# updated pool buffer.
vo_step = functools.partial(jax.jit, static_argnames=(
    "cfg", "ncx", "ncy", "img_shape"))(_vo_step)
vo_step_donated = functools.partial(jax.jit, static_argnames=(
    "cfg", "ncx", "ncy", "img_shape"), donate_argnums=(0,))(_vo_step)


class _FrameView(NamedTuple):
    T: SE3
    frame_id: jnp.ndarray
    feat_px: jnp.ndarray
    feat_f: jnp.ndarray
    feat_level: jnp.ndarray
    feat_point: jnp.ndarray
    feat_valid: jnp.ndarray


def _structure_opt_fused(m: MapState, fv: _FrameView, n_opt: int,
                         n_iter: int, enabled) -> MapState:
    """optimizeStructure with an enable mask (fused-step variant)."""
    from rpg_svo_tpu.ops.point_opt import optimize_points
    pt = m.pt
    pid = fv.feat_point
    ok = fv.feat_valid & (pid >= 0) & enabled
    pid_safe = jnp.clip(pid, 0, pt.pos.shape[0] - 1)
    age = jnp.where(ok, pt.last_optim[pid_safe], jnp.iinfo(jnp.int32).max)
    # top-k oldest (smallest last_optim) — cheaper than a full argsort
    _, order = jax.lax.top_k(-age, n_opt)
    sel = pid_safe[order]
    sel_ok = ok[order]
    kfs = jnp.clip(pt.obs_kf[sel], 0, m.kf.R.shape[0] - 1)
    Ff = m.kf.feat_f.shape[1]
    fts = jnp.clip(pt.obs_feat[sel], 0, Ff - 1)
    obs_R = m.kf.R[kfs]
    obs_t = m.kf.t[kfs]
    # flat row index: 2-axis gathers are the ~20x-slower class (CLAUDE.md)
    obs_f = m.kf.feat_f.reshape(-1, 3)[kfs * Ff + fts]
    obs_ok = pt.obs_valid[sel]
    okf = jnp.clip(pt.orig_kf[sel], 0, m.kf.R.shape[0] - 1)
    obs_R = jnp.concatenate([obs_R, m.kf.R[okf][:, None]], axis=1)
    obs_t = jnp.concatenate([obs_t, m.kf.t[okf][:, None]], axis=1)
    obs_f = jnp.concatenate([obs_f, pt.orig_f[sel][:, None]], axis=1)
    obs_ok = jnp.concatenate([obs_ok, (pt.orig_kf[sel] >= 0)[:, None]],
                             axis=1)
    can = sel_ok & (jnp.sum(obs_ok, 1) >= 2)
    p_new, _ = optimize_points(pt.pos[sel], obs_R, obs_t, obs_f, obs_ok,
                               can, n_iter=n_iter)
    pos = pt.pos.at[sel].set(jnp.where(can[:, None], p_new, pt.pos[sel]))
    last = pt.last_optim.at[sel].set(
        jnp.where(can, fv.frame_id, pt.last_optim[sel]))
    return m._replace(pt=pt._replace(pos=pos, last_optim=last))


def _vo_scan(state: VOState, imgs: jnp.ndarray, cam, cfg: Config,
             ncx: int, ncy: int, img_shape: Tuple[int, int]):
    """Track a whole image stack (T, H, W) in ONE device program."""
    def step(s, img):
        return _vo_step(s, img, cam, cfg, ncx, ncy, img_shape)
    return jax.lax.scan(step, state, imgs)


vo_scan = functools.partial(jax.jit, static_argnames=(
    "cfg", "ncx", "ncy", "img_shape"))(_vo_scan)
vo_scan_donated = functools.partial(jax.jit, static_argnames=(
    "cfg", "ncx", "ncy", "img_shape"), donate_argnums=(0,))(_vo_scan)
