"""The VO pipeline driver: stage machine + per-frame device programs.

TPU-native equivalent of FrameHandlerMono / FrameHandlerBase
(svo/src/frame_handler_mono.cpp, frame_handler_base.cpp).  The per-frame
sequential control (stages, keyframe policy, failure handling,
relocalization) runs in host Python exactly mirroring the reference's
state machine; all array math inside each stage is jitted.  The
reference's tracking/mapping thread split becomes synchronous batched
seed updates (the mapping work is one device program, so there is nothing
to hide on a second CPU thread).

Stages (frame_handler_base.h:45-51): PAUSED, FIRST_FRAME, SECOND_FRAME,
DEFAULT_FRAME, RELOCALIZING.  Tracking quality (frame_handler_base.cpp:
157-171): INSUFFICIENT when matches < quality_min_fts, BAD when the
match count dropped by more than quality_max_drop_fts.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.config import Config
from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.pyramid import pyramid_shapes
from rpg_svo_tpu.ops.detector import grid_dims, detect_features, cell_index
from rpg_svo_tpu.ops.sparse_align import sparse_img_align
from rpg_svo_tpu.ops.pose_opt import optimize_pose
from rpg_svo_tpu.ops.point_opt import optimize_points
from rpg_svo_tpu.core.frame import FrameState, make_frame, scene_depth
from rpg_svo_tpu.core import map as svomap
from rpg_svo_tpu.core.map import MapState, TYPE_UNKNOWN, TYPE_CANDIDATE
from rpg_svo_tpu.core.reprojector import reproject_map
from rpg_svo_tpu.core import depth_filter as df
from rpg_svo_tpu.core import initialization as init_mod
from rpg_svo_tpu.ops.patches import extract_tiles
from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid

# stages
STAGE_PAUSED = "paused"
STAGE_FIRST_FRAME = "first"
STAGE_SECOND_FRAME = "second"
STAGE_DEFAULT_FRAME = "default"
STAGE_RELOCALIZING = "relocalizing"

# results
RESULT_NO_KEYFRAME = "no_keyframe"
RESULT_IS_KEYFRAME = "keyframe"
RESULT_FAILURE = "failure"

QUALITY_GOOD = "good"
QUALITY_BAD = "bad"
QUALITY_INSUFFICIENT = "insufficient"


class _StageTimer:
    """Wall-clock per-stage timers with the reference's SVO_TRACE names
    (frame_handler_base.cpp:46-74).  Stage boundaries block on the
    stage's outputs — the host pipeline already syncs per stage through
    its int()/float() scalar reads, so the extra blocking is ~free and
    the recorded times are honest device+dispatch costs."""

    def __init__(self, info: dict):
        self.info = info
        self.t = time.perf_counter()

    def mark(self, name: str, *sync):
        for a in sync:
            jax.block_until_ready(a)
        now = time.perf_counter()
        self.info[name] = self.info.get(name, 0.0) + (now - self.t)
        self.t = now

    def skip(self):
        """Reset the reference point without attributing elapsed time."""
        self.t = time.perf_counter()


@functools.partial(jax.jit, static_argnames=("n_opt", "n_iter"))
def _structure_opt(m: MapState, frame: FrameState, n_opt: int,
                   n_iter: int) -> MapState:
    """optimizeStructure (frame_handler_base.cpp:178-196): refine the
    n_opt longest-unoptimized points observed in this frame."""
    pt = m.pt
    pid = frame.feat_point
    ok = frame.feat_valid & (pid >= 0)
    pid_safe = jnp.clip(pid, 0, pt.pos.shape[0] - 1)
    age = jnp.where(ok, pt.last_optim[pid_safe], jnp.iinfo(jnp.int32).max)
    # top-k oldest (smallest last_optim) — cheaper than a full argsort
    _, order = jax.lax.top_k(-age, n_opt)
    sel = pid_safe[order]
    sel_ok = ok[order]

    M = pt.obs_kf.shape[1]
    obs_kf = pt.obs_kf[sel]
    obs_feat = pt.obs_feat[sel]
    obs_ok = pt.obs_valid[sel]
    kfs = jnp.clip(obs_kf, 0, m.kf.R.shape[0] - 1)
    fts = jnp.clip(obs_feat, 0, m.kf.feat_f.shape[1] - 1)
    obs_R = m.kf.R[kfs]
    obs_t = m.kf.t[kfs]
    obs_f = m.kf.feat_f[kfs, fts]
    # origin observation as an extra column
    okf = jnp.clip(pt.orig_kf[sel], 0, m.kf.R.shape[0] - 1)
    obs_R = jnp.concatenate([obs_R, m.kf.R[okf][:, None]], axis=1)
    obs_t = jnp.concatenate([obs_t, m.kf.t[okf][:, None]], axis=1)
    obs_f = jnp.concatenate([obs_f, pt.orig_f[sel][:, None]], axis=1)
    obs_ok = jnp.concatenate(
        [obs_ok, (pt.orig_kf[sel] >= 0)[:, None]], axis=1)

    n_obs = jnp.sum(obs_ok, axis=1)
    can_opt = sel_ok & (n_obs >= 2)
    p_new, _ = optimize_points(pt.pos[sel], obs_R, obs_t, obs_f, obs_ok,
                               can_opt, n_iter=n_iter)
    pos = pt.pos.at[sel].set(
        jnp.where(can_opt[:, None], p_new, pt.pos[sel]))
    last_optim = pt.last_optim.at[sel].set(
        jnp.where(can_opt, frame.frame_id, pt.last_optim[sel]))
    return m._replace(pt=pt._replace(pos=pos, last_optim=last_optim))


@jax.jit
def _kf_policy(m: MapState, T_cur: SE3, cam, depth_mean: jnp.ndarray,
               kfselect_mindist: float):
    """needNewKf (frame_handler_mono.cpp:304-315): new KF unless some
    overlapping keyframe is within the weighted relative-distance box."""
    overlap = svomap.overlapping_kfs(m.kf, T_cur, cam)
    relpos = T_cur.apply(svomap.kf_positions(m.kf))
    close = (jnp.abs(relpos[:, 0]) / depth_mean < kfselect_mindist) \
        & (jnp.abs(relpos[:, 1]) / depth_mean < kfselect_mindist * 0.8) \
        & (jnp.abs(relpos[:, 2]) / depth_mean < kfselect_mindist * 1.3)
    return ~jnp.any(overlap & close), overlap


class FrameHandler:
    """Host-side pipeline driver (FrameHandlerMono equivalent)."""

    def __init__(self, cam, cfg: Config = Config(),
                 img_shape=(480, 752)):
        self.cam = cam
        self.cfg = cfg
        self.img_shape = img_shape
        self.n_levels = cfg.n_levels_total
        shapes = pyramid_shapes(img_shape, self.n_levels)
        from rpg_svo_tpu.ops.pallas_tiles import padded_layout
        Ws, Hs, _ = padded_layout(shapes)
        # keyframe pyramids are stored in the padded-stack layout
        self.pyr_shape = (Hs, Ws)
        self.ncx, self.ncy = grid_dims(img_shape[1], img_shape[0],
                                       cfg.grid_size)
        self.n_cells = self.ncx * self.ncy
        # per-frame feature budget (the reference's maxFts cap): frame
        # tables hold feat_cap slots; keyframe rows keep detector density
        self.feat_cap = min(-(-self.n_cells // 8) * 8,
                            -(-cfg.max_fts // 128) * 128)
        import numpy as _np
        # fixed shuffled cell order for spatially-fair compaction
        # (reprojector.cpp:44-55 shuffles its cells the same way)
        self._cell_perm = jnp.asarray(
            _np.random.default_rng(0).permutation(self.n_cells)
            .astype(_np.int32))
        self.map = svomap.init_map(
            n_kfs=cfg.max_kfs_pool, n_feats=self.n_cells,
            n_points=cfg.max_points, n_obs=cfg.max_obs_per_point,
            n_seeds=cfg.max_seeds, pyr_shape=self.pyr_shape)
        self.stage = STAGE_PAUSED
        self.quality = QUALITY_GOOD
        self.last_frame: Optional[FrameState] = None
        self.next_id = 0
        self.num_obs_last = 0
        self.log = []          # per-frame trace dicts (SVO_TRACE schema)
        self.initializer = init_mod.KltHomographyInit(cam, cfg,
                                                      self.n_cells)
        self.set_start()

    # -- control (frame_handler_base.h start/reset semantics) ----------
    def set_start(self):
        self.stage = STAGE_FIRST_FRAME

    def reset(self):
        self.map = svomap.init_map(
            n_kfs=self.cfg.max_kfs_pool, n_feats=self.n_cells,
            n_points=self.cfg.max_points, n_obs=self.cfg.max_obs_per_point,
            n_seeds=self.cfg.max_seeds, pyr_shape=self.pyr_shape)
        self.stage = STAGE_FIRST_FRAME
        self.last_frame = None
        self.num_obs_last = 0

    def _compact_feats(self, good):
        """Select up to feat_cap of the set bits of `good` (C,), in the
        fixed shuffled cell order; returns (idx (F,), valid (F,))."""
        sel_p, sv = svomap.mask_compact(good[self._cell_perm],
                                        self.feat_cap)
        return self._cell_perm[sel_p], sv

    # -- benchmark seeding (BenchmarkNode/setFirstFrame semantics) ------
    def set_first_frame_with_depth(self, img, T_f_w: SE3, depth_map,
                                   timestamp: float = 0.0):
        """Seed the map from a ground-truth depth map on the first frame,
        like the blender benchmark (benchmark_node.cpp:216-234): detect
        corners, create GOOD points at GT depth, make the frame a keyframe.
        """
        frame = make_frame(img, self.n_levels, self.feat_cap,
                           self.next_id, timestamp, T_f_w)
        self.next_id += 1
        det = detect_features(frame.pyr[:self.cfg.n_pyr_levels],
                              jnp.zeros((self.n_cells,), bool),
                              self.cfg.grid_size)
        px = det["px"]
        good = det["valid"]
        f = self.cam.cam2world(px)
        xi = jnp.clip(px[:, 0].astype(jnp.int32), 0, self.img_shape[1] - 1)
        yi = jnp.clip(px[:, 1].astype(jnp.int32), 0, self.img_shape[0] - 1)
        d = depth_map[yi, xi]
        good = good & jnp.isfinite(d) & (d > 0)
        p_w = T_f_w.inverse().apply(f * d[:, None])

        # keyframe slot first (points need its slot id)
        tile, txy0 = extract_tiles(frame.flat, px, det["level"])
        m, slot = svomap.add_keyframe(
            self.map, frame.pad.stack, T_f_w, frame.frame_id,
            px, f, det["level"], jnp.full((self.n_cells,), -1, jnp.int32),
            good, d, feat_tile=tile, feat_tile_xy0=txy0)
        pt, ids = svomap.alloc_points(
            m.pt, p_w, svomap.TYPE_GOOD,
            jnp.full((self.n_cells,), slot, jnp.int32), px, f,
            det["level"], good, orig_tile=tile, orig_tile_xy0=txy0)
        pt = svomap.add_point_observations(
            pt, ids, jnp.full((self.n_cells,), slot, jnp.int32),
            jnp.arange(self.n_cells, dtype=jnp.int32), good)
        kf = m.kf._replace(feat_point=m.kf.feat_point.at[slot].set(
            jnp.where(good, ids, -1)))
        self.map = m._replace(pt=pt, kf=kf)

        sel, sv = self._compact_feats(good)
        frame = frame._replace(feat_px=px[sel], feat_f=f[sel],
                               feat_level=det["level"][sel],
                               feat_point=jnp.where(sv, ids[sel], -1),
                               feat_valid=sv)
        # init depth-filter seeds on the remaining cells
        depth_mean, depth_min = scene_depth(frame, self.map.pt.pos)
        self.map = df.init_seeds(
            self.map, slot, frame.pyr, self.cam, good,
            depth_mean, 0.5 * depth_min, cell_size=self.cfg.grid_size,
            min_score=self.cfg.triang_min_corner_score,
            det_levels=self.cfg.n_pyr_levels,
            max_per_kf=self.cfg.max_seeds_per_kf)
        self.last_frame = frame
        self.num_obs_last = int(jnp.sum(good))
        self.stage = STAGE_DEFAULT_FRAME
        return frame

    # -- main entry ------------------------------------------------------
    def add_image(self, img, timestamp: float = 0.0):
        t0 = time.perf_counter()
        info = {"timestamp": timestamp, "stage": self.stage}
        timer = _StageTimer(info)
        frame = make_frame(img, self.n_levels, self.feat_cap,
                           self.next_id, timestamp)
        timer.mark("pyramid_creation", frame.pad.stack)
        self.next_id += 1
        info["frame_id"] = int(frame.frame_id)
        self._timer = timer
        if self.stage == STAGE_DEFAULT_FRAME:
            res, frame, info = self._process_frame(frame, info)
        elif self.stage == STAGE_RELOCALIZING:
            res, frame, info = self._relocalize(frame, info)
        elif self.stage == STAGE_FIRST_FRAME:
            res, frame, info = self._process_first_frame(frame, info)
        elif self.stage == STAGE_SECOND_FRAME:
            res, frame, info = self._process_second_frame(frame, info)
        else:
            raise RuntimeError(f"stage {self.stage}")
        if res == RESULT_FAILURE:
            if self.stage == STAGE_DEFAULT_FRAME:
                self.stage = STAGE_RELOCALIZING
        self.last_frame = frame
        info["result"] = res
        info["proc_time"] = time.perf_counter() - t0
        self.log.append(info)
        return info

    # -- bootstrap stages (processFirstFrame/processSecondFrame) ----------
    def _process_first_frame(self, frame: FrameState, info):
        frame = frame.with_pose(SE3.identity())
        if self.initializer.add_first_frame(frame.pyr) != \
                init_mod.RESULT_SUCCESS:
            return RESULT_NO_KEYFRAME, frame, info
        self._init_frame0 = frame
        self.stage = STAGE_SECOND_FRAME
        return RESULT_IS_KEYFRAME, frame, info

    def _process_second_frame(self, frame: FrameState, info):
        res, tv = self.initializer.add_second_frame(
            frame.pyr, key=jax.random.PRNGKey(int(frame.frame_id)))
        if res == init_mod.RESULT_FAILURE:
            self.initializer.reset()
            self.stage = STAGE_FIRST_FRAME
            return RESULT_FAILURE, frame, info
        if res == init_mod.RESULT_NO_KEYFRAME:
            return RESULT_NO_KEYFRAME, frame, info

        f0 = self._init_frame0
        frame = frame.with_pose(tv.T_cur_ref)   # world = first camera frame
        C = self.n_cells
        lvl0 = jnp.zeros((C,), jnp.int32)

        # keyframe 0 (world origin) with the inlier features
        tile0, txy0_0 = extract_tiles(f0.flat, tv.px_ref, lvl0)
        m, slot0 = svomap.add_keyframe(
            self.map, f0.pad.stack, SE3.identity(), f0.frame_id,
            tv.px_ref, tv.f_ref, lvl0,
            jnp.full((C,), -1, jnp.int32), tv.inlier,
            jnp.linalg.norm(tv.p_w, axis=-1),
            feat_tile=tile0, feat_tile_xy0=txy0_0)
        # points: UNKNOWN quality, origin = KF0
        pt, ids = svomap.alloc_points(
            m.pt, tv.p_w, TYPE_UNKNOWN,
            jnp.full((C,), slot0, jnp.int32), tv.px_ref, tv.f_ref,
            lvl0, tv.inlier, orig_tile=tile0, orig_tile_xy0=txy0_0)
        pt = svomap.add_point_observations(
            pt, ids, jnp.full((C,), slot0, jnp.int32),
            jnp.arange(C, dtype=jnp.int32), tv.inlier)
        kf = m.kf._replace(feat_point=m.kf.feat_point.at[slot0].set(
            jnp.where(tv.inlier, ids, -1)))
        self.map = m._replace(pt=pt, kf=kf)

        # keyframe 1 (current frame)
        p_cur = tv.T_cur_ref.apply(tv.p_w)
        depth1 = jnp.linalg.norm(p_cur, axis=-1)
        tile1, txy0_1 = extract_tiles(frame.flat, tv.px_cur, lvl0)
        m, slot1 = svomap.add_keyframe(
            self.map, frame.pad.stack, tv.T_cur_ref, frame.frame_id,
            tv.px_cur, tv.f_cur, lvl0, jnp.where(tv.inlier, ids, -1),
            tv.inlier, depth1, feat_tile=tile1, feat_tile_xy0=txy0_1)
        pt = svomap.add_point_observations(
            m.pt, ids, jnp.full((C,), slot1, jnp.int32),
            jnp.arange(C, dtype=jnp.int32), tv.inlier)
        self.map = m._replace(pt=pt)

        # optional two-view BA over the bootstrap pair (ba::twoViewBA,
        # run when BA is enabled, like the reference's
        # USE_BUNDLE_ADJUSTMENT build with lobaNumIter iterations)
        if self.cfg.loba_num_iter > 0:
            from rpg_svo_tpu.core.local_ba import run_two_view_ba
            self.map = run_two_view_ba(
                self.map, slot0, slot1,
                jnp.float32(self.cfg.loba_robust_huber_width),
                jnp.float32(self.cfg.loba_thresh), self.cam.fx,
                n_iter=self.cfg.loba_num_iter)
            self.map = svomap.scrub_dead_references(self.map)
            frame = frame.with_pose(
                SE3(self.map.kf.R[slot1], self.map.kf.t[slot1]))

        fsel, fsv = self._compact_feats(tv.inlier)
        frame = frame._replace(
            feat_px=tv.px_cur[fsel], feat_f=tv.f_cur[fsel],
            feat_level=lvl0[fsel],
            feat_point=jnp.where(fsv, ids[fsel], -1),
            feat_valid=fsv)

        # depth-filter seeds on keyframe 1
        depth_mean, depth_min = scene_depth(frame, self.map.pt.pos)
        occupied = jnp.zeros((C,), bool).at[
            cell_index(frame.feat_px, self.cfg.grid_size, self.ncx,
                       self.ncy)].max(frame.feat_valid)
        self.map = df.init_seeds(
            self.map, slot1, frame.pyr, self.cam, occupied,
            depth_mean, 0.5 * depth_min, cell_size=self.cfg.grid_size,
            min_score=self.cfg.triang_min_corner_score,
            det_levels=self.cfg.n_pyr_levels,
            max_per_kf=self.cfg.max_seeds_per_kf)
        self.num_obs_last = int(jnp.sum(tv.inlier))
        self.initializer.reset()
        self.stage = STAGE_DEFAULT_FRAME
        info["init_inliers"] = int(tv.inlier.sum())
        return RESULT_IS_KEYFRAME, frame, info

    # -- the tracking stages ----------------------------------------------
    def _track(self, frame: FrameState, info):
        """Sparse alignment + reprojection + pose refine. Returns
        (n_matches, n_edges, frame) with frame pose updated."""
        cfg = self.cfg
        last = self.last_frame
        timer = getattr(self, "_timer", None) or _StageTimer(info)
        timer.skip()
        # feature depths in the last frame from their points
        pid = jnp.clip(last.feat_point, 0, self.map.pt.pos.shape[0] - 1)
        p_last = last.T_f_w.apply(self.map.pt.pos[pid])
        depth = jnp.linalg.norm(p_last, axis=-1)
        fvalid = last.feat_valid & (last.feat_point >= 0) \
            & (self.map.pt.ptype[pid] != svomap.TYPE_DELETED)
        pad = frame.pad
        align = sparse_img_align(
            last.pyr, frame.pyr, self.cam, SE3.identity(),
            last.feat_px, last.feat_f, depth, fvalid,
            max_level=cfg.klt_max_level, min_level=cfg.klt_min_level,
            n_iter=cfg.img_align_n_iter, eps=cfg.img_align_eps,
            cur_pad=pad, ref_pad=last.pad,
            unroll=self.cfg.img_align_unroll,
            robust=self.cfg.img_align_robust)
        T_cur = align.T_cur_ref * last.T_f_w
        frame = frame.with_pose(T_cur)
        info["img_align_n_tracked"] = int(align.n_tracked)
        timer.mark("sparse_img_align")

        # reprojection, staged so the reference's sub-timers
        # (frame_handler_base.cpp:51-57) each get an honest device sync:
        # point projection + grid selection = reproject_kfs, candidate
        # bookkeeping = reproject_candidates, per-cell matching =
        # feature_align.  (The fused step runs the same stages composed
        # into one program — reproject_map — with no boundaries.)
        from rpg_svo_tpu.core.reprojector import (
            project_points_jit, candidate_bookkeeping_jit,
            grid_select_jit, match_cells_jit)
        px_all, vis0 = project_points_jit(self.map.pt, T_cur, self.cam)
        timer.mark("reproject_kfs", vis0)
        n_fail, ptype, visible = candidate_bookkeeping_jit(
            self.map.pt, vis0)
        timer.mark("reproject_candidates", ptype)
        has, sel_pt = grid_select_jit(
            px_all, visible, ptype, grid_size=cfg.grid_size,
            ncx=self.ncx, ncy=self.ncy, max_fts=self.feat_cap)
        timer.mark("reproject_kfs", sel_pt)
        pt, rep = match_cells_jit(
            self.map, frame.flat, T_cur, self.cam, n_fail, ptype, has,
            sel_pt, max_level=cfg.n_pyr_levels - 1, cur_pad=pad,
            max_fts=self.feat_cap)
        timer.mark("feature_align", rep.feat_px)
        self.map = svomap.scrub_dead_references(
            self.map._replace(pt=pt))
        info["repr_n_mps"] = int(rep.n_trials)
        info["repr_n_new_references"] = int(rep.n_matches)
        n_matches = int(rep.n_matches)
        # total column: the three sub-stages end-to-end
        info["reproject"] = (info.get("reproject_kfs", 0.0)
                             + info.get("reproject_candidates", 0.0)
                             + info.get("feature_align", 0.0))
        timer.skip()
        feat_f = self.cam.cam2world(rep.feat_px)
        frame = frame._replace(
            feat_px=rep.feat_px, feat_f=feat_f,
            feat_level=rep.feat_level, feat_point=rep.feat_point,
            feat_valid=rep.feat_valid, feat_type=rep.feat_type,
            feat_grad=rep.feat_grad)
        if n_matches < cfg.quality_min_fts:
            return n_matches, 0, frame

        # pose optimization
        pid = jnp.clip(frame.feat_point, 0, self.map.pt.pos.shape[0] - 1)
        pres = optimize_pose(
            frame.T_f_w, self.map.pt.pos[pid], frame.feat_f,
            frame.feat_level, frame.feat_valid, self.cam.fx,
            reproj_thresh=cfg.poseoptim_thresh,
            n_iter=cfg.poseoptim_num_iter)
        frame = frame.with_pose(pres.T_f_w)
        frame = frame._replace(feat_valid=pres.inliers)
        info["sfba_thresh"] = float(pres.estimated_scale)
        info["sfba_error_init"] = float(pres.error_init)
        info["sfba_error_final"] = float(pres.error_final)
        info["sfba_n_edges_final"] = int(pres.n_obs)
        timer.mark("pose_optimizer")
        return n_matches, int(pres.n_obs), frame

    def _process_frame(self, frame: FrameState, info):
        cfg = self.cfg
        last = self.last_frame
        n_matches, n_edges, frame = self._track(frame, info)

        if n_matches < cfg.quality_min_fts:
            frame = frame.with_pose(last.T_f_w)   # avoid crazy pose jumps
            self.quality = QUALITY_INSUFFICIENT
            return RESULT_FAILURE, frame, info
        if n_edges < 20:
            return RESULT_FAILURE, frame, info

        # structure optimization
        timer = getattr(self, "_timer", None) or _StageTimer(info)
        timer.skip()
        self.map = _structure_opt(self.map, frame,
                                  cfg.structureoptim_max_pts,
                                  cfg.structureoptim_num_iter)
        timer.mark("point_optimizer", self.map.pt.pos)

        # tracking quality
        self._set_quality(n_edges)
        if self.quality == QUALITY_INSUFFICIENT:
            frame = frame.with_pose(last.T_f_w)
            return RESULT_FAILURE, frame, info
        self.num_obs_last = n_edges

        depth_mean, depth_min = scene_depth(frame, self.map.pt.pos)
        need_kf, _ = _kf_policy(self.map, frame.T_f_w, self.cam,
                                depth_mean, cfg.kfselect_mindist)
        if (not bool(need_kf)) or self.quality == QUALITY_BAD:
            due = cfg.df_update_every <= 1 or \
                int(frame.frame_id) % cfg.df_update_every == 0
            if due:
                self.map, stats = df.update_seeds(
                    self.map, frame.flat, frame.T_f_w, self.cam,
                    max_n_kfs=cfg.df_max_kf_age,
                    conv_thresh=cfg.seed_convergence_sigma2_thresh,
                    max_steps=cfg.epi_max_steps,
                    update_k=cfg.df_update_k,
                    cur_pad=frame.pad,
                    max_level=cfg.n_pyr_levels - 1,
                    short_steps=cfg.epi_short_steps,
                    long_k=cfg.epi_long_k,
                    scan_rows=cfg.epi_scan_rows)
                info["n_seeds"] = int(stats.n_seeds)
            return RESULT_NO_KEYFRAME, frame, info

        # ------- new keyframe -------
        info["is_keyframe"] = True
        ktile, ktxy0 = extract_tiles(frame.flat, frame.feat_px,
                                     frame.feat_level)
        C = self.n_cells
        padC = lambda a, fill: a if a.shape[0] == C else jnp.concatenate(
            [a, jnp.full((C - a.shape[0],) + a.shape[1:], fill, a.dtype)])
        m, slot = svomap.add_keyframe(
            self.map, frame.pad.stack, frame.T_f_w, frame.frame_id,
            padC(frame.feat_px, 0), padC(frame.feat_f, 0),
            padC(frame.feat_level, 0),
            padC(frame.feat_point, -1), padC(frame.feat_valid, False),
            padC(jnp.linalg.norm(frame.T_f_w.apply(
                self.map.pt.pos[jnp.clip(frame.feat_point, 0,
                                         self.map.pt.pos.shape[0] - 1)]),
                axis=-1), 1.0),
            feat_type=padC(frame.feat_type, 0),
            feat_grad=padC(frame.feat_grad, 0),
            feat_tile=padC(ktile, 0), feat_tile_xy0=padC(ktxy0, -1))
        # point->addFrameRef for all matched features; promote candidates
        F = frame.feat_px.shape[0]
        pt = svomap.add_point_observations(
            m.pt, frame.feat_point,
            jnp.full((F,), slot, jnp.int32),
            jnp.arange(F, dtype=jnp.int32), frame.feat_valid)
        pid = jnp.clip(frame.feat_point, 0, pt.pos.shape[0] - 1)
        hit = jnp.zeros(pt.ptype.shape, bool).at[pid].set(
            frame.feat_valid & (frame.feat_point >= 0))
        ptype = jnp.where(hit & (pt.ptype == TYPE_CANDIDATE),
                          TYPE_UNKNOWN, pt.ptype)
        self.map = m._replace(pt=pt._replace(ptype=ptype))

        # optional local bundle adjustment (accurate preset)
        if cfg.loba_num_iter > 0:
            from rpg_svo_tpu.core.local_ba import run_local_ba
            timer.skip()
            self.map = run_local_ba(
                self.map, slot,
                jnp.float32(cfg.loba_robust_huber_width),
                jnp.float32(cfg.loba_thresh), self.cam.fx,
                n_iter=cfg.loba_num_iter, core_n_kfs=cfg.core_n_kfs)
            frame = frame.with_pose(
                SE3(self.map.kf.R[slot], self.map.kf.t[slot]))
            timer.mark("local_ba", self.map.pt.pos)

        # seeds: update against the KF, then init new ones
        self.map, stats = df.update_seeds(
            self.map, frame.flat, frame.T_f_w, self.cam,
            max_n_kfs=cfg.df_max_kf_age,
            conv_thresh=cfg.seed_convergence_sigma2_thresh,
            max_steps=cfg.epi_max_steps,
            update_k=cfg.df_update_k,
            cur_pad=frame.pad,
            max_level=cfg.n_pyr_levels - 1,
            short_steps=cfg.epi_short_steps,
            long_k=cfg.epi_long_k,
            scan_rows=cfg.epi_scan_rows)
        occupied = jnp.zeros((self.n_cells,), bool).at[
            cell_index(frame.feat_px, cfg.grid_size, self.ncx,
                       self.ncy)].max(frame.feat_valid)
        self.map = df.init_seeds(
            self.map, slot, frame.pyr, self.cam, occupied,
            depth_mean, 0.5 * depth_min, cell_size=cfg.grid_size,
            min_score=cfg.triang_min_corner_score,
            det_levels=cfg.n_pyr_levels,
            max_per_kf=cfg.max_seeds_per_kf)
        info["n_seeds"] = int(jnp.sum(self.map.seed.active))

        # cap the map size (drop the furthest keyframe)
        if cfg.max_n_kfs > 2 and \
                int(svomap.n_active_kfs(self.map)) >= cfg.max_n_kfs:
            far = svomap.furthest_kf(self.map.kf,
                                     frame.T_f_w.inverse().t)
            # never drop the KF we just added
            if int(far) != int(slot):
                self.map = svomap.delete_keyframe(self.map, far)
        return RESULT_IS_KEYFRAME, frame, info

    def _relocalize(self, frame: FrameState, info):
        """relocalizeFrame (frame_handler_mono.cpp:237-265): align against
        the closest keyframe; on success continue tracking from it."""
        ref_slot = svomap.closest_kf(
            self.map.kf, self.last_frame.T_f_w.inverse().t)
        if int(self.map.kf.active[ref_slot]) == 0:
            return RESULT_FAILURE, frame, info
        kf = self.map.kf
        # synthesize a FrameState view of the keyframe
        pid = jnp.clip(kf.feat_point[ref_slot], 0,
                       self.map.pt.pos.shape[0] - 1)
        T_kf = SE3(kf.R[ref_slot], kf.t[ref_slot])
        depth = jnp.linalg.norm(T_kf.apply(self.map.pt.pos[pid]), axis=-1)
        fvalid = kf.feat_valid[ref_slot] & (kf.feat_point[ref_slot] >= 0)
        # rebuild the KF pyramid from its flat buffer
        shapes = pyramid_shapes(self.img_shape, self.n_levels)
        kf_pad = PaddedPyramid.from_stack(kf.flat_pyr[ref_slot], shapes)
        pyr = kf_pad.levels()
        align = sparse_img_align(
            tuple(pyr), frame.pyr, self.cam, SE3.identity(),
            kf.feat_px[ref_slot], kf.feat_f[ref_slot], depth, fvalid,
            max_level=self.cfg.klt_max_level,
            min_level=self.cfg.klt_min_level)
        if int(align.n_tracked) > 30:
            T_last_saved = self.last_frame.T_f_w
            # continue the normal pipeline with the KF as "last frame";
            # its detector-dense row compacts into the F-slot frame table
            sel, sv = self._compact_feats(fvalid) \
                if fvalid.shape[0] != self.feat_cap \
                else (jnp.arange(self.feat_cap), fvalid)
            kf_frame = FrameState(
                pyr=tuple(pyr), pad=kf_pad, flat=kf_pad.flat_view(),
                R=kf.R[ref_slot], t=kf.t[ref_slot],
                frame_id=kf.frame_id[ref_slot],
                timestamp=frame.timestamp,
                feat_px=kf.feat_px[ref_slot][sel],
                feat_f=kf.feat_f[ref_slot][sel],
                feat_level=kf.feat_level[ref_slot][sel],
                feat_point=jnp.where(sv, kf.feat_point[ref_slot][sel],
                                     -1),
                feat_valid=sv,
                feat_type=kf.feat_type[ref_slot][sel],
                feat_grad=kf.feat_grad[ref_slot][sel])
            saved_last = self.last_frame
            self.last_frame = kf_frame
            res, frame, info = self._process_frame(frame, info)
            if res != RESULT_FAILURE:
                self.stage = STAGE_DEFAULT_FRAME
            else:
                frame = frame.with_pose(T_last_saved)
                self.last_frame = saved_last
            return res, frame, info
        return RESULT_FAILURE, frame, info

    # -- public API parity with FrameHandlerMono --------------------------
    def last_processing_time(self) -> float:
        return self.log[-1]["proc_time"] if self.log else 0.0

    def tracking_quality(self) -> str:
        return self.quality

    def global_ba(self, n_iter: int | None = None):
        """ba::globalBA over the whole keyframe map (on demand, like the
        reference's offline call)."""
        from rpg_svo_tpu.core.local_ba import run_global_ba
        cfg = self.cfg
        self.map = run_global_ba(
            self.map, jnp.float32(cfg.loba_robust_huber_width),
            jnp.float32(cfg.loba_thresh),
            jnp.float32(cfg.poseoptim_thresh), self.cam.fx,
            n_iter=n_iter if n_iter is not None else
            max(cfg.loba_num_iter, 10))
        self.map = svomap.scrub_dead_references(self.map)

    def relocalize_frame_at_pose(self, kf_frame_id: int, T_f_kf: SE3,
                                 img, timestamp: float = 0.0) -> bool:
        """relocalizeFrameAtPose (frame_handler_mono.cpp:267-283): resume
        tracking against a known keyframe with a pose prior."""
        kf = self.map.kf
        slots = np.flatnonzero(np.asarray(kf.active)
                               & (np.asarray(kf.frame_id) == kf_frame_id))
        if len(slots) == 0:
            return False
        slot = int(slots[0])
        frame = make_frame(img, self.n_levels, self.feat_cap,
                           self.next_id, timestamp)
        self.next_id += 1
        T_kf = SE3(kf.R[slot], kf.t[slot])
        frame = frame.with_pose(T_f_kf * T_kf)
        saved_stage = self.stage
        self.stage = STAGE_RELOCALIZING
        info = {"frame_id": int(frame.frame_id), "timestamp": timestamp,
                "stage": self.stage}
        res, frame, info = self._relocalize(frame, info)
        self.last_frame = frame
        if res != RESULT_FAILURE:
            self.stage = STAGE_DEFAULT_FRAME
            return True
        self.stage = saved_stage
        return False

    def get_seeds_snapshot(self):
        """Thread-safe-by-construction seed snapshot (DepthFilter::
        getSeedsCopy equivalent — our state is immutable arrays)."""
        s = self.map.seed
        act = np.asarray(s.active)
        return {
            "kf_slot": np.asarray(s.kf_slot)[act],
            "px": np.asarray(s.px)[act],
            "mu": np.asarray(s.mu)[act],
            "sigma2": np.asarray(s.sigma2)[act],
            "a": np.asarray(s.a)[act],
            "b": np.asarray(s.b)[act],
        }

    def dense_input(self, kf_slot: int):
        """DenseInput export (visualizer.cpp:269-314 / DenseInput.msg):
        keyframe image + pose + scene depth range for downstream dense
        reconstruction."""
        kf = self.map.kf
        if not bool(kf.active[kf_slot]):
            return None
        from rpg_svo_tpu.ops.pyramid import pyramid_shapes
        shapes = pyramid_shapes(self.img_shape, self.n_levels)
        h, w = shapes[0]
        from rpg_svo_tpu.ops.pallas_tiles import padded_layout
        Ws, Hs, _ = padded_layout(shapes)
        img = np.asarray(kf.flat_pyr[kf_slot]).reshape(Hs, Ws)[:h, :w]
        pid = np.asarray(kf.feat_point[kf_slot])
        ok = np.asarray(kf.feat_valid[kf_slot]) & (pid >= 0)
        T = SE3(kf.R[kf_slot], kf.t[kf_slot])
        if ok.any():
            p = np.asarray(T.apply(self.map.pt.pos[
                jnp.clip(jnp.asarray(pid), 0, self.map.pt.pos.shape[0] - 1)]))
            z = p[ok, 2]
            z = z[z > 0]
            zmin, zmax = (float(z.min()), float(z.max())) if len(z) \
                else (0.1, 10.0)
        else:
            zmin, zmax = 0.1, 10.0
        return {"image": img, "T_w_f": T.inverse(),
                "min_depth": zmin, "max_depth": zmax,
                "frame_id": int(kf.frame_id[kf_slot])}

    def _set_quality(self, num_obs: int):
        self.quality = QUALITY_GOOD
        if num_obs < self.cfg.quality_min_fts:
            self.quality = QUALITY_INSUFFICIENT
        if self.num_obs_last - num_obs > self.cfg.quality_max_drop_fts:
            self.quality = QUALITY_BAD
