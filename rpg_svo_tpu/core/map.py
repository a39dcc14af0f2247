"""Map data model: fixed-capacity SoA pools for keyframes, points, seeds.

TPU-native replacement for the reference's pointer-graph data model
(Frame/Feature/Point/Map/MapPointCandidates/Seed —
svo/include/svo/{frame,feature,point,map,depth_filter}.h).  Linked lists and
raw pointers become index tables with validity masks; insert/erase become
masked scatters into static-capacity pools, so every map operation is a
jittable device program and the whole map state is one pytree that can be
checkpointed, donated, or sharded.

Point types follow Point::Type (point.h): DELETED < CANDIDATE < UNKNOWN <
GOOD; reprojection prefers higher types (reprojector.cpp:146-149).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.patches import TILE_R

TYPE_DELETED = 0
TYPE_CANDIDATE = 1
TYPE_UNKNOWN = 2
TYPE_GOOD = 3


class KeyframeStore(NamedTuple):
    """Keyframe pool. Pyramids live as flat buffers (one FlatPyramid layout
    shared by all slots); features are per-KF fixed-capacity tables."""
    flat_pyr: jnp.ndarray     # (K, rows, cols) padded pyramid stacks
    R: jnp.ndarray            # (K, 3, 3) T_f_w rotation
    t: jnp.ndarray            # (K, 3)    T_f_w translation
    frame_id: jnp.ndarray     # (K,) int32, -1 when free
    active: jnp.ndarray       # (K,) bool
    feat_px: jnp.ndarray      # (K, F, 2) level-0 px
    feat_f: jnp.ndarray       # (K, F, 3) unit bearing
    feat_level: jnp.ndarray   # (K, F) int32
    feat_point: jnp.ndarray   # (K, F) int32 point index, -1 none
    feat_valid: jnp.ndarray   # (K, F) bool
    feat_type: jnp.ndarray    # (K, F) int32 FEATURE_CORNER/EDGELET
    feat_grad: jnp.ndarray    # (K, F, 2) unit gradient dir (edgelets)
    kp5_dir: jnp.ndarray      # (K, 5, 3) bearing of 5 key features
    kp5_depth: jnp.ndarray    # (K, 5) depth along bearing
    kp5_valid: jnp.ndarray    # (K, 5) bool
    # creation-time intensity tile per feature (ops/patches.py): all later
    # affine patch warps read this instead of the keyframe pyramid
    feat_tile: jnp.ndarray     # (K, Fs, TILE_R*TILE_R) f32 flat rows
    feat_tile_xy0: jnp.ndarray  # (K, Fs, 2) int32 tile origin; Fs = F
                                # rounded up to 8 (free row-flatten)

    @property
    def T_f_w(self) -> SE3:
        return SE3(self.R, self.t)


class PointStore(NamedTuple):
    pos: jnp.ndarray          # (P, 3) world position
    ptype: jnp.ndarray        # (P,) int32 TYPE_*
    n_succ: jnp.ndarray       # (P,) int32 successful reprojections
    n_fail: jnp.ndarray       # (P,) int32 failed reprojections
    last_optim: jnp.ndarray   # (P,) int32 frame id of last structure opt
    obs_kf: jnp.ndarray       # (P, M) int32 keyframe slot, -1 free
    obs_feat: jnp.ndarray     # (P, M) int32 feature index in that KF
    obs_valid: jnp.ndarray    # (P, M) bool
    # origin observation (the seed's feature in its spawning KF); candidates
    # have only this until bound to a keyframe (MapPointCandidates role)
    orig_kf: jnp.ndarray      # (P,) int32 keyframe slot
    orig_px: jnp.ndarray      # (P, 2) level-0 px
    orig_f: jnp.ndarray       # (P, 3) unit bearing
    orig_level: jnp.ndarray   # (P,) int32
    orig_type: jnp.ndarray    # (P,) int32 FEATURE_*
    orig_grad: jnp.ndarray    # (P, 2) unit gradient dir
    orig_tile: jnp.ndarray    # (P, TILE_R*TILE_R) origin-feature tile (flat)
    orig_tile_xy0: jnp.ndarray  # (P, 2) int32

    @property
    def active(self) -> jnp.ndarray:
        return self.ptype != TYPE_DELETED

    @property
    def n_obs(self) -> jnp.ndarray:
        return jnp.sum(self.obs_valid, axis=-1)


class SeedStore(NamedTuple):
    """Depth-filter seeds: Beta(a,b) x Gaussian(mu, sigma2) on inverse
    depth (depth_filter.cpp:37-46)."""
    active: jnp.ndarray       # (S,) bool
    kf_slot: jnp.ndarray      # (S,) int32 origin keyframe slot
    batch_id: jnp.ndarray     # (S,) int32 keyframe counter at spawn
    px: jnp.ndarray           # (S, 2) level-0 px in origin KF
    f: jnp.ndarray            # (S, 3) unit bearing in origin KF
    level: jnp.ndarray        # (S,) int32
    a: jnp.ndarray            # (S,) inlier pseudo-count
    b: jnp.ndarray            # (S,) outlier pseudo-count
    mu: jnp.ndarray           # (S,) inverse-depth mean
    z_range: jnp.ndarray      # (S,) inverse-depth range (1/depth_min)
    sigma2: jnp.ndarray       # (S,) inverse-depth variance
    ftype: jnp.ndarray        # (S,) int32 FEATURE_*
    grad: jnp.ndarray         # (S, 2) unit gradient dir
    tile: jnp.ndarray         # (S, TILE_R*TILE_R) origin-patch tile (flat)
    tile_xy0: jnp.ndarray     # (S, 2) int32
    upd_count: jnp.ndarray    # (S,) int32 — K-capped update services (LRU)


class MapState(NamedTuple):
    kf: KeyframeStore
    pt: PointStore
    seed: SeedStore
    kf_counter: jnp.ndarray   # scalar int32 (Seed::batch_counter equivalent)


def init_map(n_kfs: int, n_feats: int, n_points: int, n_obs: int,
             n_seeds: int, pyr_shape: Tuple[int, int]) -> MapState:
    # SCRATCH-ROW CONVENTION: the LAST row of every pool (keyframes,
    # points, seeds) is reserved as a write scratch slot and is never
    # handed out by the free-slot search.  Masked per-frame inserts land
    # there when disabled, so pool writes are plain dynamic-update-slices
    # instead of gather-old-row + select + write round trips; usable
    # capacity is n-1.  Pool sizes stay at their configured multiples —
    # growing them by one would recreate the odd-leading-dim table
    # layouts implicated in TPU worker faults (see CLAUDE.md).
    kf = KeyframeStore(
        # (K, rows, cols) with 8/128-aligned trailing dims: inserting a
        # keyframe pyramid is then a CONTIGUOUS tiled write.  The old
        # (K, rows*cols) row-per-slot layout made the same insert write
        # 1-of-8 sublanes of every tile in the slot's stripe — ~8x
        # read-modify-write traffic, 0.078 ms/frame (profiled).
        flat_pyr=jnp.zeros((n_kfs,) + tuple(pyr_shape), jnp.float32),
        R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (n_kfs, 1, 1)),
        t=jnp.zeros((n_kfs, 3), jnp.float32),
        frame_id=jnp.full((n_kfs,), -1, jnp.int32),
        active=jnp.zeros((n_kfs,), bool),
        feat_px=jnp.zeros((n_kfs, n_feats, 2), jnp.float32),
        feat_f=jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                        (n_kfs, n_feats, 1)),
        feat_level=jnp.zeros((n_kfs, n_feats), jnp.int32),
        feat_point=jnp.full((n_kfs, n_feats), -1, jnp.int32),
        feat_valid=jnp.zeros((n_kfs, n_feats), bool),
        feat_type=jnp.zeros((n_kfs, n_feats), jnp.int32),
        feat_grad=jnp.tile(jnp.array([1.0, 0.0], jnp.float32),
                           (n_kfs, n_feats, 1)),
        kp5_dir=jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                         (n_kfs, 5, 1)),
        kp5_depth=jnp.ones((n_kfs, 5), jnp.float32),
        kp5_valid=jnp.zeros((n_kfs, 5), bool),
        # tile tables pad the F axis to a multiple of 8 sublanes so the
        # reprojector's (K, Fs, .) -> (K*Fs, .) row-flatten is a free
        # bitcast — with Fs=620 it was a full layout-conversion copy of
        # the pool (~0.2 ms/frame at the accurate preset's 91 MB pool)
        feat_tile=jnp.zeros((n_kfs, -(-n_feats // 8) * 8,
                             TILE_R * TILE_R), jnp.float32),
        feat_tile_xy0=jnp.full((n_kfs, -(-n_feats // 8) * 8, 2), -1,
                               jnp.int32),
    )
    pt = PointStore(
        pos=jnp.zeros((n_points, 3), jnp.float32),
        ptype=jnp.zeros((n_points,), jnp.int32),
        n_succ=jnp.zeros((n_points,), jnp.int32),
        n_fail=jnp.zeros((n_points,), jnp.int32),
        last_optim=jnp.zeros((n_points,), jnp.int32),
        obs_kf=jnp.full((n_points, n_obs), -1, jnp.int32),
        obs_feat=jnp.full((n_points, n_obs), -1, jnp.int32),
        obs_valid=jnp.zeros((n_points, n_obs), bool),
        orig_kf=jnp.full((n_points,), -1, jnp.int32),
        orig_px=jnp.zeros((n_points, 2), jnp.float32),
        orig_f=jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                        (n_points, 1)),
        orig_level=jnp.zeros((n_points,), jnp.int32),
        orig_type=jnp.zeros((n_points,), jnp.int32),
        orig_grad=jnp.tile(jnp.array([1.0, 0.0], jnp.float32),
                           (n_points, 1)),
        orig_tile=jnp.zeros((n_points, TILE_R * TILE_R), jnp.float32),
        orig_tile_xy0=jnp.full((n_points, 2), -1, jnp.int32),
    )
    seed = SeedStore(
        active=jnp.zeros((n_seeds,), bool),
        kf_slot=jnp.full((n_seeds,), -1, jnp.int32),
        batch_id=jnp.zeros((n_seeds,), jnp.int32),
        px=jnp.zeros((n_seeds, 2), jnp.float32),
        f=jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32), (n_seeds, 1)),
        level=jnp.zeros((n_seeds,), jnp.int32),
        a=jnp.ones((n_seeds,), jnp.float32),
        b=jnp.ones((n_seeds,), jnp.float32),
        mu=jnp.ones((n_seeds,), jnp.float32),
        z_range=jnp.ones((n_seeds,), jnp.float32),
        sigma2=jnp.ones((n_seeds,), jnp.float32),
        ftype=jnp.zeros((n_seeds,), jnp.int32),
        grad=jnp.tile(jnp.array([1.0, 0.0], jnp.float32), (n_seeds, 1)),
        tile=jnp.zeros((n_seeds, TILE_R * TILE_R), jnp.float32),
        tile_xy0=jnp.full((n_seeds, 2), -1, jnp.int32),
        upd_count=jnp.zeros((n_seeds,), jnp.int32),
    )
    return MapState(kf, pt, seed, jnp.int32(0))


# ---------------------------------------------------------------------------
# slot allocation helpers
# ---------------------------------------------------------------------------

def _padF(a: jnp.ndarray, Fs: int, fill) -> jnp.ndarray:
    """Pad a per-feature table's leading axis up to the tile-table
    capacity Fs (8-sublane multiple; see KeyframeStore)."""
    if a.shape[0] == Fs:
        return a
    return jnp.concatenate(
        [a, jnp.full((Fs - a.shape[0],) + a.shape[1:], fill, a.dtype)])


def free_slots(active: jnp.ndarray, n: int) -> jnp.ndarray:
    """Indices of up to n free slots (-1 padded), static shape (n,)."""
    idx = jnp.nonzero(~active, size=n, fill_value=-1)[0]
    return idx.astype(jnp.int32)


def mask_compact(mask: jnp.ndarray, k: int):
    """First k set indices of a bool mask, order-preserving.

    O(N) cumsum + scatter — replaces `argsort(~mask, stable=True)[:k]`,
    which pays a full O(N log^2 N) sort network on TPU.

    Returns (idx (k,) int32, valid (k,) bool): idx[j] is the j-th set
    index for j < popcount (clamped to k); invalid slots hold 0 (safe for
    gathers; mask results with `valid`).
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask & (pos < k), pos, k)
    # overflow region padded to 128 rows, not 1: odd-length (k+1,) 1-D
    # scatters are in the TPU layout-miscompile class that faults the
    # worker at execution (see CLAUDE.md)
    out = jnp.zeros((k + 128,), jnp.int32).at[tgt].max(
        jnp.arange(n, dtype=jnp.int32))
    idx = out[:k]
    valid = jnp.arange(k, dtype=jnp.int32) < jnp.maximum(pos[-1] + 1, 0)
    return jnp.where(valid, idx, 0), valid


def mask_compact_priority(mask: jnp.ndarray, k: int,
                          priority: jnp.ndarray):
    """Top-k set indices of a bool mask, highest `priority` first.

    Like mask_compact, but when popcount(mask) > k the DROPPED rows are
    the lowest-priority ones instead of whatever happened to sit past the
    first k pool slots (local BA compacts by observation count so an
    overflow sheds the least-constrained points).  Costs one top_k
    (O(N log N) on TPU) — fine for once-per-keyframe callers; use
    mask_compact on per-frame paths.

    Returns (idx (k,) int32, valid (k,) bool); invalid slots hold 0.
    """
    key = jnp.where(mask, priority.astype(jnp.float32), -jnp.inf)
    val, idx = jax.lax.top_k(key, k)
    valid = jnp.isfinite(val)
    return jnp.where(valid, idx, 0).astype(jnp.int32), valid


def alloc_scatter(arr: jnp.ndarray, slots: jnp.ndarray,
                  values: jnp.ndarray) -> jnp.ndarray:
    """Scatter values into arr at slots; slots == -1 land in the pool's
    scratch row (the LAST row — see init_map), which callers reset after
    the batch of writes.  No old-row gather + select."""
    sw = jnp.where(slots >= 0, slots, arr.shape[0] - 1)
    return arr.at[sw].set(values)


# ---------------------------------------------------------------------------
# keyframe queries (Map::getCloseKeyframes / getFurthestKeyframe / closest)
# ---------------------------------------------------------------------------

def kf_positions(kf: KeyframeStore) -> jnp.ndarray:
    """World camera centers of all KF slots (K, 3): -R^T t."""
    return -jnp.einsum("kji,kj->ki", kf.R, kf.t)


def overlapping_kfs(kf: KeyframeStore, T_cur: SE3, cam) -> jnp.ndarray:
    """Bool (K,): KF shares field of view with the current frame.

    Reference semantics (map.cpp:106-127 via Frame::check/setKeyPoints):
    a KF overlaps if any of its 5 key features' 3D points projects into
    the current frame.
    """
    kp_ref = kf.kp5_dir * kf.kp5_depth[..., None]            # (K, 5, 3)
    T_w_kf = SE3(kf.R, kf.t).inverse()
    p_w = T_w_kf.apply(jnp.moveaxis(kp_ref, 1, 0))           # (5, K, 3)
    p_cur = T_cur.apply(p_w)                                  # (5, K, 3)
    px = cam.world2cam(p_cur)
    vis = cam.is_in_frame(px) & (p_cur[..., 2] > 0.0)         # (5, K)
    vis = vis & jnp.moveaxis(kf.kp5_valid, 1, 0)
    return jnp.any(vis, axis=0) & kf.active


def furthest_kf(kf: KeyframeStore, pos_w: jnp.ndarray) -> jnp.ndarray:
    d = jnp.linalg.norm(kf_positions(kf) - pos_w, axis=-1)
    d = jnp.where(kf.active, d, -jnp.inf)
    return jnp.argmax(d).astype(jnp.int32)


def closest_kf(kf: KeyframeStore, pos_w: jnp.ndarray,
               exclude_frame_id: jnp.ndarray | None = None) -> jnp.ndarray:
    d = jnp.linalg.norm(kf_positions(kf) - pos_w, axis=-1)
    mask = kf.active
    if exclude_frame_id is not None:
        mask = mask & (kf.frame_id != exclude_frame_id)
    d = jnp.where(mask, d, jnp.inf)
    return jnp.argmax(-d).astype(jnp.int32)


# ---------------------------------------------------------------------------
# mutations
# ---------------------------------------------------------------------------

def add_keyframe(m: MapState, flat_pyr: jnp.ndarray, T_f_w: SE3,
                 frame_id: jnp.ndarray,
                 feat_px: jnp.ndarray, feat_f: jnp.ndarray,
                 feat_level: jnp.ndarray, feat_point: jnp.ndarray,
                 feat_valid: jnp.ndarray,
                 feat_depth: jnp.ndarray,
                 feat_type: jnp.ndarray | None = None,
                 feat_grad: jnp.ndarray | None = None,
                 enable: jnp.ndarray | bool = True,
                 feat_tile: jnp.ndarray | None = None,
                 feat_tile_xy0: jnp.ndarray | None = None
                 ) -> Tuple[MapState, jnp.ndarray]:
    """Insert a keyframe into a free slot; returns (map, slot).

    Also computes the 5 'key points' (center + 4 quadrant extremes of the
    feature set, Frame::setKeyPoints semantics) used for overlap queries.
    feat_depth: per-feature depth along the bearing (for key points).

    ``enable`` may be a traced bool: when False the call is an exact no-op
    (slot = -1, all writes masked).  This lets the fused step insert
    keyframes with masked scatters instead of a lax.cond whose outputs
    would force a copy of the whole keyframe pool (incl. the pyramid
    buffers) every frame.
    """
    kf = m.kf
    F = feat_px.shape[0]
    if feat_type is None:
        feat_type = jnp.zeros((F,), jnp.int32)
    if feat_grad is None:
        feat_grad = jnp.tile(jnp.array([1.0, 0.0], jnp.float32), (F, 1))
    if feat_tile is None:
        from rpg_svo_tpu.ops.patches import empty_tiles
        feat_tile, feat_tile_xy0 = empty_tiles(F)
    slot = free_slots(kf.active[:-1], 1)[0]   # scratch row is not a slot
    slot = jnp.where(enable, slot, -1)
    ok = slot >= 0
    s = jnp.where(ok, slot, 0)

    # 5 key points: most central + 4 corner-most valid features.
    # Computed under a cond on `enable`: the nanmedian is a full sort of
    # the F-slot table and this runs MASKED on every frame of the fused
    # step — the cond's outputs are 5 rows (tiny), so skipping is free.
    def _kp5(_):
        u = feat_px[:, 0]
        v = feat_px[:, 1]
        # use image center approx from feature cloud median
        cu = jnp.nanmedian(jnp.where(feat_valid, u, jnp.nan))
        cv = jnp.nanmedian(jnp.where(feat_valid, v, jnp.nan))
        du = u - jnp.where(jnp.isnan(cu), 0.0, cu)
        dv = v - jnp.where(jnp.isnan(cv), 0.0, cv)
        scores = jnp.stack([
            -(jnp.abs(du) + jnp.abs(dv)),      # most central
            jnp.where((du >= 0) & (dv >= 0), du * dv, -jnp.inf),
            jnp.where((du >= 0) & (dv < 0), -du * dv, -jnp.inf),
            jnp.where((du < 0) & (dv < 0), du * dv, -jnp.inf),
            jnp.where((du < 0) & (dv >= 0), -du * dv, -jnp.inf),
        ])                                       # (5, F)
        has_depth = feat_valid & jnp.isfinite(feat_depth) \
            & (feat_depth > 0)
        scores = jnp.where(has_depth[None, :], scores, -jnp.inf)
        kp_idx = jnp.argmax(scores, axis=1)      # (5,)
        kp_valid = jnp.isfinite(jnp.max(scores, axis=1))
        return feat_f[kp_idx], feat_depth[kp_idx], kp_valid

    if isinstance(enable, bool):
        kp_dir, kp_depth, kp_valid = _kp5(None)
    else:
        kp_dir, kp_depth, kp_valid = jax.lax.cond(
            enable, _kp5,
            lambda _: (jnp.zeros((5, 3), feat_f.dtype),
                       jnp.zeros((5,), feat_depth.dtype),
                       jnp.zeros((5,), bool)), None)

    # disabled inserts write to the scratch row (last pool row, never
    # active): a plain DUS per field, no old-row gather + select
    sw = jnp.where(ok, slot, kf.active.shape[0] - 1)
    kf = kf._replace(
        flat_pyr=kf.flat_pyr.at[sw].set(
            flat_pyr.reshape(kf.flat_pyr.shape[1:])),
        R=kf.R.at[sw].set(T_f_w.R),
        t=kf.t.at[sw].set(T_f_w.t),
        frame_id=kf.frame_id.at[sw].set(frame_id),
        active=kf.active.at[sw].set(True),
        feat_px=kf.feat_px.at[sw].set(feat_px),
        feat_f=kf.feat_f.at[sw].set(feat_f),
        feat_level=kf.feat_level.at[sw].set(feat_level),
        feat_point=kf.feat_point.at[sw].set(feat_point),
        feat_type=kf.feat_type.at[sw].set(feat_type),
        feat_grad=kf.feat_grad.at[sw].set(feat_grad),
        feat_valid=kf.feat_valid.at[sw].set(feat_valid),
        kp5_dir=kf.kp5_dir.at[sw].set(kp_dir),
        kp5_depth=kf.kp5_depth.at[sw].set(kp_depth),
        kp5_valid=kf.kp5_valid.at[sw].set(kp_valid),
        feat_tile=kf.feat_tile.at[sw].set(_padF(
            feat_tile, kf.feat_tile.shape[1], 0)),
        feat_tile_xy0=kf.feat_tile_xy0.at[sw].set(_padF(
            feat_tile_xy0, kf.feat_tile_xy0.shape[1], -1)),
    )
    # the scratch row must stay inert regardless of what landed there
    kf = kf._replace(
        active=kf.active.at[kf.active.shape[0] - 1].set(False),
        frame_id=kf.frame_id.at[kf.frame_id.shape[0] - 1].set(-1))
    return m._replace(kf=kf), slot


def alloc_points(pt: PointStore, pos: jnp.ndarray, ptype_val: int,
                 orig_kf: jnp.ndarray, orig_px: jnp.ndarray,
                 orig_f: jnp.ndarray, orig_level: jnp.ndarray,
                 valid: jnp.ndarray,
                 orig_type: jnp.ndarray | None = None,
                 orig_grad: jnp.ndarray | None = None,
                 orig_tile: jnp.ndarray | None = None,
                 orig_tile_xy0: jnp.ndarray | None = None,
                 any_valid: jnp.ndarray | None = None
                 ) -> Tuple[PointStore, jnp.ndarray]:
    """Allocate up to N new points into free pool slots; returns
    (store, slot_ids (N,), -1 where not allocated or invalid).

    any_valid: optional traced scalar == valid.any(); when given, the
    full-pool free-slot search runs under a cond (tiny (N,) output) so
    frames with nothing to allocate — the common case for per-frame
    candidate conversion — skip its O(P) cumsum+scatter.
    """
    N = valid.shape[0]
    if orig_type is None:
        orig_type = jnp.zeros((N,), jnp.int32)
    if orig_grad is None:
        orig_grad = jnp.tile(jnp.array([1.0, 0.0], jnp.float32), (N, 1))
    if orig_tile is None:
        from rpg_svo_tpu.ops.patches import empty_tiles
        orig_tile, orig_tile_xy0 = empty_tiles(N)
    if any_valid is not None:
        slots = jax.lax.cond(
            any_valid, lambda: free_slots(pt.active[:-1], N),
            lambda: jnp.full((N,), -1, jnp.int32))
    else:
        slots = free_slots(pt.active[:-1], N)   # scratch row is not a slot
    slots = jnp.where(valid, slots, -1)
    ok = slots >= 0
    s = jnp.where(ok, slots, 0)
    M = pt.obs_kf.shape[1]
    pt = pt._replace(
        pos=alloc_scatter(pt.pos, slots, pos),
        ptype=alloc_scatter(pt.ptype, slots,
                            jnp.full((N,), ptype_val, jnp.int32)),
        n_succ=alloc_scatter(pt.n_succ, slots, jnp.zeros((N,), jnp.int32)),
        n_fail=alloc_scatter(pt.n_fail, slots, jnp.zeros((N,), jnp.int32)),
        last_optim=alloc_scatter(pt.last_optim, slots,
                                 jnp.zeros((N,), jnp.int32)),
        obs_valid=pt.obs_valid.at[s].set(
            jnp.where(ok[:, None], False, pt.obs_valid[s])),
        orig_kf=alloc_scatter(pt.orig_kf, slots, orig_kf),
        orig_px=alloc_scatter(pt.orig_px, slots, orig_px),
        orig_f=alloc_scatter(pt.orig_f, slots, orig_f),
        orig_level=alloc_scatter(pt.orig_level, slots, orig_level),
        orig_type=alloc_scatter(pt.orig_type, slots, orig_type),
        orig_grad=alloc_scatter(pt.orig_grad, slots, orig_grad),
        orig_tile=alloc_scatter(pt.orig_tile, slots, orig_tile),
        orig_tile_xy0=alloc_scatter(pt.orig_tile_xy0, slots,
                                    orig_tile_xy0),
    )
    # the scratch row must stay dead regardless of what landed there
    pt = pt._replace(ptype=pt.ptype.at[pt.ptype.shape[0] - 1].set(
        TYPE_DELETED))
    return pt, slots


def add_point_observations(pt: PointStore, point_ids: jnp.ndarray,
                           kf_slot: jnp.ndarray, feat_idx: jnp.ndarray,
                           valid: jnp.ndarray) -> PointStore:
    """Append (kf_slot, feat_idx) observations to points (Point::addFrameRef).

    point_ids (N,), feat_idx (N,), valid (N,).  Each point gets at most one
    new observation here (one feature per point per keyframe).  The slot is
    the first free obs slot; when full, the OLDEST slot is overwritten
    (ring semantics — the reference list grows unboundedly, we cap).
    """
    N = point_ids.shape[0]
    ok = valid & (point_ids >= 0)
    pid = jnp.where(ok, point_ids, 0)
    # first free slot per point
    free = ~pt.obs_valid[pid]                        # (N, M)
    M = free.shape[1]
    slot = jnp.argmax(free, axis=1)                  # first True, or 0
    has_free = jnp.any(free, axis=1)
    # ring overwrite when full: use (n_succ) as a rotating pointer
    slot = jnp.where(has_free, slot, pt.n_succ[pid] % M)
    pt = pt._replace(
        obs_kf=pt.obs_kf.at[pid, slot].set(
            jnp.where(ok, kf_slot, pt.obs_kf[pid, slot])),
        obs_feat=pt.obs_feat.at[pid, slot].set(
            jnp.where(ok, feat_idx, pt.obs_feat[pid, slot])),
        obs_valid=pt.obs_valid.at[pid, slot].set(
            jnp.where(ok, True, pt.obs_valid[pid, slot])),
    )
    return pt


def delete_keyframe(m: MapState, slot: jnp.ndarray) -> MapState:
    """Map::safeDeleteFrame semantics: deactivate the KF, remove point
    observations referencing it, delete points left with < 2 observations
    (removePtFrameRef, map.cpp:79-99), kill seeds originating from it."""
    kf = m.kf
    ok = slot >= 0
    s = jnp.where(ok, slot, 0)
    kf = kf._replace(
        active=kf.active.at[s].set(jnp.where(ok, False, kf.active[s])),
        frame_id=kf.frame_id.at[s].set(
            jnp.where(ok, -1, kf.frame_id[s])),
        feat_valid=kf.feat_valid.at[s].set(
            jnp.where(ok, jnp.zeros_like(kf.feat_valid[s]),
                      kf.feat_valid[s])),
    )
    pt = m.pt
    hit = pt.obs_valid & (pt.obs_kf == slot) & ok
    obs_valid = pt.obs_valid & ~hit
    n_obs = jnp.sum(obs_valid, axis=-1)
    # affected points (UNKNOWN/GOOD) die when left below 2 refs
    starved = (n_obs < 2) & (pt.ptype >= TYPE_UNKNOWN) \
        & jnp.any(hit, axis=-1)
    # candidates whose origin observation was on this KF die too
    # (MapPointCandidates::removeFrameCandidates semantics)
    cand_dead = (pt.ptype == TYPE_CANDIDATE) & (pt.orig_kf == slot) & ok
    ptype = jnp.where(starved | cand_dead, TYPE_DELETED, pt.ptype)
    pt = pt._replace(obs_valid=obs_valid, ptype=ptype)
    seed = m.seed
    seed = seed._replace(active=seed.active & ~((seed.kf_slot == slot) & ok))
    return m._replace(kf=kf, pt=pt, seed=seed)


def scrub_dead_references(m: MapState) -> MapState:
    """Invalidate keyframe features whose point has been deleted
    (Map::safeDeletePoint's removePtFrameRef side, map.cpp:60-77, done
    lazily in bulk).  MUST run after any pass that deletes points and
    BEFORE the next point allocation, so stale references can never see a
    recycled pool slot."""
    kf = m.kf
    pt = m.pt
    pid = jnp.clip(kf.feat_point, 0, pt.ptype.shape[0] - 1)
    has_pt = kf.feat_point >= 0
    alive = pt.ptype[pid] != TYPE_DELETED
    feat_valid = kf.feat_valid & (~has_pt | alive)
    feat_point = jnp.where(has_pt & ~alive, -1, kf.feat_point)
    # observations of deleted points die with them
    obs_valid = pt.obs_valid & (pt.ptype != TYPE_DELETED)[:, None]
    return m._replace(kf=kf._replace(feat_valid=feat_valid,
                                     feat_point=feat_point),
                      pt=pt._replace(obs_valid=obs_valid))


def n_active_kfs(m: MapState) -> jnp.ndarray:
    return jnp.sum(m.kf.active)


def transform_map(m: MapState, R: jnp.ndarray, t: jnp.ndarray,
                  s: jnp.ndarray) -> MapState:
    """Global similarity transform of the whole map (Map::transform,
    map.cpp:176-193): world points and camera positions map through
    p' = s R p + t; camera orientations rotate by R.

    The reference applies this before seeds exist (bootstrap scale
    normalization); we also rescale the inverse-depth seeds (depths in
    their keyframe's frame scale by s) so it is safe at any time.
    """
    kf = m.kf
    pos_w = kf_positions(kf)                       # (K, 3) camera centers
    pos_new = s * jnp.einsum("ij,kj->ki", R, pos_w) + t
    # T_f_w' = (R_glob R_w_f, pos')^{-1}
    R_wf = jnp.swapaxes(kf.R, -1, -2)
    rot = jnp.einsum("ij,kjl->kil", R, R_wf)       # cam->world after
    T_w_f = SE3(rot, pos_new)
    T_f_w = T_w_f.inverse()
    pt_pos = s * jnp.einsum("ij,pj->pi", R, m.pt.pos) + t
    seed = m.seed
    seed = seed._replace(mu=seed.mu / s, sigma2=seed.sigma2 / (s * s),
                         z_range=seed.z_range / s)
    return m._replace(
        kf=kf._replace(R=T_f_w.R, t=T_f_w.t,
                       kp5_depth=kf.kp5_depth * s),
        pt=m.pt._replace(pos=pt_pos),
        seed=seed)
