"""Patch correspondence engine: affine warp + ZMSSD epipolar search.

TPU-native equivalent of Matcher + the warp:: helpers
(svo/src/matcher.cpp:33-321) and vikit's SSE ZMSSD patch score
(svo/include/svo/matcher.h:72).  Everything is batched over N queries
(map points being reprojected, or depth-filter seeds being updated) with
static shapes: the epipolar scan is padded to a fixed number of steps and
masked, turning the reference's data-dependent while-loops into one
(N, STEPS, 64) gather + reduction; per-item pyramid levels sample through
a FlatPyramid (all levels in one buffer, flat-index gather).

Reproduced reference behavior:
- getWarpMatrixAffine: affine warp ref->cur estimated by projecting the
  patch's +du/+dv corners through the feature's depth plane (:33-55);
- getBestSearchLevel: pyramid level where the warped patch determinant
  is < 3 (:57-70);
- warpAffine: inverse-warp bilinear sampling of the ref patch (:72-105);
- findMatchDirect: warp ref observation patch, align2d at projection
  (:135-177);
- findEpipolarMatchDirect: unit-plane segment d_min..d_max, ~0.7px steps
  capped (reference cap 1000, :251-256), ZMSSD scan, align2d subpixel
  refinement, re-triangulation (:179-321).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.cameras import project2d
from rpg_svo_tpu.geometry.linalg import det2x2, inv2x2
from rpg_svo_tpu.geometry.triangulation import depth_from_triangulation
from rpg_svo_tpu.ops.interp import FlatPyramid


def _bmv2(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(N, 2, 2) x (N, P, 2) -> (N, P, 2) as broadcast-multiply-reduce
    (fuses with neighbors; a batched tiny dot_general is its own kernel)."""
    return jnp.sum(M[:, None, :, :] * v[:, :, None, :], axis=-1)
from rpg_svo_tpu.ops.feature_align import (
    HALFPATCH, PATCH, BORDERED, align2d, align_features,
)

# static cap on epipolar scan steps (reference caps at 1000)
DEFAULT_MAX_STEPS = 128
ZMSSD_THRESHOLD = 2000.0 * PATCH * PATCH

# feature types (svo/include/svo/feature.h:28-32)
FEATURE_CORNER = 0
FEATURE_EDGELET = 1
# epipolar edgelet pre-filter: reject when |grad_cur . epi_dir| is below
# this (epi_search_edgelet_max_angle, matcher.h:90)
EDGELET_MAX_ANGLE_COS = 0.7


def warp_matrix_affine(cam_ref, cam_cur, px_ref: jnp.ndarray,
                       f_ref: jnp.ndarray, depth_ref: jnp.ndarray,
                       T_cur_ref: SE3, level_ref: jnp.ndarray,
                       halfpatch: int = HALFPATCH + 1) -> jnp.ndarray:
    """Affine warp A (N, 2, 2) mapping LEVEL-0 ref px offsets to LEVEL-0
    cur px offsets, estimated at the feature's own pyramid scale."""
    p_ref = f_ref * depth_ref[..., None]
    scale = (2.0 ** level_ref.astype(jnp.float32))[..., None]
    hp = halfpatch
    du = px_ref + jnp.stack([jnp.full_like(depth_ref, hp),
                             jnp.zeros_like(depth_ref)], -1) * scale
    dv = px_ref + jnp.stack([jnp.zeros_like(depth_ref),
                             jnp.full_like(depth_ref, hp)], -1) * scale
    f_du = cam_ref.cam2world(du)
    f_dv = cam_ref.cam2world(dv)
    z = p_ref[..., 2:3]
    p_du = f_du / jnp.where(jnp.abs(f_du[..., 2:3]) < 1e-10, 1e-10,
                            f_du[..., 2:3]) * z
    p_dv = f_dv / jnp.where(jnp.abs(f_dv[..., 2:3]) < 1e-10, 1e-10,
                            f_dv[..., 2:3]) * z
    c0 = cam_cur.world2cam(T_cur_ref.apply(p_ref))
    cu = cam_cur.world2cam(T_cur_ref.apply(p_du))
    cv = cam_cur.world2cam(T_cur_ref.apply(p_dv))
    col0 = (cu - c0) / (hp * scale)
    col1 = (cv - c0) / (hp * scale)
    return jnp.stack([col0, col1], axis=-1)       # (N, 2, 2) level0->level0


def best_search_level(A_level0: jnp.ndarray, level_ref: jnp.ndarray,
                      max_level: int) -> jnp.ndarray:
    """Pyramid level in cur where one REF-LEVEL pixel covers < 3 px^2.

    Reference semantics (matcher.cpp:57-70) with A expressed level0->level0:
    the ref-level determinant is det(A0) * 4^level_ref.
    """
    D = jnp.abs(det2x2(A_level0)) \
        * (4.0 ** level_ref.astype(jnp.float32))
    lvl = jnp.ceil(jnp.log2(jnp.maximum(D, 1e-12) / 3.0) / 2.0)
    return jnp.clip(lvl, 0, max_level).astype(jnp.int32)


def warp_affine_patches(A_level0: jnp.ndarray, ref_pyr: FlatPyramid,
                        px_ref: jnp.ndarray, level_ref: jnp.ndarray,
                        search_level: jnp.ndarray):
    """Inverse-warp 10x10 bordered ref patches (N, 100), valid (N,).

    Patch coords live on the cur `search_level` grid; they are mapped
    through A^{-1} to level-0 ref offsets and sampled from the ref pyramid
    at each feature's own level (proper decimation, like the reference's
    warpAffine sampling img_ref at level_ref).
    """
    Ainv = inv2x2(A_level0 + 1e-9 * jnp.eye(2, dtype=A_level0.dtype))
    r = jnp.arange(BORDERED, dtype=jnp.float32) - (HALFPATCH + 1)
    ys, xs = jnp.meshgrid(r, r, indexing="ij")
    grid = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)     # (100, 2)
    scale_cur = (2.0 ** search_level.astype(jnp.float32))
    scale_ref = (2.0 ** level_ref.astype(jnp.float32))
    pc = grid[None] * scale_cur[:, None, None]              # level-0 cur offs
    po = jnp.sum(Ainv[:, None, :, :] * pc[:, :, None, :], axis=-1)               # level-0 ref offs
    coords = (px_ref[:, None, :] + po) / scale_ref[:, None, None]
    vals, ok = ref_pyr.bilinear(level_ref[:, None], coords)
    return vals, jnp.all(ok, axis=-1)


def zmssd(ref_patch: jnp.ndarray, cur_patch: jnp.ndarray,
          axis: int = -1) -> jnp.ndarray:
    """Zero-mean SSD between patches along `axis` (vikit patch_score)."""
    r = ref_patch - jnp.mean(ref_patch, axis=axis, keepdims=True)
    c = cur_patch - jnp.mean(cur_patch, axis=axis, keepdims=True)
    return jnp.sum((r - c) ** 2, axis=axis)


def warp_affine_patches_tiles(A_level0: jnp.ndarray, tiles: jnp.ndarray,
                              xy0: jnp.ndarray, px_ref: jnp.ndarray,
                              level_ref: jnp.ndarray,
                              search_level: jnp.ndarray):
    """warp_affine_patches sampling from creation-time tiles instead of
    the origin pyramid (identical coordinates; see ops/patches.py)."""
    from rpg_svo_tpu.ops.patches import sample_tiles
    Ainv = inv2x2(A_level0 + 1e-9 * jnp.eye(2, dtype=A_level0.dtype))
    r = jnp.arange(BORDERED, dtype=jnp.float32) - (HALFPATCH + 1)
    ys, xs = jnp.meshgrid(r, r, indexing="ij")
    grid = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)     # (100, 2)
    scale_cur = (2.0 ** search_level.astype(jnp.float32))
    scale_ref = (2.0 ** level_ref.astype(jnp.float32))
    pc = grid[None] * scale_cur[:, None, None]
    po = jnp.sum(Ainv[:, None, :, :] * pc[:, :, None, :], axis=-1)
    coords = (px_ref[:, None, :] + po) / scale_ref[:, None, None]
    # (bicubic here was tried and measured WORSE — the affine warp's
    # anisotropic resampling makes Catmull-Rom overshoot; the cur-side
    # align window is where bicubic pays, ops/feature_align.BICUBIC)
    vals, ok = sample_tiles(tiles, xy0, coords)
    return vals, jnp.all(ok, axis=-1)


def warp_rotated_tiles(A_level0: jnp.ndarray, tiles: jnp.ndarray,
                       xy0: jnp.ndarray, px_ref: jnp.ndarray,
                       level_ref: jnp.ndarray, search_level: jnp.ndarray,
                       dir_lvl: jnp.ndarray):
    """warp_patches_rotated sampling from creation-time tiles."""
    from rpg_svo_tpu.ops.patches import sample_tiles
    Ainv = inv2x2(A_level0 + 1e-9 * jnp.eye(2, dtype=A_level0.dtype))
    r = jnp.arange(PATCH, dtype=jnp.float32) - HALFPATCH
    uu, vv = jnp.meshgrid(r, r, indexing="ij")
    nrm = jnp.stack([-dir_lvl[:, 1], dir_lvl[:, 0]], axis=-1)
    offs = (uu.ravel()[None, :, None] * dir_lvl[:, None, :]
            + vv.ravel()[None, :, None] * nrm[:, None, :])
    scale_cur = (2.0 ** search_level.astype(jnp.float32))
    scale_ref = (2.0 ** level_ref.astype(jnp.float32))
    po = _bmv2(Ainv,
                    offs * scale_cur[:, None, None])
    coords = (px_ref[:, None, :] + po) / scale_ref[:, None, None]
    vals, ok = sample_tiles(tiles, xy0, coords)
    return vals, jnp.all(ok, axis=-1)


class EpipolarMatch(NamedTuple):
    px_cur: jnp.ndarray      # (N, 2) level-0 coords of the match
    depth_ref: jnp.ndarray   # (N,) triangulated depth along f_ref
    level_cur: jnp.ndarray   # (N,) search level used
    success: jnp.ndarray     # (N,) bool
    # False only for long-segment items beyond the two-tier long budget
    # (epi_long_k): they were not scanned this call and must not receive
    # failure evidence (the reference's mapping thread similarly defers
    # seeds it has no time for, depth_filter.cpp:197-213)
    scanned: jnp.ndarray     # (N,) bool


class EpipolarGeom(NamedTuple):
    """Search geometry shared by the ref-patch samplers and the scan."""
    A: jnp.ndarray            # (N, 2, 2) level0->level0 affine warp
    search_level: jnp.ndarray  # (N,)
    scale: jnp.ndarray        # (N,) 2^search_level
    pxA: jnp.ndarray          # (N, 2) near endpoint, search-level coords
    dir_lvl: jnp.ndarray      # (N, 2) unit epipolar dir, search-level px
    n_steps: jnp.ndarray      # (N,) int32 scan steps at 1px spacing


def epipolar_geometry(cam, T_cur_ref: SE3, px_ref, f_ref, level_ref,
                      d_estimate, d_min, d_max,
                      max_steps: int = DEFAULT_MAX_STEPS,
                      max_level: int = 4) -> EpipolarGeom:
    """Warp matrix, search level, and the epipolar segment at that level
    (matcher.cpp:179-260 preamble), independent of how ref patches are
    sampled."""
    pA = T_cur_ref.apply(f_ref * d_min[:, None])     # near endpoint
    pB = T_cur_ref.apply(f_ref * d_max[:, None])     # far endpoint
    uvA = project2d(pA)
    uvB = project2d(pB)

    A = warp_matrix_affine(cam, cam, px_ref, f_ref, d_estimate,
                           T_cur_ref, level_ref)
    search_level = best_search_level(A, level_ref, max_level)

    # bump the level until the segment fits max_steps at 1px spacing
    pxA0 = cam.project_unitplane(uvA)
    pxB0 = cam.project_unitplane(uvB)
    seg0 = jnp.linalg.norm(pxB0 - pxA0, axis=-1)     # level-0 px
    need = jnp.ceil(jnp.log2(jnp.maximum(
        seg0 / (2.0 ** search_level.astype(jnp.float32))
        / (max_steps - 1.0), 1.0)))
    search_level = jnp.clip(search_level + need.astype(jnp.int32),
                            0, max_level)
    scale = 2.0 ** search_level.astype(jnp.float32)

    pxA = pxA0 / scale[:, None]
    pxB = pxB0 / scale[:, None]
    seg = pxB - pxA
    seg_len = jnp.linalg.norm(seg, axis=-1)
    dir_lvl = seg / jnp.maximum(seg_len, 1e-9)[:, None]
    degen = seg_len < 1e-6
    dir_lvl = jnp.where(degen[:, None], jnp.array([1.0, 0.0]), dir_lvl)
    n_steps = jnp.clip(seg_len.astype(jnp.int32) + 1, 1, max_steps)
    return EpipolarGeom(A, search_level, scale, pxA, dir_lvl, n_steps)


def warp_patches_rotated(A_level0: jnp.ndarray, ref_pyr,
                         px_ref: jnp.ndarray, level_ref: jnp.ndarray,
                         search_level: jnp.ndarray, dir_lvl: jnp.ndarray):
    """Ref 8x8 patches sampled in the (epipolar-dir, normal) basis of the
    CURRENT frame, inverse-warped into the ref pyramid.  dir_lvl (N, 2) is
    the unit epipolar direction in search-level px.  Returns
    (patch (N, 64), valid (N,))."""
    Ainv = inv2x2(A_level0 + 1e-9 * jnp.eye(2, dtype=A_level0.dtype))
    r = jnp.arange(PATCH, dtype=jnp.float32) - HALFPATCH
    # flat order MUST match the scan windows built from the strip:
    # index p = u * 8 + v (u = along-line offset slow, v = normal fast)
    uu, vv = jnp.meshgrid(r, r, indexing="ij")
    nrm = jnp.stack([-dir_lvl[:, 1], dir_lvl[:, 0]], axis=-1)
    # (N, 64, 2) rotated offsets in search-level px
    offs = (uu.ravel()[None, :, None] * dir_lvl[:, None, :]
            + vv.ravel()[None, :, None] * nrm[:, None, :])
    scale_cur = (2.0 ** search_level.astype(jnp.float32))
    scale_ref = (2.0 ** level_ref.astype(jnp.float32))
    po = _bmv2(Ainv,
                    offs * scale_cur[:, None, None])      # level-0 ref offs
    coords = (px_ref[:, None, :] + po) / scale_ref[:, None, None]
    vals, ok = ref_pyr.bilinear(level_ref[:, None], coords)
    return vals, jnp.all(ok, axis=-1)


@functools.partial(jax.jit, static_argnames=("max_steps", "n_iter",
                                             "max_level", "align_1d",
                                             "short_steps", "long_k",
                                             "scan_rows"))
def epipolar_match(cur_pyr: FlatPyramid,
                   ref_pyr: FlatPyramid,
                   cam,
                   T_cur_ref: SE3,            # batched (N,) or scalar SE3
                   px_ref: jnp.ndarray,       # (N, 2) level-0
                   f_ref: jnp.ndarray,        # (N, 3) unit bearing
                   level_ref: jnp.ndarray,    # (N,)
                   d_estimate: jnp.ndarray,   # (N,)
                   d_min: jnp.ndarray,        # (N,)
                   d_max: jnp.ndarray,        # (N,)
                   valid: jnp.ndarray,        # (N,)
                   max_steps: int = DEFAULT_MAX_STEPS,
                   n_iter: int = 10,
                   max_level: int = 4,
                   ftr_type: jnp.ndarray | None = None,  # (N,) FEATURE_*
                   ftr_grad: jnp.ndarray | None = None,  # (N, 2)
                   align_1d: bool = False,
                   short_steps: int = 0,
                   long_k: int = 0,
                   scan_rows: int = PATCH) -> EpipolarMatch:
    """Batched epipolar ZMSSD search + subpixel refinement + triangulation.

    Compatibility wrapper sampling ref patches from a pyramid; the fused
    hot path samples from creation-time tiles instead (ops/patches.py)
    and calls epipolar_geometry + epipolar_search directly.
    """
    geom = epipolar_geometry(cam, T_cur_ref, px_ref, f_ref, level_ref,
                             d_estimate, d_min, d_max, max_steps,
                             max_level)
    # ref patches: axis-aligned bordered (for align2d) + rotated (for scan)
    ref_patch_border, ref_ok = warp_affine_patches(
        geom.A, ref_pyr, px_ref, level_ref, geom.search_level)
    ref_rot, rot_ok = warp_patches_rotated(
        geom.A, ref_pyr, px_ref, level_ref, geom.search_level,
        geom.dir_lvl)
    return epipolar_search(cur_pyr, cam, geom, T_cur_ref, f_ref,
                           ref_patch_border, ref_rot, ref_ok & rot_ok,
                           valid, max_steps=max_steps, n_iter=n_iter,
                           ftr_type=ftr_type, ftr_grad=ftr_grad,
                           align_1d=align_1d, short_steps=short_steps,
                           long_k=long_k, scan_rows=scan_rows)


def _strip_scan(cur_pyr: FlatPyramid, pxA: jnp.ndarray,
                dir_lvl: jnp.ndarray, search_level: jnp.ndarray,
                n_steps: jnp.ndarray, ref_rot: jnp.ndarray,
                steps: int, scan_rows: int = PATCH):
    """ZMSSD over `steps` 1-px windows along the epipolar line.

    ONE rotated strip of 8 x (steps+8) nearest samples is gathered along
    the line, laid out with the LONG scan axis last (TPU lane dim; the
    8-row axis rides the sublanes).  The per-window ZMSSD is computed
    incrementally from 8 shifted slices of the strip via the expansion
      ZMSSD(s) = sum(w^2) - (sum w)^2/64 - 2*sum(w*r') + sum(r'^2)
    (r' = zero-meaned ref patch), so no (N, S, 64) im2col window tensor
    is ever materialized — every intermediate is a clean (N, S) or
    (N, 8, S) array.  [The earlier (N, S+8, 8) trailing-8 im2col layout
    also intermittently faulted the TPU worker at execution — same
    miscompile class as the odd-leading-dim table faults; this
    formulation avoids those layouts by construction.]
    scan_rows < PATCH subsamples the strip's normal-direction rows (e.g.
    4 of 8) for the SCAN only — the gather is per-sample latency-bound,
    so this halves the scan's gather cost; the full 8x8 align2d
    refinement afterwards is unchanged.  The ZMSSD normalization, ref
    zero-meaning and validity count all use the subsampled window.

    Returns (best_score (N,), best_step (N,)) with inf score where no
    window in [0, min(n_steps, steps)) was fully inside the level."""
    assert PATCH % scan_rows == 0
    row_sel = tuple(range(0, PATCH, PATCH // scan_rows))
    nrm = jnp.stack([-dir_lvl[:, 1], dir_lvl[:, 0]], axis=-1)
    cs = jnp.arange(steps + PATCH, dtype=jnp.float32) - HALFPATCH
    rs = (jnp.arange(PATCH, dtype=jnp.float32) - HALFPATCH)[
        jnp.asarray(row_sel)]
    coords = (pxA[:, None, None, :]
              + rs[None, :, None, None] * nrm[:, None, None, :]
              + cs[None, None, :, None] * dir_lvl[:, None, None, :])
    # nearest-neighbor: 1 gather/sample (reference scans integer pixels
    # too); align2d afterwards recovers the subpixel position.
    # Narrow strips (S+8 < 128) gather through a flat 1-D index vector
    # instead of an (N, 8, S+8)-shaped one: gathers whose output arrays
    # have sub-128 lane dims hit the same TPU layout miscompile class as
    # the 120-row feature-table fault (worker dies at execution; see
    # CLAUDE.md), and 1-D outputs are trivially tiled.  The wide 136-lane
    # shape is the long-proven-stable program — leave its HLO untouched.
    N_, W_ = pxA.shape[0], steps + PATCH
    if W_ < 128:
        # pad the item axis until the flat vector is a multiple of 128
        # (dN <= 15; duplicated row-0 queries, sliced away after) rather
        # than falling back to the fault-implicated (N, 8, S+8)-shaped
        # gather for awkward N
        dN = 0
        while ((N_ + dN) * scan_rows * W_) % 128:
            dN += 1
        cq = coords if dN == 0 else jnp.concatenate(
            [coords, jnp.broadcast_to(coords[:1],
                                      (dN,) + coords.shape[1:])])
        lq = search_level if dN == 0 else jnp.concatenate(
            [search_level, jnp.broadcast_to(search_level[:1], (dN,))])
        lvl_b = jnp.broadcast_to(lq[:, None, None],
                                 (N_ + dN, scan_rows, W_)).reshape(-1)
        strip, strip_ok = cur_pyr.nearest(lvl_b, cq.reshape(-1, 2))
        strip = strip.reshape(N_ + dN, scan_rows, W_)[:N_]
        strip_ok = strip_ok.reshape(N_ + dN, scan_rows, W_)[:N_]
    else:
        strip, strip_ok = cur_pyr.nearest(
            search_level[:, None, None], coords)          # (N, 8, S+8)
    okf = strip_ok.astype(strip.dtype)
    # Pad the scan axis (the TPU lane dimension) up to a multiple of 128
    # AFTER the gather: programs whose window arrays had 16/64-lane
    # layouts faulted the TPU worker at execution (same miscompile class
    # as the 120-row feature-table fault; the 128-lane program has been
    # stable — see CLAUDE.md).  Gather traffic, the actual cost, stays at
    # steps+8 samples per row; the padded lanes are masked dense math.
    csteps = -(-steps // 128) * 128
    if csteps != steps:
        pad = ((0, 0), (0, 0), (0, csteps - steps))
        strip = jnp.pad(strip, pad)
        okf = jnp.pad(okf, pad)
    # ref patch in (u=along-dir, r=row) order, subsampled to the scanned
    # rows and zero-meaned over the SAME window as the strip samples
    r2 = ref_rot.reshape(-1, PATCH, PATCH)[:, :, row_sel]
    r2 = r2 - jnp.mean(r2, axis=(1, 2))[:, None, None]  # (N, 8u, rows)
    swin = jnp.zeros((strip.shape[0], csteps), strip.dtype)
    s2win = jnp.zeros_like(swin)
    cross = jnp.zeros_like(swin)
    nok = jnp.zeros_like(swin)
    for u in range(PATCH):
        sl = strip[:, :, u: u + csteps]                   # (N, 8, 128k)
        swin = swin + jnp.sum(sl, axis=1)
        s2win = s2win + jnp.sum(sl * sl, axis=1)
        cross = cross + jnp.sum(sl * r2[:, u, :, None], axis=1)
        nok = nok + jnp.sum(okf[:, :, u: u + csteps], axis=1)
    rss = jnp.sum(r2 * r2, axis=(1, 2))                   # (N,)
    sc = s2win - swin * swin * (1.0 / (PATCH * scan_rows)) \
        - 2.0 * cross + rss[:, None]                      # (N, 128k)
    wok = nok >= float(PATCH * scan_rows) - 0.5
    step_ids = jnp.arange(csteps, dtype=jnp.int32)[None, :]
    # (n_steps can exceed `steps` only in the padded/short-tier case; keep
    # the csteps == steps HLO identical to the proven-stable program)
    lim = n_steps if csteps == steps else jnp.minimum(n_steps, steps)
    sc = jnp.where((step_ids < lim[:, None]) & wok, sc, jnp.inf)
    return jnp.min(sc, axis=1), jnp.argmin(sc, axis=1).astype(jnp.int32)


def epipolar_search(cur_pyr: FlatPyramid, cam, geom: EpipolarGeom,
                    T_cur_ref: SE3, f_ref: jnp.ndarray,
                    ref_patch_border: jnp.ndarray,  # (N, 100)
                    ref_rot: jnp.ndarray,           # (N, 64)
                    ref_ok: jnp.ndarray,            # (N,)
                    valid: jnp.ndarray,             # (N,)
                    max_steps: int = DEFAULT_MAX_STEPS,
                    n_iter: int = 10,
                    ftr_type: jnp.ndarray | None = None,
                    ftr_grad: jnp.ndarray | None = None,
                    align_1d: bool = False,
                    cur_pad=None,
                    short_steps: int = 0,
                    long_k: int = 0,
                    scan_rows: int = PATCH) -> EpipolarMatch:
    """ZMSSD scan along the epipolar segment + align2d + triangulation.

    cur_pad: optional PaddedPyramid of the current frame — routes the
    subpixel-refinement tile gathers through the Pallas aligned-load
    kernel (ops/pallas_tiles.py) instead of XLA scattered gathers.

    TPU-shaped scan: instead of gathering an 8x8 patch at every scan
    position (O(steps*64) scattered gathers per seed — the throughput
    killer), ONE rotated strip of (max_steps+8) x 8 samples is gathered
    along the epipolar line and every scan window becomes a static slice
    of the strip (im2col); the ZMSSD over all windows is then dense VPU
    math.  Scan spacing is exactly 1px at the search level; segments
    longer than max_steps px bump the search level so the whole range is
    always covered (coarser, then recovered by align2d).
    """
    pxA = geom.pxA
    dir_lvl = geom.dir_lvl
    search_level = geom.search_level
    n_steps = geom.n_steps
    N = pxA.shape[0]
    scanned = jnp.ones((N,), bool)

    # (A per-seed Pallas scan kernel was tried here and removed: its
    # per-item serial VPU loops measured ~2x slower end to end than this
    # strip formulation — 62-66 vs 117 fps on the round-1 bench.)
    if short_steps and short_steps < max_steps:
        # Two-tier scan: the strip gather is per-element latency-bound
        # (~9 ns/sample scattered-gather floor), so its cost is set by
        # TOTAL samples.  Most mature seeds scan only a few px — they get
        # a short (short_steps+8) x 8 strip in place; the few long
        # segments are compacted to `long_k` slots and scanned at full
        # width.  Longs beyond the budget are deferred (scanned=False).
        from rpg_svo_tpu.core.map import mask_compact
        is_short = n_steps <= short_steps
        sc_s, bi_s = _strip_scan(cur_pyr, pxA, dir_lvl, search_level,
                                 n_steps, ref_rot, short_steps,
                                 scan_rows=scan_rows)
        # long-tier table rounded UP to a multiple of 128: odd leading
        # dims (e.g. 96) deterministically fault the TPU worker at
        # execution (layout/tiling miscompile — same failure mode as the
        # 120-row feature-table fault; see CLAUDE.md)
        kl = min(-(-(long_k or N) // 128) * 128, N)
        sel, okl = mask_compact((~is_short) & valid & ref_ok, kl)
        sc_lc, bi_lc = _strip_scan(
            cur_pyr, pxA[sel], dir_lvl[sel], search_level[sel],
            jnp.where(okl, n_steps[sel], 0), ref_rot[sel], max_steps,
            scan_rows=scan_rows)
        tgt = jnp.where(okl, sel, N)     # padding rows -> dropped slot
        # scatter buffers padded to N+128, not N+1: odd-length 1-D
        # scatters (e.g. 513) are in the TPU layout-miscompile class that
        # faults the worker at execution (see CLAUDE.md); the overflow
        # region [N, N+128) absorbs dropped rows either way
        sc_l = jnp.full((N + 128,), jnp.inf).at[tgt].set(
            jnp.where(okl, sc_lc, jnp.inf))[:N]
        bi_l = jnp.zeros((N + 128,), jnp.int32).at[tgt].set(bi_lc)[:N]
        long_done = jnp.zeros((N + 128,), bool).at[tgt].set(okl)[:N]
        best_score = jnp.where(is_short, sc_s, sc_l)
        bi = jnp.where(is_short, bi_s, bi_l)
        scanned = is_short | long_done
    else:
        best_score, bi = _strip_scan(cur_pyr, pxA, dir_lvl, search_level,
                                     n_steps, ref_rot, max_steps,
                                     scan_rows=scan_rows)
    best_px = pxA + bi[:, None].astype(jnp.float32) * dir_lvl

    found = jnp.isfinite(best_score) & valid & ref_ok
    # threshold scales with the scanned window's sample count
    found = found & (best_score < 2000.0 * PATCH * scan_rows)

    # edgelet pre-filter (matcher.cpp:204-211): reject seeds whose warped
    # gradient is nearly orthogonal to the epipolar direction — the 1-D
    # scan cannot localize along an edge parallel to itself
    if ftr_type is not None:
        grad_cur = jnp.sum(geom.A * ftr_grad[:, None, :], axis=-1)
        grad_cur = grad_cur / jnp.maximum(
            jnp.linalg.norm(grad_cur, axis=-1, keepdims=True), 1e-12)
        cosangle = jnp.abs(jnp.sum(grad_cur * dir_lvl, axis=-1))
        reject = (ftr_type == FEATURE_EDGELET) \
            & (cosangle < EDGELET_MAX_ANGLE_COS)
        found = found & ~reject

    # subpixel refinement at the search level; align_1d constrains the
    # refinement along the epipolar direction (matcher.h options_.align_1d)
    align_src = cur_pad if cur_pad is not None else cur_pyr
    if align_1d:
        px_ref_out, conv = align_features(
            align_src, ref_patch_border, best_px, found, n_iter,
            level=search_level, direction=dir_lvl,
            is_1d=jnp.ones(best_px.shape[:1], bool))
    else:
        px_ref_out, conv = align2d(align_src, ref_patch_border, best_px,
                                   found, n_iter, level=search_level)
    px_ref_out = jnp.where(conv[:, None], px_ref_out, best_px)

    # triangulate refined match
    px0 = px_ref_out * geom.scale[:, None]                # level-0 coords
    f_cur = cam.cam2world(px0)
    d_ref, d_cur, tri_ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    success = conv & found & tri_ok & (d_ref > 0)
    return EpipolarMatch(px0, d_ref, search_level, success, scanned)


class DirectMatch(NamedTuple):
    px_cur: jnp.ndarray      # (N, 2) refined level-0 coords
    level_cur: jnp.ndarray   # (N,)
    success: jnp.ndarray     # (N,)
    grad_cur: jnp.ndarray    # (N, 2) warped unit gradient dir (edgelets)


@functools.partial(jax.jit, static_argnames=("n_iter", "max_level"))
def find_match_direct(cur_pyr: FlatPyramid,
                      ref_pyr: FlatPyramid,
                      cam,
                      T_cur_ref: SE3,          # batched over N
                      px_ref: jnp.ndarray,     # (N, 2) ref obs pixel
                      f_ref: jnp.ndarray,      # (N, 3) ref obs bearing
                      level_ref: jnp.ndarray,  # (N,)
                      depth_ref: jnp.ndarray,  # (N,) point depth in ref
                      px_cur_init: jnp.ndarray,  # (N, 2) projected guess
                      valid: jnp.ndarray,
                      n_iter: int = 10,
                      max_level: int = 4,
                      ftr_type: jnp.ndarray | None = None,  # (N,) FEATURE_*
                      ftr_grad: jnp.ndarray | None = None   # (N, 2)
                      ) -> DirectMatch:
    """Matcher::findMatchDirect (matcher.cpp:135-177): warp the reference
    observation's patch and align it at the projected location.  Edgelet
    observations (ftr_type == FEATURE_EDGELET) refine 1-D along the
    warped gradient direction A_cur_ref . grad (matcher.cpp:161-167);
    corners refine 2-D."""
    A = warp_matrix_affine(cam, cam, px_ref, f_ref, depth_ref,
                           T_cur_ref, level_ref)
    search_level = best_search_level(A, level_ref, max_level)
    patch_border, ref_ok = warp_affine_patches(
        A, ref_pyr, px_ref, level_ref, search_level)
    return _direct_align(cur_pyr, A, search_level, patch_border, ref_ok,
                         px_cur_init, valid, n_iter, ftr_type, ftr_grad)


def find_match_direct_tiles(cur_pyr: FlatPyramid,
                            ref_tiles: jnp.ndarray,   # (N, T, T)
                            ref_xy0: jnp.ndarray,     # (N, 2)
                            cam,
                            T_cur_ref: SE3,
                            px_ref: jnp.ndarray,
                            f_ref: jnp.ndarray,
                            level_ref: jnp.ndarray,
                            depth_ref: jnp.ndarray,
                            px_cur_init: jnp.ndarray,
                            valid: jnp.ndarray,
                            n_iter: int = 10,
                            max_level: int = 4,
                            ftr_type: jnp.ndarray | None = None,
                            ftr_grad: jnp.ndarray | None = None,
                            cur_pad=None) -> DirectMatch:
    """find_match_direct with ref patches from creation-time tiles (the
    fused hot path: no keyframe-pyramid reads)."""
    A = warp_matrix_affine(cam, cam, px_ref, f_ref, depth_ref,
                           T_cur_ref, level_ref)
    search_level = best_search_level(A, level_ref, max_level)
    patch_border, ref_ok = warp_affine_patches_tiles(
        A, ref_tiles, ref_xy0, px_ref, level_ref, search_level)
    src = cur_pad if cur_pad is not None else cur_pyr
    return _direct_align(src, A, search_level, patch_border, ref_ok,
                         px_cur_init, valid, n_iter, ftr_type, ftr_grad)


def _direct_align(cur_pyr, A, search_level, patch_border, ref_ok,
                  px_cur_init, valid, n_iter,
                  ftr_type, ftr_grad) -> DirectMatch:
    N = px_cur_init.shape[0]
    scale = 2.0 ** search_level.astype(jnp.float32)
    px_lvl = px_cur_init / scale[:, None]
    if ftr_type is None:
        is_edge = jnp.zeros((N,), bool)
        grad = jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32), (N, 1))
    else:
        is_edge = ftr_type == FEATURE_EDGELET
        grad = ftr_grad
    dir_cur = jnp.sum(A * grad[:, None, :], axis=-1)
    dir_cur = dir_cur / jnp.maximum(
        jnp.linalg.norm(dir_cur, axis=-1, keepdims=True), 1e-12)
    px2, conv = align_features(cur_pyr, patch_border, px_lvl,
                               valid & ref_ok, n_iter, level=search_level,
                               direction=dir_cur, is_1d=is_edge)
    out_px = jnp.where(conv[:, None], px2, px_lvl)
    return DirectMatch(out_px * scale[:, None], search_level, conv,
                       dir_cur)
