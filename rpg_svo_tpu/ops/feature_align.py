"""Subpixel feature alignment (batched inverse-compositional KLT).

TPU-native equivalent of feature_alignment::align2D / align1D and their
SSE2/NEON variants (svo/src/feature_alignment.cpp:30-598).  The reference
refines ONE 8x8 patch at a time with hand-vectorized intrinsics; here the
batch dimension is ALL candidate features/seeds at once, so the whole
refinement is a few (N, 64) gathers and FMAs per iteration on the VPU —
the per-patch SIMD becomes per-batch vectorization.

Semantics preserved:
- 8x8 patch, gradients from a 10x10 patch-with-border;
- estimated parameters: (u, v, mean_diff) for align2D, (offset-along-dir,
  mean_diff) for align1D — mean_diff models affine illumination offset;
- inverse compositional: Hessian from reference patch, fixed across
  iterations; per-iteration residual against the current image;
- convergence when the position update < 0.03 px (feature_alignment.cpp
  conv_thresh), fixed max iteration count, per-item convergence masks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.ops.interp import bilinear, FlatPyramid
from rpg_svo_tpu.geometry.linalg import inv2x2, inv3x3

HALFPATCH = 4
PATCH = 2 * HALFPATCH          # 8
BORDERED = PATCH + 2           # 10
CONV_EPS = 0.03 * 0.03
# Window interpolation of the refinement: 4-tap Catmull-Rom instead of
# the reference's bilinear.  Bilinear resampling carries a subpixel-
# phase-dependent localization bias that sets the matching-noise floor
# (measured ~0.026 px on the flat depth-filter protocol); the cubic
# kernel's flat phase response removes most of it.  The selection
# contraction cost is identical (4 nonzeros per row instead of 2 in the
# same (PATCH, TILE) matrices), but the tap/weight CONSTRUCTION is ~2x
# the elementwise ops — measured ~0.05 ms/frame on the accurate-preset
# bench (441.6 -> 432.9 fps) for ~12% better depth-filter golden tails
# and 1.94 -> 1.90 mm trajectory accuracy.  BICUBIC_LAST < n_iter runs
# bilinear for the early iterations and cubic only for the last few
# (the fixed point is a property of the interpolant used at
# convergence); measured roughly half the cost at marginally worse
# tails — kept available as a knob, default all-cubic.
# Trace-time constants (env hooks for measurement/bisect only).
import os as _os
BICUBIC = _os.environ.get("SVO_BICUBIC", "1") != "0"
BICUBIC_LAST = int(_os.environ.get("SVO_BICUBIC_LAST", "10"))
# Slack of the per-feature intensity tile around the initial position.
# The tile is gathered ONCE (TILE^2 scattered gathers, ~ the cost of a
# single bilinear iteration); every GN iteration then samples the moving
# 8x8 window from it with dense one-hot selection matmuls — zero further
# gathers.  Items drifting more than SLACK px from the start fail (the
# reference lets them wander, but such wanderers virtually never converge
# within its 0.03px/10-iter budget either).
SLACK = 4
TILE = PATCH + 1 + 2 * SLACK   # 17


def extract_patch_with_border(img: jnp.ndarray, centers: jnp.ndarray):
    """Bilinear 10x10 patches around centers (N, 2) -> (N, 100), valid (N,)."""
    r = jnp.arange(BORDERED, dtype=jnp.float32) - (HALFPATCH + 1)
    ys, xs = jnp.meshgrid(r, r, indexing="ij")
    grid = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)   # (100, 2)
    coords = centers[:, None, :] + grid[None]
    vals, ok = bilinear(img, coords)
    return vals, jnp.all(ok, axis=-1)


def _gather_tile(cur_img, level, px_init):
    """One (TILE, TILE) integer-pixel tile per feature around px_init.

    Returns (base (N,2) float (x,y) of the tile origin, tile (N,T,T),
    ok (N,T,T)).

    cur_img may be a PaddedPyramid (Pallas aligned-load fast path: the
    tile origin is CLAMPED into the level, so tiles are always fully
    backed — targets that would leave the image fail via the window
    in-bounds check), a FlatPyramid, or a raw (H, W) image (XLA gathers,
    tiles may extend outside with per-pixel ok marks)."""
    from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid, gather_tiles
    base = jnp.floor(px_init).astype(jnp.int32) - HALFPATCH - SLACK
    if isinstance(cur_img, PaddedPyramid):
        vals, x0c, y0c = gather_tiles(cur_img, level, base[:, 0],
                                      base[:, 1], TILE, TILE)
        basec = jnp.stack([x0c, y0c], axis=-1)
        ok = jnp.ones(vals.shape, bool)
        return basec.astype(jnp.float32), vals, ok
    r = jnp.arange(TILE, dtype=jnp.int32)
    xg = base[:, 0, None, None] + r[None, None, :]
    yg = base[:, 1, None, None] + r[None, :, None]
    if isinstance(cur_img, FlatPyramid):
        xy = jnp.stack(jnp.broadcast_arrays(xg, yg), axis=-1)
        vals, ok = cur_img.nearest(level[:, None, None],
                                   xy.astype(jnp.float32))
    else:
        H, W = cur_img.shape
        ok = (xg >= 0) & (yg >= 0) & (xg < W) & (yg < H)
        idx = jnp.clip(yg, 0, H - 1) * W + jnp.clip(xg, 0, W - 1)
        vals = jnp.where(ok, cur_img.reshape(-1)[idx], 0.0)
    return base.astype(jnp.float32), vals, ok


def _select_mats(o, need_support: bool = True, bicubic: bool = False):
    """Interpolating row/col selection matrices for window offset o (N, 2).

    Returns (Px, Py) each (N, PATCH, TILE) with the two-tap bilinear (or
    four-tap Catmull-Rom, bicubic=True) weights, plus (PxB, PyB) binary
    support masks (None when need_support=False) and an in-bounds mask."""
    oi = jnp.floor(o).astype(jnp.int32)
    w = o - oi
    i8 = jnp.arange(PATCH, dtype=jnp.int32)[None, :, None]
    jT = jnp.arange(TILE, dtype=jnp.int32)[None, None, :]

    if bicubic:
        from rpg_svo_tpu.ops.patches import catmull_rom_weights

        def sel(oid, t):
            m = 0.0
            sup = 0.0
            for k, wk in enumerate(catmull_rom_weights(t)):
                tap = (jT == i8 + oid[:, None, None] + (k - 1))
                m = m + tap.astype(jnp.float32) * wk[:, None, None]
                if need_support:
                    sup = sup + tap.astype(jnp.float32)
            return m, sup if need_support else None
        lo, hi = 1, TILE - PATCH - 2
    else:
        def sel(oid, wd):
            a = (jT == i8 + oid[:, None, None])
            b = (jT == i8 + oid[:, None, None] + 1)
            m = a.astype(jnp.float32) * (1.0 - wd)[:, None, None] \
                + b.astype(jnp.float32) * wd[:, None, None]
            return m, (a | b).astype(jnp.float32) if need_support else None
        lo, hi = 0, TILE - PATCH - 1

    Px, PxB = sel(oi[:, 0], w[:, 0])
    Py, PyB = sel(oi[:, 1], w[:, 1])
    inb = (oi[:, 0] >= lo) & (oi[:, 1] >= lo) \
        & (oi[:, 0] <= hi) & (oi[:, 1] <= hi)
    return Px, Py, PxB, PyB, inb


def _window(tile, okf, o, full_ok: bool = False, bicubic: bool = False):
    """Sample the 8x8 interpolated window at float offset o from the tile.

    Returns (cur (N, 64) row-major y*8+x, usable (N,)).  full_ok=True
    (tiles from the Pallas aligned loader: every pixel backed) skips the
    tap support reduction — in-bounds alone decides usability."""
    Px, Py, PxB, PyB, inb = _select_mats(o, need_support=not full_ok,
                                         bicubic=bicubic)
    # broadcast-multiply-reduce instead of einsum: a batched (8,17)@(17,17)
    # dot_general is a separate (MXU-padded) kernel per call site, which
    # breaks XLA fusion of the GN iteration; explicit reduces fuse with
    # the surrounding elementwise ops into one kernel (the step is
    # kernel-count-bound on TPU, ~2-5us dispatch per kernel)
    cur = jnp.sum(Py[:, :, :, None] * tile[:, None, :, :], axis=2)
    cur = jnp.sum(cur[:, :, None, :] * Px[:, None, :, :], axis=3)
    if full_ok:
        usable = inb
    else:
        support = jnp.sum(PyB[:, :, :, None] * okf[:, None, :, :], axis=2)
        support = jnp.sum(support[:, :, None, :] * PxB[:, None, :, :],
                          axis=(1, 2, 3))        # taps^2 per px if valid
        taps2 = 16.0 if bicubic else 4.0
        usable = inb & (support >= taps2 * PATCH * PATCH - 0.5)
    return cur.reshape(-1, PATCH * PATCH), usable


def _border_gradients(patch_b: jnp.ndarray):
    """Gradients of the inner 8x8 from a (N, 100) bordered patch."""
    pb = patch_b.reshape(-1, BORDERED, BORDERED)
    inner = pb[:, 1:-1, 1:-1]
    dx = 0.5 * (pb[:, 1:-1, 2:] - pb[:, 1:-1, :-2])
    dy = 0.5 * (pb[:, 2:, 1:-1] - pb[:, :-2, 1:-1])
    return (inner.reshape(-1, PATCH * PATCH),
            dx.reshape(-1, PATCH * PATCH),
            dy.reshape(-1, PATCH * PATCH))


@functools.partial(jax.jit, static_argnames=("n_iter",))
def align_features(cur_img,
                   ref_patch_border: jnp.ndarray,   # (N, 100)
                   px_init: jnp.ndarray,            # (N, 2) level coords
                   valid: jnp.ndarray,              # (N,)
                   n_iter: int = 10,
                   level: jnp.ndarray | None = None,
                   direction: jnp.ndarray | None = None,  # (N, 2) unit
                   is_1d: jnp.ndarray | None = None       # (N,) bool
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unified batched subpixel refinement; returns (px, converged (N,)).

    Items with is_1d=False run the 3-param (u, v, mean_diff) align2D;
    items with is_1d=True run the 2-param align1D constrained along
    `direction` (edgelets: matcher.cpp:161-167; both share one tile
    gather and one window sampling per iteration).

    cur_img: (H, W) image (px in that image's coords), or a FlatPyramid
    with `level` (N,) giving each item's pyramid level (px in level
    coords).
    """
    N = px_init.shape[0]
    if direction is None:
        direction = jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32), (N, 1))
    if is_1d is None:
        is_1d = jnp.zeros((N,), bool)
    ref, dx, dy = _border_gradients(ref_patch_border)
    ones = jnp.ones_like(dx)
    # 2-D: fixed 3x3 Hessian per item, J2 = [dx, dy, 1]
    J2 = jnp.stack([dx, dy, ones], axis=-1)           # (N, 64, 3)
    H2 = jnp.sum(J2[:, :, :, None] * J2[:, :, None, :], axis=1)
    H2inv = inv3x3(H2 + 1e-9 * jnp.eye(3))
    # 1-D: directional gradient, J1 = [dd, 1]
    dd = dx * direction[:, None, 0] + dy * direction[:, None, 1]
    J1 = jnp.stack([dd, ones], axis=-1)               # (N, 64, 2)
    H1 = jnp.sum(J1[:, :, :, None] * J1[:, :, None, :], axis=1)
    H1inv = inv2x2(H1 + 1e-9 * jnp.eye(2))

    from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid
    full_ok = isinstance(cur_img, PaddedPyramid)   # tiles always backed
    base, tile, tok = _gather_tile(cur_img, level, px_init)
    okf = tok.astype(jnp.float32)

    def body(it, state):
        uvm, conv = state                              # (N, 3), (N,)
        o = uvm[:, :2] - HALFPATCH - base
        cubic = BICUBIC and it >= n_iter - BICUBIC_LAST
        cur, in_img = _window(tile, okf, o, full_ok,
                              bicubic=cubic)           # (N, 64), (N,)
        res = cur - ref + uvm[:, 2:3]                  # (N, 64)
        # 2-D update
        Jres2 = jnp.sum(res[:, :, None] * J2, axis=1)
        upd2 = jnp.sum(H2inv * Jres2[:, None, :], axis=2)  # (du, dv, dmu)
        # 1-D update along direction
        Jres1 = jnp.sum(res[:, :, None] * J1, axis=1)
        upd1 = jnp.sum(H1inv * Jres1[:, None, :], axis=2)  # (step, dmu)
        upd1_uv = upd1[:, 0:1] * direction
        upd = jnp.where(
            is_1d[:, None],
            jnp.concatenate([upd1_uv, upd1[:, 1:2]], -1), upd2)
        step2 = jnp.where(is_1d, upd1[:, 0] ** 2,
                          upd2[:, 0] ** 2 + upd2[:, 1] ** 2)
        # inverse compositional: subtract update.  The reference BREAKS
        # at the first sub-0.03px update (feature_alignment.cpp:252-255);
        # here the unrolled batch iterations run regardless, so converged
        # items keep polishing for free — `conv` (the success flag) keeps
        # the reference's 0.03px test, while the position refines to the
        # GN fixed point.  Measured on the flat depth-filter protocol:
        # per-measurement matching noise 0.026 -> 0.019 px equivalent.
        # Out-of-window items simply freeze (act=False) and can never
        # SET conv; an item that converged in bounds and then polished
        # to the window edge keeps its success flag and its last valid
        # position (revoking conv here dropped correctly-localized
        # matches when the bilinear->cubic switch shrank the window).
        act = valid & in_img
        uvm = jnp.where(act[:, None], uvm - upd, uvm)
        conv = conv | (act & (step2 < CONV_EPS))
        return uvm, conv

    uvm0 = jnp.concatenate([px_init, jnp.zeros_like(px_init[:, :1])], -1)
    # unrolled: fixed small trip count; lets XLA fuse across iterations
    # (sequential lax loops pay per-iteration dispatch on this backend)
    state = (uvm0, jnp.zeros_like(valid))
    for it in range(n_iter):
        state = body(it, state)
    uvm, conv = state
    return uvm[:, :2], conv & valid


@functools.partial(jax.jit, static_argnames=("n_iter",))
def align2d(cur_img, ref_patch_border, px_init, valid, n_iter: int = 10,
            level: jnp.ndarray | None = None):
    """Batched align2D (all items 2-D)."""
    return align_features(cur_img, ref_patch_border, px_init, valid,
                          n_iter, level)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def align1d(cur_img, ref_patch_border, px_init, direction, valid,
            n_iter: int = 10, level: jnp.ndarray | None = None):
    """Batched align1D along `direction` (all items 1-D)."""
    ones = jnp.ones(px_init.shape[:1], bool)
    return align_features(cur_img, ref_patch_border, px_init, valid,
                          n_iter, level, direction=direction, is_1d=ones)
