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

HALFPATCH = 4
PATCH = 2 * HALFPATCH          # 8
BORDERED = PATCH + 2           # 10
CONV_EPS = 0.03 * 0.03


def _sample(img, level, coords):
    """Dispatch bilinear sampling: plain (H, W) image or FlatPyramid with
    per-item levels (static dispatch at trace time)."""
    if isinstance(img, FlatPyramid):
        return img.bilinear(level[:, None], coords)
    return bilinear(img, coords)


def _patch_offsets():
    """(64, 2) offsets of the 8x8 patch relative to its center, and the
    matching (64,) flat indices into a 10x10 bordered patch."""
    r = jnp.arange(PATCH, dtype=jnp.float32) - HALFPATCH
    ys, xs = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)
    ij = jnp.arange(PATCH)
    yy, xx = jnp.meshgrid(ij, ij, indexing="ij")
    inner = ((yy + 1) * BORDERED + (xx + 1)).ravel()
    return offs, inner


def extract_patch_with_border(img: jnp.ndarray, centers: jnp.ndarray):
    """Bilinear 10x10 patches around centers (N, 2) -> (N, 100), valid (N,)."""
    r = jnp.arange(BORDERED, dtype=jnp.float32) - (HALFPATCH + 1)
    ys, xs = jnp.meshgrid(r, r, indexing="ij")
    grid = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)   # (100, 2)
    coords = centers[:, None, :] + grid[None]
    vals, ok = bilinear(img, coords)
    return vals, jnp.all(ok, axis=-1)


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
def align2d(cur_img,
            ref_patch_border: jnp.ndarray,   # (N, 100)
            px_init: jnp.ndarray,            # (N, 2) level coords
            valid: jnp.ndarray,              # (N,)
            n_iter: int = 10,
            level: jnp.ndarray | None = None
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refine px (N, 2); returns (px, converged (N,)).

    cur_img: (H, W) image (px in that image's coords), or a FlatPyramid
    with `level` (N,) giving each item's pyramid level (px in level coords).
    """
    ref, dx, dy = _border_gradients(ref_patch_border)
    offs, _ = _patch_offsets()
    # fixed 3x3 Hessian per item: J = [dx, dy, 1]
    ones = jnp.ones_like(dx)
    J = jnp.stack([dx, dy, ones], axis=-1)            # (N, 64, 3)
    H = jnp.einsum("npj,npk->njk", J, J)
    Hinv = jnp.linalg.inv(H + 1e-9 * jnp.eye(3))

    def body(_, state):
        uvm, conv = state                              # (N, 3), (N,)
        coords = uvm[:, None, :2] + offs[None]
        cur, ok = _sample(cur_img, level, coords)      # (N, 64)
        in_img = jnp.all(ok, axis=-1)
        res = cur - ref + uvm[:, 2:3]                  # (N, 64)
        Jres = jnp.einsum("np,npj->nj", res, J)        # (N, 3)
        upd = jnp.einsum("njk,nk->nj", Hinv, Jres)
        # inverse compositional: subtract update
        act = valid & in_img & (~conv)
        uvm = jnp.where(act[:, None], uvm - upd, uvm)
        step2 = upd[:, 0] ** 2 + upd[:, 1] ** 2
        conv = conv | (act & (step2 < CONV_EPS))
        # items that fell outside the image never converge
        conv = conv & in_img
        return uvm, conv

    uvm0 = jnp.concatenate([px_init, jnp.zeros_like(px_init[:, :1])], -1)
    uvm, conv = jax.lax.fori_loop(0, n_iter, body,
                                  (uvm0, jnp.zeros_like(valid)))
    return uvm[:, :2], conv & valid


@functools.partial(jax.jit, static_argnames=("n_iter",))
def align1d(cur_img,
            ref_patch_border: jnp.ndarray,   # (N, 100)
            px_init: jnp.ndarray,            # (N, 2)
            direction: jnp.ndarray,          # (N, 2) unit search direction
            valid: jnp.ndarray,
            n_iter: int = 10,
            level: jnp.ndarray | None = None
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-DoF refinement along `direction` (edgelets / epipolar lines)."""
    ref, dx, dy = _border_gradients(ref_patch_border)
    offs, _ = _patch_offsets()
    dd = dx * direction[:, None, 0] + dy * direction[:, None, 1]  # (N, 64)
    ones = jnp.ones_like(dd)
    J = jnp.stack([dd, ones], axis=-1)                # (N, 64, 2)
    H = jnp.einsum("npj,npk->njk", J, J)
    Hinv = jnp.linalg.inv(H + 1e-9 * jnp.eye(2))

    def body(_, state):
        st, conv = state                               # st: (N, 3) u, v, mu
        coords = st[:, None, :2] + offs[None]
        cur, ok = _sample(cur_img, level, coords)
        in_img = jnp.all(ok, axis=-1)
        res = cur - ref + st[:, 2:3]
        Jres = jnp.einsum("np,npj->nj", res, J)
        upd = jnp.einsum("njk,nk->nj", Hinv, Jres)     # (N, 2): step, dmu
        act = valid & in_img & (~conv)
        duv = upd[:, 0:1] * direction
        st = jnp.where(act[:, None],
                       st - jnp.concatenate([duv, upd[:, 1:2]], -1), st)
        conv = conv | (act & (upd[:, 0] ** 2 < CONV_EPS))
        conv = conv & in_img
        return st, conv

    st0 = jnp.concatenate([px_init, jnp.zeros_like(px_init[:, :1])], -1)
    st, conv = jax.lax.fori_loop(0, n_iter, body,
                                 (st0, jnp.zeros_like(valid)))
    return st[:, :2], conv & valid
