"""Creation-time reference patch tiles + gather-free resampling.

The reference re-reads its keyframe images on every frame: warpAffine
samples the matched feature's source patch from the origin keyframe's
pyramid (svo/src/matcher.cpp:72-105), and the depth filter does the same
per seed per update (matcher.cpp:198-224).  On TPU those reads are
scattered gathers from a many-MB keyframe-pyramid pool — the single most
expensive data path in the fused step (and each read forces a layout
conversion of the whole pool).

TPU-shaped replacement: when a feature or seed is CREATED, a small
integer-aligned intensity tile around it is extracted ONCE from its
origin image at its own pyramid level and stored SoA beside the feature.
All later affine resampling (any pose, any search level) reads the tile —
dense rows, no pyramid access — via separable one-hot bilinear matmuls
(MXU work instead of scattered gathers).  The tile is sized so any
plausible affine warp of the 10x10 matching patch stays inside; samples
falling outside simply invalidate the match attempt (the reference also
fails matches whose warped patch leaves the image).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from rpg_svo_tpu.ops.interp import FlatPyramid

# tile side: 10x10 bordered patch + warp slack (halfsize 12 from center).
# an affine warp with singular value up to ~2.3 of the bordered patch
# still samples inside; beyond that the attempt is dropped.
TILE_R = 24


def extract_tiles(pyr: FlatPyramid, px0: jnp.ndarray, level: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integer tiles around px0 (N, 2) level-0 coords at per-item `level`.

    Returns (tiles (N, TILE_R*TILE_R) f32 FLAT, xy0 (N, 2) int32 tile
    origin in level coords).  Tiles are flat rows everywhere at rest: a
    (N, 24, 24) layout pads its 24-lane minor dim to 128 under TPU tiling
    (5.3x HBM blowup on every pool) and relayout-copies at the
    producer/consumer boundaries; the flat (N, 576) row has one canonical
    layout.  `sample_tiles` unflattens the compacted working set only.
    Tile origins are clamped inside the level image, so tiles are always
    fully valid image content.  This is the creation-time (amortized)
    path; it gathers from the pyramid once per feature lifetime.
    """
    from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid, gather_tiles
    scale = 2.0 ** level.astype(jnp.float32)
    pl_ = px0 / scale[:, None]
    cx = jnp.round(pl_[:, 0]).astype(jnp.int32)
    cy = jnp.round(pl_[:, 1]).astype(jnp.int32)
    if isinstance(pyr, PaddedPyramid):
        vals, x0, y0 = gather_tiles(pyr, level, cx - TILE_R // 2,
                                    cy - TILE_R // 2, TILE_R, TILE_R)
        return (vals.reshape(vals.shape[0], TILE_R * TILE_R),
                jnp.stack([x0, y0], axis=-1))
    W = pyr._widths[jnp.clip(level, 0, pyr.n_levels - 1)]
    H = pyr._heights[jnp.clip(level, 0, pyr.n_levels - 1)]
    x0 = jnp.clip(cx - TILE_R // 2, 0, jnp.maximum(W - TILE_R, 0))
    y0 = jnp.clip(cy - TILE_R // 2, 0, jnp.maximum(H - TILE_R, 0))
    r = jnp.arange(TILE_R, dtype=jnp.int32)
    xs = x0[:, None, None] + r[None, None, :]
    ys = y0[:, None, None] + r[None, :, None]
    xy = jnp.stack(jnp.broadcast_arrays(xs, ys), axis=-1).astype(jnp.float32)
    vals, _ = pyr.nearest(level[:, None, None], xy)
    return (vals.reshape(vals.shape[0], TILE_R * TILE_R),
            jnp.stack([x0, y0], axis=-1))


def empty_tiles(n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Placeholder tiles marked invalid (xy0 = -1)."""
    return (jnp.zeros((n, TILE_R * TILE_R), jnp.float32),
            jnp.full((n, 2), -1, jnp.int32))


def catmull_rom_weights(t):
    """4-tap Catmull-Rom kernel weights at fractional offset t (any
    shape) for taps at offsets (-1, 0, +1, +2).  Shared by the tile
    sampler here and the align window selection matrices
    (ops/feature_align._select_mats) — keep the two interpolants
    identical."""
    t2 = t * t
    t3 = t2 * t
    return ((-0.5 * t3 + t2 - 0.5 * t),
            (1.5 * t3 - 2.5 * t2 + 1.0),
            (-1.5 * t3 + 2.0 * t2 + 0.5 * t),
            (0.5 * t3 - 0.5 * t2))


def sample_tiles(tiles: jnp.ndarray, xy0: jnp.ndarray,
                 coords_lvl: jnp.ndarray,
                 bicubic: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample tiles (N, T*T) flat (or (N, T, T)) at level coords (N, P, 2)
    with bilinear (default) or 4-tap Catmull-Rom (bicubic=True) weights.

    Gather-free: separable one-hot weights contracted on the MXU.
    Returns (vals (N, P), ok (N, P)); samples outside the tile (or items
    with xy0 < 0, i.e. no tile) are invalid.  Bicubic needs one more
    pixel of support on each side (ok shrinks accordingly); it removes
    the subpixel-phase localization bias of bilinear resampling (see
    ops/feature_align.BICUBIC).
    """
    if tiles.ndim == 2:
        side = int(round(tiles.shape[-1] ** 0.5))
        tiles = tiles.reshape(tiles.shape[0], side, side)
    T = tiles.shape[-1]
    local = coords_lvl - xy0[:, None, :].astype(jnp.float32)
    x = local[..., 0]
    y = local[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    t = jnp.arange(T, dtype=jnp.int32)
    if bicubic:
        ok = (x0 >= 1) & (y0 >= 1) & (x0 < T - 2) & (y0 < T - 2) \
            & (xy0[:, None, 0] >= 0)
        xi = jnp.clip(x0.astype(jnp.int32), 1, T - 3)
        yi = jnp.clip(y0.astype(jnp.int32), 1, T - 3)

        def W(ti, w):
            out = 0.0
            for k, wk in enumerate(catmull_rom_weights(w)):
                out = out + (t == ti[..., None] + (k - 1)) * wk[..., None]
            return out
        Wx = W(xi, wx)
        Wy = W(yi, wy)
    else:
        ok = (x0 >= 0) & (y0 >= 0) & (x0 < T - 1) & (y0 < T - 1) \
            & (xy0[:, None, 0] >= 0)
        xi = jnp.clip(x0.astype(jnp.int32), 0, T - 2)
        yi = jnp.clip(y0.astype(jnp.int32), 0, T - 2)
        # (N, P, T) two-tap bilinear selection, separable in x and y
        Wx = (t == xi[..., None]) * (1.0 - wx[..., None]) \
            + (t == xi[..., None] + 1) * wx[..., None]
        Wy = (t == yi[..., None]) * (1.0 - wy[..., None]) \
            + (t == yi[..., None] + 1) * wy[..., None]
    tw = jnp.einsum("nyx,npx->nyp", tiles, Wx)       # (N, T, P)
    vals = jnp.einsum("nyp,npy->np", tw, Wy)
    return jnp.where(ok, vals, 0.0), ok
