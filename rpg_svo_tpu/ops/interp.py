"""Bilinear image sampling and patch extraction.

Equivalent of the reference's scattered bilinear-interp loops
(vk::interpolateMat_8u, the patch loads in svo/src/matcher.cpp:72-105 and
svo/src/feature_alignment.cpp).  Here sampling is expressed as batched
gathers with f32 accumulation; the per-feature patch grids are built once
as static (P*P, 2) offset tables so every alignment kernel is a single
vectorized gather + FMA over all features at once.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear(img: jnp.ndarray, xy: jnp.ndarray,
             fill: float = 0.0):
    """Sample img (H, W) at float coords xy (..., 2) = (x, y).

    Returns (values (...,), valid (...,)) where valid marks samples whose
    4-pixel support is fully inside the image.  Out-of-range coords are
    clamped before the gather so the op is safe; use the mask to ignore them.
    """
    H, W = img.shape
    flat = img.reshape(-1)   # 1-D gathers: ~20x faster than 2-D on TPU
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    valid = (x0 >= 0) & (y0 >= 0) & (x0 < W - 1) & (y0 < H - 1)
    xi = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    idx = yi * W + xi
    i00 = flat[idx]
    i01 = flat[idx + 1]
    i10 = flat[idx + W]
    i11 = flat[idx + W + 1]
    top = i00 * (1.0 - wx) + i01 * wx
    bot = i10 * (1.0 - wx) + i11 * wx
    vals = top * (1.0 - wy) + bot * wy
    return jnp.where(valid, vals, fill), valid


def patch_grid(halfsize: int, border: int = 0) -> jnp.ndarray:
    """Static (P*P, 2) offset table for a (2*halfsize+2*border)^2 patch,
    offsets relative to the patch center, pixel-aligned (x, y) order."""
    size = 2 * (halfsize + border)
    r = jnp.arange(size, dtype=jnp.float32) - (halfsize + border)
    ys, xs = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([xs.ravel(), ys.ravel()], axis=-1)


def extract_patches(img: jnp.ndarray, centers: jnp.ndarray,
                    halfsize: int, border: int = 0):
    """Bilinear patches around centers (N, 2) -> (N, P*P), valid (N,).

    A patch is valid only if every sample lies inside the image.
    """
    grid = patch_grid(halfsize, border)              # (P*P, 2)
    coords = centers[:, None, :] + grid[None, :, :]  # (N, P*P, 2)
    vals, ok = bilinear(img, coords)
    return vals, jnp.all(ok, axis=-1)


class FlatPyramid:
    """All pyramid levels concatenated into one flat buffer.

    Enables bilinear sampling where the pyramid LEVEL is a per-query traced
    value: flat index = level_offset[l] + y * width[l] + x, one gather for
    the whole batch regardless of level mix.  This is the TPU-shaped
    replacement for the reference's per-feature ``frame->img_pyr_[level]``
    indirection.
    """

    def __init__(self, levels):
        import numpy as _np
        self.n_levels = len(levels)
        self.shapes = tuple((int(l.shape[0]), int(l.shape[1]))
                            for l in levels)
        offs = _np.cumsum([0] + [h * w for h, w in self.shapes])
        self._offsets = jnp.asarray(offs[:-1], dtype=jnp.int32)
        self._widths = jnp.asarray([w for _, w in self.shapes],
                                   dtype=jnp.int32)
        self._heights = jnp.asarray([h for h, _ in self.shapes],
                                    dtype=jnp.int32)
        # row stride per level == level width for the packed layout
        self._strides = self._widths
        self.flat = jnp.concatenate([l.reshape(-1) for l in levels])

    @classmethod
    def from_padded(cls, pad) -> "FlatPyramid":
        """Zero-copy flat view of a PaddedPyramid stack: level l starts at
        row_off[l] * Ws with row stride Ws; valid extent is the TRUE level
        (h, w).  Lets every per-item-level sampler read straight from the
        padded stack — no separate packed buffer is ever built."""
        obj = cls.__new__(cls)
        obj.n_levels = len(pad.shapes)
        obj.shapes = tuple(pad.shapes)
        obj._offsets = jnp.asarray(
            [int(o) * pad.Ws for o in pad.row_off], dtype=jnp.int32)
        obj._widths = jnp.asarray([w for _, w in pad.shapes],
                                  dtype=jnp.int32)
        obj._heights = jnp.asarray([h for h, _ in pad.shapes],
                                   dtype=jnp.int32)
        obj._strides = jnp.full((obj.n_levels,), pad.Ws, jnp.int32)
        obj.flat = pad.stack.reshape(-1)
        return obj

    def tree_flatten(self):
        return ((self.flat, self._offsets, self._widths, self._heights,
                 self._strides), (self.n_levels, self.shapes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.flat, obj._offsets, obj._widths, obj._heights,
         obj._strides) = children
        obj.n_levels, obj.shapes = aux
        return obj

    def bilinear(self, level: jnp.ndarray, xy: jnp.ndarray,
                 fill: float = 0.0):
        """Sample at level-``level`` coords xy (..., 2); level broadcasts
        against xy's batch dims. Returns (values, valid)."""
        level = jnp.clip(level, 0, self.n_levels - 1)
        W = self._widths[level]
        H = self._heights[level]
        S = self._strides[level]
        base = self._offsets[level]
        x, y = xy[..., 0], xy[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        valid = (x0 >= 0) & (y0 >= 0) & (x0 < (W - 1)) & (y0 < (H - 1))
        xi = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
        yi = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
        idx = base + yi * S + xi
        i00 = self.flat[idx]
        i01 = self.flat[idx + 1]
        i10 = self.flat[idx + S]
        i11 = self.flat[idx + S + 1]
        top = i00 * (1.0 - wx) + i01 * wx
        bot = i10 * (1.0 - wx) + i11 * wx
        return jnp.where(valid, top * (1.0 - wy) + bot * wy, fill), valid


    # NOTE: a bf16/u8 copy of the pyramid for the scan gathers was tried
    # and removed: the TPU scattered gather is per-ELEMENT latency-bound
    # (~9-10 ns/elem regardless of dtype; tools_gather_bench.py), so
    # narrower elements save nothing.  Only fewer samples or Pallas
    # aligned loads reduce gather cost.

    def nearest(self, level: jnp.ndarray, xy: jnp.ndarray,
                fill: float = 0.0):
        """Nearest-neighbor sampling (1 gather per sample; the epipolar
        SCAN uses this — the reference also scans at integer pixels,
        matcher.cpp:263-291 — and the subsequent align2d refines
        subpixel)."""
        level = jnp.clip(level, 0, self.n_levels - 1)
        W = self._widths[level]
        H = self._heights[level]
        S = self._strides[level]
        base = self._offsets[level]
        xi = jnp.round(xy[..., 0]).astype(jnp.int32)
        yi = jnp.round(xy[..., 1]).astype(jnp.int32)
        valid = (xi >= 0) & (yi >= 0) & (xi < W) & (yi < H)
        idx = base + jnp.clip(yi, 0, H - 1) * S + jnp.clip(xi, 0, W - 1)
        return jnp.where(valid, self.flat[idx], fill), valid


class BoundPyramidPool:
    """A (K, L) pool of flat pyramids (all sharing one level layout) bound
    to a per-query pyramid index — e.g. each depth-filter seed sampling its
    own origin keyframe's pyramid.  Exposes the same ``bilinear(level, xy)``
    interface as FlatPyramid, so the matcher works against either.
    """

    def __init__(self, pool_flat, shapes, idx):
        """pool_flat (K, L); shapes: FlatPyramid level shapes; idx (N,)."""
        import numpy as _np
        self.n_levels = len(shapes)
        self.shapes = tuple(shapes)
        offs = _np.cumsum([0] + [h * w for h, w in self.shapes])
        self._offsets = jnp.asarray(offs[:-1], dtype=jnp.int32)
        self._widths = jnp.asarray([w for _, w in self.shapes],
                                   dtype=jnp.int32)
        self._heights = jnp.asarray([h for h, _ in self.shapes],
                                    dtype=jnp.int32)
        self.pool = pool_flat
        self.idx = idx

    def tree_flatten(self):
        return ((self.pool, self.idx, self._offsets, self._widths,
                 self._heights), (self.n_levels, self.shapes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.pool, obj.idx, obj._offsets, obj._widths,
         obj._heights) = children
        obj.n_levels, obj.shapes = aux
        return obj

    def bilinear(self, level: jnp.ndarray, xy: jnp.ndarray,
                 fill: float = 0.0):
        """xy (N, ..., 2); level broadcasts against xy batch dims; item i
        samples pyramid self.idx[i] (clamped; callers mask idx < 0).

        The pool is addressed as one flat 1-D buffer (k * L + idx): 2-D
        gathers lower ~20x slower on TPU than single-axis gathers.
        """
        level = jnp.clip(level, 0, self.n_levels - 1)
        W = self._widths[level]
        H = self._heights[level]
        base = self._offsets[level]
        L = self.pool.shape[1]
        k = jnp.clip(self.idx, 0, self.pool.shape[0] - 1)
        k = k.reshape(k.shape + (1,) * (xy.ndim - k.ndim - 1))
        flat = self.pool.reshape(-1)
        x, y = xy[..., 0], xy[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        valid = (x0 >= 0) & (y0 >= 0) & (x0 < (W - 1)) & (y0 < (H - 1))
        xi = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
        yi = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
        idx = k * L + base + yi * W + xi
        i00 = flat[idx]
        i01 = flat[idx + 1]
        i10 = flat[idx + W]
        i11 = flat[idx + W + 1]
        top = i00 * (1.0 - wx) + i01 * wx
        bot = i10 * (1.0 - wx) + i11 * wx
        return jnp.where(valid, top * (1.0 - wy) + bot * wy, fill), valid


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(
    FlatPyramid,
    lambda p: p.tree_flatten(),
    FlatPyramid.tree_unflatten)
_jtu.register_pytree_node(
    BoundPyramidPool,
    lambda p: p.tree_flatten(),
    BoundPyramidPool.tree_unflatten)


def image_gradients(img: jnp.ndarray):
    """Central-difference gradients (dx, dy), same shape, 0.5*(I+1 − I−1)."""
    dx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    dy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    return dx, dy
