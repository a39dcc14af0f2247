"""Pallas TPU kernel: batched integer tile gather from an image pyramid.

The alignment kernels need one small integer-aligned intensity tile per
feature per frame (feature_align/sparse_align window tiles, creation-time
patch tiles).  As XLA gathers these cost ~9-14 ns per ELEMENT on TPU
(~1.3 ms per 620x17x17 gather — 4+ of them per fused step).  This kernel
instead does one 8/128-aligned vector load per tile from a VMEM-resident
pyramid plus two dynamic rolls: ~0.4 us per tile, ~8x faster end to end.

Layout: all pyramid levels are padded (H to 8 rows, W to 128 lanes,
min 256) and stacked vertically into ONE (Hs, Ws) f32 array, so a tile
address is a single global (row, col) pair — no per-level branching in
the kernel.  Host-side code converts per-item (level, x, y) to global
coords and builds the validity masks; the kernel only moves pixels.

On non-TPU backends callers fall back to plain XLA gathers (bit-identical
results); the kernel itself is also exercised on CPU via interpret mode
in the unit tests.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# aligned load geometry: LH rows x 256 lanes in, tile rows x 128 lanes out
_LW = 256


def use_pallas() -> bool:
    """Pallas path on TPU-like backends; XLA fallback on CPU.
    SVO_NO_TILE_KERNEL=1 forces the XLA fallback (debug/bisect)."""
    import os
    if os.environ.get("SVO_NO_TILE_KERNEL"):
        return False
    return jax.default_backend() not in ("cpu",)


def padded_layout(shapes: Sequence[Tuple[int, int]]):
    """Static layout of the padded stack for given level shapes:
    (Ws, Hs, row_off) with H padded to 8 rows, W to 128 lanes (min 256),
    plus 40 rows of tail slack for the aligned loads of the last level."""
    Ws = max(256, -(-max(w for _, w in shapes) // 128) * 128)
    offs = []
    row = 0
    for h, _ in shapes:
        offs.append(row)
        row += -(-h // 8) * 8
    return Ws, row + 40, np.asarray(offs, dtype=np.int32)


class PaddedPyramid:
    """Pyramid levels padded and vertically stacked into one 2-D array.

    stack: (Hs, Ws) f32; level l occupies rows row_off[l] .. +Hp[l], with
    the real (H, W) content at the top-left and zero padding elsewhere.

    This is THE storage layout of the framework: frames carry it in state,
    the keyframe pool stores one flattened stack per slot, the Pallas tile
    kernels load from it, and `flat_view()` exposes it to the per-item-
    level samplers — so a pyramid is laid out once per frame and never
    relaid.
    """

    def __init__(self, levels: Sequence[jnp.ndarray]):
        shapes = [(int(l.shape[0]), int(l.shape[1])) for l in levels]
        self.shapes = tuple(shapes)
        Ws, Hs, offs = padded_layout(shapes)
        padded = []
        for (h, w), img, hp in zip(
                shapes, levels,
                [-(-h // 8) * 8 for h, _ in shapes]):
            padded.append(jnp.pad(img, ((0, hp - h), (0, Ws - w))))
        # tail slack so the last level's aligned loads stay in bounds
        padded.append(jnp.zeros((40, Ws), jnp.float32))
        self.stack = jnp.concatenate(padded, axis=0)
        self.Ws = Ws
        self.Hs = Hs
        self.row_off = offs

    @classmethod
    def from_stack(cls, stack: jnp.ndarray,
                   shapes: Sequence[Tuple[int, int]]) -> "PaddedPyramid":
        """Wrap an existing padded stack (no data movement)."""
        obj = cls.__new__(cls)
        obj.shapes = tuple((int(h), int(w)) for h, w in shapes)
        obj.Ws, obj.Hs, obj.row_off = padded_layout(obj.shapes)
        obj.stack = stack.reshape(obj.Hs, obj.Ws)
        return obj

    def flat_view(self):
        """Strided FlatPyramid over this stack (zero-copy)."""
        from rpg_svo_tpu.ops.interp import FlatPyramid
        return FlatPyramid.from_padded(self)

    def levels(self) -> Tuple[jnp.ndarray, ...]:
        """Per-level images as static slices of the stack (views; XLA
        dead-code-eliminates any level nothing consumes)."""
        return tuple(
            self.stack[int(o): int(o) + h, :w]
            for o, (h, w) in zip(self.row_off, self.shapes))

    def tree_flatten(self):
        return ((self.stack,), (self.shapes, self.Ws, self.Hs,
                                tuple(self.row_off.tolist())))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.stack,) = children
        obj.shapes, obj.Ws, obj.Hs, row_off = aux
        obj.row_off = np.asarray(row_off, dtype=np.int32)
        return obj


jax.tree_util.register_pytree_node(
    PaddedPyramid, lambda p: p.tree_flatten(), PaddedPyramid.tree_unflatten)


def _tile_kernel(y0r, x0r, stack, out, *, ipp: int, lh: int,
                 hs: int, ws: int):
    g = pl.program_id(0)
    for j in range(ipp):
        i = g * ipp + j
        x0 = x0r[i]
        y0 = y0r[i]
        xa = jnp.minimum(x0 & ~127, ws - _LW)
        ya = jnp.minimum(y0 & ~7, hs - lh)
        xa = pl.multiple_of(xa, 128)
        ya = pl.multiple_of(ya, 8)
        t = stack[pl.ds(ya, lh), pl.ds(xa, _LW)]
        t = pltpu.roll(t, (lh - (y0 - ya)) % lh, 0)
        t = pltpu.roll(t, (_LW - (x0 - xa)) % _LW, 1)
        out[j] = t[:, :128]


@functools.partial(jax.jit, static_argnames=("lh", "hs", "ws", "interpret"))
def _gather(stack, y0g, x0g, lh: int, hs: int, ws: int,
            interpret: bool = False):
    n = y0g.shape[0]
    ipp = 4
    npad = -(-n // ipp) * ipp
    y0g = jnp.pad(y0g, (0, npad - n))
    x0g = jnp.pad(x0g, (0, npad - n))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npad // ipp,),
        in_specs=[pl.BlockSpec((hs, ws), lambda i, y, x: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ipp, lh, 128), lambda i, y, x: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_tile_kernel, ipp=ipp, lh=lh, hs=hs, ws=ws),
        out_shape=jax.ShapeDtypeStruct((npad, lh, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(y0g, x0g, stack)
    return out[:n]


def gather_tiles(pyr: PaddedPyramid, level: jnp.ndarray, x0: jnp.ndarray,
                 y0: jnp.ndarray, tile_h: int, tile_w: int,
                 interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather (N, tile_h, tile_w) integer tiles at per-item pyramid level.

    (x0, y0) are the requested tile origins in LEVEL coords (int32); they
    are clamped into the level so every returned tile is fully backed by
    image content.  Returns (tiles, x0c, y0c) with the clamped origins.
    """
    assert tile_w <= 128
    lh = -(-(tile_h + 8) // 8) * 8
    Wr = np.asarray([w for _, w in pyr.shapes], np.int32)
    Hr = np.asarray([h for h, _ in pyr.shapes], np.int32)
    lv = jnp.clip(level, 0, len(pyr.shapes) - 1)
    wmax = jnp.maximum(jnp.asarray(Wr)[lv] - tile_w, 0)
    hmax = jnp.maximum(jnp.asarray(Hr)[lv] - tile_h, 0)
    x0c = jnp.clip(x0, 0, wmax)
    y0c = jnp.clip(y0, 0, hmax)
    y0g = y0c + jnp.asarray(pyr.row_off)[lv]
    if use_pallas() or interpret:
        tiles = _gather(pyr.stack, y0g, x0c, lh, pyr.Hs, pyr.Ws,
                        interpret=interpret)
        tiles = tiles[:, :tile_h, :tile_w]
    else:
        # XLA fallback (CPU): plain gather, identical results
        r = jnp.arange(tile_h, dtype=jnp.int32)
        c = jnp.arange(tile_w, dtype=jnp.int32)
        yy = y0g[:, None, None] + r[None, :, None]
        xx = x0c[:, None, None] + c[None, None, :]
        tiles = pyr.stack.reshape(-1)[yy * pyr.Ws + xx]
    return tiles, x0c, y0c
