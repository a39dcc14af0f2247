"""Pallas TPU kernel: per-seed epipolar ZMSSD scan.

Replaces the XLA strip scan in ops/matcher.py (epipolar_search).  The XLA
formulation must gather a STATIC worst-case strip of (max_steps+8) x 8
nearest-neighbor samples per seed (~0.5M scattered gathers per update,
~4 ms), even though most mature seeds scan only a few px.  Here each
seed walks its epipolar segment inside the kernel with one 8/128-aligned
(16, 256) load + two rolls + three masked reductions per step, and the
loop bound is the seed's ACTUAL step count — cost scales with live
uncertainty, not the cap.

Scores are standard ZMSSD up to the constant sum(ref_zm^2), added back by
the host wrapper; windows are axis-aligned 8x8 patches at rounded pixel
positions, exactly like the reference scan (matcher.cpp:263-291) — the
rotated-patch approximation of the strip path is gone.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid, use_pallas

_LW = 256
_LH = 16
HALF = 4
PATCH = 8


def _scan_kernel(pxax, pxay, dirx, diry, nsteps, xhi, ylo, yhi,
                 refs, stack, out, *, ipp: int, hs: int, ws: int,
                 max_steps: int):
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (PATCH, 128), 1)
    m8 = (lane < PATCH).astype(jnp.float32)
    for j in range(ipp):
        i = g * ipp + j
        px = pxax[i]
        py = pxay[i]
        dx = dirx[i]
        dy = diry[i]
        ns = jnp.minimum(nsteps[i], max_steps)
        ref = refs[j]                      # (8, 128) zero-mean, 0-padded

        def body(c, carry):
            best_s, best_c = carry
            fx = px + c.astype(jnp.float32) * dx
            fy = py + c.astype(jnp.float32) * dy
            # sanitize BEFORE int conversion: ineligible seeds carry
            # NaN/huge coords; int32 garbage would produce negative
            # dynamic roll shifts (device fault), so clamp to the stack
            fx = jnp.where(jnp.isfinite(fx), fx, -1.0)
            fy = jnp.where(jnp.isfinite(fy), fy, -1.0)
            xi = jnp.floor(jnp.clip(fx, -2.0, ws - 1.0) + 0.5)
            yi = jnp.floor(jnp.clip(fy, -2.0, hs - 1.0) + 0.5)
            xi = xi.astype(jnp.int32)
            yi = yi.astype(jnp.int32)
            ok = (xi >= HALF) & (xi <= xhi[i]) & (yi >= ylo[i] + HALF) \
                & (yi <= yhi[i])
            x0 = jnp.clip(xi - HALF, 0, ws - 1)
            y0 = jnp.clip(yi - HALF, 0, hs - 1)
            xa = jnp.clip(x0 & ~127, 0, ws - _LW)
            ya = jnp.clip(y0 & ~7, 0, hs - _LH)
            xa = pl.multiple_of(xa, 128)
            ya = pl.multiple_of(ya, 8)
            t = stack[pl.ds(ya, _LH), pl.ds(xa, _LW)]
            t = pltpu.roll(t, (_LH - (y0 - ya)) % _LH, 0)
            t = pltpu.roll(t, (_LW - (x0 - xa)) % _LW, 1)
            w = t[:PATCH, :128] * m8
            s1 = jnp.sum(w)
            s2 = jnp.sum(w * w)
            cross = jnp.sum(w * ref)
            score = s2 - s1 * s1 * (1.0 / (PATCH * PATCH)) - 2.0 * cross
            score = jnp.where(ok, score, jnp.float32(jnp.inf))
            upd = score < best_s
            return (jnp.where(upd, score, best_s),
                    jnp.where(upd, c, best_c))

        best_s, best_c = jax.lax.fori_loop(
            0, ns, body, (jnp.float32(jnp.inf), jnp.int32(0)))
        ol = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(ol == 0, best_s,
                        jnp.where(ol == 1, best_c.astype(jnp.float32),
                                  0.0))
        out[pl.ds(j, 1), :] = row


@functools.partial(jax.jit, static_argnames=("max_steps", "interpret"))
def _scan_call(stack, pxax, pxay, dirx, diry, nsteps, xhi, ylo, yhi,
               refs, max_steps: int, interpret: bool = False):
    n = pxax.shape[0]
    ipp = 8    # output block (ipp, 128) needs sublane dim % 8 == 0
    npad = -(-n // ipp) * ipp
    padi = lambda a: jnp.pad(a, (0, npad - n))
    refs = jnp.pad(refs, ((0, npad - n), (0, 0), (0, 0)))
    hs, ws = stack.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(npad // ipp,),
        in_specs=[
            pl.BlockSpec((ipp, PATCH, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hs, ws), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ipp, 128), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_scan_kernel, ipp=ipp, hs=hs, ws=ws,
                          max_steps=max_steps),
        out_shape=jax.ShapeDtypeStruct((npad, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(padi(pxax), padi(pxay), padi(dirx), padi(diry), padi(nsteps),
      padi(xhi), padi(ylo), padi(yhi), refs, stack)
    return out[:n, 0], out[:n, 1].astype(jnp.int32)


def epipolar_scan(pad: PaddedPyramid, search_level: jnp.ndarray,
                  pxA: jnp.ndarray, dir_lvl: jnp.ndarray,
                  n_steps: jnp.ndarray, ref_patch: jnp.ndarray,
                  max_steps: int, interpret: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan n_steps 1-px positions from pxA along dir_lvl (search-level
    coords) against the zero-mean 8x8 ref patch; returns
    (zmssd_score (N,), best_step (N,)).  Scores at invalid windows
    (outside the level) are inf.

    ref_patch: (N, 64) axis-aligned warped patch (NOT zero-meaned).
    """
    n = pxA.shape[0]
    Wr = np.asarray([w for _, w in pad.shapes], np.int32)
    Hr = np.asarray([h for h, _ in pad.shapes], np.int32)
    lv = jnp.clip(search_level, 0, len(pad.shapes) - 1)
    row0 = jnp.asarray(pad.row_off)[lv].astype(jnp.float32)
    rzm = ref_patch - jnp.mean(ref_patch, axis=-1, keepdims=True)
    rsq = jnp.sum(rzm * rzm, axis=-1)
    xhi = (jnp.asarray(Wr)[lv] - HALF).astype(jnp.int32)
    ylo = jnp.asarray(pad.row_off)[lv].astype(jnp.int32)
    yhi = (jnp.asarray(pad.row_off)[lv] + jnp.asarray(Hr)[lv]
           - HALF).astype(jnp.int32)
    import os
    kernel_on = (jax.default_backend() not in ("cpu",)
                 and not os.environ.get("SVO_NO_SCAN"))
    if kernel_on or interpret:
        refs = jnp.zeros((n, PATCH, 128), jnp.float32)
        refs = refs.at[:, :, :PATCH].set(rzm.reshape(n, PATCH, PATCH))
        score, best_c = _scan_call(
            pad.stack, pxA[:, 0], pxA[:, 1] + row0, dir_lvl[:, 0],
            dir_lvl[:, 1], n_steps.astype(jnp.int32), xhi, ylo, yhi,
            refs, max_steps=max_steps, interpret=interpret)
        return score + rsq, best_c
    # XLA fallback (CPU): same axis-aligned windows, dense over max_steps
    cs = jnp.arange(max_steps, dtype=jnp.float32)
    fx = pxA[:, 0:1] + cs[None, :] * dir_lvl[:, 0:1]
    fy = (pxA[:, 1:2] + row0[:, None]) + cs[None, :] * dir_lvl[:, 1:2]
    xi = jnp.floor(fx + 0.5).astype(jnp.int32)          # (N, S)
    yi = jnp.floor(fy + 0.5).astype(jnp.int32)
    ok = (xi >= HALF) & (xi <= xhi[:, None]) \
        & (yi >= ylo[:, None] + HALF) & (yi <= yhi[:, None]) \
        & (jnp.arange(max_steps)[None, :] < n_steps[:, None])
    g = jnp.arange(PATCH, dtype=jnp.int32) - HALF
    xx = xi[..., None, None] + g[None, None, None, :]
    yy = yi[..., None, None] + g[None, None, :, None]
    flat = pad.stack.reshape(-1)
    idx = jnp.clip(yy, 0, pad.Hs - 1) * pad.Ws + jnp.clip(xx, 0,
                                                          pad.Ws - 1)
    w = flat[idx].reshape(n, max_steps, PATCH * PATCH)
    wz = w - jnp.mean(w, axis=-1, keepdims=True)
    sc = jnp.sum((wz - rzm[:, None, :]) ** 2, axis=-1)
    sc = jnp.where(ok, sc, jnp.inf)
    return jnp.min(sc, axis=1), jnp.argmin(sc, axis=1).astype(jnp.int32)
