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
        # positions in 8.8 fixed point: all-int32 scalar dataflow (the
        # host sanitizes non-finite coords), no f32 SMEM scalars
        px = pxax[i]
        py = pxay[i]
        dx = dirx[i]
        dy = diry[i]
        ns = jnp.minimum(nsteps[i], max_steps)
        ref = refs[j]                      # (8, 128) zero-mean, 0-padded

        def body(c, carry):
            best_s, best_c = carry
            xi = (px + c * dx + 128) >> 8
            yi = (py + c * dy + 128) >> 8
            ok = (c < ns) & (xi >= HALF) & (xi <= xhi[i]) \
                & (yi >= ylo[i] + HALF) & (yi <= yhi[i])
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

        # fixed trip count with in-body predication: a data-dependent
        # fori bound inside the kernel intermittently faulted the TPU
        # worker when composed into the full fused step
        best_s, best_c = jax.lax.fori_loop(
            0, max_steps, body, (jnp.float32(jnp.inf), jnp.int32(0)))
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
    # The kernel passes its unit tests and a 300-invocation stress test in
    # isolation, but composed into the full fused step it intermittently
    # kills the tunneled TPU worker (tried: input sanitization, fixed
    # loop bounds, int32-only scalars, no enclosing cond — all still
    # fault).  Off by default until the root cause is found; the strip
    # path in ops/matcher.py is used instead.  SVO_PALLAS_SCAN=1 opts in.
    kernel_on = (jax.default_backend() not in ("cpu",)
                 and os.environ.get("SVO_PALLAS_SCAN") == "1")
    if kernel_on or interpret:
        refs = jnp.zeros((n, PATCH, 128), jnp.float32)
        refs = refs.at[:, :, :PATCH].set(rzm.reshape(n, PATCH, PATCH))

        def fx8(v, lo, hi):
            v = jnp.where(jnp.isfinite(v), v, lo)
            return jnp.round(jnp.clip(v, lo, hi) * 256.0).astype(jnp.int32)

        score, best_c = _scan_call(
            pad.stack, fx8(pxA[:, 0], -4.0, pad.Ws + 4.0),
            fx8(pxA[:, 1] + row0, -4.0, pad.Hs + 4.0),
            fx8(dir_lvl[:, 0], -1.0, 1.0), fx8(dir_lvl[:, 1], -1.0, 1.0),
            n_steps.astype(jnp.int32), xhi, ylo, yhi,
            refs, max_steps=max_steps, interpret=interpret)
        return score + rsq, best_c
    # XLA fallback (CPU): same axis-aligned windows, dense over max_steps,
    # with the SAME 8.8 fixed-point rounding as the kernel
    def fx8f(v, lo, hi):
        v = jnp.where(jnp.isfinite(v), v, lo)
        return jnp.round(jnp.clip(v, lo, hi) * 256.0).astype(jnp.int32)

    cs = jnp.arange(max_steps, dtype=jnp.int32)
    px8 = fx8f(pxA[:, 0:1], -4.0, pad.Ws + 4.0)
    py8 = fx8f(pxA[:, 1:2] + row0[:, None], -4.0, pad.Hs + 4.0)
    dx8 = fx8f(dir_lvl[:, 0:1], -1.0, 1.0)
    dy8 = fx8f(dir_lvl[:, 1:2], -1.0, 1.0)
    xi = (px8 + cs[None, :] * dx8 + 128) >> 8           # (N, S)
    yi = (py8 + cs[None, :] * dy8 + 128) >> 8
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

def axis_scan_enabled() -> bool:
    """Whether epipolar_search should route through epipolar_scan
    (the Pallas kernel on TPU / dense-gather fallback on CPU) instead of
    the XLA strip scan.  TPU default is OFF pending the worker-fault
    investigation above; CPU tests exercise it directly."""
    import os
    if jax.default_backend() in ("cpu",):
        return os.environ.get("SVO_AXIS_SCAN") == "1"
    return os.environ.get("SVO_PALLAS_SCAN") == "1"
