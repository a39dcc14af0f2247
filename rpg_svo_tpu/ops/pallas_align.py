"""Pallas TPU kernel: whole-level Gauss-Newton for sparse image alignment.

Replaces the XLA GN iteration loop of ``ops/sparse_align._level_gn`` with
ONE kernel per pyramid level.  The XLA loop is kernel-count-bound: each GN
iteration is ~20 small kernels (window one-hot build, two contractions,
normal-equation reduces, 6x6 solve, SE3 exp/compose) plus their dispatch
gaps — ~700 kernels/frame, ~0.5 ms of the 2.6 ms fast-preset frame.  Here
the per-feature tiles, reference patches and Jacobians sit in VMEM and the
entire iteration loop (window sampling, normal equations, Cholesky solve,
pose update, rollback/plateau logic) runs in-kernel with an early-exit
``lax.while_loop`` — one dispatch per level.

Semantics mirror ``_level_gn`` exactly (same rollback/plateau/eps rules,
reference: svo/src/sparse_img_align.cpp:84-258 + vk::NLLSSolver), so the
two paths are interchangeable; the XLA path remains for CPU, ATAN cameras
and the robust-weighting option.

Layout: features live in LANES (N = multiple of 128).  Per-feature data
is packed as (rows, N) slabs — tiles (TILE, TILE, N), reference patches
(16, N), Jacobians (6*16, N) — so every per-iteration op is a full-width
VPU op; the 6x6 solve and the pose update are scalar (SREG) math between
the vector passes.  The pose, camera intrinsics and distortion ride in
SMEM; results (pose, H, chi2, n_meas) come back in one SMEM row.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpg_svo_tpu.geometry.se3 import SE3

# must match ops/sparse_align (asserted there at import)
PATCH_HALFSIZE = 2
PATCH_SIZE = 4
SLACK = 6
TILE = PATCH_SIZE + 1 + 2 * SLACK   # 17


def use_align_kernel(cam, cur_pad, robust: bool) -> bool:
    """Kernel path on TPU backends for pinhole cameras with tiles.

    SVO_NO_ALIGN_KERNEL=1 forces the XLA path (debug/bisect)."""
    from rpg_svo_tpu.geometry.cameras import PinholeCamera
    from rpg_svo_tpu.ops.pallas_tiles import use_pallas
    if os.environ.get("SVO_NO_ALIGN_KERNEL"):
        return False
    if robust or cur_pad is None or not isinstance(cam, PinholeCamera):
        return False
    return use_pallas()


def _gn_kernel(params, tiles, feat, refp, jac, out, *, n_iter: int,
               eps: float, scale: float, n_feat: int):
    f32 = jnp.float32
    P = PATCH_SIZE
    bx = feat[0:1, :]
    by = feat[1:2, :]
    vmask = feat[2:3, :]
    X = feat[3:4, :]
    Y = feat[4:5, :]
    Z = feat[5:6, :]
    tile = tiles[...]                    # (TILE, TILE, N) [ty, tx, n]
    refv = refp[...]                     # (16, N)
    jslices = [jac[a * 16:(a + 1) * 16, :] for a in range(6)]
    fx = params[0, 12]
    fy = params[0, 13]
    cx = params[0, 14]
    cy = params[0, 15]
    k1 = params[0, 16]
    k2 = params[0, 17]
    p1 = params[0, 18]
    p2 = params[0, 19]
    k3 = params[0, 20]
    ity = jax.lax.broadcasted_iota(jnp.int32, (TILE, n_feat), 0)

    def eval_at(T):
        """Residual pass at pose T (12 scalars): H (21), Jres (6), chi2,
        n_meas — the batched equivalent of sparse_img_align.cpp:147-211."""
        (R00, R01, R02, R10, R11, R12, R20, R21, R22, t0, t1, t2) = T
        pcx = R00 * X + R01 * Y + R02 * Z + t0
        pcy = R10 * X + R11 * Y + R12 * Z + t1
        pcz = R20 * X + R21 * Y + R22 * Z + t2
        front = pcz > 1e-6
        zs = jnp.where(jnp.abs(pcz) < 1e-10, 1e-10, pcz)
        xu = pcx / zs
        yu = pcy / zs
        # PinholeCamera.world2cam incl. radial-tangential distortion
        r2 = xu * xu + yu * yu
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = xu * radial + 2.0 * p1 * xu * yu + p2 * (r2 + 2.0 * xu * xu)
        yd = yu * radial + p1 * (r2 + 2.0 * yu * yu) + 2.0 * p2 * xu * yu
        u = (fx * xd + cx) * scale
        v = (fy * yd + cy) * scale
        ox = u - PATCH_HALFSIZE - bx
        oy = v - PATCH_HALFSIZE - by
        oxf = jnp.floor(ox)
        oyf = jnp.floor(oy)
        wx = ox - oxf
        wy = oy - oyf
        oix = oxf.astype(jnp.int32)
        oiy = oyf.astype(jnp.int32)
        usable = ((oix >= 0) & (oiy >= 0)
                  & (oix <= TILE - P - 1) & (oiy <= TILE - P - 1))
        oix = jnp.clip(oix, 0, TILE - P - 1)
        oiy = jnp.clip(oiy, 0, TILE - P - 1)
        mf = vmask * usable.astype(f32) * front.astype(f32)
        # bilinear 4x4 window via one-hot contractions (ty then tx)
        rows = []
        for py in range(P):
            sel = ((ity == oiy + py).astype(f32) * (1.0 - wy)
                   + (ity == oiy + (py + 1)).astype(f32) * wy)
            rows.append(jnp.sum(tile * sel[:, None, :], axis=0))  # (TILE, N)
        cols = []
        for px_ in range(P):
            cols.append((ity == oix + px_).astype(f32) * (1.0 - wx)
                        + (ity == oix + (px_ + 1)).astype(f32) * wx)
        res = []
        for py in range(P):
            for px_ in range(P):
                val = jnp.sum(rows[py] * cols[px_], axis=0, keepdims=True)
                res.append((val - refv[py * P + px_:py * P + px_ + 1, :])
                           * mf)
        resv = jnp.concatenate(res, axis=0)                      # (16, N)
        jm = [js * mf for js in jslices]
        H = []
        for a in range(6):
            for b in range(a, 6):
                H.append(jnp.sum(jm[a] * jslices[b]))
        Jr = [-jnp.sum(resv * js) for js in jslices]
        nm = jnp.sum(mf) * 16.0
        chi2 = jnp.sum(resv * resv) / jnp.maximum(nm, 1.0)
        return H, Jr, chi2, nm

    def solve6(H, Jr):
        """Damped-Cholesky solve (matches geometry/linalg.solve6x6_spd:
        NaN propagates on an indefinite system — the rollback signal)."""
        A = [[None] * 6 for _ in range(6)]
        k = 0
        for a in range(6):
            for b in range(a, 6):
                h = H[k]
                k += 1
                A[a][b] = h
                A[b][a] = h
            A[a][a] = A[a][a] + 1e-8
        L = [[None] * 6 for _ in range(6)]
        for j in range(6):
            s = A[j][j]
            for t in range(j):
                s = s - L[j][t] * L[j][t]
            d = jnp.sqrt(s)
            L[j][j] = d
            for i2 in range(j + 1, 6):
                s2 = A[i2][j]
                for t in range(j):
                    s2 = s2 - L[i2][t] * L[j][t]
                L[i2][j] = s2 / d
        y = [None] * 6
        for i2 in range(6):
            s = Jr[i2]
            for t in range(i2):
                s = s - L[i2][t] * y[t]
            y[i2] = s / L[i2][i2]
        x = [None] * 6
        for i2 in reversed(range(6)):
            s = y[i2]
            for t in range(i2 + 1, 6):
                s = s - L[t][i2] * x[t]
            x[i2] = s / L[i2][i2]
        return x

    def step_pose(T, x):
        """T * exp(-x) with xi=(v, w) — scalar Rodrigues (geometry/se3)."""
        (R00, R01, R02, R10, R11, R12, R20, R21, R22, t0, t1, t2) = T
        v0, v1, v2 = -x[0], -x[1], -x[2]
        w0, w1, w2 = -x[3], -x[4], -x[5]
        th2 = w0 * w0 + w1 * w1 + w2 * w2
        th = jnp.sqrt(jnp.maximum(th2, 0.0))
        small = th2 < 1e-8
        sd = jnp.where(small, 1.0, th)
        sd2 = jnp.where(small, 1.0, th2)
        st = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / sd)
        ct = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / sd2)
        vt = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                       (th - jnp.sin(th)) / (sd2 * sd))
        # W = hat(w); W2 = W @ W
        W = [[0.0, -w2, w1], [w2, 0.0, -w0], [-w1, w0, 0.0]]
        W2 = [[sum(W[a][c] * W[c][b] for c in range(3)) for b in range(3)]
              for a in range(3)]
        eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        ER = [[eye[a][b] + st * W[a][b] + ct * W2[a][b] for b in range(3)]
              for a in range(3)]
        V = [[eye[a][b] + ct * W[a][b] + vt * W2[a][b] for b in range(3)]
             for a in range(3)]
        vv = [v0, v1, v2]
        Et = [sum(V[a][b] * vv[b] for b in range(3)) for a in range(3)]
        R = [[R00, R01, R02], [R10, R11, R12], [R20, R21, R22]]
        Rn = [[sum(R[a][c] * ER[c][b] for c in range(3)) for b in range(3)]
              for a in range(3)]
        tn = [sum(R[a][b] * Et[b] for b in range(3)) + tt
              for a, tt in zip(range(3), (t0, t1, t2))]
        return (Rn[0][0], Rn[0][1], Rn[0][2], Rn[1][0], Rn[1][1], Rn[1][2],
                Rn[2][0], Rn[2][1], Rn[2][2], tn[0], tn[1], tn[2])

    T0 = tuple(params[0, k] for k in range(12))

    def body(carry):
        i, done, bchi2, T, bT, Hc = carry
        H, Jr, chi2, _ = eval_at(T)
        x = solve6(H, Jr)
        anynan = jnp.isnan(x[0])
        for k in range(1, 6):
            anynan = anynan | jnp.isnan(x[k])
        bad = anynan | (chi2 > bchi2)
        plateau = (i > 0) & (chi2 > bchi2 * (1.0 - 1e-4))
        Tn = step_pose(T, x)
        better = jnp.logical_not(done) & (chi2 <= bchi2)
        bT2 = tuple(jnp.where(better, a, b) for a, b in zip(T, bT))
        bchi2n = jnp.where(better, chi2, bchi2)
        roll = bad & (i > 0)
        Tnext = tuple(jnp.where(done, c, jnp.where(roll, bb, nn))
                      for c, bb, nn in zip(T, bT2, Tn))
        Hc2 = tuple(jnp.where(done, ho, hn) for ho, hn in zip(Hc, H))
        mx = jnp.abs(x[0])
        for k in range(1, 6):
            mx = jnp.maximum(mx, jnp.abs(x[k]))
        newdone = done | (mx < eps) | plateau | (bad & (i > 0))
        return (jnp.where(done, i, i + 1), newdone, bchi2n, Tnext, bT2, Hc2)

    init = (jnp.int32(0), jnp.bool_(False), f32(jnp.inf), T0, T0,
            tuple(f32(0.0) for _ in range(21)))
    carry = jax.lax.while_loop(
        lambda c: (c[0] < n_iter) & jnp.logical_not(c[1]), body, init)
    i, _, bchi2, T, bT, Hc = carry
    _, _, chi2f, nm = eval_at(T)
    better = chi2f <= bchi2
    Tout = tuple(jnp.where(better, a, b) for a, b in zip(T, bT))
    chi2o = jnp.minimum(chi2f, bchi2)
    for k in range(12):
        out[0, k] = Tout[k]
    sym = [[None] * 6 for _ in range(6)]
    k = 0
    for a in range(6):
        for b in range(a, 6):
            sym[a][b] = Hc[k]
            sym[b][a] = Hc[k]
            k += 1
    for a in range(6):
        for b in range(6):
            out[0, 12 + a * 6 + b] = sym[a][b]
    out[0, 48] = chi2o
    out[0, 49] = nm
    out[0, 50] = i.astype(f32)


def level_gn_kernel(cur_pad, cam, T_init: SE3, p_ref, ref_patch, jac,
                    valid, level: int, n_iter: int, eps: float,
                    interpret: bool = False):
    """One-dispatch GN for one pyramid level; drop-in for _level_gn.

    Gathers the per-feature tiles with the Pallas aligned loader (same
    tiles the XLA path uses), re-lays the per-feature data features-in-
    lanes, and runs the whole iteration loop in one kernel."""
    from rpg_svo_tpu.ops.pallas_tiles import gather_tiles
    N = p_ref.shape[0]
    Np = -(-N // 128) * 128
    scale = 1.0 / (2.0 ** level)
    uv0 = cam.world2cam(T_init.apply(p_ref)) * scale
    base = jnp.floor(uv0).astype(jnp.int32) - PATCH_HALFSIZE - SLACK
    lv = jnp.full((N,), level, jnp.int32)
    tiles, x0c, y0c = gather_tiles(cur_pad, lv, base[:, 0], base[:, 1],
                                   TILE, TILE, interpret=interpret)
    padN = lambda a: jnp.pad(a, ((0, Np - N),) + ((0, 0),) * (a.ndim - 1))
    tiles_t = jnp.transpose(padN(tiles), (1, 2, 0))          # (T, T, Np)
    feat = jnp.concatenate([
        x0c[None].astype(jnp.float32), y0c[None].astype(jnp.float32),
        valid[None].astype(jnp.float32), p_ref.T,
        jnp.zeros((2, N), jnp.float32)], axis=0)
    feat = jnp.pad(feat, ((0, 0), (0, Np - N)))              # (8, Np)
    refp_t = jnp.pad(ref_patch.T, ((0, 0), (0, Np - N)))     # (16, Np)
    jac_t = jnp.pad(jnp.transpose(jac, (2, 1, 0)).reshape(96, N),
                    ((0, 0), (0, Np - N)))                   # (96, Np)
    params = jnp.concatenate([
        T_init.R.reshape(9), T_init.t,
        jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy, cam.k1, cam.k2,
                   cam.p1, cam.p2, cam.k3]),
        jnp.zeros((11,), jnp.float32)]).reshape(1, 32)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, n_iter=n_iter, eps=eps, scale=scale,
                          n_feat=Np),
        out_shape=jax.ShapeDtypeStruct((1, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(params, tiles_t, feat, refp_t, jac_t)
    T_out = SE3(out[0, :9].reshape(3, 3), out[0, 9:12])
    H = out[0, 12:48].reshape(6, 6)
    chi2 = out[0, 48]
    n_meas = out[0, 49].astype(jnp.int32)
    return T_out, n_meas, H, chi2
