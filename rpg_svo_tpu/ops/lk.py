"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for OpenCV's calcOpticalFlowPyrLK as used by the
reference bootstrap (svo/src/initialization.cpp:127-169, 30px window,
4 pyramid levels).  All N corners track simultaneously: per level one
(N, W*W) gather per GN iteration, coarse-to-fine with the flow carried
across levels.  Windows are PARTIAL: out-of-image samples are masked per
pixel (OpenCV pads its pyramids; masking is the static-shape equivalent),
so coarse levels remain usable even when the window exceeds the image.
Illumination-offset term included.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.ops.interp import bilinear


@functools.partial(jax.jit, static_argnames=("halfwin", "n_iter",
                                             "max_level"))
def track_klt(ref_pyr: Tuple[jnp.ndarray, ...],
              cur_pyr: Tuple[jnp.ndarray, ...],
              px_ref: jnp.ndarray,      # (N, 2) level-0 coords
              valid: jnp.ndarray,       # (N,)
              halfwin: int = 15,
              n_iter: int = 20,
              max_level: int = 4):
    """Track px_ref from ref to cur. Returns (px_cur (N, 2), ok (N,))."""
    r = jnp.arange(2 * halfwin + 1, dtype=jnp.float32) - halfwin
    ys, xs = jnp.meshgrid(r, r, indexing="ij")
    grid = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)   # (W2, 2)

    flow = jnp.zeros_like(px_ref)       # displacement at level-0 scale
    conv0 = jnp.zeros_like(valid)
    for level in range(max_level, -1, -1):
        scale = 1.0 / (2.0 ** level)
        ref_img = ref_pyr[level]
        cur_img = cur_pyr[level]
        p_ref = px_ref * scale
        coords = p_ref[:, None, :] + grid[None]
        ref_patch, m_ref = bilinear(ref_img, coords)
        rp1, m1 = bilinear(ref_img, coords + jnp.array([1.0, 0.0]))
        rm1, m2 = bilinear(ref_img, coords - jnp.array([1.0, 0.0]))
        rp2, m3 = bilinear(ref_img, coords + jnp.array([0.0, 1.0]))
        rm2, m4 = bilinear(ref_img, coords - jnp.array([0.0, 1.0]))
        m_ref = m_ref & m1 & m2 & m3 & m4                  # (N, W2)
        dx = 0.5 * (rp1 - rm1)
        dy = 0.5 * (rp2 - rm2)
        ones = jnp.ones_like(dx)
        J = jnp.stack([dx, dy, ones], axis=-1)            # (N, W2, 3)
        Jm = J * m_ref[..., None]
        H = jnp.einsum("npj,npk->njk", Jm, J)
        Hinv = jnp.linalg.inv(H + 1e-4 * jnp.eye(3))
        n_ref = jnp.sum(m_ref, axis=-1)
        lvl_ok = valid & (n_ref > 0.25 * grid.shape[0])

        def body(_, state):
            d, mu, conv = state                            # (N,2),(N,),(N,)
            cc = (p_ref + d * scale)[:, None, :] + grid[None]
            cur, m_cur = bilinear(cur_img, cc)
            m = m_ref & m_cur
            frac = jnp.sum(m, -1) / jnp.maximum(n_ref, 1)
            good = lvl_ok & (frac > 0.5) & (~conv)
            res = jnp.where(m, cur - ref_patch + mu[:, None], 0.0)
            upd = jnp.einsum("njk,nk->nj", Hinv,
                             jnp.einsum("np,npj->nj", res, J))
            d = jnp.where(good[:, None], d - upd[:, :2] / scale, d)
            mu = jnp.where(good, mu - upd[:, 2], mu)
            conv = conv | (good & (upd[:, 0] ** 2 + upd[:, 1] ** 2
                                   < 0.03 * 0.03))
            return d, mu, conv

        flow, _, conv0 = jax.lax.fori_loop(
            0, n_iter, body,
            (flow, jnp.zeros(px_ref.shape[0]), jnp.zeros_like(valid)))
    px_cur = px_ref + flow
    # success: converged at the finest level and landed inside the image
    H0, W0 = cur_pyr[0].shape
    inb = (px_cur[:, 0] >= 0) & (px_cur[:, 0] < W0 - 1) \
        & (px_cur[:, 1] >= 0) & (px_cur[:, 1] < H0 - 1)
    return px_cur, valid & conv0 & inb
