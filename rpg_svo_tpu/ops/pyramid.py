"""Image pyramid construction.

Equivalent of ``frame_utils::createImgPyramid`` + ``vk::halfSample``
(svo/src/frame.cpp:156-165): each level is the 2x2 block average of the
previous one.  Implemented as a reshape-mean, which XLA lowers to a single
fused reduction per level — no Pallas needed; this op is trivially
bandwidth-bound and already optimal.

Images are float32 in [0, 255] throughout the framework (uint8 is converted
at the I/O boundary; TPU vector units operate on f32/bf16).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def half_sample(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H//2, W//2) by 2x2 averaging (ref: vk::halfSample).

    Keep the reshape-mean form: XLA lowers it to one fused reduction per
    level (~0.1 ms/frame total).  A strided-slice variant
    (v[0::2, 0::2] + ...) was tried and REVERTED: lane-strided slices
    are scatter-class on TPU and measured 4.7 ms/frame — 47x worse.
    """
    H, W = img.shape
    h, w = H // 2, W // 2
    v = img[: h * 2, : w * 2].reshape(h, 2, w, 2)
    return v.mean(axis=(1, 3))


def build_pyramid(img: jnp.ndarray, n_levels: int) -> Tuple[jnp.ndarray, ...]:
    """Level-0 image -> tuple of n_levels images, halving each level."""
    levels = [img.astype(jnp.float32)]
    for _ in range(n_levels - 1):
        levels.append(half_sample(levels[-1]))
    return tuple(levels)


def binomial_blur(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5-tap binomial ([1,4,6,4,1]/16) low-pass, edge-replicated.

    Used to build antialiased pyramids for the LK tracker (OpenCV's
    buildOpticalFlowPyramid equivalent); the box-average pyramid that the
    VO kernels use (matching the reference's vk::halfSample) keeps more
    high-frequency detail but aliases under large displacements.
    """
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    p = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    v = sum(k[i] * p[i: i + img.shape[0], :] for i in range(5))
    p = jnp.pad(v, ((0, 0), (2, 2)), mode="edge")
    return sum(k[i] * p[:, i: i + img.shape[1]] for i in range(5))


def build_lk_pyramid(img: jnp.ndarray, n_levels: int) -> Tuple[jnp.ndarray, ...]:
    """Antialiased pyramid for optical flow: blur, then 2x2 half-sample."""
    levels = [img.astype(jnp.float32)]
    for _ in range(n_levels - 1):
        levels.append(half_sample(binomial_blur(levels[-1])))
    return tuple(levels)


def pyramid_shapes(shape: Tuple[int, int], n_levels: int) -> Sequence[Tuple[int, int]]:
    out = [shape]
    for _ in range(n_levels - 1):
        h, w = out[-1]
        out.append((h // 2, w // 2))
    return out


# ---------------------------------------------------------------------------
# padded-stack pyramid build (the fused-step hot path)
# ---------------------------------------------------------------------------

def _mm_exact(A_np, x, right: bool = False):
    """A @ x (or x @ A) where A is a constant 0/0.5 matrix: two bf16 MXU
    passes with a hi/lo split of x.  A's entries are bf16-representable
    and each product 0.5*hi / 0.5*lo is exact, with f32 accumulation, so
    the scheme is exact up to the hi/lo rounding of x — measured ~1e-5
    agreement with the f32 reshape-mean on real images (pixel values in
    [0, 255]), at 2 MXU passes instead of Precision.HIGHEST's 6.  (NOT
    claimed bit-exact: bf16 splits through the real MXU have measurably
    diverged from CPU emulation elsewhere in this repo — ba/schur.py.)"""
    import numpy as np
    A = jnp.asarray(np.asarray(A_np, np.float32), jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda u, v: jax.lax.dot(  # noqa: E731
        u, v, preferred_element_type=jnp.float32)
    if right:
        return d(hi, A) + d(lo, A)
    return d(A, hi) + d(A, lo)


def build_padded_pyramid(img: jnp.ndarray, n_levels: int,
                         force_matmul: bool = False):
    """Build the PaddedPyramid stack directly: each level is produced IN
    the padded (Hp, Ws) layout by pair-averaging matmuls
    ``Ah @ prev @ Aw`` on the MXU.

    The reshape-mean halfsample materializes a (h, 2, w, 2) intermediate
    whose 2-wide minor dim pads to 128 lanes; in the fused step that
    cost 0.149 ms/frame (profiled) — ~20x the bandwidth roof.  The 0/0.5
    matrices land on the MXU with no awkward layouts and write every
    level straight into its padded extent (zero rows/cols outside the
    true (h, w)).  CPU keeps the reshape-mean path (bf16 matmuls are
    emulated there and the values agree to ~1e-5 anyway);
    `force_matmul=True` runs the matmul construction regardless of
    backend so the production path has CPU parity coverage
    (tests/test_image_ops.py).
    """
    import numpy as np
    from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid, padded_layout

    shapes = pyramid_shapes((int(img.shape[0]), int(img.shape[1])),
                            n_levels)
    if jax.default_backend() == "cpu" and not force_matmul:
        return PaddedPyramid(build_pyramid(img, n_levels))
    Ws, Hs, _offs = padded_layout(shapes)
    Hp = [-(-h // 8) * 8 for h, _ in shapes]
    x = img.astype(jnp.float32)
    parts = [jnp.pad(x, ((0, Hp[0] - shapes[0][0]),
                         (0, Ws - shapes[0][1])))]
    for lv in range(1, n_levels):
        h2, w2 = shapes[lv]
        Ah = np.zeros((Hp[lv], Hp[lv - 1]), np.float32)
        ii = np.arange(h2)
        Ah[ii, 2 * ii] = 0.5
        Ah[ii, 2 * ii + 1] = 0.5
        Aw = np.zeros((Ws, Ws), np.float32)
        jj = np.arange(w2)
        Aw[2 * jj, jj] = 0.5
        Aw[2 * jj + 1, jj] = 0.5
        nxt = _mm_exact(Aw, _mm_exact(Ah, parts[-1]), right=True)
        parts.append(nxt)
    parts.append(jnp.zeros((Hs - sum(Hp), Ws), jnp.float32))
    return PaddedPyramid.from_stack(jnp.concatenate(parts, axis=0),
                                    shapes)
