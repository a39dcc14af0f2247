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
