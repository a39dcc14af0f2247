"""Robust cost weights and scale estimators.

Equivalent of vikit's robust_cost.h (TukeyWeightFunction, HuberWeight,
MADScaleEstimator) used by the reference's pose optimizer
(svo/src/pose_optimizer.cpp:41,59) and NLLS solver.  All masked/batched.
"""

from __future__ import annotations

import jax.numpy as jnp

# standard consistency constant: 1 / Phi^-1(0.75)
MAD_NORMALIZER = 1.4826
TUKEY_B = 4.6851


def mad_scale(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Robust sigma estimate: 1.4826 * median(|x|) over masked entries.

    Median over a masked set with static shapes: sort with invalid entries
    pushed to +inf, then index the (n_valid/2)-th element.
    """
    n = jnp.sum(mask)
    vals = jnp.where(mask, jnp.abs(x), jnp.inf)
    s = jnp.sort(vals)
    idx = jnp.clip((n // 2).astype(jnp.int32), 0, x.shape[0] - 1)
    return MAD_NORMALIZER * s[idx]


def tukey_weight(x_normalized: jnp.ndarray, b: float = TUKEY_B) -> jnp.ndarray:
    """Tukey biweight on residuals already divided by scale."""
    u = x_normalized / b
    w = (1.0 - u * u)
    return jnp.where(jnp.abs(u) < 1.0, w * w, 0.0)


def huber_weight(x_normalized: jnp.ndarray, k: float = 1.345) -> jnp.ndarray:
    ax = jnp.abs(x_normalized)
    return jnp.where(ax < k, 1.0, k / jnp.maximum(ax, 1e-12))


def masked_median(x: jnp.ndarray, mask: jnp.ndarray,
                  default: float = 0.0) -> jnp.ndarray:
    """Median of masked entries (ref: vk::getMedian via nth_element)."""
    n = jnp.sum(mask)
    s = jnp.sort(jnp.where(mask, x, jnp.inf))
    idx = jnp.clip((n // 2).astype(jnp.int32), 0, x.shape[0] - 1)
    return jnp.where(n > 0, s[idx], default)
