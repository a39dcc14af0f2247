"""Microbench: halfsample variants on TPU (752x480 f32).

The reshape-mean halfsample splits the lane axis into (w, 2), which
costs a relayout; candidates: reduce_window pooling and an exact
two-hot 0.5-matmul on the MXU (both mathematically identical 2x2 box
means)."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

H, W = 480, 752
img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (H, W))
                  .astype(np.float32))


def reshape_mean(img):
    H, W = img.shape
    h, w = H // 2, W // 2
    v = img[: h * 2, : w * 2].reshape(h, 2, w, 2)
    return v.mean(axis=(1, 3))


def reduce_win(img):
    H, W = img.shape
    s = jax.lax.reduce_window(img[: H // 2 * 2, : W // 2 * 2], 0.0,
                              jax.lax.add, (2, 2), (2, 2), "VALID")
    return s * 0.25


def _two_hot(n):
    # (n, n//2) with 0.5 at rows 2j, 2j+1 of column j
    D = np.zeros((n, n // 2), np.float32)
    D[np.arange(0, n - 1, 2), np.arange(n // 2)] = 0.5
    D[np.arange(1, n, 2), np.arange(n // 2)] = 0.5
    return jnp.asarray(D)


def matmul_half(img):
    H, W = img.shape
    Dr = _two_hot(H)          # (H, h)
    Dc = _two_hot(W)          # (W, w)
    hp = jnp.einsum("rh,rw->hw", Dr, img,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("hw,wc->hc", hp, Dc,
                      precision=jax.lax.Precision.HIGHEST)


def full_pyr(fn, img, n=5):
    levels = [img]
    for _ in range(n - 1):
        levels.append(fn(levels[-1]))
    return levels


for name, fn in [("reshape_mean", reshape_mean),
                 ("reduce_window", reduce_win),
                 ("matmul_2hot", matmul_half)]:
    f = jax.jit(lambda x, fn=fn: full_pyr(fn, x))
    out = f(img)
    jax.block_until_ready(out)
    ref = full_pyr(reshape_mean, img)
    err = max(float(jnp.abs(a - b).max()) for a, b in zip(out, ref))
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(img)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 50
    print(f"{name}: {dt*1e3:.3f} ms  max_err={err:.2e}")
