"""Microbench: reshape-mean halfsample vs 0/1-matmul halfsample on TPU.

The profiler attributes 0.149 ms/frame to pyramid creation (two
halfsamples of a 752x480 frame) — ~15x over the HBM bandwidth roof.
Hypothesis: the (h,2,w,2) reshape + mean over axes (1,3) pays lane-axis
relayouts; pairing rows/cols with 0/1 averaging matrices on the MXU
(the detector-upsample trick from r3) should land near bandwidth.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from rpg_svo_tpu.ops.pyramid import half_sample  # noqa: E402

H, W = 480, 752


def pair_matrix(n: int) -> np.ndarray:
    """(n//2, n) matrix averaging consecutive pairs: A @ x halves axis 0."""
    h = n // 2
    A = np.zeros((h, n), np.float32)
    A[np.arange(h), 2 * np.arange(h)] = 0.5
    A[np.arange(h), 2 * np.arange(h) + 1] = 0.5
    return A


def half_mm(img, Ah, Aw):
    # f32 accumulate on the MXU: pixel values are 0..255 and the pyramid
    # feeds geometry; default bf16 truncation costs ~0.5 gray levels.
    t = jax.lax.dot(Ah, img, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot(t, Aw, precision=jax.lax.Precision.HIGHEST)


def build_mm(img, n_levels):
    levels = [img]
    mats = {}
    for _ in range(n_levels - 1):
        h, w = levels[-1].shape
        if (h, w) not in mats:
            mats[(h, w)] = (jnp.array(pair_matrix(h)),
                            jnp.array(pair_matrix(w).T))
        Ah, Aw = mats[(h, w)]
        levels.append(half_mm(levels[-1], Ah, Aw))
    return tuple(levels)


def build_ref(img, n_levels):
    levels = [img]
    for _ in range(n_levels - 1):
        levels.append(half_sample(levels[-1]))
    return tuple(levels)


def chained(build, n):
    """n builds chained inside ONE program: a tunneled dispatch is
    ~20-25 ms round trip, so per-call timing must amortize it."""
    def f(img):
        acc = jnp.float32(0)
        for i in range(n):
            lv = build(img + jnp.float32(i) * 1e-6)  # defeat CSE
            acc = acc + lv[-1].sum()
        return acc
    return jax.jit(f)


def bench(build, img, n=50, reps=5):
    f = chained(build, n)
    jax.block_until_ready(f(img))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(img))
        ts.append((time.perf_counter() - t0) / n * 1e3)
    return min(ts)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    img = jnp.array(rng.uniform(0, 255, (H, W)).astype(np.float32))
    r = jax.jit(lambda x: build_ref(x, 3))(img)
    m = jax.jit(lambda x: build_mm(x, 3))(img)
    for a, b in zip(r, m):
        d = float(jnp.abs(a - b).max())
        print(f"level {a.shape}: max abs diff {d:.3e}")
    print(f"reshape-mean: {bench(lambda x: build_ref(x, 3), img):.4f} ms")
    print(f"matmul:       {bench(lambda x: build_mm(x, 3), img):.4f} ms")
