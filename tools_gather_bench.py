"""Microbench: epipolar-strip-shaped gathers under different dtypes.

Measures the dominant data movement of the seed update — a (K, S+8, 8)
nearest-neighbor gather along rotated lines — from f32 / bf16 / u8
source buffers, plus the dense windows+zmssd math that consumes it.
Answers whether the scattered gather is latency- or bandwidth-bound
(i.e. whether a half/quarter-width pyramid copy would pay).
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

K = 512          # seeds
S = 128          # scan steps
P = 8            # patch
H, W = 768, 768  # stack-ish image

rng = np.random.default_rng(0)
img32 = jnp.asarray(rng.random((H, W), np.float32) * 255.0)
flat32 = img32.reshape(-1)
flat16 = flat32.astype(jnp.bfloat16)
flat8 = flat32.astype(jnp.uint8)

# strip geometry: random start + unit dir per seed
pxA = jnp.asarray(rng.uniform(100, 600, (K, 2)).astype(np.float32))
ang = rng.uniform(0, 2 * np.pi, (K,)).astype(np.float32)
dirv = jnp.stack([jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))], -1)
ref = jnp.asarray(rng.random((K, P * P), np.float32))


def strip_idx():
    nrm = jnp.stack([-dirv[:, 1], dirv[:, 0]], axis=-1)
    cs = jnp.arange(S + P, dtype=jnp.float32) - P // 2
    rs = jnp.arange(P, dtype=jnp.float32) - P // 2
    coords = (pxA[:, None, None, :]
              + cs[None, :, None, None] * dirv[:, None, None, :]
              + rs[None, None, :, None] * nrm[:, None, None, :])
    xi = jnp.clip(jnp.round(coords[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(coords[..., 1]).astype(jnp.int32), 0, H - 1)
    return yi * W + xi


IDX = jax.jit(strip_idx)()
jax.block_until_ready(IDX)


def windows_score(strip):
    wins = jnp.stack([strip[:, u: u + S, :] for u in range(P)], axis=2)
    wins = wins.reshape(K, S, P * P).astype(jnp.float32)
    wz = wins - jnp.mean(wins, -1, keepdims=True)
    rz = ref - jnp.mean(ref, -1, keepdims=True)
    sc = jnp.sum((wz - rz[:, None, :]) ** 2, -1)
    return jnp.min(sc, 1), jnp.argmin(sc, 1)


@jax.jit
def gather_only_f32(idx):
    return flat32[idx]


@jax.jit
def gather_only_bf16(idx):
    return flat16[idx]


@jax.jit
def gather_only_u8(idx):
    return flat8[idx]


@jax.jit
def full_f32(idx):
    return windows_score(flat32[idx])


@jax.jit
def full_bf16(idx):
    return windows_score(flat16[idx])


@jax.jit
def full_u8(idx):
    return windows_score(flat8[idx].astype(jnp.bfloat16))


def bench(fn, name, n=30):
    o = fn(IDX)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(IDX)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n * 1e3
    nel = K * (S + P) * P
    print(f"{name:18s} {dt:7.3f} ms   {dt * 1e6 / nel:6.2f} ns/elem",
          flush=True)


for f, nm in [(gather_only_f32, "gather f32"),
              (gather_only_bf16, "gather bf16"),
              (gather_only_u8, "gather u8"),
              (full_f32, "gather+zmssd f32"),
              (full_bf16, "gather+zmssd bf16"),
              (full_u8, "gather+zmssd u8")]:
    bench(f, nm)
