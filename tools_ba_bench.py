"""Standalone TPU microbench for the Schur BA solve at accurate-preset
shapes (P=16384, M=17, K=64, Vn=6, n_iter=10) — the accurate preset's
dominant stage.  Iterate layouts here instead of re-benching the whole
pipeline."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rpg_svo_tpu.ba.schur import BAProblem, solve_ba

P = int(os.environ.get("BA_P", "4096"))
M, K, VN = 17, 64, 6
rng = np.random.default_rng(0)


def make_problem():
    # points in front of a cluster of cameras, ~40% of obs valid
    p_w = rng.normal(size=(P, 3)).astype(np.float32) + [0, 0, 4.0]
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = rng.normal(size=(K, 3)).astype(np.float32) * 0.1
    obs_cam = rng.integers(0, 8, size=(P, M)).astype(np.int32)
    obs_mask = rng.random(size=(P, M)) < 0.4
    p_valid = rng.random(size=(P,)) < 0.6
    # perfect bearings + noise
    pcam = np.einsum("kij,pj->pki", R, p_w) + t[None]
    sel = pcam[np.arange(P)[:, None], obs_cam]       # (P, M, 3)
    f = sel / np.linalg.norm(sel, axis=-1, keepdims=True)
    f = f + rng.normal(size=f.shape).astype(np.float32) * 1e-3
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    variable = np.zeros((K,), bool)
    variable[:VN] = True
    return BAProblem(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(variable),
        jnp.asarray(p_w), jnp.asarray(p_valid), jnp.asarray(obs_cam),
        jnp.asarray(f.astype(np.float32)),
        jnp.asarray(rng.integers(0, 3, size=(P, M)).astype(np.int32)),
        jnp.asarray(obs_mask))


if __name__ == "__main__":
    prob = make_problem()
    fn = jax.jit(lambda pb: solve_ba(pb, n_iter=10, n_var_max=VN))
    t0 = time.perf_counter()
    res = fn(prob)
    jax.block_until_ready(res.chi2_final)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s  "
          f"chi2 {float(res.chi2_init):.3e} -> {float(res.chi2_final):.3e}")
    # async-dispatch a batch and block ONCE: a blocking call pays the
    # ~20 ms tunnel round trip, which would swamp the device time
    n = 10
    t0 = time.perf_counter()
    outs = [fn(prob).chi2_final for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"solve_ba(n_iter=10): {(time.perf_counter()-t0)/n*1e3:.2f} "
          f"ms/solve (batch of {n}, one sync)")
