"""Micro-repro for the epi64/two-tier TPU worker fault.

Compiles ONLY the epipolar strip scan (_strip_scan: nearest-gather +
incremental ZMSSD windows + argmin) at production shapes and runs it
repeatedly.  Usage:

    python tools_scan_fault.py <steps> [n_rows] [repeats]

e.g. `python tools_scan_fault.py 64` reproduces the epi64 tier,
`python tools_scan_fault.py 16` the short tier, `python
tools_scan_fault.py 128` the known-stable wide program.
"""
import os
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.ops.matcher import _strip_scan
from rpg_svo_tpu.ops.pyramid import build_pyramid, pyramid_shapes
from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 512
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

H, W = 480, 752
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
pad = PaddedPyramid(build_pyramid(img, 5))
flat = pad.flat_view()

pxA = jnp.asarray(rng.uniform([8, 8], [W - 8, H - 8], (N, 2))
                  .astype(np.float32))
th = rng.uniform(0, 2 * np.pi, N).astype(np.float32)
dir_lvl = jnp.stack([jnp.cos(jnp.asarray(th)), jnp.sin(jnp.asarray(th))],
                    axis=-1)
search_level = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))
n_steps = jnp.asarray(rng.integers(1, steps + 1, N).astype(np.int32))
ref_rot = jnp.asarray(rng.uniform(0, 255, (N, 64)).astype(np.float32))

fn = jax.jit(lambda p, d, lv, ns, rr: _strip_scan(flat, p, d, lv, ns, rr,
                                                  steps))
t0 = time.perf_counter()
sc, bi = fn(pxA, dir_lvl, search_level, n_steps, ref_rot)
jax.block_until_ready(sc)
t1 = time.perf_counter()
for r in range(reps):
    sc, bi = fn(pxA + r * 0.01, dir_lvl, search_level, n_steps, ref_rot)
    if r % 4 == 3:
        jax.block_until_ready(sc)
jax.block_until_ready(sc)
t2 = time.perf_counter()
print(f"OK steps={steps} N={N} compile+first={t1-t0:.1f}s "
      f"{(t2-t1)/reps*1e3:.2f} ms/call "
      f"best0={float(sc[0]):.1f}", flush=True)
