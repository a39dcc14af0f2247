"""Time detect_features + extract_tiles standalone on the TPU."""
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from rpg_svo_tpu.ops.detector import detect_features, grid_dims
from rpg_svo_tpu.ops.pyramid import build_pyramid
from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid
from rpg_svo_tpu.ops.patches import extract_tiles
from rpg_svo_tpu.utils.synthetic import SyntheticDataset

ds = SyntheticDataset(n_frames=2, trajectory="circle", radius=0.25)
img, _, _ = ds.frame(0)
ncx, ncy = grid_dims(752, 480, 25)
occ = jnp.zeros((ncx * ncy,), bool)

@jax.jit
def det(img, occ):
    pyr = build_pyramid(img, 5)
    d = detect_features(pyr, occ, 25)
    pad = PaddedPyramid(pyr)
    t, xy0 = extract_tiles(pad, d["px"], d["level"])
    return d["px"], d["score"], t

o = det(img, occ); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(20):
    o = det(img, occ)
jax.block_until_ready(o)
print(f"detect+tiles: {(time.perf_counter()-t0)/20*1e3:.2f} ms/frame", flush=True)

@jax.jit
def pyr_only(img):
    pyr = build_pyramid(img, 5)
    return PaddedPyramid(pyr).stack

o = pyr_only(img); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(20):
    o = pyr_only(img)
jax.block_until_ready(o)
print(f"pyramid+pad: {(time.perf_counter()-t0)/20*1e3:.2f} ms/frame", flush=True)
