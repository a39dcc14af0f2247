"""Bisect the TPU fault in the feature-budget build: run a short vo_scan
with one stage ablated per invocation."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core import fused
from rpg_svo_tpu.utils.synthetic import SyntheticDataset

abl = tuple(x for x in sys.argv[1].split(",") if x) if len(sys.argv) > 1 else ()
ds = SyntheticDataset(n_frames=12, trajectory="circle", radius=0.25,
                      revolutions=0.3)
imgs = []
for i in range(12):
    img, depth, T = ds.frame(i)
    imgs.append(img)
    if i == 0:
        img0, depth0, T0 = img, depth, T
imgs = jnp.stack(imgs[1:])
cfg = fast_preset(grid_size=25, epi_max_steps=128, df_update_k=512,
                  ablate=abl)
fh = FrameHandler(ds.cam, cfg)
fh.set_first_frame_with_depth(jnp.array(img0, copy=True), T0.inverse(), depth0)
st = fused.state_from_handler(fh)
st, outs = fused.vo_scan_donated(st, imgs, ds.cam, cfg, fh.ncx, fh.ncy,
                                 fh.img_shape)
jax.block_until_ready(outs.t_wc)
print(f"OK abl={abl} terr_ok", flush=True)
