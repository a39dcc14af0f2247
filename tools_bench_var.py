"""Bench one config variant: python bench_var.py key=val ..."""
import os, sys, json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core import fused
from rpg_svo_tpu.utils.synthetic import SyntheticDataset

ov = {}
for a in sys.argv[1:]:
    k, v = a.split("=")
    ov[k] = float(v) if "." in v else int(v)
chunk = int(ov.pop("chunk", 40))
n_frames = int(ov.pop("frames", 240))
ds = SyntheticDataset(n_frames=n_frames, trajectory="circle", radius=0.25,
                      revolutions=0.5)
cfg = fast_preset(grid_size=25, epi_max_steps=128, df_update_k=512).replace(**ov)
fh = FrameHandler(ds.cam, cfg)
imgs = []
for i in range(n_frames):
    img, depth, T = ds.frame(i)
    imgs.append(img)
    if i == 0:
        img0, depth0, T0 = img, depth, T
imgs = jnp.stack(imgs[1:])
jax.block_until_ready(imgs)
fh.set_first_frame_with_depth(jnp.array(img0, copy=True), T0.inverse(), depth0)
state = fused.state_from_handler(fh)
scan = lambda st, im: fused.vo_scan_donated(st, im, ds.cam, cfg, fh.ncx,
                                            fh.ncy, fh.img_shape)
T = imgs.shape[0]
state, outs = scan(state, imgs[:chunk])
jax.block_until_ready(outs.t_wc)
n_chunks = (T - chunk) // chunk
t0 = time.perf_counter()
pos = []
for c in range(n_chunks):
    lo = chunk + c * chunk
    state, outs = scan(state, imgs[lo:lo + chunk])
    pos.append(outs.t_wc)
    outs.t_wc.block_until_ready()
dt = time.perf_counter() - t0
n = n_chunks * chunk
gt = jnp.stack([ds.poses[i].t for i in range(1 + chunk, 1 + chunk + n)])
errs = jnp.linalg.norm(jnp.concatenate(pos) - gt, axis=-1)
print(json.dumps({"ov": {**ov, "chunk": chunk}, "fps": round(n / dt, 1),
                  "ms_per_frame": round(dt / n * 1e3, 2),
                  "median_terr_mm": round(float(jnp.median(errs)) * 1e3, 2)}),
      flush=True)
