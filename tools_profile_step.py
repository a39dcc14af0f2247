"""Profile the fused vo_step on TPU: capture a jax profiler trace and
print per-op device time aggregated by op category/name."""
import glob
import json
import os
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core import fused
from rpg_svo_tpu.utils.synthetic import SyntheticDataset

n_frames = 40
ds = SyntheticDataset(n_frames=n_frames, trajectory="circle",
                      radius=0.25, revolutions=0.5)
cfg = fast_preset(grid_size=25)
fh = FrameHandler(ds.cam, cfg)
imgs = []
for i in range(n_frames):
    img, depth, T = ds.frame(i)
    imgs.append(img)
    if i == 0:
        img0, depth0, T0 = img, depth, T
imgs = jnp.stack(imgs[1:])
jax.block_until_ready(imgs)
fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
state = fused.state_from_handler(fh)

def step(st, img):
    return fused.vo_step(st, img, ds.cam, cfg, fh.ncx, fh.ncy, fh.img_shape)

for i in range(10):
    state, out = step(state, imgs[i])
    if i % 3 == 2:
        jax.block_until_ready(out.t_wc)
jax.block_until_ready(out.t_wc)

logdir = "/tmp/jaxprof"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for i in range(10, 14):
        state, out = step(state, imgs[i])
        jax.block_until_ready(out.t_wc)

# parse xplane
paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, file=sys.stderr)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
params = {"tqx": "out:json;"}
data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", params)
try:
    obj = json.loads(data)
    print(json.dumps(obj)[:2000])
except Exception:
    out_path = "/tmp/opstats.out"
    with open(out_path, "wb") as f:
        f.write(data if isinstance(data, bytes) else data.encode())
    print("wrote", out_path)
