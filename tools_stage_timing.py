"""Stage-cost estimation by config ablation on the real TPU.

The op-level profiler can crash the tunneled TPU worker, so instead this
times the fused step under several config ablations; differences between
variants bound each stage's cost.  Usage: python tools_stage_timing.py
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core import fused
from rpg_svo_tpu.utils.synthetic import SyntheticDataset

N_FRAMES = 60
ds = SyntheticDataset(n_frames=N_FRAMES, trajectory="circle",
                      radius=0.25, revolutions=0.5)
imgs = []
for i in range(N_FRAMES):
    img, depth, T = ds.frame(i)
    imgs.append(img)
    if i == 0:
        img0, depth0, T0 = img, depth, T
imgs = jnp.stack(imgs[1:])
jax.block_until_ready(imgs)

VARIANTS = {
    "full": {},
    "seeds_never": {"df_update_every": 1000000},
    "seeds_k128": {"df_update_k": 128},
    "epi32": {"epi_max_steps": 32},
    "align_1iter": {"img_align_n_iter": 1},
    "pose_1iter": {"poseoptim_num_iter": 1},
    "struct_0": {"structureoptim_max_pts": 1,
                 "structureoptim_num_iter": 1},
}


def run(name, overrides):
    cfg = fast_preset(grid_size=25, **overrides)
    fh = FrameHandler(ds.cam, cfg)
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
    state = fused.state_from_handler(fh)

    def step(st, img):
        return fused.vo_step_donated(st, img, ds.cam, cfg, fh.ncx,
                                     fh.ncy, fh.img_shape)

    for i in range(6):
        state, out = step(state, imgs[i])
    jax.block_until_ready(out.t_wc)
    t0 = time.perf_counter()
    n = 0
    for i in range(6, imgs.shape[0]):
        state, out = step(state, imgs[i])
        n += 1
        if n % 6 == 0:
            out.t_wc.block_until_ready()
    jax.block_until_ready(state.t)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:14s} {dt*1e3:7.2f} ms/frame", flush=True)
    return dt


base = None
for name, ov in VARIANTS.items():
    try:
        dt = run(name, ov)
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}", flush=True)
        time.sleep(90)   # worker recovery
        continue
    if name == "full":
        base = dt
    elif base is not None:
        print(f"{'':14s}   delta vs full: {(base - dt)*1e3:+.2f} ms",
              flush=True)
