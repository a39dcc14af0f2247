"""Stage-cost estimation by config ablation on the real TPU (scan mode).

The op-level profiler can crash the tunneled TPU worker, so instead this
times the fused vo_scan under several config ablations; differences
between variants bound each stage's cost.  Usage:
  python tools_stage_timing.py [variant ...]
"""
import os
import sys
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

N_FRAMES = 120
CHUNK = 10
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
    "seeds_every4": {"df_update_every": 4},
    "seeds_k256": {"df_update_k": 256},
    "epi64": {"epi_max_steps": 64},
    "align_1iter": {"img_align_n_iter": 1},
    "pose_1iter": {"poseoptim_num_iter": 1},
    "struct_0": {"structureoptim_max_pts": 1,
                 "structureoptim_num_iter": 1},
    "grid40": {"grid_size": 40},
    "grid30": {"grid_size": 30},
    "subpix5": {"subpix_n_iter": 5},
    "short8": {"epi_short_steps": 8},
    "fts96": {"max_fts": 96},
    "align_unroll6": {"img_align_unroll": 6},
    "align_unroll_full": {"img_align_unroll": 30},
    "align_i12_full": {"img_align_n_iter": 12, "img_align_unroll": 12},
    # code-level stage stubs (cfg.ablate; exact stage removal)
    "no_align": {"ablate": ("align",)},
    "no_reproject": {"ablate": ("reproject",)},
    "no_pose": {"ablate": ("pose",)},
    "no_struct": {"ablate": ("struct",)},
    "no_df": {"ablate": ("df",)},
    "no_kf": {"ablate": ("kf",)},
    "only_pyr": {"ablate": ("align", "reproject", "pose", "struct",
                            "df", "kf")},
}


def run(name, overrides):
    ov = dict(overrides)
    gs = ov.pop("grid_size", 25)
    cfg = fast_preset(grid_size=gs, epi_max_steps=64, df_update_k=512)
    cfg = cfg.replace(**ov) if ov else cfg
    fh = FrameHandler(ds.cam, cfg)
    # fresh copy: the donated scan deletes the previous run's state, whose
    # pyramid level 0 aliases img0
    fh.set_first_frame_with_depth(jnp.array(img0, copy=True),
                                  T0.inverse(), depth0)
    state = fused.state_from_handler(fh)

    def scan(st, chunk_imgs):
        return fused.vo_scan_donated(st, chunk_imgs, ds.cam, cfg, fh.ncx,
                                     fh.ncy, fh.img_shape)

    T = imgs.shape[0]
    state, outs = scan(state, imgs[:CHUNK])
    jax.block_until_ready(outs.t_wc)
    n_chunks = (T - CHUNK) // CHUNK
    t0 = time.perf_counter()
    n = 0
    kfs = []
    for c in range(n_chunks):
        lo = CHUNK + c * CHUNK
        state, outs = scan(state, imgs[lo:lo + CHUNK])
        n += CHUNK
        kfs.append((outs.is_keyframe, outs.failed))
        # sync on device data only — reading SCALARS back here would put
        # a host round-trip (~tens of ms over the tunnel) in the loop
        outs.t_wc.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    n_kf = int(sum(jnp.sum(k) for k, _ in kfs))
    n_fail = int(sum(jnp.sum(f) for _, f in kfs))
    print(f"{name:14s} {dt*1e3:7.2f} ms/frame   "
          f"(kf={n_kf} fail={n_fail})", flush=True)
    return dt


names = sys.argv[1:] or list(VARIANTS)
base = None
for name in names:
    try:
        dt = run(name, VARIANTS[name])
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)
        time.sleep(90)
        continue
    if name == "full":
        base = dt
    elif base is not None:
        print(f"{'':14s}   delta vs full: {(base - dt)*1e3:+.2f} ms",
              flush=True)
