"""Measure aggregate tracked frames/s with B vmapped streams on one chip.

Usage: BENCH_B=8 python tools_streams_bench.py
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools

from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core import fused
from rpg_svo_tpu.utils.synthetic import SyntheticDataset


def main():
    B = int(os.environ.get("BENCH_B", "8"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    chunk = int(os.environ.get("BENCH_CHUNK", "10"))
    ds = SyntheticDataset(n_frames=n_frames, trajectory="circle",
                          radius=0.25, revolutions=0.5)
    cfg = fast_preset(grid_size=25, epi_max_steps=128, df_update_k=512)
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
    state1 = fused.state_from_handler(fh)
    # B identical streams (same sequence; per-stream state diverges only
    # by numerics) — representative for cost since the program is
    # data-independent in shape
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                          state1)
    states = jax.tree.map(jnp.array, states)   # materialize

    @functools.partial(jax.jit, static_argnames=("cfg", "ncx", "ncy",
                                                 "img_shape"),
                       donate_argnums=(0,))
    def scan_b(states, imgs_chunk, cam, cfg, ncx, ncy, img_shape):
        def one(st, im):
            return fused._vo_scan(st, im, cam, cfg, ncx, ncy, img_shape)
        return jax.vmap(one)(states, imgs_chunk)

    T = imgs.shape[0]
    imgs_b = jnp.broadcast_to(imgs, (B,) + imgs.shape)

    # warm
    t_compile = time.perf_counter()
    states, outs = scan_b(states, imgs_b[:, :chunk], ds.cam, cfg, fh.ncx,
                          fh.ncy, fh.img_shape)
    jax.block_until_ready(outs.t_wc)
    print(f"# warm(+compile) {time.perf_counter()-t_compile:.1f}s",
          flush=True)

    n_chunks = (T - chunk) // chunk
    t0 = time.perf_counter()
    n_timed = 0
    for c in range(n_chunks):
        lo = chunk + c * chunk
        states, outs = scan_b(states, imgs_b[:, lo:lo + chunk], ds.cam,
                              cfg, fh.ncx, fh.ncy, fh.img_shape)
        n_timed += chunk * B
        outs.t_wc.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_timed / dt
    per_frame = dt / (n_timed / B) * 1e3
    print(f"B={B} aggregate_fps={fps:.1f} per_step={per_frame:.2f} ms "
          f"(x{fps/106.5:.2f} vs single-stream 106.5)", flush=True)


if __name__ == "__main__":
    main()
