"""Benchmark: tracked frames/s of the fused VO step on one TPU chip.

Prints ONE JSON line:
  {"metric": "tracked_fps_single_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 300.0}

Baseline: the reference SVO 'fast' preset tracks >300 fps on an i7 laptop
(Forster et al., ICRA 2014 §VII-B; BASELINE.md).  BASELINE.json target:
>=600 fps on a single TPU chip.

Protocol: render a synthetic 752x480 sequence (hermetic equivalent of the
sin2_tex2_h1_v8 dataset), seed frame 0 with ground-truth depth (reference
blender-benchmark protocol), then time the FUSED single-program step (the
full track+map update per frame — sparse alignment, reprojection/matching,
pose+structure refinement, keyframe logic, depth filter) over the
remaining frames, one async dispatch per frame with periodic syncs.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the fused step is a large program and the
# TPU backend compiles slowly; cache across runs so steady-state timing is
# measured rather than compilation.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    # scan-mode chunk: one host->device dispatch per chunk.  The tunneled
    # device pays ~20 ms of round-trip latency per dispatch, so the
    # throughput metric amortizes it over 40 frames; BENCH_MODE=step
    # measures the per-frame low-latency path instead.
    n_frames = int(os.environ.get("BENCH_FRAMES", "400"))
    chunk = int(os.environ.get("BENCH_CHUNK", "80"))
    from rpg_svo_tpu.config import fast_preset
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.core import fused
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=n_frames, trajectory="circle",
                          radius=0.25, revolutions=0.5)
    cfg = fast_preset(grid_size=int(os.environ.get("BENCH_GRID", "25")),
                      epi_max_steps=int(os.environ.get("BENCH_EPI",
                                                       "128")),
                      df_update_k=int(os.environ.get("BENCH_K", "512")))
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

    # Dispatch mode: "scan" (default) tracks `chunk` frames per device
    # program via lax.scan — sequential frame-by-frame semantics,
    # identical results to per-frame stepping (tests assert this), but
    # one host->device dispatch per chunk so the remote-tunnel latency
    # is off the critical path.  BENCH_MODE=step times one dispatch per
    # frame (the live low-latency path).
    mode = os.environ.get("BENCH_MODE", "scan")

    def step(st, img):
        return fused.vo_step_donated(st, img, ds.cam, cfg, fh.ncx, fh.ncy,
                                     fh.img_shape)

    def scan(st, imgs_chunk):
        return fused.vo_scan_donated(st, imgs_chunk, ds.cam, cfg, fh.ncx,
                                     fh.ncy, fh.img_shape)

    T = imgs.shape[0]
    n_warm = min(chunk, T - 1)
    if mode == "scan":
        state, outs = scan(state, imgs[:n_warm])
        jax.block_until_ready(outs.t_wc)
        n_chunks = (T - n_warm) // chunk
        t0 = time.perf_counter()
        all_pos = []
        n_timed = 0
        # keep 2 chunk dispatches in flight: the ~20 ms host->device
        # round trip of chunk c+1's dispatch overlaps chunk c's compute
        # (bounded queue depth so the remote worker stays healthy)
        for c in range(n_chunks):
            lo = n_warm + c * chunk
            state, outs = scan(state, imgs[lo: lo + chunk])
            all_pos.append(outs.t_wc)
            n_timed += chunk
            if len(all_pos) >= 2:
                all_pos[-2].block_until_ready()
        jax.block_until_ready(state.t)
        dt = time.perf_counter() - t0
        pos = jnp.concatenate(all_pos) if all_pos else jnp.zeros((0, 3))
    else:
        for i in range(n_warm):
            state, out = step(state, imgs[i])
        jax.block_until_ready(out.t_wc)
        t0 = time.perf_counter()
        n_timed = 0
        all_pos = []
        # bounded in-flight work: sync every `chunk` frames so the remote
        # device queue stays healthy
        for s in range(n_warm, T):
            state, out = step(state, imgs[s])
            all_pos.append(out.t_wc)
            n_timed += 1
            if n_timed % chunk == 0:
                out.t_wc.block_until_ready()
        jax.block_until_ready(state.t)
        dt = time.perf_counter() - t0
        pos = jnp.stack(all_pos) if all_pos else jnp.zeros((0, 3))

    if n_timed == 0:
        print(json.dumps({"metric": "tracked_fps_single_chip",
                          "value": 0.0, "unit": "frames/s",
                          "vs_baseline": 0.0}))
        return
    fps = n_timed / dt

    # accuracy sanity on stderr
    gt = jnp.stack([ds.poses[i].t
                    for i in range(1 + n_warm, 1 + n_warm + n_timed)])
    errs = jnp.linalg.norm(pos - gt, axis=-1)
    print(f"# frames={n_timed} dt={dt:.3f}s median_terr="
          f"{float(jnp.median(errs))*1000:.2f}mm "
          f"max_terr={float(jnp.max(errs))*1000:.2f}mm", file=sys.stderr)

    print(json.dumps({
        "metric": "tracked_fps_single_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 300.0, 3),
    }))


if __name__ == "__main__":
    # the tunneled TPU worker occasionally dies mid-run ("kernel fault",
    # see CLAUDE.md) and recovers in ~1-2 min; a dead backend cannot be
    # revived in-process, so retry by re-exec'ing a fresh interpreter
    attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
    try:
        main()
    except Exception as e:                 # noqa: BLE001
        print(f"# attempt {attempt} failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        if attempt >= 2:
            raise
        time.sleep(100)
        os.environ["BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
