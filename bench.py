"""Benchmark: tracked frames/s of the fused VO step on one TPU chip.

Prints one JSON line per preset (fast first — the headline metric):
  {"metric": "tracked_fps_single_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 600.0}
  {"metric": "tracked_fps_single_chip_accurate", ...}

Baseline: the reference SVO 'fast' preset tracks >300 fps on an i7 laptop
(Forster et al., ICRA 2014 §VII-B; BASELINE.md).  BASELINE.json target:
>=600 fps on a single TPU chip — vs_baseline is reported against 600.
The accurate preset (local BA on, 200 features, grid 20 — Table I) is
the second line; the reference runs it at camera rate (~55-70 fps) on a
desktop.

Protocol: render a synthetic 752x480 sequence (hermetic equivalent of the
sin2_tex2_h1_v8 dataset), seed frame 0 with ground-truth depth (reference
blender-benchmark protocol), then time the FUSED single-program step (the
full track+map update per frame — sparse alignment, reprojection/matching,
pose+structure refinement, keyframe logic, depth filter, local BA when
enabled) over the remaining frames.
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
if os.environ.get("BENCH_PLATFORM"):      # smoke tests: BENCH_PLATFORM=cpu
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])


def make_cfg(preset: str):
    from rpg_svo_tpu.config import fast_preset, accurate_preset
    # epi_max_steps=32 / epi_short_steps=8: measured n_steps on this
    # scene (tools in /tmp, 31835 eligible updates): p50=2, p90=5,
    # longs avg 23 / p90 32, NONE past 48 — the long strip was ~2x
    # oversized at 64 and the short tier 2x at 16.  Segments past 32
    # bump the search level (0.3%% here), exactly the reference's
    # coverage rule; median terr unchanged (2.38/1.95 mm).
    kw = dict(grid_size=int(os.environ.get("BENCH_GRID", "25")),
              epi_max_steps=int(os.environ.get("BENCH_EPI", "32")),
              epi_short_steps=int(os.environ.get("BENCH_SHORT", "8")),
              # K=192: bit-identical 400-frame accuracy to 256 and 512
              # on both pinned scenes (1.89 mm median, same maxima) at
              # +12 fps — the eligible-seed population fits; overflow
              # seeds defer to later frames under the starvation-free
              # LRU service counters (two-tier budget semantics)
              df_update_k=int(os.environ.get("BENCH_K", "192")))
    # scan_rows=4 for BOTH presets: bit-identical 400-frame accuracy
    # to 8 rows (1.95 mm / same maxima) at +10% accurate fps
    kw["epi_scan_rows"] = int(os.environ.get("BENCH_SCANROWS", "4"))
    if os.environ.get("BENCH_UNROLL"):
        kw["img_align_unroll"] = int(os.environ["BENCH_UNROLL"])
    if os.environ.get("BENCH_DFEVERY"):     # seed-update cadence sweep
        kw["df_update_every"] = int(os.environ["BENCH_DFEVERY"])
    # reproject attempt budget 1.5x max_fts (accurate: 384 cells, was
    # 512): steady-state match success is ~90%, and the bench measured
    # BIT-IDENTICAL 400-frame accuracy (1.89 mm median, same max) at
    # +14 fps; the second-scene pin (tests/test_bench_defaults.py) runs
    # this exact value against the untuned control
    kw["reproj_attempt_factor"] = float(os.environ.get("BENCH_ATTF",
                                                       "1.5"))
    if preset == "accurate":
        # full preset defaults (max_points=16384, max_obs=16): the Schur
        # cross-blocks are assembled via one-hot camera couplings
        # (ba/schur.py), so the reduced camera system no longer
        # materializes a (P, M+1, M+1, 6, 6) buffer that outgrew HBM
        if os.environ.get("BENCH_MAXPTS"):      # accuracy-bisect hooks
            kw["max_points"] = int(os.environ["BENCH_MAXPTS"])
        if os.environ.get("BENCH_MAXOBS"):
            kw["max_obs_per_point"] = int(os.environ["BENCH_MAXOBS"])
        if os.environ.get("BENCH_LOBA"):
            kw["loba_num_iter"] = int(os.environ["BENCH_LOBA"])
        return accurate_preset(epi_long_k=128, **kw)
    return fast_preset(**kw)


def timed_chunked_scan(scan, state, imgs, lo: int, chunk: int, tag: str):
    """The bench timing protocol, shared by run_preset and
    run_bootstrap: one warmup chunk (compile/cache-load, logged), then
    full chunks with 2 dispatches in flight (the ~20 ms tunnel
    round-trip of chunk c+1 overlaps chunk c's compute), one final
    sync before reading the clock.

    Returns (state, warm_pos, timed_pos, fps, n_timed, n_warm)."""
    T = imgs.shape[0]
    n_warm = min(chunk, T - lo)
    t_c = time.perf_counter()
    state, outs = scan(state, imgs[lo: lo + n_warm])
    jax.block_until_ready(outs.t_wc)
    print(f"# {tag}: compile+warmup {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr)
    warm_pos = outs.t_wc
    n_chunks = (T - lo - n_warm) // chunk
    t0 = time.perf_counter()
    all_pos = []
    n_timed = 0
    for c in range(n_chunks):
        s = lo + n_warm + c * chunk
        state, outs = scan(state, imgs[s: s + chunk])
        all_pos.append(outs.t_wc)
        n_timed += chunk
        if len(all_pos) >= 2:
            all_pos[-2].block_until_ready()
    jax.block_until_ready(state.t)
    dt = time.perf_counter() - t0
    fps = n_timed / dt if n_timed else 0.0
    pos = jnp.concatenate(all_pos) if all_pos else jnp.zeros((0, 3))
    return state, warm_pos, pos, fps, n_timed, n_warm


def run_preset(preset: str, ds, imgs, first, n_frames: int, chunk: int,
               mode: str):
    """Track the sequence under `preset`; returns (fps, n_timed, pos,
    n_warm)."""
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.core import fused

    img0, depth0, T0 = first
    cfg = make_cfg(preset)
    fh = FrameHandler(ds.cam, cfg)
    fh.set_first_frame_with_depth(jnp.array(img0, copy=True),
                                  T0.inverse(), depth0)
    state = fused.state_from_handler(fh)

    def step(st, img):
        return fused.vo_step_donated(st, img, ds.cam, cfg, fh.ncx, fh.ncy,
                                     fh.img_shape)

    def scan(st, imgs_chunk):
        return fused.vo_scan_donated(st, imgs_chunk, ds.cam, cfg, fh.ncx,
                                     fh.ncy, fh.img_shape)

    T = imgs.shape[0]
    n_warm = min(chunk, T - 1)
    if mode == "scan":
        # warmup chunk = the compile-time guard: fresh two-tier compiles
        # have ranged 2-25 minutes on this backend, a bad op pattern
        # shows up in the logged warmup time first
        state, _, pos, fps, n_timed, n_warm = timed_chunked_scan(
            scan, state, imgs, 0, chunk, preset)
        return fps, n_timed, pos, n_warm
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

    fps = n_timed / dt if n_timed else 0.0
    return fps, n_timed, pos, n_warm


def run_bootstrap(preset: str, ds, imgs, n_frames: int, chunk: int):
    """Self-bootstrapped mode (VERDICT r4 #5; --bootstrap): frames go
    through the on-chip KLT+homography two-view init
    (core/initialization.py — the first thing a real dataset hits, and
    a fresh compile/layout/fault surface on this backend), then the
    fused scan tracks the rest.  The bootstrap's map scale is its own
    (Config.map_scale normalization), so accuracy is Sim3-aligned ATE
    (analysis/ate.py) instead of raw translation error."""
    from rpg_svo_tpu.core.pipeline import FrameHandler, STAGE_DEFAULT_FRAME
    from rpg_svo_tpu.core import fused
    from rpg_svo_tpu.analysis.ate import ate_rmse

    cfg = make_cfg(preset)
    fh = FrameHandler(ds.cam, cfg)
    stride = int(os.environ.get("BENCH_BOOT_STRIDE", "5"))
    t0 = time.perf_counter()
    fh.add_image(jnp.asarray(ds.frame(0)[0]), 0.0)
    i = 0
    i_boot = None
    # preroll at a stride so the ~0.4 px/frame bench motion reaches the
    # reference's 50 px disparity gate in bounded wall time; the KLT
    # tracker re-tracks first->current each attempt (initialization.py)
    while i + stride < n_frames - 1:
        i += stride
        fh.add_image(jnp.asarray(ds.frame(i)[0]), i / 50.0)
        if fh.stage == STAGE_DEFAULT_FRAME:
            i_boot = i
            break
    if i_boot is None:
        raise RuntimeError("bootstrap never reached 50px disparity")
    boot_s = time.perf_counter() - t0
    print(f"# {preset}-bootstrap: init at frame {i_boot} "
          f"({boot_s:.1f}s incl. compiles)", file=sys.stderr)

    state = fused.state_from_handler(fh)

    def scan(st, imgs_chunk):
        return fused.vo_scan_donated(st, imgs_chunk, ds.cam, cfg, fh.ncx,
                                     fh.ncy, fh.img_shape)

    j0 = i_boot            # imgs[j] = frame j+1
    state, warm_pos, pos, fps, n_timed, _ = timed_chunked_scan(
        scan, state, imgs, j0, chunk, f"{preset}-bootstrap")
    # ATE over warm + timed frames (accuracy covers the whole tracked
    # stretch; only the timed chunks define fps)
    est = jnp.concatenate([warm_pos, pos])  # frames i_boot+1 .. end
    import numpy as np
    gt = np.stack([np.asarray(ds.poses[k].t)
                   for k in range(i_boot + 1, i_boot + 1 + est.shape[0])])
    ate = ate_rmse(gt, np.asarray(est), with_scale=True)
    print(f"# {preset}-bootstrap: frames={n_timed} "
          f"ate_median={ate['median'] * 1000:.2f}mm "
          f"ate_rmse={ate['rmse'] * 1000:.2f}mm scale={ate['scale']:.4f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"tracked_fps_single_chip_bootstrap",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 600.0, 3),
    }), flush=True)


def main():
    # scan-mode chunk: one host->device dispatch per chunk.  The tunneled
    # device pays ~20 ms of round-trip latency per dispatch, so the
    # throughput metric amortizes it over 40 frames; BENCH_MODE=step
    # measures the per-frame low-latency path instead.
    n_frames = int(os.environ.get("BENCH_FRAMES", "441"))
    chunk = int(os.environ.get("BENCH_CHUNK", "40"))
    mode = os.environ.get("BENCH_MODE", "scan")
    presets = os.environ.get("BENCH_PRESETS", "fast,accurate").split(",")
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=n_frames, trajectory="circle",
                          radius=0.25, revolutions=0.5)
    imgs = []
    for i in range(n_frames):
        img, depth, T = ds.frame(i)
        imgs.append(img)
        if i == 0:
            first = (img, depth, T)
    imgs = jnp.stack(imgs[1:])
    jax.block_until_ready(imgs)

    if "--bootstrap" in sys.argv or os.environ.get("BENCH_BOOTSTRAP"):
        run_bootstrap(presets[0], ds, imgs, n_frames, chunk)
        return

    ok_lines = 0
    for pi, preset in enumerate(presets):
        try:
            fps, n_timed, pos, n_warm = run_preset(
                preset, ds, imgs, first, n_frames, chunk, mode)
        except Exception as e:   # noqa: BLE001
            msg = f"{type(e).__name__}: {str(e)[:300]}"
            # deterministic failures (compile/HBM OOM) must not abort the
            # presets that already produced their metric line; transient
            # backend death (worker fault) must REACH the __main__
            # re-exec loop — a dead backend cannot run the next preset
            # either, and swallowing it here silently drops the metric
            fatal = ("RESOURCE_EXHAUSTED" in msg or "memory" in msg
                     or "OOM" in msg)
            if not fatal:
                # resume from the failed preset only: finished presets
                # already flushed their metric lines to stdout
                os.environ["BENCH_PRESETS"] = ",".join(presets[pi:])
                raise
            print(f"# {preset} preset failed: {msg}", file=sys.stderr)
            continue
        if n_timed:
            # accuracy sanity on stderr
            gt = jnp.stack([ds.poses[i].t
                            for i in range(1 + n_warm,
                                           1 + n_warm + n_timed)])
            errs = jnp.linalg.norm(pos - gt, axis=-1)
            print(f"# {preset}: frames={n_timed} median_terr="
                  f"{float(jnp.median(errs))*1000:.2f}mm "
                  f"max_terr={float(jnp.max(errs))*1000:.2f}mm",
                  file=sys.stderr)
        suffix = "" if preset == "fast" else f"_{preset}"
        # vs_baseline: BASELINE.json target is >=600 fps on one TPU chip
        # (2x the reference's >300 fps laptop fast preset)
        print(json.dumps({
            "metric": f"tracked_fps_single_chip{suffix}",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / 600.0, 3),
        }), flush=True)
        ok_lines += 1
    if not ok_lines:
        raise RuntimeError("no preset produced a metric line")


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
