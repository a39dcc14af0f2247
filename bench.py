"""Benchmark: tracked frames/s of the VO pipeline on one TPU chip.

Prints ONE JSON line:
  {"metric": "tracked_fps_single_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 300.0}

Baseline: the reference SVO 'fast' preset tracks >300 fps on an i7 laptop
(Forster et al., ICRA 2014 §VII-B; BASELINE.md).  The BASELINE.json build
target is >=600 fps on a single TPU chip.

Protocol: render a synthetic 752x480 sequence (the hermetic equivalent of
the sin2_tex2_h1_v8 dataset), seed the first frame with ground-truth depth
(reference blender-benchmark protocol), warm up compiles, then time
steady-state tracking over the remaining frames.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    from rpg_svo_tpu.config import fast_preset
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset

    ds = SyntheticDataset(n_frames=n_frames, trajectory="circle",
                          radius=0.25, revolutions=0.5)
    cfg = fast_preset(grid_size=25)
    fh = FrameHandler(ds.cam, cfg)

    # pre-render all frames on device so rendering isn't timed
    frames = []
    for i in range(n_frames):
        img, depth, T = ds.frame(i)
        frames.append((img, depth, T))
    jax.block_until_ready(frames[-1][0])

    img0, depth0, T0 = frames[0]
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)

    # warmup: run enough frames to hit every compile path (KF + non-KF)
    warmup = min(20, n_frames - 1)
    for i in range(1, warmup):
        fh.add_image(frames[i][0], timestamp=i / 50.0)

    t0 = time.perf_counter()
    n_timed = 0
    errs = []
    for i in range(warmup, n_frames):
        info = fh.add_image(frames[i][0], timestamp=i / 50.0)
        n_timed += 1
        T_est = fh.last_frame.T_f_w.inverse()
        errs.append(float(jnp.linalg.norm(T_est.t - frames[i][2].t)))
    jax.block_until_ready(fh.last_frame.t)
    dt = time.perf_counter() - t0

    fps = n_timed / dt
    result = {
        "metric": "tracked_fps_single_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 300.0, 3),
    }
    # sanity numbers on stderr (not part of the contract line)
    print(f"# frames={n_timed} dt={dt:.3f}s "
          f"median_terr={sorted(errs)[len(errs)//2]*1000:.2f}mm "
          f"max_terr={max(errs)*1000:.2f}mm", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
