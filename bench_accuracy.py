"""Trajectory-accuracy artifact: Sim3-aligned ATE RMSE + RPE, both presets.

The reference's Table II protocol (Forster2014ICRA.pdf §VII; error
tracefiles in svo_ros/src/benchmark_node.cpp:91-131, evaluated by the TUM
tools): run the full VO pipeline over a sequence, align the estimated
trajectory to ground truth with a similarity transform, report ATE RMSE
and relative pose error (translation + rotation) for the fast AND
accurate presets.  Here the sequence is the hermetic synthetic circle
(same renderer/protocol as bench.py) tracked by the fused vo_scan.

Usage: python bench_accuracy.py [--preset fast|accurate|both]
       [--platform tpu|cpu] [--frames N] [--report FILE]
Appends a markdown block to the report file and prints JSON lines.
"""

import argparse
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def run_preset(name: str, n_frames: int, chunk: int):
    import jax.numpy as jnp
    import numpy as np
    from rpg_svo_tpu.config import fast_preset, accurate_preset
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.core import fused
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset
    from rpg_svo_tpu.analysis.ate import ate_rmse
    from rpg_svo_tpu.analysis.rpe import rpe

    ds = SyntheticDataset(n_frames=n_frames, trajectory="circle",
                          radius=0.25, revolutions=0.5)
    # mirror bench.py's configs EXACTLY (shared make_cfg) so the
    # accuracy artifact measures the same cached programs the
    # throughput metric reports
    from bench import make_cfg
    cfg = make_cfg(name)
    fh = FrameHandler(ds.cam, cfg)
    imgs = []
    for i in range(n_frames):
        img, depth, T = ds.frame(i)
        # accumulate on HOST: 400 device-resident frames + a device-side
        # stack fragment HBM (measured ResourceExhausted right after a
        # prior TPU process exit); one bulk transfer instead
        imgs.append(np.asarray(img))
        if i == 0:
            img0, depth0, T0 = img, depth, T
    imgs = jnp.asarray(np.stack(imgs[1:]))
    jax.block_until_ready(imgs)
    fh.set_first_frame_with_depth(jnp.array(img0, copy=True),
                                  T0.inverse(), depth0)
    state = fused.state_from_handler(fh)

    def scan(st, chunk_imgs):
        return fused.vo_scan_donated(st, chunk_imgs, ds.cam, cfg, fh.ncx,
                                     fh.ncy, fh.img_shape)

    T = imgs.shape[0]
    t0 = time.perf_counter()
    pos, rot, failed = [], [], []
    for lo in range(0, T - (T % chunk), chunk):
        state, outs = scan(state, imgs[lo: lo + chunk])
        pos.append(outs.t_wc)
        rot.append(outs.R_fw)
        failed.append(outs.failed)
        outs.t_wc.block_until_ready()
    dt = time.perf_counter() - t0
    n = sum(p.shape[0] for p in pos)
    est_t = np.asarray(jnp.concatenate(pos))
    # R_fw is R of T_f_w (world->cam); T_w_c rotation is its transpose
    est_R = np.asarray(jnp.concatenate(rot)).reshape(-1, 3, 3)
    est_R = np.swapaxes(est_R, 1, 2)
    n_failed = int(np.asarray(jnp.concatenate(failed)).sum())

    gt_t = np.stack([np.asarray(ds.poses[i + 1].t) for i in range(n)])
    gt_R = np.stack([np.asarray(ds.poses[i + 1].R) for i in range(n)])

    ate = ate_rmse(gt_t, est_t, with_scale=True)
    ate_noscale = ate_rmse(gt_t, est_t, with_scale=False)
    r1 = rpe(gt_t, gt_R, est_t, est_R, delta=1)
    r10 = rpe(gt_t, gt_R, est_t, est_R, delta=10)
    # Table II units: the reference reports RPE per SECOND (m/s, deg/s).
    # The pipeline timestamps frames at 50 Hz, so delta=50 frames = 1 s.
    hz = 50.0
    r1s = rpe(gt_t, gt_R, est_t, est_R, delta=int(hz))
    speed = float(np.mean(np.linalg.norm(np.diff(gt_t, axis=0),
                                         axis=-1)) * hz)
    return {
        "preset": name,
        "frames": n,
        "n_failed": n_failed,
        "fps": round(n / dt, 1),
        "ate_rmse_m": round(ate["rmse"], 6),
        "ate_median_m": round(ate["median"], 6),
        "ate_scale": round(ate["scale"], 5),
        "ate_rmse_noscale_m": round(ate_noscale["rmse"], 6),
        "rpe1_trans_rmse_m": round(r1["trans_rmse"], 6),
        "rpe1_rot_rmse_deg": round(np.degrees(r1["rot_rmse"]), 5),
        "rpe10_trans_rmse_m": round(r10["trans_rmse"], 6),
        "rpe10_rot_rmse_deg": round(np.degrees(r10["rot_rmse"]), 5),
        "rpe_1s_trans_mps": round(r1s["trans_rmse"], 6),
        "rpe_1s_trans_median_mps": round(r1s["trans_median"], 6)
        if "trans_median" in r1s else None,
        "rpe_1s_rot_degps": round(np.degrees(r1s["rot_rmse"]), 5),
        "cam_speed_mps": round(speed, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="both",
                    choices=["fast", "accurate", "both"])
    ap.add_argument("--platform", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--frames", type=int,
                    default=int(os.environ.get("BENCH_FRAMES", "400")))
    ap.add_argument("--chunk", type=int,
                    default=int(os.environ.get("BENCH_CHUNK", "40")))
    ap.add_argument("--report", default="ACCURACY.md")
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    presets = ["fast", "accurate"] if args.preset == "both" \
        else [args.preset]
    rows = []
    for p in presets:
        res = run_preset(p, args.frames, args.chunk)
        print(json.dumps(res), flush=True)
        rows.append(res)

    if args.report:
        lines = ["", f"## Trajectory accuracy (synthetic circle, "
                 f"{args.frames} frames, Sim3-aligned)", "",
                 "Reference bounds (84 m MAV trajectory, Table II): fast "
                 "Pos-RMSE 0.0059 m/s, Rot-RMSE 0.43 °/s; accurate "
                 "0.0051 m/s / 0.45 °/s.  RPE/s below uses the Table II "
                 "per-second protocol (50 Hz timestamps, delta = 1 s); "
                 "note the synthetic camera moves at the speed shown, "
                 "vs the MAV's faster flight — per-second drift scales "
                 "with speed, so compare like-for-like.", "",
                 "| preset | frames | failed | speed (m/s) | ATE RMSE "
                 "(m) | RPE/s trans (m/s) | RPE/s rot (deg/s) | RPE@1 "
                 "trans (m) | RPE@10 trans (m) |", "|" + "---|" * 9]
        for r in rows:
            lines.append(
                f"| {r['preset']} | {r['frames']} | {r['n_failed']} | "
                f"{r['cam_speed_mps']} | {r['ate_rmse_m']} | "
                f"{r['rpe_1s_trans_mps']} | {r['rpe_1s_rot_degps']} | "
                f"{r['rpe1_trans_rmse_m']} | {r['rpe10_trans_rmse_m']} |")
        with open(args.report, "a") as f:
            f.write("\n".join(lines) + "\n")
        print(f"# appended to {args.report}", file=sys.stderr)


if __name__ == "__main__":
    main()
