"""Offline benchmark driver: run the pipeline over a dataset, trace, evaluate.

Equivalent of BenchmarkNode (svo_ros/src/benchmark_node.cpp:133-256) plus
the svo_analysis benchmark/evaluate drivers (scripts/benchmark.py:18-106,
evaluate.py): runs VO over a dataset, writes the TUM-format trajectory and
the SVO_TRACE csv, and evaluates ATE/RPE against ground truth.

Usage:
  python -m rpg_svo_tpu.tools.benchmark --dataset synthetic \
      --frames 100 --out /tmp/svo_run
  python -m rpg_svo_tpu.tools.benchmark --dataset tum --path <dir> ...
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _feature_depth_errors(fh, depth_map):
    """|estimated - GT| depth along the ray for tracked features.

    Mirrors BenchmarkNode::traceDepthError
    (svo_ros/src/benchmark_node.cpp:113-131): for every feature with a 3D
    point, compare its depth in the current frame to the ground-truth
    depth map at the feature pixel."""
    import numpy as np
    lf = fh.last_frame
    px = np.asarray(lf.feat_px)
    pid = np.asarray(lf.feat_point)
    ok = np.asarray(lf.feat_valid) & (pid >= 0)
    if not ok.any():
        return []
    pos = np.asarray(fh.map.pt.pos)[np.clip(pid, 0, None)]
    R, t = np.asarray(lf.R), np.asarray(lf.t)
    p_cam = pos @ R.T + t
    z = np.linalg.norm(p_cam, axis=-1)
    u = np.clip(np.round(px[:, 0]).astype(int), 0,
                depth_map.shape[1] - 1)
    v = np.clip(np.round(px[:, 1]).astype(int), 0,
                depth_map.shape[0] - 1)
    gt_z = np.asarray(depth_map)[v, u]
    errs = np.abs(z - gt_z)[ok & (gt_z > 0)]
    return errs.tolist()


def run(args, cfg=None, cam_override=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rpg_svo_tpu.config import fast_preset, accurate_preset
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.geometry.se3 import SE3
    from rpg_svo_tpu.io.trajectory import write_tum, pose_entry
    from rpg_svo_tpu.io.trace import TraceWriter
    from rpg_svo_tpu.viz import Info, InfoStream, status_line
    from rpg_svo_tpu.analysis.ate import ate_rmse, associate
    from rpg_svo_tpu.analysis.rpe import rpe as rpe_eval
    from rpg_svo_tpu.geometry.se3 import quat_to_rot

    os.makedirs(args.out, exist_ok=True)
    if cfg is None:
        cfg = accurate_preset() if args.preset == "accurate" \
            else fast_preset()
        cfg = cfg.replace(grid_size=args.grid_size)
    if getattr(args, "min_fts", 0):
        # quality gate override for small images (the reference mutates
        # Config accessors the same way in its tests, e.g.
        # svo/test/test_sparse_img_align.cpp:156-157)
        cfg = cfg.replace(quality_min_fts=args.min_fts)

    gt = None  # (ts, t (N,3), q (N,4) xyzw)
    if args.dataset == "synthetic":
        from rpg_svo_tpu.utils.synthetic import SyntheticDataset
        from rpg_svo_tpu.geometry.se3 import rot_to_quat
        ds = SyntheticDataset(n_frames=args.frames, trajectory="circle",
                              radius=0.25, revolutions=0.6)
        cam = ds.cam
        shape = ds.shape

        def frames():
            for i in range(len(ds)):
                img, depth, T = ds.frame(i)
                yield i / 50.0, img, (depth if i == 0 else None), T
        gt = (np.arange(len(ds)) / 50.0,
              np.stack([np.asarray(p.t) for p in ds.poses]),
              np.stack([np.asarray(rot_to_quat(p.R)) for p in ds.poses]))
    elif args.dataset == "tum":
        from rpg_svo_tpu.io.datasets import TUMDataset
        from rpg_svo_tpu.geometry.cameras import PinholeCamera
        ds = TUMDataset(args.path)
        img0, _ = ds.frame(0)
        shape = img0.shape
        # fr2 intrinsics default; override via --cam fx,fy,cx,cy
        cam_p = [float(x) for x in args.cam.split(",")] if args.cam else \
            [520.9, 521.0, 325.1, 249.7]
        cam = PinholeCamera.make(shape[1], shape[0], *cam_p[:4])
        gt = ds.gt

        frames = _file_frames(ds, args.frames)
    elif args.dataset == "euroc":
        from rpg_svo_tpu.io.datasets import EuRoCDataset
        from rpg_svo_tpu.geometry.cameras import PinholeCamera
        ds = EuRoCDataset(args.path)
        img0, _ = ds.frame(0)
        shape = img0.shape
        cam_p = [float(x) for x in args.cam.split(",")] if args.cam else \
            [458.654, 457.296, 367.215, 248.375, -0.2834, 0.0739,
             0.0002, 1.76e-5]
        cam = PinholeCamera.make(shape[1], shape[0], cam_p[0], cam_p[1],
                                 cam_p[2], cam_p[3],
                                 *(cam_p[4:8] if len(cam_p) > 4 else []))
        gt = ds.gt

        frames = _file_frames(ds, args.frames)
    elif args.dataset == "blender":
        # reference blender-benchmark protocol
        # (svo_ros/src/benchmark_node.cpp:183-256): GT trajectory +
        # per-pixel GT depth maps; frame 0 seeded with GT-depth features
        from rpg_svo_tpu.io.datasets import BlenderDataset
        from rpg_svo_tpu.geometry.cameras import PinholeCamera
        from rpg_svo_tpu.geometry.se3 import rot_to_quat
        ds = BlenderDataset(args.path)
        img0, _, _ = ds.frame(0)
        shape = img0.shape
        cam_p = [float(x) for x in args.cam.split(",")] if args.cam else \
            [315.5, 315.5, 376.0, 240.0]
        cam = PinholeCamera.make(shape[1], shape[0], *cam_p[:4])
        n = min(len(ds), args.frames)
        gt_T = [ds.frame(i)[1] for i in range(n)]
        gt = (np.arange(n, dtype=np.float64) / 50.0,
              np.stack([np.asarray(T.t) for T in gt_T]),
              np.stack([np.asarray(rot_to_quat(T.R)) for T in gt_T]))

        def frames():
            for i in range(n):
                img, T, _ = ds.frame(i)
                d0 = ds.depth(i, shape) if i == 0 else None
                yield i / 50.0, jnp.asarray(img), \
                    (jnp.asarray(d0) if d0 is not None else None), T
    else:
        raise SystemExit(f"unknown dataset {args.dataset}")

    if cam_override is not None:
        cam = cam_override

    if args.noise_sigma > 0:
        # benchmark-level image noise injection
        # (benchmark_node.cpp:166-176, dataset_noise_sigma)
        rng = np.random.default_rng(args.noise_seed)
        base_frames = frames

        def frames():  # noqa: F811
            for ts, img, d0, T_gt in base_frames():
                noisy = np.asarray(img) + rng.normal(
                    0.0, args.noise_sigma, np.asarray(img).shape)
                yield ts, jnp.asarray(
                    np.clip(noisy, 0.0, 255.0).astype(np.float32)), \
                    d0, T_gt

    fh = FrameHandler(cam, cfg, img_shape=shape)
    tracer = TraceWriter(args.out, "trace")
    stream = InfoStream()
    entries = []
    est_ts = []

    # per-frame error tracefiles (benchmark_node tracePoseError /
    # traceDepthError, benchmark_node.cpp:91-131)
    terr_rows, rerr_rows, depth_errs = [], [], []

    t_start = time.perf_counter()
    frame_i = 0
    for ts, img, depth0, T_gt in frames():
        if frame_i == 0 and depth0 is not None and args.seed_first_frame:
            fh.set_first_frame_with_depth(img, T_gt.inverse(), depth0, ts)
            entries.append(pose_entry(ts, T_gt))
            est_ts.append(ts)
            frame_i += 1
            continue
        info = fh.add_image(img, ts)
        tracer.log_frame(info)
        rec = Info.from_frame_info(info, fh.quality)
        stream.push(rec)
        if args.verbose:
            print(status_line(rec, stream.fps))
        if fh.stage == "default":
            T_wc = fh.last_frame.T_f_w.inverse()
            entries.append(pose_entry(ts, T_wc))
            est_ts.append(ts)
            if T_gt is not None:
                dt_vec = np.asarray(T_wc.t) - np.asarray(T_gt.t)
                terr_rows.append((ts, float(np.linalg.norm(dt_vec)),
                                  *dt_vec.tolist()))
                dR = np.asarray(T_gt.R).T @ np.asarray(T_wc.R)
                ang = float(np.arccos(np.clip(
                    (np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)))
                rerr_rows.append((ts, ang))
            if args.dataset == "blender" and args.trace_depth:
                dm = ds.depth(frame_i, shape)
                if dm is not None:
                    depth_errs.extend(_feature_depth_errors(fh, dm))
        frame_i += 1
    wall = time.perf_counter() - t_start

    traj_path = os.path.join(args.out, "traj_estimate.txt")
    write_tum(traj_path, entries)
    trace_path = tracer.flush()
    if terr_rows:
        with open(os.path.join(args.out, "translation_error.txt"),
                  "w") as f:
            for row in terr_rows:
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")
        with open(os.path.join(args.out, "orientation_error.txt"),
                  "w") as f:
            for row in rerr_rows:
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")
    if depth_errs:
        from rpg_svo_tpu.analysis.depth import depth_error_stats
        with open(os.path.join(args.out, "depth_error.txt"), "w") as f:
            for e in depth_errs:
                f.write(f"{e:.9f}\n")
    if args.ply:
        from rpg_svo_tpu.io.ply import map_points_ply
        map_points_ply(os.path.join(args.out, "map_points.ply"), fh.map)

    report = {"frames": len(stream.infos), "wall_s": round(wall, 3),
              "fps": round(len(stream.infos) / max(wall, 1e-9), 2),
              "trajectory": traj_path, "trace": trace_path}
    if depth_errs:
        from rpg_svo_tpu.analysis.depth import depth_error_stats
        report["depth_error"] = depth_error_stats(np.asarray(depth_errs))
    if gt is not None and len(entries) > 3:
        est_t = np.stack([e[1] for e in entries])
        est_q = np.stack([e[2] for e in entries])
        ia, ib = associate(np.asarray(est_ts), gt[0])
        if len(ia) > 3:
            report["ate"] = ate_rmse(gt[1][ib], est_t[ia])
            gt_R = np.asarray(quat_to_rot(jnp.asarray(gt[2][ib])))
            est_R = np.asarray(quat_to_rot(jnp.asarray(est_q[ia])))
            report["rpe_delta1"] = rpe_eval(gt[1][ib], gt_R,
                                            est_t[ia], est_R, delta=1)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report


def run_experiment(args):
    """Reference experiment protocol: one YAML names the algorithm
    preset and dataset(s); each dataset dir carries its own
    dataset_params.yaml (svo_analysis/scripts/benchmark.py:18-106)."""
    import copy
    from rpg_svo_tpu.io.experiment import (
        load_experiment, load_algo_config, apply_param_overrides,
        load_dataset_params, camera_from_params)
    exp = load_experiment(args.experiment)
    root = args.dataset_dir or os.environ.get("SVO_DATASET_DIR") \
        or os.path.dirname(os.path.abspath(args.experiment))
    base_cfg = load_algo_config(
        exp.param_settings,
        search_dirs=[root, os.path.dirname(os.path.abspath(args.experiment))])
    base_cfg = apply_param_overrides(base_cfg, exp.extra)
    reports = {}
    for name in (exp.datasets or ["synthetic"]):
        sub = copy.copy(args)
        sub.out = os.path.join(args.out, f"{exp.label}_{name}".replace(
            " ", "_"))
        cam = None
        cfg = base_cfg
        if name == "synthetic":
            sub.dataset = "synthetic"
        else:
            ddir = os.path.join(root, name)
            if not os.path.isdir(ddir):
                raise SystemExit(f"dataset directory not found: {ddir}")
            dp = load_dataset_params(ddir)
            cfg = apply_param_overrides(cfg, dp)
            if "cam0" in dp or "cam_model" in dp:
                cam = camera_from_params(dp)
            if dp.get("dataset_noise_sigma"):
                sub.noise_sigma = float(dp["dataset_noise_sigma"])
            sub.path = ddir
            if dp.get("dataset_is_blender"):
                sub.dataset = "blender"
            elif os.path.exists(os.path.join(ddir, "rgb.txt")):
                sub.dataset = "tum"
            elif os.path.isdir(os.path.join(ddir, "mav0")):
                sub.dataset = "euroc"
            else:
                sub.dataset = "blender"
        reports[name] = run(sub, cfg=cfg, cam_override=cam)
    out = os.path.join(args.out, "experiment_report.json")
    with open(out, "w") as f:
        json.dump({"label": exp.label, "datasets": reports}, f, indent=2)
    print(f"# experiment report: {out}")
    return reports


def _file_frames(ds, max_frames: int):
    """Frame iterator over a file dataset, decoding ahead on the native
    C++ prefetch pool when available (rpg_svo_tpu/native/loader.cpp),
    falling back to serial decode."""
    n = min(len(ds), max_frames)

    def gen():
        try:
            from rpg_svo_tpu.io.datasets import NativePrefetchingSource
            source = NativePrefetchingSource(ds)
        except Exception:   # native lib unavailable -> serial decode
            source = None
        if source is None:
            for i in range(n):
                img, ts = ds.frame(i)
                yield ts, jnp.asarray(img), None, None
            return
        for i, (img, ts) in source:
            if i >= n:
                break
            yield ts, jnp.asarray(img), None, None
    return gen


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--experiment", default=None,
                    help="experiment YAML (svo_analysis/experiments "
                         "format); overrides --dataset/--preset")
    ap.add_argument("--dataset-dir", default=None,
                    help="root of dataset directories ($SVO_DATASET_DIR)")
    ap.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "tum", "euroc", "blender"])
    ap.add_argument("--path", default=None, help="dataset directory")
    ap.add_argument("--out", default="/tmp/svo_run")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--preset", default="fast",
                    choices=["fast", "accurate"])
    ap.add_argument("--grid-size", type=int, default=25)
    ap.add_argument("--cam", default=None,
                    help="fx,fy,cx,cy[,k1,k2,p1,p2]")
    ap.add_argument("--seed-first-frame", action="store_true",
                    default=True,
                    help="seed frame 0 with GT depth when available")
    ap.add_argument("--noise-sigma", type=float, default=0.0,
                    help="Gaussian image noise stddev (benchmark_node's "
                         "dataset_noise_sigma)")
    ap.add_argument("--noise-seed", type=int, default=0)
    ap.add_argument("--trace-depth", action="store_true",
                    help="trace per-feature depth errors vs GT depth "
                         "maps (blender datasets)")
    ap.add_argument("--min-fts", type=int, default=0,
                    help="override quality_min_fts (small images)")
    ap.add_argument("--ply", action="store_true",
                    help="export final map points as PLY")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    if args.experiment:
        run_experiment(args)
    else:
        run(args)


if __name__ == "__main__":
    main()
