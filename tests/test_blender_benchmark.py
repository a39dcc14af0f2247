"""Blender benchmark protocol, depth analysis, PLY export.

Covers the reference's runBlenderBenchmark path
(svo_ros/src/benchmark_node.cpp:183-256): blender-layout dataset reader,
GT-depth first-frame seeding, noise injection, per-frame pose/depth error
traces, and the analyse_depth / .ply outputs."""

import os

import numpy as np
import pytest

from rpg_svo_tpu.analysis.depth import (
    depth_error_stats, precision_curve, load_depth_trace,
)
from rpg_svo_tpu.io.ply import write_ply, map_points_ply


def test_depth_error_stats():
    errs = np.array([0.1, 0.2, 0.3, 0.4, 1.0])
    s = depth_error_stats(errs)
    assert s["n"] == 5
    assert s["mean"] == pytest.approx(0.4)
    assert s["p50"] == pytest.approx(0.3)
    e = depth_error_stats(np.zeros((0,)))
    assert e["n"] == 0 and np.isnan(e["mean"])


def test_precision_curve_monotone():
    rng = np.random.default_rng(0)
    errs = np.abs(rng.normal(0, 0.1, 500))
    th, frac = precision_curve(errs)
    assert np.all(np.diff(frac) >= -1e-12)
    assert frac[-1] >= 0.98
    # explicit thresholds
    th2, fr2 = precision_curve(errs, [0.0, 10.0])
    assert fr2[1] == 1.0


def test_load_depth_trace(tmp_path):
    p = str(tmp_path / "depth_error.txt")
    with open(p, "w") as f:
        f.write("# header\n0.1\n0.2\n")
    vals = load_depth_trace(p)
    np.testing.assert_allclose(vals, [0.1, 0.2])


def test_write_ply(tmp_path):
    p = str(tmp_path / "cloud.ply")
    pts = np.arange(12, dtype=np.float64).reshape(4, 3)
    write_ply(p, pts, colors=np.full((4, 3), 128))
    txt = open(p).read()
    assert "element vertex 4" in txt
    assert "property uchar red" in txt
    assert txt.strip().endswith("128 128 128")


def _make_blender_dir(tmp_path, n=12, shape=(120, 160),
                      revolutions=0.4):
    """Render the synthetic dataset into the blender on-disk layout."""
    from PIL import Image
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset
    from rpg_svo_tpu.geometry.se3 import rot_to_quat

    ds = SyntheticDataset(n_frames=n, trajectory="circle", radius=0.25,
                          revolutions=revolutions, shape=shape)
    root = tmp_path / "blender_ds"
    (root / "img").mkdir(parents=True)
    (root / "depth").mkdir()
    lines = []
    for i in range(n):
        img, depth, T_wc = ds.frame(i)
        name = f"frame_{i:06d}"
        Image.fromarray(np.clip(np.asarray(img), 0, 255).astype(np.uint8),
                        mode="L").save(str(root / "img" / f"{name}_0.png"))
        np.savetxt(str(root / "depth" / f"{name}_0.depth"),
                   np.asarray(depth).ravel()[None], fmt="%.6f")
        q = np.asarray(rot_to_quat(T_wc.R))
        t = np.asarray(T_wc.t)
        lines.append(f"{name} {t[0]} {t[1]} {t[2]} "
                     f"{q[0]} {q[1]} {q[2]} {q[3]}")
    (root / "trajectory.txt").write_text("\n".join(lines) + "\n")
    return str(root), ds


def test_blender_dataset_reader(tmp_path):
    from rpg_svo_tpu.io.datasets import BlenderDataset
    root, ds = _make_blender_dir(tmp_path, n=3)
    bd = BlenderDataset(root)
    assert len(bd) == 3
    img, T, name = bd.frame(1)
    assert img.shape == (120, 160)
    ref_img, ref_depth, ref_T = ds.frame(1)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=1.0)
    np.testing.assert_allclose(np.asarray(T.t), np.asarray(ref_T.t),
                               atol=1e-5)
    dm = bd.depth(1, (120, 160))
    np.testing.assert_allclose(dm, np.asarray(ref_depth), rtol=1e-4)


def test_blender_benchmark_end_to_end(tmp_path):
    """Full blender protocol: seeding, tracking, error traces, ply."""
    import argparse
    from rpg_svo_tpu.tools.benchmark import run
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset

    root, ds = _make_blender_dir(tmp_path, n=10, shape=(480, 752),
                                 revolutions=0.125)
    cam = ds.cam
    out = str(tmp_path / "run")
    args = argparse.Namespace(
        dataset="blender", path=root, out=out, frames=10, preset="fast",
        grid_size=25, cam=f"{cam.fx},{cam.fy},{cam.cx},{cam.cy}",
        seed_first_frame=True, verbose=False, noise_sigma=1.0,
        noise_seed=0, trace_depth=True, ply=True, min_fts=0)
    report = run(args)
    assert report["frames"] >= 8
    assert os.path.exists(os.path.join(out, "traj_estimate.txt"))
    assert os.path.exists(os.path.join(out, "translation_error.txt"))
    assert os.path.exists(os.path.join(out, "orientation_error.txt"))
    assert os.path.exists(os.path.join(out, "map_points.ply"))
    assert "ate" in report
    # seeded GT first frame + small circle: trajectory should track
    assert report["ate"]["rmse"] < 0.05
    terr = np.loadtxt(os.path.join(out, "translation_error.txt"))
    assert terr.shape[1] == 5   # ts, |err|, dx, dy, dz
    if "depth_error" in report:
        assert report["depth_error"]["n"] > 0


def test_experiment_yaml_driver(tmp_path):
    """Experiment YAML composition (svo_analysis/scripts/benchmark.py
    parity): experiment -> algo params -> dataset_params, incl. camera
    intrinsics from cam0 and config overrides from the algo YAML."""
    import argparse
    from rpg_svo_tpu.tools.benchmark import run_experiment
    from rpg_svo_tpu.io.experiment import (load_experiment,
                                           load_algo_config)

    root, ds = _make_blender_dir(tmp_path, n=8, shape=(480, 752),
                                 revolutions=0.1)
    cam = ds.cam
    (tmp_path / "blender_ds" / "dataset_params.yaml").write_text(
        "dataset_is_blender: True\n"
        "cam0:\n"
        "  cam_model: Pinhole\n"
        "  cam_width: 752\n  cam_height: 480\n"
        f"  cam_fx: {float(cam.fx)}\n  cam_fy: {float(cam.fy)}\n"
        f"  cam_cx: {float(cam.cx)}\n  cam_cy: {float(cam.cy)}\n")
    (tmp_path / "vo_custom.yaml").write_text(
        "grid_size: 30\nmax_n_kfs: 10\nloba_num_iter: 0\n")
    exp_file = tmp_path / "exp.yaml"
    exp_file.write_text(
        "experiment_label: 'svo test'\n"
        "param_settings: vo_custom\n"
        "dataset: blender_ds\n")

    exp = load_experiment(str(exp_file))
    assert exp.label == "svo test" and exp.datasets == ["blender_ds"]
    cfg = load_algo_config("vo_custom", search_dirs=[str(tmp_path)])
    assert cfg.grid_size == 30 and cfg.max_n_kfs == 10

    args = argparse.Namespace(
        experiment=str(exp_file), dataset_dir=str(tmp_path),
        dataset="synthetic", path=None, out=str(tmp_path / "out"),
        frames=8, preset="fast", grid_size=25, cam=None,
        seed_first_frame=True, verbose=False, noise_sigma=0.0,
        noise_seed=0, trace_depth=False, ply=False, min_fts=0)
    reports = run_experiment(args)
    assert "blender_ds" in reports
    assert reports["blender_ds"]["ate"]["rmse"] < 0.05
    assert os.path.exists(
        os.path.join(str(tmp_path / "out"), "experiment_report.json"))
