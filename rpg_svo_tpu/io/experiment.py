"""Experiment configuration: the reference's YAML composition layer.

Parity with svo_analysis/scripts/benchmark.py:18-43, which merges three
YAML layers before a run:
  1. the EXPERIMENT file (experiment_label, param_settings, dataset or
     datasets list — svo_analysis/experiments/*.yaml);
  2. the ALGORITHM params it names (svo_ros/param/vo_fast.yaml /
     vo_accurate.yaml — flat `<param>: <value>` overriding Config);
  3. the DATASET's own dataset_params.yaml (camera intrinsics under
     cam0, dataset_is_blender, dataset_first_frame, noise sigma).

Reference Config param names equal our Config field names (config.py
mirrors svo/src/config.cpp), so algorithm YAMLs apply directly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import yaml

from rpg_svo_tpu.config import Config, fast_preset, accurate_preset


@dataclasses.dataclass
class Experiment:
    label: str
    param_settings: str
    datasets: List[str]
    extra: Dict[str, Any]


def load_experiment(path: str) -> Experiment:
    """Parse an experiment YAML (svo_analysis/experiments format)."""
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    datasets = d.get("datasets")
    if datasets is None:
        datasets = [d["dataset"]] if "dataset" in d else []
    known = {"experiment_label", "param_settings", "dataset", "datasets"}
    return Experiment(
        label=str(d.get("experiment_label", os.path.basename(path))),
        param_settings=str(d.get("param_settings", "vo_fast")),
        datasets=[str(x) for x in datasets],
        extra={k: v for k, v in d.items() if k not in known})


def load_algo_config(param_settings: str,
                     search_dirs: Optional[List[str]] = None) -> Config:
    """Resolve a param_settings name to a Config.

    "vo_fast"/"vo_accurate" map to the shipped presets (the same values
    as svo_ros/param/*.yaml); any other name (or a path ending in .yaml)
    is loaded as a flat YAML of Config overrides on top of fast_preset.
    """
    if param_settings == "vo_fast":
        return fast_preset()
    if param_settings == "vo_accurate":
        return accurate_preset()
    path = param_settings
    if not os.path.exists(path) and search_dirs:
        for d in search_dirs:
            cand = os.path.join(d, param_settings + ".yaml")
            if os.path.exists(cand):
                path = cand
                break
    with open(path) as f:
        overrides = yaml.safe_load(f) or {}
    return apply_param_overrides(fast_preset(), overrides)


def apply_param_overrides(cfg: Config, overrides: Dict[str, Any]) -> Config:
    """Apply reference-named params to a Config, ignoring unknown keys
    (the reference's YAMLs may carry ROS-only keys like cam_topic)."""
    fields = {f.name for f in dataclasses.fields(Config)}
    known = {k: v for k, v in overrides.items()
             if k in fields and v is not None}
    return cfg.replace(**known) if known else cfg


def load_dataset_params(dataset_dir: str) -> Dict[str, Any]:
    """Read <dataset_dir>/dataset_params.yaml if present (cam0 intrinsics,
    dataset_is_blender, dataset_first_frame, dataset_noise_sigma)."""
    path = os.path.join(dataset_dir, "dataset_params.yaml")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def camera_from_params(p: Dict[str, Any]):
    """Build a camera from dataset_params (cam0 block or flat cam_*
    keys), mirroring vikit camera_loader dispatch on cam_model."""
    from rpg_svo_tpu.geometry.cameras import PinholeCamera, ATANCamera
    cam = p.get("cam0", p)
    model = str(cam.get("cam_model", "Pinhole")).lower()
    w = int(cam.get("cam_width", 752))
    h = int(cam.get("cam_height", 480))
    if model == "atan":
        # PTAM normalized convention (see io/camera_loader.py)
        fx = float(cam["cam_fx"]) * w
        fy = float(cam["cam_fy"]) * h
        cx = float(cam["cam_cx"]) * w - 0.5
        cy = float(cam["cam_cy"]) * h - 0.5
        return ATANCamera.make(w, h, fx, fy, cx, cy, float(cam["cam_d0"]))
    return PinholeCamera.make(
        w, h, float(cam["cam_fx"]), float(cam["cam_fy"]),
        float(cam["cam_cx"]), float(cam["cam_cy"]),
        float(cam.get("cam_d0", 0.0)), float(cam.get("cam_d1", 0.0)),
        float(cam.get("cam_d2", 0.0)), float(cam.get("cam_d3", 0.0)))
