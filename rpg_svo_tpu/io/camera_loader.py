"""Camera YAML loader.

Parity with vikit's camera_loader consumed by the live node
(`svo_ros/src/vo_node.cpp:72-73`), reading the shipped
`svo_ros/param/camera_pinhole.yaml` / `camera_atan.yaml` formats:
flat `cam_*` keys. ATAN files store PTAM-convention normalized
intrinsics (fx,cx relative to width; fy,cy relative to height, with the
half-pixel offset), Pinhole files store absolute pixels plus radial-
tangential distortion d0..d3.
"""

from __future__ import annotations

from typing import Dict


def _parse_flat_yaml(path: str) -> Dict[str, str]:
    """Parse the flat `key: value` YAML subset these files use."""
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            k, v = line.split(":", 1)
            out[k.strip()] = v.strip()
    return out


def load_camera_yaml(path: str):
    """Build a PinholeCamera or ATANCamera from a cam_* YAML file."""
    from rpg_svo_tpu.geometry.cameras import PinholeCamera, ATANCamera
    kv = _parse_flat_yaml(path)
    model = kv.get("cam_model", "Pinhole").lower()
    w = int(float(kv["cam_width"]))
    h = int(float(kv["cam_height"]))
    fx = float(kv["cam_fx"])
    fy = float(kv["cam_fy"])
    cx = float(kv["cam_cx"])
    cy = float(kv["cam_cy"])
    if model == "atan":
        # ATANCamera.make applies the PTAM normalized convention itself
        # (fx_px = fx * w, cx_px = cx * w - 0.5, likewise for y)
        s = float(kv.get("cam_d0", 0.0))
        return ATANCamera.make(w, h, fx, fy, cx, cy, s)
    d = [float(kv.get(f"cam_d{i}", 0.0)) for i in range(4)]
    return PinholeCamera.make(w, h, fx, fy, cx, cy, *d)
