"""Observability: per-frame Info records and annotated images.

Equivalent of svo_ros Visualizer + svo_msgs/Info + the rqt_svo dashboard
(SURVEY §2.2 #21-23), without ROS: Info is a plain record assembled from
the pipeline's per-frame dict, the annotated image drawing mirrors the
feature overlays (squares for corners), and `status_line` reproduces the
rqt widget's fps / #features / stage / quality readout as text.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Info:
    """svo_msgs/Info equivalent (visualizer.cpp:77-92)."""
    frame_id: int
    timestamp: float
    processing_time: float
    num_matches: int
    tracking_quality: str
    stage: str
    is_keyframe: bool

    @staticmethod
    def from_frame_info(info: dict, quality: str = "good") -> "Info":
        return Info(
            frame_id=info.get("frame_id", -1),
            timestamp=info.get("timestamp", 0.0),
            processing_time=info.get("proc_time", 0.0),
            num_matches=info.get("repr_n_new_references", 0),
            tracking_quality=quality,
            stage=info.get("stage", "?"),
            is_keyframe=bool(info.get("is_keyframe", False)),
        )


def draw_features(img: np.ndarray, px: np.ndarray, valid: np.ndarray,
                  halfsize: int = 2, value: float = 255.0) -> np.ndarray:
    """Overlay feature squares on a grayscale image (visualizer's
    drawFeatures equivalent). Returns a copy."""
    out = np.asarray(img).copy()
    H, W = out.shape
    for p, v in zip(np.asarray(px), np.asarray(valid)):
        if not v:
            continue
        x, y = int(p[0]), int(p[1])
        x0, x1 = max(x - halfsize, 0), min(x + halfsize, W - 1)
        y0, y1 = max(y - halfsize, 0), min(y + halfsize, H - 1)
        out[y0, x0:x1 + 1] = value
        out[y1, x0:x1 + 1] = value
        out[y0:y1 + 1, x0] = value
        out[y0:y1 + 1, x1] = value
    return out


def status_line(info: Info, fps: Optional[float] = None) -> str:
    """rqt_svo widget readout as a one-line string."""
    fps_s = f"{fps:6.1f} fps" if fps is not None else "   -   "
    return (f"[{info.stage:>7}] frame {info.frame_id:5d}  {fps_s}  "
            f"matches {info.num_matches:4d}  quality "
            f"{info.tracking_quality:<12} "
            f"{'KF' if info.is_keyframe else '  '}")


class InfoStream:
    """Rolling per-frame Info collection with fps estimation
    (frame_handler_base's ring-buffer fps readout equivalent)."""

    def __init__(self, window: int = 10):
        self.infos: List[Info] = []
        self.window = window

    def push(self, info: Info):
        self.infos.append(info)

    @property
    def fps(self) -> Optional[float]:
        if len(self.infos) < 2:
            return None
        recent = self.infos[-self.window:]
        dt = [i.processing_time for i in recent if i.processing_time > 0]
        if not dt:
            return None
        return len(dt) / sum(dt)
