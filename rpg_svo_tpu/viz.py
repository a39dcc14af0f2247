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


@dataclasses.dataclass
class DenseInput:
    """svo_msgs/DenseInput equivalent (visualizer.cpp:269-314): everything
    a downstream dense-reconstruction consumer needs per frame."""
    frame_id: int
    timestamp: float
    image: np.ndarray          # (H, W) grayscale
    t_w_c: np.ndarray          # (3,) camera position in world
    q_w_c: np.ndarray          # (4,) xyzw camera orientation in world
    min_depth: float
    max_depth: float


def dense_input_from_frame(frame_id: int, timestamp: float,
                           image, T_f_w, point_pos_cam) -> DenseInput:
    """Build the DenseInput record: pose is cam-in-world; depth range is
    the min/max z of the frame's observed points in the camera frame
    (visualizer.cpp:285-297)."""
    from rpg_svo_tpu.geometry.se3 import rot_to_quat
    import jax.numpy as jnp
    z = np.asarray(point_pos_cam)[:, 2]
    z = z[np.isfinite(z) & (z > 0)]
    T_w_c = T_f_w.inverse()
    return DenseInput(
        frame_id=frame_id, timestamp=timestamp,
        image=np.asarray(image),
        t_w_c=np.asarray(T_w_c.t),
        q_w_c=np.asarray(rot_to_quat(T_w_c.R)),
        min_depth=float(z.min()) if z.size else 0.0,
        max_depth=float(z.max()) if z.size else 0.0,
    )


def pose_with_covariance(T_f_w, Cov: np.ndarray,
                         world_in_cam: bool = False):
    """Pose + 6x6 covariance for publishing (visualizer.cpp:163-196).

    world_in_cam=True returns (T_f_w, Cov) unchanged (the covariance is
    estimated in the camera frame by the pose optimizer); otherwise the
    pose is inverted to cam-in-world and the covariance transformed by
    the SE3 adjoint congruence Cov_w = Adj(T_w_c) Cov Adj(T_w_c)^T.
    (The reference writes Adj(T) Cov Adj(T^-1), visualizer.cpp:182, which
    is not symmetric — the congruence is the correct covariance
    transform for a change of tangent-space frame.)"""
    if world_in_cam:
        return T_f_w, np.asarray(Cov)
    import numpy as _np
    T_w_c = T_f_w.inverse()
    A = _np.asarray(T_w_c.adjoint())
    return T_w_c, A @ _np.asarray(Cov) @ A.T


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

@dataclasses.dataclass
class FeatureMsg:
    """svo_msgs/Feature equivalent: one tracked feature observation."""
    frame_id: int
    feature_id: int
    px: tuple          # (u, v) level-0 pixel
    level: int
    point_id: int      # map point index, -1 if none
    type: int          # FEATURE_CORNER / FEATURE_EDGELET


@dataclasses.dataclass
class NbvTrajectory:
    """svo_msgs/NbvTrajectory equivalent: a candidate trajectory for
    next-best-view planning (sequence of stamped poses)."""
    timestamps: List[float]
    positions: List[tuple]      # (x, y, z) world
    orientations: List[tuple]   # quaternions (w, x, y, z)


def features_from_frame(frame, max_n: int = 1000) -> List[FeatureMsg]:
    """Extract FeatureMsg records from a FrameState (valid slots only)."""
    out = []
    px = np.asarray(frame.feat_px)
    lvl = np.asarray(frame.feat_level)
    pid = np.asarray(frame.feat_point)
    typ = np.asarray(frame.feat_type)
    ok = np.asarray(frame.feat_valid)
    fid = int(frame.frame_id)
    for i in np.nonzero(ok)[0][:max_n]:
        out.append(FeatureMsg(fid, int(i), (float(px[i, 0]),
                                            float(px[i, 1])),
                              int(lvl[i]), int(pid[i]), int(typ[i])))
    return out

