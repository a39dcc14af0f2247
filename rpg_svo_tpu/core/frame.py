"""Per-frame state: pyramid + pose + the per-cell feature table.

TPU-native replacement for the reference Frame (svo/src/frame.cpp):
the feature list becomes a static table with one slot per reprojector grid
cell (the reprojector produces at most one match per cell), and the image
pyramid is carried both as a level tuple (for whole-image kernels) and in
flat form (for per-item-level gathers).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.ops.interp import FlatPyramid
from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid
from rpg_svo_tpu.ops.pyramid import build_padded_pyramid, build_pyramid
from rpg_svo_tpu.ops.robust import masked_median


class FrameState(NamedTuple):
    pyr: Tuple[jnp.ndarray, ...]
    pad: PaddedPyramid         # padded-stack layout (the storage format)
    flat: FlatPyramid          # strided flat view of `pad` (zero-copy)
    R: jnp.ndarray             # T_f_w rotation
    t: jnp.ndarray             # T_f_w translation
    frame_id: jnp.ndarray      # int32
    timestamp: jnp.ndarray     # float64-as-float32 seconds
    feat_px: jnp.ndarray       # (C, 2)
    feat_f: jnp.ndarray        # (C, 3)
    feat_level: jnp.ndarray    # (C,)
    feat_point: jnp.ndarray    # (C,) point id or -1
    feat_valid: jnp.ndarray    # (C,)
    feat_type: jnp.ndarray     # (C,) int32 FEATURE_CORNER/EDGELET
    feat_grad: jnp.ndarray     # (C, 2) unit gradient dir (edgelets)

    @property
    def T_f_w(self) -> SE3:
        return SE3(self.R, self.t)

    def with_pose(self, T: SE3) -> "FrameState":
        return self._replace(R=T.R, t=T.t)


def make_frame(img: jnp.ndarray, n_levels: int, n_cells: int,
               frame_id: int, timestamp: float,
               T_f_w: SE3 | None = None) -> FrameState:
    pad = build_padded_pyramid(img, n_levels)
    pyr = pad.levels()
    if T_f_w is None:
        T_f_w = SE3.identity()
    return FrameState(
        pyr=pyr,
        pad=pad,
        flat=pad.flat_view(),
        R=T_f_w.R, t=T_f_w.t,
        frame_id=jnp.int32(frame_id),
        timestamp=jnp.float32(timestamp),
        feat_px=jnp.zeros((n_cells, 2), jnp.float32),
        feat_f=jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                        (n_cells, 1)),
        feat_level=jnp.zeros((n_cells,), jnp.int32),
        feat_point=jnp.full((n_cells,), -1, jnp.int32),
        feat_valid=jnp.zeros((n_cells,), bool),
        feat_type=jnp.zeros((n_cells,), jnp.int32),
        feat_grad=jnp.tile(jnp.array([1.0, 0.0], jnp.float32),
                           (n_cells, 1)),
    )


def scene_depth(frame: FrameState, point_pos: jnp.ndarray):
    """Median and min z-depth of the frame's observed points
    (frame_utils::getSceneDepth, frame.cpp:167-188).
    point_pos: full point pool positions (P, 3)."""
    pid = jnp.clip(frame.feat_point, 0, point_pos.shape[0] - 1)
    p_f = frame.T_f_w.apply(point_pos[pid])
    z = p_f[..., 2]
    ok = frame.feat_valid & (frame.feat_point >= 0) & (z > 0)
    depth_mean = masked_median(z, ok, default=1.0)
    depth_min = jnp.min(jnp.where(ok, z, jnp.inf))
    depth_min = jnp.where(jnp.isfinite(depth_min), depth_min, depth_mean)
    return depth_mean, depth_min
