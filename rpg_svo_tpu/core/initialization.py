"""Two-view bootstrap: KLT tracking + homography initialization.

TPU-native equivalent of initialization::KltHomographyInit
(svo/src/initialization.cpp):

- first frame: FAST detect, require >= 100 corners (:29-41, 107-125);
- second frame: pyramidal LK to track them (OpenCV in the reference, our
  batched tracker here), require >= init_min_tracked tracked and
  >= init_min_disparity px median disparity (:43-66, 127-169);
- homography on unit-plane coordinates, require >= init_min_inliers
  (:171-195);
- rescale the map so median scene depth equals map_scale (:68-76);
- triangulate inliers into initial points observed in both frames
  (:79-97).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.cameras import project2d
from rpg_svo_tpu.geometry.triangulation import triangulate_midpoint
from rpg_svo_tpu.ops.detector import detect_features
from rpg_svo_tpu.ops.lk import track_klt
from rpg_svo_tpu.ops.pyramid import build_lk_pyramid
from rpg_svo_tpu.ops.homography import estimate_homography
from rpg_svo_tpu.ops.robust import masked_median

RESULT_SUCCESS = "success"
RESULT_NO_KEYFRAME = "no_keyframe"
RESULT_FAILURE = "failure"


class InitState(NamedTuple):
    px_ref: jnp.ndarray      # (C,) detected corners on frame 0
    f_ref: jnp.ndarray
    level_ref: jnp.ndarray
    valid: jnp.ndarray


class TwoViewResult(NamedTuple):
    T_cur_ref: SE3           # scaled relative pose
    px_ref: jnp.ndarray      # (C, 2) inlier ref pixels
    px_cur: jnp.ndarray      # (C, 2) tracked cur pixels
    f_ref: jnp.ndarray
    f_cur: jnp.ndarray
    p_w: jnp.ndarray         # (C, 3) triangulated points, ref frame = world
    inlier: jnp.ndarray      # (C,)


class KltHomographyInit:
    """Host-side wrapper mirroring the reference class."""

    def __init__(self, cam, cfg, n_cells: int):
        self.cam = cam
        self.cfg = cfg
        self.n_cells = n_cells
        self.state: Optional[InitState] = None
        self.ref_pyr = None

    def reset(self):
        self.state = None
        self.ref_pyr = None

    def add_first_frame(self, pyr) -> str:
        det = detect_features(pyr[:self.cfg.n_pyr_levels],
                              jnp.zeros((self.n_cells,), bool),
                              self.cfg.grid_size)
        n = int(det["valid"].sum())
        if n < 100:
            return RESULT_NO_KEYFRAME
        self.state = InitState(det["px"], self.cam.cam2world(det["px"]),
                               det["level"], det["valid"])
        # antialiased pyramid for large-displacement LK
        self.ref_pyr = build_lk_pyramid(pyr[0], len(pyr))
        return RESULT_SUCCESS

    def add_second_frame(self, pyr, key=None):
        """Returns (result, TwoViewResult | None)."""
        cfg = self.cfg
        st = self.state
        lk_pyr = build_lk_pyramid(pyr[0], len(pyr))
        px_cur, ok = track_klt(self.ref_pyr, lk_pyr, st.px_ref, st.valid,
                               halfwin=15, max_level=4)
        tracked = st.valid & ok
        n_tracked = int(tracked.sum())
        disp = jnp.linalg.norm(px_cur - st.px_ref, axis=-1)
        med_disp = float(masked_median(disp, tracked))
        if n_tracked < cfg.init_min_tracked:
            return RESULT_FAILURE, None
        if med_disp < cfg.init_min_disparity:
            return RESULT_NO_KEYFRAME, None

        f_cur = self.cam.cam2world(px_cur)
        uv_ref = project2d(st.f_ref)
        uv_cur = project2d(f_cur)
        if key is None:
            key = jax.random.PRNGKey(0)
        hres = estimate_homography(
            uv_ref, uv_cur, tracked, key,
            thresh=2.0 * cfg.reproj_thresh / self.cam.fx)
        if int(hres.n_inliers) < cfg.init_min_inliers or \
                not bool(hres.decomp_ok):
            return RESULT_FAILURE, None

        # triangulate in the ref frame (ref = world for now)
        T_ref = SE3.identity()
        T_cur = hres.T_cur_ref
        p_w, tri_ok = triangulate_midpoint(
            T_ref, T_cur.inverse(), st.f_ref, f_cur)
        good = hres.inliers & tri_ok

        # rescale to map_scale via median depth in cur frame
        z_cur = T_cur.apply(p_w)[..., 2]
        depth_med = masked_median(jnp.where(good, z_cur, jnp.inf), good,
                                  default=1.0)
        scale = cfg.map_scale / jnp.maximum(depth_med, 1e-9)
        p_w = p_w * scale
        T_cur_scaled = SE3(T_cur.R, T_cur.t * scale)
        return RESULT_SUCCESS, TwoViewResult(
            T_cur_scaled, st.px_ref, px_cur, st.f_ref, f_cur, p_w, good)
