"""The FULL fused VO step on a device mesh.

`vo_step_mesh` runs the exact single-chip fused program
(core/fused.py::vo_step) with its two heavy batched internals — the
depth-filter's K-compacted epipolar scan and the local-BA Schur point
blocks — GSPMD-sharded over the mesh's seed/point-parallel axis
(parallel/gspmd.py).  This is the TPU-native replacement for the
reference's tracking/mapping THREAD split (svo/src/depth_filter.cpp:
64-112): instead of a mapping thread racing the tracker, the mapping
work is partitioned across chips inside the one per-frame program, with
XLA-placed all-gathers/psums over ICI.

Semantics are bit-for-bit the single-chip step's up to float reduction
order; tests and the driver dryrun assert parity.
"""

from __future__ import annotations

from typing import Tuple

import jax

from rpg_svo_tpu.config import Config
from rpg_svo_tpu.core import fused


def _check_cfg(mesh, cfg: Config, axis: str) -> Config:
    size = int(mesh.shape[axis])
    if cfg.df_update_k and cfg.df_update_k % size:
        raise ValueError(
            f"cfg.df_update_k={cfg.df_update_k} must be a multiple of the "
            f"'{axis}' mesh axis size {size}: the K-compacted seed domain "
            f"is sharded over that axis (parallel/gspmd.py)")
    return cfg.replace(shard_axis=axis)


def vo_step_mesh(mesh, state: "fused.VOState", img, cam, cfg: Config,
                 ncx: int, ncy: int, img_shape: Tuple[int, int],
                 axis: str = "sp"):
    """One fused tracking+mapping step with mapping internals sharded
    over `axis`.  Inputs may live anywhere; outputs follow XLA's layout.

    cfg.df_update_k must be a multiple of the axis size (checked)."""
    cfg_sp = _check_cfg(mesh, cfg, axis)
    with jax.set_mesh(mesh):
        return fused.vo_step(state, img, cam, cfg_sp, ncx, ncy, img_shape)


def vo_scan_mesh(mesh, state: "fused.VOState", imgs, cam, cfg: Config,
                 ncx: int, ncy: int, img_shape: Tuple[int, int],
                 axis: str = "sp"):
    """vo_scan (whole image stack, one program) with sharded internals."""
    cfg_sp = _check_cfg(mesh, cfg, axis)
    with jax.set_mesh(mesh):
        return fused.vo_scan(state, imgs, cam, cfg_sp, ncx, ncy, img_shape)
