"""Map / pipeline state checkpointing.

The reference has NO persistence (SURVEY §5.4 — reset rebuilds from
scratch).  Because our whole map is one pytree of arrays, checkpoint and
resume are trivial — this is a new capability, not a port.  Numpy .npz is
used so checkpoints are portable and dependency-free; the pytree
structure is reconstructed from the same static capacities.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.core.map import (
    MapState, KeyframeStore, PointStore, SeedStore,
)


def save_map(path: str, m: MapState) -> None:
    flat, treedef = jax.tree.flatten(m)
    np.savez_compressed(path, n_leaves=len(flat),
                        **{f"leaf_{i}": np.asarray(x)
                           for i, x in enumerate(flat)})


def load_map(path: str, template: MapState) -> MapState:
    """Template provides the pytree structure (same capacities)."""
    data = np.load(path)
    flat_t, treedef = jax.tree.flatten(template)
    n = int(data["n_leaves"])
    assert n == len(flat_t), (
        f"checkpoint has {n} leaves, template expects {len(flat_t)} "
        "(capacity/config mismatch)")
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    for a, b in zip(leaves, flat_t):
        assert a.shape == b.shape, f"shape mismatch {a.shape} {b.shape}"
    return jax.tree.unflatten(treedef, leaves)


def save_handler(path: str, fh) -> None:
    """Checkpoint a FrameHandler's full tracking state (map + last frame
    + stage), enough to resume add_image() mid-sequence."""
    flat, _ = jax.tree.flatten(fh.map)
    lf = fh.last_frame
    frame_leaves, _ = jax.tree.flatten(
        (lf.pyr, lf.R, lf.t, lf.frame_id, lf.timestamp, lf.feat_px,
         lf.feat_f, lf.feat_level, lf.feat_point, lf.feat_valid,
         lf.feat_type, lf.feat_grad))
    np.savez_compressed(
        path,
        n_map=len(flat),
        n_frame=len(frame_leaves),
        stage=fh.stage, quality=fh.quality,
        next_id=fh.next_id, num_obs_last=fh.num_obs_last,
        **{f"m_{i}": np.asarray(x) for i, x in enumerate(flat)},
        **{f"f_{i}": np.asarray(x) for i, x in enumerate(frame_leaves)})


def load_handler(path: str, fh) -> None:
    """Restore state saved by save_handler into a compatible handler."""
    from rpg_svo_tpu.core.frame import FrameState
    from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid
    data = np.load(path)
    flat_t, treedef = jax.tree.flatten(fh.map)
    n = int(data["n_map"])
    assert n == len(flat_t), (
        f"checkpoint has {n} map leaves, handler expects {len(flat_t)}")
    leaves = [jnp.asarray(data[f"m_{i}"]) for i in range(n)]
    for a, b in zip(leaves, flat_t):
        assert a.shape == b.shape, (
            f"checkpoint/config capacity mismatch: {a.shape} vs {b.shape}")
    fh.map = jax.tree.unflatten(treedef, leaves)
    n_lv = fh.n_levels
    fr = [jnp.asarray(data[f"f_{i}"])
          for i in range(int(data["n_frame"]))]
    pyr = tuple(fr[:n_lv])
    (R, t, frame_id, ts, feat_px, feat_f, feat_level, feat_point,
     feat_valid, feat_type, feat_grad) = fr[n_lv:n_lv + 11]
    pad = PaddedPyramid(pyr)
    fh.last_frame = FrameState(
        pyr=pyr, pad=pad, flat=pad.flat_view(), R=R, t=t,
        frame_id=frame_id,
        timestamp=ts, feat_px=feat_px, feat_f=feat_f,
        feat_level=feat_level, feat_point=feat_point,
        feat_valid=feat_valid, feat_type=feat_type, feat_grad=feat_grad)
    fh.stage = str(data["stage"])
    fh.quality = str(data["quality"])
    fh.next_id = int(data["next_id"])
    fh.num_obs_last = int(data["num_obs_last"])
