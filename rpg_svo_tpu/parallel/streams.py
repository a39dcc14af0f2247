"""Multi-stream (data-parallel) visual odometry over a device mesh.

The reference is a single-camera, single-process system; the TPU-native
scaling axis it lacks is SERVING MANY CAMERA STREAMS AT ONCE (SURVEY
§2.4: tracking/mapping concurrency maps to batched device programs).
Two composable forms:

- `vmapped_vo_step`: B streams in ONE device program on one chip.  Under
  vmap, per-stream lax.cond branches lower to select (both branches
  execute), so the keyframe-insertion work is paid every frame — best
  for small B where raw FLOPs are cheap and dispatch overhead dominates.
- `multistream_step`: one stream per device over the mesh's `dp` axis
  via shard_map.  Each device keeps REAL branch semantics (its own
  keyframe cond), so the per-frame cost matches single-stream; streams
  scale with devices at ~zero marginal cost until ICI-bound collectives
  appear (there are none in the tracking step — it is embarrassingly
  parallel across streams).

Both operate on a VOState pytree with a leading stream axis.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rpg_svo_tpu.config import Config
from rpg_svo_tpu.core import fused


def stack_states(states) -> "fused.VOState":
    """Stack B per-stream VOStates into one batched pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def index_state(batched, i: int):
    """Extract stream i's VOState from a batched pytree."""
    return jax.tree.map(lambda x: x[i], batched)


@functools.partial(jax.jit, static_argnames=("cfg", "ncx", "ncy",
                                             "img_shape"))
def vmapped_vo_step(states, imgs: jnp.ndarray, cam, cfg: Config,
                    ncx: int, ncy: int, img_shape: Tuple[int, int]):
    """One tracking step for B streams in one program (single chip).

    states: VOState with leading axis B; imgs (B, H, W)."""
    def step(s, img):
        return fused.vo_step(s, img, cam, cfg, ncx, ncy, img_shape)
    return jax.vmap(step)(states, imgs)


def multistream_step(mesh: Mesh, states, imgs: jnp.ndarray, cam,
                     cfg: Config, ncx: int, ncy: int,
                     img_shape: Tuple[int, int], axis: str = "dp"):
    """One tracking step for n_devices streams, one per device.

    states: VOState with leading axis == mesh.shape[axis]; imgs likewise.
    Each device runs the full fused step on its own stream with real
    branch semantics.  Returns (states', StepOut) with the same layout.
    """
    def local(state, img):
        s1 = jax.tree.map(lambda x: x[0], state)
        s2, out = fused.vo_step(s1, img[0], cam, cfg, ncx, ncy, img_shape)
        return (jax.tree.map(lambda x: x[None], s2),
                jax.tree.map(lambda x: x[None], out))

    spec_state = jax.tree.map(lambda _: P(axis), states)
    spec_img = P(axis)
    spec_out = (spec_state,
                jax.tree.map(lambda _: P(axis), fused.StepOut(
                    *[0] * len(fused.StepOut._fields))))
    # check_vma off: loop carries seeded from replicated constants (e.g.
    # SE3.identity() in the alignment) are typed "unvarying" and trip the
    # varying-manual-axes check even though the computation is per-device
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec_state, spec_img),
                   out_specs=spec_out, check_vma=False)
    return fn(states, imgs)


def multistream_scan(mesh: Mesh, states, imgs: jnp.ndarray, cam,
                     cfg: Config, ncx: int, ncy: int,
                     img_shape: Tuple[int, int], axis: str = "dp"):
    """vo_scan for one stream per device along `axis`: each device tracks
    its own whole image stack in one program, with NO collective between
    streams (the steady-state multi-host claim of parallel/multihost.py:
    dp streams host-local => zero DCN traffic; tests/_multihost_track_
    worker.py asserts it from the compiled HLO).

    states: VOState with leading axis == mesh.shape[axis]; imgs
    (B, T, H, W).  Returns (states', StepOut stacked (B, T, ...))."""
    def local(state, img):
        s1 = jax.tree.map(lambda x: x[0], state)
        s2, outs = fused.vo_scan(s1, img[0], cam, cfg, ncx, ncy,
                                 img_shape)
        return (jax.tree.map(lambda x: x[None], s2),
                jax.tree.map(lambda x: x[None], outs))

    spec_state = jax.tree.map(lambda _: P(axis), states)
    spec_out = (spec_state,
                jax.tree.map(lambda _: P(axis), fused.StepOut(
                    *[0] * len(fused.StepOut._fields))))
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec_state, P(axis)),
                   out_specs=spec_out, check_vma=False)
    return fn(states, imgs)
