"""Multi-host (multi-process) execution: the DCN layer of the framework.

SURVEY §5.8: the reference has no distributed backend (threads + ROS
topics only); the TPU-native design is single-program multi-host SPMD —
`jax.distributed.initialize` + one global mesh whose OUTER axis spans
hosts (collectives over DCN) and whose INNER axis spans each host's
chips (collectives over ICI).  The placement rule of the framework:

- `dp` (outer, across hosts): independent camera STREAMS.  Image input
  stays host-local (each process feeds its own cameras); per-frame state
  never crosses the host boundary, so steady-state tracking needs NO
  DCN traffic at all.
- `sp` (inner, within a host): the batched internals of one stream
  (depth-filter K-domain, BA point blocks) — psum/all-gather ride ICI.
- Global jobs (distributed BA over every host's points) psum over BOTH
  axes: the Vn*6-sized reduced system is the only thing that crosses
  DCN, once per GN iteration (ba/schur.build_system outputs).

On CPU the same code paths run multi-process via Gloo TCP collectives
(`jax_cpu_collectives_implementation = "gloo"`), which is how
tests/test_multihost.py exercises this module with 2 processes x N
virtual devices without TPU hardware.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int,
                   local_device_count: Optional[int] = None) -> None:
    """Join (or start, for process 0) the distributed runtime.

    For CPU runs, set `local_device_count` to get that many virtual
    devices per process (must be called before the backend initializes)
    and Gloo collectives are selected automatically."""
    if local_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_device_count}")
    # NOTE: must not touch jax.devices()/default_backend() here — any
    # backend query initializes XLA and distributed.initialize refuses
    # to run after that.  Read the config/env instead.
    platforms = str(jax.config.jax_platforms or
                    os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in platforms:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(outer: str = "dp", inner: str = "sp",
                inner_size: Optional[int] = None) -> "jax.sharding.Mesh":
    """One mesh over ALL processes' devices: (num_processes, per_host).

    outer axis = host boundary (DCN), inner = within-host (ICI).
    `inner_size` < devices-per-host folds the remainder into the outer
    axis (more streams per host)."""
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices())
    n_proc = jax.process_count()
    per_host = devs.size // n_proc
    inner_size = inner_size or per_host
    assert per_host % inner_size == 0, (per_host, inner_size)
    grid = devs.reshape(n_proc * (per_host // inner_size), inner_size)
    return Mesh(grid, (outer, inner))


def host_local_rows(mesh, arr: np.ndarray, axes: Tuple[str, ...]):
    """Build a global array whose leading dim is sharded over `axes` of
    `mesh` from THIS process's rows (jax.make_array_from_process_local_data
    — the host-batch input boundary: each host contributes only what it
    loaded locally)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axes))
    return jax.make_array_from_process_local_data(sharding, arr)


def replicated(mesh, arr):
    """Replicate identical per-process data onto every device."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(arr, NamedSharding(mesh, P()))


def multihost_ba_solve(mesh, prob, n_iter: int = 10,
                       huber_width: float = 0.01,
                       n_var_max: int = 0):
    """Distributed BA over every device of every host.

    Cameras replicated; points sharded over (outer, inner) jointly —
    the per-iteration psum of the reduced camera system is the only
    DCN-crossing collective.  `prob` must already hold GLOBAL arrays
    (use host_local_rows/replicated to build them)."""
    from rpg_svo_tpu.parallel.ba import distributed_ba_solve
    outer, inner = mesh.axis_names
    return distributed_ba_solve(mesh, prob, n_iter=n_iter,
                                huber_width=huber_width,
                                axis=(outer, inner),
                                n_var_max=n_var_max)
