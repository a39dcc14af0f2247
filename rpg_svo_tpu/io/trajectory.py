"""TUM-format trajectory I/O.

Equivalent of the reference's trace output (BenchmarkNode::tracePose,
svo_ros/src/benchmark_node.cpp:91-110): one line per frame,
``timestamp tx ty tz qx qy qz qw`` — directly consumable by the TUM
RGB-D benchmark tools (and our analysis.ate / analysis.rpe ports).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from rpg_svo_tpu.geometry.se3 import SE3, rot_to_quat, quat_to_rot


def write_tum(path: str, entries: List[Tuple[float, np.ndarray, np.ndarray]]):
    """entries: (timestamp, t (3,), q (4,) xyzw) — pose of camera in world."""
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for ts, t, q in entries:
            f.write("%.6f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n"
                    % (ts, t[0], t[1], t[2], q[0], q[1], q[2], q[3]))


def pose_entry(timestamp: float, T_w_c: SE3):
    import jax.numpy as jnp
    t = np.asarray(T_w_c.t)
    q = np.asarray(rot_to_quat(T_w_c.R))
    return (timestamp, t, q)


def read_tum(path: str):
    """Returns (timestamps (N,), t (N, 3), q (N, 4) xyzw)."""
    ts, tt, qq = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.replace(",", " ").split()]
            if len(v) < 8:
                continue
            ts.append(v[0])
            tt.append(v[1:4])
            qq.append(v[4:8])
    return np.asarray(ts), np.asarray(tt), np.asarray(qq)


def tum_to_se3(t: np.ndarray, q: np.ndarray) -> SE3:
    """Batched TUM rows -> SE3 (T_w_c)."""
    import jax.numpy as jnp
    R = quat_to_rot(jnp.asarray(q, dtype=jnp.float32))
    return SE3(R, jnp.asarray(t, dtype=jnp.float32))
