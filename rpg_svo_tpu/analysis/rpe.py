"""Relative pose error (RPE).

Port of the TUM tool vendored by the reference
(svo_analysis/.../evaluate_rpe.py): error of relative motion over a fixed
frame delta (or per second), translational and rotational parts.
"""

from __future__ import annotations

import numpy as np


def _to_mat(t: np.ndarray, R: np.ndarray) -> np.ndarray:
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = t
    return M


def rpe(gt_t: np.ndarray, gt_R: np.ndarray, est_t: np.ndarray,
        est_R: np.ndarray, delta: int = 1) -> dict:
    """Relative pose error over a delta of `delta` frames.

    gt_t/est_t (N, 3); gt_R/est_R (N, 3, 3) as T_w_c.
    Returns translational (m) and rotational (rad) stats per delta.
    """
    n = gt_t.shape[0]
    terrs, rerrs = [], []
    for i in range(n - delta):
        j = i + delta
        G = np.linalg.inv(_to_mat(gt_t[i], gt_R[i])) \
            @ _to_mat(gt_t[j], gt_R[j])
        E = np.linalg.inv(_to_mat(est_t[i], est_R[i])) \
            @ _to_mat(est_t[j], est_R[j])
        D = np.linalg.inv(G) @ E
        terrs.append(np.linalg.norm(D[:3, 3]))
        ang = np.arccos(np.clip((np.trace(D[:3, :3]) - 1) / 2, -1, 1))
        rerrs.append(ang)
    terrs = np.asarray(terrs)
    rerrs = np.asarray(rerrs)
    return {
        "trans_rmse": float(np.sqrt((terrs ** 2).mean())),
        "trans_median": float(np.median(terrs)),
        "rot_rmse": float(np.sqrt((rerrs ** 2).mean())),
        "rot_median": float(np.median(rerrs)),
        "n": int(terrs.shape[0]),
    }
