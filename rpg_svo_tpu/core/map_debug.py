"""Map consistency validation and statistics.

Equivalent of map_debug (svo/src/map.cpp:297-365): cross-checks the
keyframe<->point reference structure and reports map statistics.  On the
SoA map these are vectorized invariant checks over the index tables.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from rpg_svo_tpu.core.map import MapState, TYPE_DELETED, TYPE_CANDIDATE


def validate_map(m: MapState) -> List[str]:
    """Returns a list of violation strings (empty = consistent)."""
    errors = []
    kf = m.kf
    pt = m.pt
    K = kf.active.shape[0]
    P = pt.ptype.shape[0]
    F = kf.feat_point.shape[1]
    active_kf = np.asarray(kf.active)
    ptype = np.asarray(pt.ptype)
    feat_point = np.asarray(kf.feat_point)
    feat_valid = np.asarray(kf.feat_valid)
    obs_kf = np.asarray(pt.obs_kf)
    obs_feat = np.asarray(pt.obs_feat)
    obs_valid = np.asarray(pt.obs_valid)

    # 1. keyframe features reference live points
    for k in range(K):
        if not active_kf[k]:
            continue
        pids = feat_point[k][feat_valid[k]]
        pids = pids[pids >= 0]
        if (pids >= P).any():
            errors.append(f"kf{k}: feature point id out of range")
            continue
        dead = ptype[pids] == TYPE_DELETED
        if dead.any():
            errors.append(
                f"kf{k}: {int(dead.sum())} features reference deleted points")

    # 2. point observations reference active keyframes and matching
    #    feature back-references (Point::findFrameRef semantics)
    for flat in np.argwhere(obs_valid):
        p, o = flat
        if ptype[p] == TYPE_DELETED:
            errors.append(f"pt{p}: deleted point has live observation")
            break
    live_obs = obs_valid & (ptype != TYPE_DELETED)[:, None]
    bad_kf = live_obs & ((obs_kf < 0) | (obs_kf >= K))
    if bad_kf.any():
        errors.append(f"{int(bad_kf.sum())} observations with invalid kf")
    ok = live_obs & ~bad_kf
    kf_idx = np.clip(obs_kf, 0, K - 1)
    inactive = ok & ~active_kf[kf_idx]
    if inactive.any():
        errors.append(
            f"{int(inactive.sum())} observations on inactive keyframes")
    ft_idx = np.clip(obs_feat, 0, F - 1)
    back = feat_point[kf_idx, ft_idx]
    pid = np.arange(P)[:, None]
    mismatch = ok & ~inactive & (back != pid)
    if mismatch.any():
        errors.append(
            f"{int(mismatch.sum())} observations whose keyframe feature "
            "does not point back")

    # 3. seeds reference active keyframes
    seed_act = np.asarray(m.seed.active)
    seed_kf = np.asarray(m.seed.kf_slot)
    bad_seed = seed_act & ((seed_kf < 0) | (seed_kf >= K))
    if bad_seed.any():
        errors.append(f"{int(bad_seed.sum())} seeds with invalid kf slot")
    alive = seed_act & ~bad_seed
    dead_kf = alive & ~active_kf[np.clip(seed_kf, 0, K - 1)]
    if dead_kf.any():
        errors.append(f"{int(dead_kf.sum())} seeds on inactive keyframes")
    return errors


def map_statistics(m: MapState) -> Dict[str, int]:
    """mapStatistics equivalent: keyframe / point / observation counts."""
    pt = m.pt
    ptype = np.asarray(pt.ptype)
    obs_valid = np.asarray(pt.obs_valid)
    live = ptype != TYPE_DELETED
    return {
        "n_keyframes": int(np.asarray(m.kf.active).sum()),
        "n_points": int(live.sum()),
        "n_candidates": int((ptype == TYPE_CANDIDATE).sum()),
        "n_observations": int((obs_valid & live[:, None]).sum()),
        "n_seeds": int(np.asarray(m.seed.active).sum()),
        "avg_obs_per_point": float(
            (obs_valid & live[:, None]).sum() / max(live.sum(), 1)),
    }
