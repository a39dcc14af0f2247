"""Per-iteration chi2 gains of the REAL local-BA solves on the bench-like
scene (CPU): captures MapStates at each run_local_ba call, rebuilds the
problem with build_local_ba_problem, replays GN iterations one by one.

This is the instrument behind solve_ba's chi2-plateau early exit
(ba/schur.py::run_phase): measured r5, phase gains drop below 1e-4
relative by iteration 3-5 of each phase — the 10-iteration reference
budget spends ~40% of its device time past the plateau."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import rpg_svo_tpu.core.local_ba as lba
from rpg_svo_tpu.ba.schur import (variable_compaction, obs_cam_onehot,
                                  var_onehot, _chi2, _gn_step, _apply_cams)
from rpg_svo_tpu.geometry.cameras import project2d

calls = []
real = lba.run_local_ba
def cap(m, slot, hw, thr, fx, **kw):
    calls.append((jax.tree.map(np.asarray, m), int(slot), float(hw),
                  float(thr), float(fx), dict(kw)))
    return real(m, slot, hw, thr, fx, **kw)
lba.run_local_ba = cap
import rpg_svo_tpu.core.pipeline as pl
pl.run_local_ba = cap  # in case it was imported by name

from rpg_svo_tpu.utils.synthetic import SyntheticDataset
from rpg_svo_tpu.config import accurate_preset
from rpg_svo_tpu.core.pipeline import FrameHandler

N = 41
ds = SyntheticDataset(n_frames=N, trajectory="circle", radius=0.25,
                      revolutions=0.5)
cfg = accurate_preset(grid_size=20, max_points=4096, df_update_k=128,
                      epi_max_steps=32, epi_short_steps=8, epi_long_k=128,
                      epi_scan_rows=4, max_seeds=1024)
fh = FrameHandler(ds.cam, cfg)
img0, depth0, T0 = ds.frame(0)
fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
for i in range(1, N):
    fh.add_image(ds.frame(i)[0], timestamp=i / 50)
print(f"captured {len(calls)} local-BA solves")

for ci, (m, slot, hw_px, thr_px, fx, kw) in enumerate(calls):
    m = jax.tree.map(jnp.asarray, m)
    prob, sel, selok, variable = lba.build_local_ba_problem(
        m, jnp.int32(slot), kw.get("core_n_kfs", 5), 4096)
    hw = jnp.float32(hw_px / fx)
    thr = thr_px / fx
    n_iter = kw.get("n_iter", 10)
    K = prob.R.shape[0]
    n_var = min(K, kw.get("core_n_kfs", 5) + 1)
    vsel, vok, inv_map = variable_compaction(prob.cam_variable, n_var)
    E, _ = obs_cam_onehot(prob.obs_cam, K)
    Ev = var_onehot(prob.obs_cam, inv_map, n_var)
    R, t, p = prob.R, prob.t, prob.p_w
    best = _chi2(prob, R, t, p, hw, E)
    damping = jnp.float32(1e-4)
    pb = prob
    n1 = max(n_iter // 2, 1)
    rels = []
    for it in range(n_iter):
        if it == n1:
            pc = _apply_cams(R, t, E, p)
            res = project2d(pb.obs_f) - project2d(pc)
            keep = prob.obs_mask & (jnp.linalg.norm(res, axis=-1) < 3.0 * thr)
            pb = prob._replace(obs_mask=keep)
            best = _chi2(pb, R, t, p, hw, E)
        Rn, tn, pn, chi2 = _gn_step(pb, R, t, p, hw, damping, vsel, vok,
                                    inv_map, n_var, E=E, Ev=Ev)
        c_new = float(_chi2(pb, Rn, tn, pn, hw, E))
        b = float(best)
        if c_new < b and np.isfinite(c_new):
            rels.append((b - c_new) / max(b, 1e-30))
            R, t, p, best = Rn, tn, pn, jnp.float32(c_new)
            damping = damping * 0.5
        else:
            rels.append(0.0)
            damping = damping * 8.0
        damping = jnp.clip(damping, 1e-8, 1e2)
    print(f"solve {ci}: rel gains " + " ".join(f"{r:.1e}" for r in rels))
