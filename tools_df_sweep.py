"""Depth-filter protocol parameter sweep (step size, surface amp)."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.utils.synthetic import SurfaceDataset, SineSurface
from rpg_svo_tpu.core.map import init_map, add_keyframe, TYPE_CANDIDATE
from rpg_svo_tpu.core import depth_filter as df
from rpg_svo_tpu.ops.pyramid import build_pyramid
from rpg_svo_tpu.ops.interp import FlatPyramid
from rpg_svo_tpu.ops.detector import grid_dims


def run(step, amp, n_frames=20, conv_thresh=200.0, level0=False):
    surf = SineSurface(amp=amp) if amp else SineSurface(amp=0.0)
    ds = SurfaceDataset(n_frames=n_frames, step=step, surf=surf)
    img0, depth0, T0 = ds.frame(0)
    pyr0 = build_pyramid(img0, 5)
    fp0 = FlatPyramid(pyr0)
    m = init_map(n_kfs=8, n_feats=512, n_points=4096, n_obs=8,
                 n_seeds=2048, pyr_shape=(1, fp0.flat.shape[0]))
    F = m.kf.feat_px.shape[1]
    m, slot = add_keyframe(
        m, fp0.flat, T0.inverse(), jnp.int32(0),
        jnp.zeros((F, 2)), jnp.tile(jnp.array([0.0, 0.0, 1.0]), (F, 1)),
        jnp.zeros((F,), jnp.int32), jnp.full((F,), -1, jnp.int32),
        jnp.zeros((F,), bool), jnp.ones((F,)))
    ncx, ncy = grid_dims(ds.shape[1], ds.shape[0], 25)
    if level0:
        from rpg_svo_tpu.ops.detector import detect_features
        from rpg_svo_tpu.ops.patches import extract_tiles
        det = detect_features(pyr0, jnp.zeros((ncx * ncy,), bool), 25)
        det["valid"] = det["valid"] & (det["level"] == 0)
        tile, xy0 = extract_tiles(fp0, det["px"], det["level"])
        det = dict(det, tile=tile, tile_xy0=xy0)
        m = df.init_seeds_from_detection(m, slot, det, ds.cam,
                                         jnp.float32(2.0), jnp.float32(0.5))
    else:
        m = df.init_seeds(m, slot, pyr0, ds.cam,
                          jnp.zeros((ncx * ncy,), bool),
                          jnp.float32(2.0), jnp.float32(0.5), cell_size=25)
    n0 = int(m.seed.active.sum())
    for i in range(1, n_frames):
        img, _, T = ds.frame(i)
        fp = FlatPyramid(build_pyramid(img, 5))
        m, stats = df.update_seeds(m, fp, T.inverse(), ds.cam,
                                   conv_thresh=conv_thresh)
    conv = np.asarray(m.pt.ptype) == TYPE_CANDIDATE
    p_w = np.asarray(m.pt.pos)[conv]
    d_est = np.linalg.norm(np.asarray(T0.inverse().apply(jnp.asarray(p_w))),
                           axis=-1)
    px = np.asarray(m.pt.orig_px)[conv]
    d_gt = np.asarray(depth0)[px[:, 1].astype(int), px[:, 0].astype(int)]
    lvl = np.asarray(m.pt.orig_level)[conv]
    err = np.abs(d_est - d_gt) * 100
    for l in range(5):
        el = err[lvl == l]
        if len(el):
            print(f"  level {l}: n={len(el)} p50={np.median(el):.4f} cm")
    e = np.sort(err)
    n = len(e)
    if n == 0:
        print(f"step={step} amp={amp} ct={conv_thresh}: 0 converged of {n0}")
        return
    print(f"step={step} amp={amp} ct={conv_thresh}: {n}/{n0} conv  "
          f"mean {e.mean():.4f}  p50 {e[int(.5*n)]:.4f}  "
          f"p80 {e[int(.8*n)]:.4f}  p95 {e[min(int(.95*n), n-1)]:.4f} cm",
          flush=True)


if __name__ == "__main__":
    for args in sys.argv[1:]:
        parts = args.split(",")
        step, amp, ct = parts[:3]
        level0 = len(parts) > 3 and parts[3] == "l0"
        run(float(step), float(amp), conv_thresh=float(ct), level0=level0)
