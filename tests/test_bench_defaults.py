"""Second-scene pin for the TPU bench configuration (VERDICT r4 item 4).

bench.py bakes epipolar tiers (short 8 / long 32), scan_rows=4 and
df_update_k=256 from n_steps measurements on the bench scene; segments
past the long tier bump the search level (coarser matching — the scan's
standing coverage rule, vs the reference's single 1000-eval cap,
svo/src/matcher.cpp:251-256).  This test guards those scene-tuned
defaults against silent generalization loss: a DIFFERENT hermetic scene
(closer surface => shorter depth range, different texture spectrum,
faster lateral motion => longer epipolar segments) is tracked under

- the EXACT bench configuration, and
- an untuned control (single-tier scan at the 128-step cap, full seed
  budget),

and the bench configuration must match the control's trajectory
accuracy.  Tier-sizing rule (documented here and in PARITY.md): the
short tier must cover the n_steps median of mature seeds (p50 ~2-5),
the long tier the p90 of long segments; anything past the long tier is
covered by the level bump, so mis-sizing degrades ACCURACY, never
correctness — which is exactly what this test pins.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.config import fast_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core import fused
from rpg_svo_tpu.utils.synthetic import SyntheticDataset, Texture


def _track(ds, cfg, imgs, first, n):
    img0, depth0, T0 = first
    fh = FrameHandler(ds.cam, cfg)
    fh.set_first_frame_with_depth(jnp.asarray(img0), T0.inverse(), depth0)
    state = fused.state_from_handler(fh)
    state, outs = fused.vo_scan(state, imgs, ds.cam, cfg, fh.ncx, fh.ncy,
                                fh.img_shape)
    gt = np.stack([np.asarray(ds.poses[i].t) for i in range(1, n)])
    errs = np.linalg.norm(np.asarray(outs.t_wc) - gt, axis=-1)
    return errs, np.asarray(outs.failed), np.asarray(outs.n_matches)


@pytest.mark.slow
def test_bench_epi_tiers_hold_on_second_scene():
    n = 25
    # different scene: 0.9 m height (bench: 1.5), coarser texture
    # spectrum, straight lateral sweep at 2x the bench scene's per-frame
    # baseline (longer epipolar segments stress the tier caps)
    tex = Texture.make(seed=7, n_waves=48, min_freq=10.0, max_freq=350.0,
                      flat_spectrum=True)
    ds = SyntheticDataset(n_frames=n, trajectory="line", speed=0.012,
                          height=0.9, tex=tex)
    imgs = jnp.stack([jnp.asarray(ds.frame(i)[0]) for i in range(1, n)])
    first = ds.frame(0)

    # the EXACT bench defaults (bench.py make_cfg, fast preset)
    bench_cfg = fast_preset(grid_size=25, epi_max_steps=32,
                            epi_short_steps=8, df_update_k=192,
                            epi_scan_rows=4, epi_long_k=128,
                            reproj_attempt_factor=1.5)
    # untuned control: single-tier scan at the full 128-step cap, full
    # seed budget, 8 scan rows (the config defaults)
    ctrl_cfg = fast_preset(grid_size=25, epi_max_steps=128,
                           epi_short_steps=0, df_update_k=512,
                           epi_scan_rows=8)

    errs_b, failed_b, nm_b = _track(ds, bench_cfg, imgs, first, n)
    errs_c, failed_c, nm_c = _track(ds, ctrl_cfg, imgs, first, n)

    assert not failed_b.any(), "bench config lost tracking on scene 2"
    assert not failed_c.any(), "control config lost tracking on scene 2"
    med_b, med_c = np.median(errs_b), np.median(errs_c)
    # accuracy parity: the tiered/trimmed bench configuration must not
    # silently degrade on a scene it was not tuned on
    assert med_b < max(1.25 * med_c, med_c + 2e-4), \
        f"bench config degraded: {med_b * 1000:.2f}mm vs control " \
        f"{med_c * 1000:.2f}mm"
    assert errs_b.max() < max(1.5 * errs_c.max(), errs_c.max() + 5e-4)
    # and the matcher kept feeding the map (not starved by the tier caps)
    assert nm_b[-5:].mean() > 0.8 * nm_c[-5:].mean()
