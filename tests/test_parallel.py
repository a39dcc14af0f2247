"""Sharded programs on the virtual 8-device CPU mesh: distributed BA must
match the single-device solver; sharded pose opt must match optimize_pose
behavior; sharded seed update must match the batched one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.parallel.sharded import (
    make_mesh, sharded_pose_optimize, sharded_seed_update,
)
from rpg_svo_tpu.parallel.ba import distributed_ba_solve
from rpg_svo_tpu.ba.schur import solve_ba
from rpg_svo_tpu.core.depth_filter import seed_variance_update

from test_ba import make_problem


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "sp")


def test_distributed_ba_matches_single_device():
    mesh = make_mesh(8, dp=1)   # 8-way point sharding
    prob, (R_gt, t_gt, p_gt) = make_problem(jax.random.PRNGKey(0),
                                            K=4, P=64, M=4)
    res_single = solve_ba(prob, n_iter=8, huber_width=0.01)
    R, t, p, chi2 = distributed_ba_solve(mesh, prob, n_iter=8,
                                         huber_width=0.01)
    # both must recover the ground truth (reduction order may differ)
    terr_d = np.linalg.norm(np.asarray(t - t_gt), axis=-1)
    assert terr_d[2:].max() < 2e-3, terr_d
    perr = np.linalg.norm(np.asarray(p - p_gt), axis=-1)
    assert np.median(perr) < 2e-3
    # and agree with each other closely
    np.testing.assert_allclose(np.asarray(t), np.asarray(res_single.t),
                               atol=5e-4)


def test_sharded_pose_optimize_converges():
    mesh = make_mesh(8, dp=2)   # sp = 4
    key = jax.random.PRNGKey(1)
    p_w = jax.random.uniform(key, (128, 3), minval=-1, maxval=1) \
        + jnp.array([0.0, 0.0, 3.0])
    T_gt = SE3.exp(jnp.array([0.2, -0.1, 0.05, 0.03, 0.02, -0.01]))
    f = T_gt.apply(p_w)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    T0 = SE3.identity()
    T = sharded_pose_optimize(mesh, T0, p_w, f,
                              jnp.zeros(128, jnp.int32),
                              jnp.ones(128, bool), n_iter=10)
    terr = float(jnp.linalg.norm(T.t - T_gt.t))
    assert terr < 1e-3, terr


def test_sharded_seed_update_matches_batched():
    mesh = make_mesh(8, dp=1)
    S = 8 * 16
    key = jax.random.PRNGKey(2)
    mu = jax.random.uniform(key, (S,), minval=0.3, maxval=0.8)
    sigma2 = jnp.full((S,), 0.05)
    a = jnp.full((S,), 10.0)
    b = jnp.full((S,), 10.0)
    z_range = jnp.full((S,), 2.0)
    x = mu + 0.01
    tau2 = jnp.full((S,), 1e-3)
    act = jnp.ones((S,), bool)
    m2, s2, a2, b2, nconv = sharded_seed_update(
        mesh, mu, sigma2, a, b, z_range, x, tau2, act)
    m2r, s2r, a2r, b2r = seed_variance_update(mu, sigma2, a, b, z_range,
                                              x, tau2)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m2r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r), atol=1e-6)


def test_multistream_step_shard_map():
    """4 DIVERGENT camera streams, one per device, via shard_map.

    Each stream carries a different state (the same bootstrap advanced a
    different number of frames) and receives a different image; every
    stream's output must equal its own single-stream vo_step — i.e. the
    batch dimension is truly independent, not just replicated."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    import numpy as np
    from rpg_svo_tpu.config import fast_preset
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.core import fused
    from rpg_svo_tpu.parallel.streams import (
        stack_states, index_state, multistream_step, vmapped_vo_step,
    )
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset

    B = 4
    devs = np.array(jax.devices()[:B])
    mesh = Mesh(devs, ("dp",))
    ds = SyntheticDataset(n_frames=24)
    cfg = fast_preset(grid_size=25)
    fh = FrameHandler(ds.cam, cfg)
    img0, depth0, T0 = ds.frame(0)
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
    # stream b = bootstrap advanced to frame 7+b; next image frame 8+b
    stream_states = []
    for i in range(1, 7 + B):
        fh.add_image(ds.frame(i)[0], timestamp=i / 50)
        if i >= 7:
            stream_states.append(fused.state_from_handler(fh))
    assert len(stream_states) == B
    states = stack_states(stream_states)
    imgs = jnp.stack([ds.frame(8 + b)[0] for b in range(B)])
    states2, out = multistream_step(mesh, states, imgs, ds.cam, cfg,
                                    fh.ncx, fh.ncy, fh.img_shape)
    assert out.t_wc.shape == (B, 3)
    assert not bool(out.failed.any())
    # every stream matches its own single-stream run
    outs1 = []
    for b in range(B):
        _, out1 = fused.vo_step(stream_states[b], ds.frame(8 + b)[0],
                                ds.cam, cfg, fh.ncx, fh.ncy, fh.img_shape)
        outs1.append(out1)
        assert np.allclose(np.asarray(out.t_wc[b]), np.asarray(out1.t_wc),
                           atol=1e-5), b
    # the streams really diverged (different poses per stream)
    spread = np.ptp(np.asarray(out.t_wc), axis=0).max()
    assert spread > 1e-4, spread
    # vmapped variant agrees per stream too
    _, outv = vmapped_vo_step(states, imgs, ds.cam, cfg,
                              fh.ncx, fh.ncy, fh.img_shape)
    for b in range(B):
        assert np.allclose(np.asarray(outv.t_wc[b]),
                           np.asarray(outs1[b].t_wc), atol=1e-4), b
    s_one = index_state(states2, 0)
    assert s_one.t.shape == (3,)


def test_vo_scan_mesh_multiframe_parity_and_collectives():
    """Multi-frame sharded vo_scan: (a) parity with the single-chip scan
    over several frames, (b) the compiled HLO actually contains ICI
    collectives (all-reduce/all-gather) from the sp-sharded mapping
    internals, (c) df_update_k % sp != 0 is rejected."""
    import numpy as np
    from rpg_svo_tpu.config import fast_preset
    from rpg_svo_tpu.core.pipeline import FrameHandler
    from rpg_svo_tpu.core import fused
    from rpg_svo_tpu.parallel.fused_mesh import vo_scan_mesh
    from rpg_svo_tpu.utils.synthetic import SyntheticDataset

    mesh = make_mesh(8, dp=2)   # sp = 4
    shape = (120, 160)
    ds = SyntheticDataset(n_frames=14, shape=shape, trajectory="circle",
                          radius=0.25, revolutions=0.05)
    cfg = fast_preset(grid_size=10, df_update_k=64, max_seeds=512,
                      max_points=2048, max_kfs_pool=8, max_fts=128,
                      quality_min_fts=20, epi_max_steps=32)
    fh = FrameHandler(ds.cam, cfg, img_shape=shape)
    img0, depth0, T0 = ds.frame(0)
    fh.set_first_frame_with_depth(img0, T0.inverse(), depth0)
    for i in range(1, 6):
        fh.add_image(ds.frame(i)[0], timestamp=i / 50)
    s0 = fused.state_from_handler(fh)
    imgs = jnp.stack([ds.frame(i)[0] for i in range(6, 12)])

    _, outs_ref = fused.vo_scan(s0, imgs, ds.cam, cfg, fh.ncx, fh.ncy,
                                fh.img_shape)
    _, outs_sp = vo_scan_mesh(mesh, s0, imgs, ds.cam, cfg, fh.ncx,
                              fh.ncy, fh.img_shape)
    d = float(jnp.max(jnp.abs(outs_sp.t_wc - outs_ref.t_wc)))
    assert d < 1e-4, f"sharded multi-frame scan diverged: {d}"

    # collective structure of the compiled sharded program
    cfg_sp = cfg.replace(shard_axis="sp")
    with jax.set_mesh(mesh):
        compiled = fused.vo_scan.lower(
            s0, imgs, ds.cam, cfg_sp, fh.ncx, fh.ncy,
            fh.img_shape).compile()
    hlo = compiled.as_text()
    n_ar = hlo.count("all-reduce")
    n_ag = hlo.count("all-gather")
    assert n_ar + n_ag > 0, \
        "sp-sharded vo_scan compiled without any collectives"

    # axis-divisibility contract is enforced
    with pytest.raises(ValueError):
        vo_scan_mesh(mesh, s0, imgs, ds.cam,
                     cfg.replace(df_update_k=66), fh.ncx, fh.ncy,
                     fh.img_shape)
