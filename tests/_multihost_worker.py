"""Worker for tests/test_multihost.py: one of N processes in a
multi-process CPU (Gloo) run of the distributed BA solver.

argv: <coordinator> <num_processes> <process_id>
Prints "MULTIHOST_OK" on success; "MULTIHOST_UNSUPPORTED: <why>" if the
runtime cannot do multi-process CPU collectives in this build.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=2"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from rpg_svo_tpu.parallel import multihost
    try:
        multihost.init_multihost(coord, n_proc, pid)
    except Exception as e:  # noqa: BLE001
        print(f"MULTIHOST_UNSUPPORTED: init failed: {e}")
        return
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 2 * n_proc, len(jax.devices())

    mesh = multihost.global_mesh("dp", "sp")   # (n_proc, 2)

    # DCN smoke: a psum across every device of every host
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    ones = multihost.host_local_rows(
        mesh, np.ones((2 * 2,), np.float32), ("dp", "sp"))
    total = jax.jit(shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), ("dp", "sp")),
        mesh=mesh, in_specs=P(("dp", "sp")), out_specs=P(),
        check_vma=False))(ones)
    np.testing.assert_allclose(np.asarray(total), 2.0 * 2 * n_proc)

    # distributed BA across hosts: every process builds the SAME problem
    # deterministically, contributes its own point rows, and the reduced
    # camera system psums over (dp, sp) — dp legs cross the process
    # (DCN) boundary.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_ba import make_problem
    prob, (R_gt, t_gt, p_gt) = make_problem(jax.random.PRNGKey(0),
                                            K=4, P=64, M=4)
    n_shards = 2 * n_proc
    rows = 64 // n_shards
    lo = pid * 2 * rows            # this process owns 2 shards
    local = slice(lo, lo + 2 * rows)
    gprob = prob._replace(
        R=multihost.replicated(mesh, prob.R),
        t=multihost.replicated(mesh, prob.t),
        cam_variable=multihost.replicated(mesh, prob.cam_variable),
        p_w=multihost.host_local_rows(
            mesh, np.asarray(prob.p_w)[local], ("dp", "sp")),
        p_valid=multihost.host_local_rows(
            mesh, np.asarray(prob.p_valid)[local], ("dp", "sp")),
        obs_cam=multihost.host_local_rows(
            mesh, np.asarray(prob.obs_cam)[local], ("dp", "sp")),
        obs_f=multihost.host_local_rows(
            mesh, np.asarray(prob.obs_f)[local], ("dp", "sp")),
        obs_level=multihost.host_local_rows(
            mesh, np.asarray(prob.obs_level)[local], ("dp", "sp")),
        obs_mask=multihost.host_local_rows(
            mesh, np.asarray(prob.obs_mask)[local], ("dp", "sp")))
    R, t, p, chi2 = multihost.multihost_ba_solve(
        mesh, gprob, n_iter=8, huber_width=0.01)

    # parity vs the single-device solver run host-locally
    from rpg_svo_tpu.ba.schur import solve_ba
    with jax.default_device(jax.local_devices()[0]):
        res = solve_ba(prob, n_iter=8, huber_width=0.01)
    terr = np.linalg.norm(np.asarray(t) - np.asarray(t_gt), axis=-1)
    assert terr[2:].max() < 2e-3, terr
    np.testing.assert_allclose(np.asarray(t), np.asarray(res.t),
                               atol=5e-4)
    print("MULTIHOST_OK")


if __name__ == "__main__":
    main()
