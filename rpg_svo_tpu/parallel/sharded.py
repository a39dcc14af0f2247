"""Device-mesh sharded VO programs.

The reference is a single-process 2-thread CPU system (SURVEY §2.4); its
scaling axes are caps, not parallelism.  Here those axes become sharded
batch dimensions over a jax.sharding.Mesh:

- ``dp`` (data parallel): independent camera streams tracked in parallel
  (multi-camera rigs / multi-sequence serving);
- ``sp`` (seed/point parallel): the depth-filter seed pool and the
  feature sets of the optimizers sharded across devices, with 6x6 / Schur
  reductions over ICI collectives (psum).

These functions are written with shard_map over explicit axis names so the
same code runs on a virtual CPU mesh (tests, dryrun) and on real
multi-chip slices.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

import functools as _ft
# f32 MXU accumulation (see ba/schur.py precision note)
_ein = _ft.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.cameras import project2d
from rpg_svo_tpu.geometry.triangulation import jacobian_xyz2uv
from rpg_svo_tpu.ops.robust import tukey_weight


def make_mesh(n_devices: int | None = None,
              axis_names: Tuple[str, str] = ("dp", "sp"),
              dp: int | None = None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = 2 if n % 2 == 0 and n >= 4 else 1
    sp = n // dp
    import numpy as np
    arr = np.array(devs[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, axis_names)


def distributed_pose_gn_step(T: SE3, p_w: jnp.ndarray, f_meas: jnp.ndarray,
                             sqrt_inv_cov: jnp.ndarray, valid: jnp.ndarray,
                             scale: jnp.ndarray, axis: str = "sp"):
    """One Gauss-Newton step for the pose with FEATURES SHARDED over `axis`.

    Each shard accumulates its partial 6x6 normal equations; a psum over
    ICI assembles the global system; the tiny solve is replicated.  This is
    the building block of the distributed motion-only BA (and the
    camera-block update of the distributed Schur local BA).
    Call inside shard_map with p_w/f_meas/... sharded on `axis`.
    """
    p_cam = T.apply(p_w)
    e = (project2d(f_meas) - project2d(p_cam)) * sqrt_inv_cov[:, None]
    e = jnp.where(valid[:, None], e, 0.0)
    J = jacobian_xyz2uv(p_cam) * sqrt_inv_cov[:, None, None]
    w = tukey_weight(jnp.linalg.norm(e, axis=-1)
                     / jnp.maximum(scale, 1e-12))
    w = jnp.where(valid, w, 0.0)
    H_local = _ein("nij,nik,n->jk", J, J, w)
    b_local = -_ein("nij,ni,n->j", J, e, w)
    chi2_local = jnp.sum(jnp.sum(e * e, -1) * w)
    H = jax.lax.psum(H_local, axis)
    b = jax.lax.psum(b_local, axis)
    chi2 = jax.lax.psum(chi2_local, axis)
    dT = jnp.linalg.solve(H + 1e-12 * jnp.eye(6), b)
    return SE3.exp(dT) * T, chi2


def sharded_pose_optimize(mesh: Mesh, T_init: SE3, p_w, f_meas, level,
                          valid, n_iter: int = 10, axis: str = "sp"):
    """Full sharded pose optimization: features sharded over `axis`,
    replicated pose, psum-assembled normal equations."""
    sqrt_inv_cov = 1.0 / (2.0 ** level.astype(jnp.float32))

    def body(args):
        T, p, f, sic, v = args

        def step(i, Tc):
            Tn, _ = distributed_pose_gn_step(Tc, p, f, sic, v,
                                             jnp.float32(1.0), axis)
            return Tn
        return jax.lax.fori_loop(0, n_iter, step, T)

    fn = shard_map(
        lambda T, p, f, sic, v: body((T, p, f, sic, v)),
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(), check_vma=False,
    )
    return fn(T_init, p_w, f_meas, sqrt_inv_cov, valid)


def sharded_seed_update(mesh: Mesh, mu, sigma2, a, b, z_range, x, tau2,
                        active, axis: str = "sp"):
    """Depth-filter Bayesian update with the SEED POOL SHARDED over `axis`.

    Pure map over seeds + one psum for the convergence statistic —
    the multi-device depth filter's inner step.
    Returns (mu', sigma2', a', b', n_converged_total).
    """
    from rpg_svo_tpu.core.depth_filter import seed_variance_update

    def local(mu, sigma2, a, b, z_range, x, tau2, active):
        m2, s2, a2, b2 = seed_variance_update(mu, sigma2, a, b, z_range,
                                              x, tau2)
        m2 = jnp.where(active, m2, mu)
        s2 = jnp.where(active, s2, sigma2)
        a2 = jnp.where(active, a2, a)
        b2 = jnp.where(active, b2, b)
        conv = active & (jnp.sqrt(jnp.maximum(s2, 0.0)) < z_range / 200.0)
        n_conv = jax.lax.psum(jnp.sum(conv), axis)
        return m2, s2, a2, b2, n_conv

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 8,
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    return fn(mu, sigma2, a, b, z_range, x, tau2, active)


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated on every device of the mesh."""
    s = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_on(mesh: Mesh, tree, axis: str = "sp"):
    """Shard leading dim of every leaf over `axis`."""
    s = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.device_put(tree, s)
