"""Probabilistic depth filter: Bayesian inverse-depth seeds, fully batched.

TPU-native equivalent of DepthFilter + Seed (svo/src/depth_filter.cpp).
The reference runs a mapping THREAD that walks a linked list of seeds one
at a time (epipolar search -> tau -> Bayesian update).  Here the whole seed
pool updates in ONE batched device program per frame — the reference's
biggest unexploited parallelism (SURVEY §7.2 step 7).  The thread/queue
machinery (frame queue, condvar, halt flag) disappears: the pipeline calls
`update_seeds` synchronously with an async-dispatched device program.

Reproduced reference math:
- Seed init: a=10, b=10, mu=1/depth_mean, z_range=1/depth_min,
  sigma2=(z_range/6)^2 (depth_filter.cpp:37-46), batch-counter aging;
- seed aging: drop seeds older than max_n_kfs keyframes (:216-219);
- visibility gating, epipolar search in mu +/- sqrt(sigma2) (:236-242);
- failed match => b += 1 (:243-247);
- tau from the 1-px observation-angle geometry (computeTau, :334-350),
  converted to inverse depth;
- Vogiatzis/Hernandez moment-matching posterior update (updateSeed,
  :309-332);
- convergence when sqrt(sigma2) < z_range / thresh => new CANDIDATE point
  (:260-282); NaN guard prunes the seed (:283-287).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.geometry.linalg import onehot_gather_rows
from rpg_svo_tpu.ops.interp import FlatPyramid
from rpg_svo_tpu.ops.detector import detect_features
from rpg_svo_tpu.ops.matcher import (
    epipolar_geometry, epipolar_search, warp_affine_patches_tiles,
    warp_rotated_tiles,
)
from rpg_svo_tpu.ops.patches import extract_tiles, empty_tiles
from rpg_svo_tpu.core.map import (
    MapState, SeedStore, TYPE_CANDIDATE, free_slots, alloc_scatter,
    alloc_points, mask_compact,
)

INIT_A = 10.0
INIT_B = 10.0


class SeedUpdateStats(NamedTuple):
    n_updated: jnp.ndarray
    n_failed: jnp.ndarray
    n_converged: jnp.ndarray
    n_seeds: jnp.ndarray


def seed_variance_update(mu, sigma2, a, b, z_range, x, tau2):
    """Vogiatzis-Hernandez Bayesian update (depth_filter.cpp:309-332).
    All args (S,); returns (mu', sigma2', a', b')."""
    norm_scale2 = sigma2 + tau2
    norm_scale = jnp.sqrt(jnp.maximum(norm_scale2, 1e-20))
    s2 = 1.0 / (1.0 / jnp.maximum(sigma2, 1e-20) + 1.0 / jnp.maximum(tau2, 1e-20))
    m = s2 * (mu / jnp.maximum(sigma2, 1e-20) + x / jnp.maximum(tau2, 1e-20))
    pdf = jnp.exp(-0.5 * ((x - mu) / norm_scale) ** 2) \
        / (norm_scale * jnp.sqrt(2.0 * jnp.pi))
    C1 = a / (a + b) * pdf
    C2 = b / (a + b) / jnp.maximum(z_range, 1e-20)
    norm = jnp.maximum(C1 + C2, 1e-20)
    C1 = C1 / norm
    C2 = C2 / norm
    f = C1 * (a + 1.0) / (a + b + 1.0) + C2 * a / (a + b + 1.0)
    e = C1 * (a + 1.0) * (a + 2.0) / ((a + b + 1.0) * (a + b + 2.0)) \
        + C2 * a * (a + 1.0) / ((a + b + 1.0) * (a + b + 2.0))
    mu_new = C1 * m + C2 * mu
    sigma2_new = C1 * (s2 + m * m) + C2 * (sigma2 + mu * mu) \
        - mu_new * mu_new
    a_new = (e - f) / jnp.where(jnp.abs(f - e / jnp.maximum(f, 1e-20)) < 1e-20,
                                1e-20, f - e / jnp.maximum(f, 1e-20))
    b_new = a_new * (1.0 - f) / jnp.maximum(f, 1e-20)
    # guard: keep old values if anything went non-finite
    ok = jnp.isfinite(mu_new) & jnp.isfinite(sigma2_new) \
        & jnp.isfinite(a_new) & jnp.isfinite(b_new)
    return (jnp.where(ok, mu_new, mu), jnp.where(ok, sigma2_new, sigma2),
            jnp.where(ok, a_new, a), jnp.where(ok, b_new, b))


def compute_tau(T_ref_cur_t: jnp.ndarray, f: jnp.ndarray, z: jnp.ndarray,
                px_error_angle: jnp.ndarray) -> jnp.ndarray:
    """Measurement std in depth from 1px angular error (computeTau)."""
    t = T_ref_cur_t                                     # (S, 3)
    a = f * z[:, None] - t
    t_norm = jnp.linalg.norm(t, axis=-1)
    a_norm = jnp.linalg.norm(a, axis=-1)
    alpha = jnp.arccos(jnp.clip(
        jnp.sum(f * t, -1) / jnp.maximum(t_norm, 1e-12), -1.0, 1.0))
    beta = jnp.arccos(jnp.clip(
        jnp.sum(a * (-t), -1) / jnp.maximum(t_norm * a_norm, 1e-12),
        -1.0, 1.0))
    beta_plus = beta + px_error_angle
    gamma_plus = jnp.pi - alpha - beta_plus
    sin_g = jnp.sin(gamma_plus)
    z_plus = t_norm * jnp.sin(beta_plus) / jnp.where(
        jnp.abs(sin_g) < 1e-12, 1e-12, sin_g)
    return z_plus - z


@functools.partial(jax.jit, static_argnames=("cell_size", "min_score",
                                             "n_levels", "det_levels",
                                             "max_per_kf"))
def init_seeds(m: MapState, kf_slot: jnp.ndarray,
               pyramid: Tuple[jnp.ndarray, ...],
               cam, occupied: jnp.ndarray,
               depth_mean: jnp.ndarray, depth_min: jnp.ndarray,
               cell_size: int, min_score: float = 20.0,
               n_levels: int = 5, det_levels: int = 3,
               max_per_kf: int = 0) -> MapState:
    """DepthFilter::initializeSeeds: FAST-detect on the new keyframe,
    avoiding occupied cells, one seed per new corner.

    Detection runs on the first `det_levels` levels (ref n_pyr_levels=3).
    Increments the keyframe batch counter (Seed::batch_counter)."""
    det = detect_features(pyramid[:det_levels], occupied, cell_size)
    if max_per_kf and max_per_kf < det["valid"].shape[0]:
        # compact to the per-KF seed budget BEFORE tile extraction (see
        # Config.max_seeds_per_kf: allocation-scatter rows, not corners)
        good = det["valid"] & (det["score"] > min_score)
        sel, ok = mask_compact(good, max_per_kf)
        det = {"px": det["px"][sel], "score": det["score"][sel],
               "level": det["level"][sel], "valid": ok}
    tile, tile_xy0 = extract_tiles(FlatPyramid(pyramid), det["px"],
                                   det["level"])
    det = dict(det, tile=tile, tile_xy0=tile_xy0)
    return init_seeds_from_detection(m, kf_slot, det, cam, depth_mean,
                                     depth_min, min_score=min_score)


def has_update_work(m: MapState, T_cur_w: SE3, cam,
                    max_n_kfs: int = 3) -> jnp.ndarray:
    """True when a seed update would change ANYTHING: some active seed is
    visible and young enough to match (eligible), or some active seed has
    aged out and needs pruning.  The fused step gates the whole
    depth-filter update cond on this — the K-compacted epipolar scan has
    static shapes and costs the same with zero eligible seeds, and the
    map spends long stretches with every seed converged (measured: the
    update was ~0.5 ms/frame of pure no-op scan on the bench scene)."""
    seed = m.seed
    too_old = (m.kf_counter - seed.batch_id) > max_n_kfs
    active = seed.active & ~too_old
    kf_idx = jnp.clip(seed.kf_slot, 0, m.kf.R.shape[0] - 1)
    # one-hot matmul, not a scattered gather (see onehot_gather_rows)
    T_kf_w = SE3(onehot_gather_rows(m.kf.R, kf_idx),
                 onehot_gather_rows(m.kf.t, kf_idx))
    T_cur_ref = T_cur_w * T_kf_w.inverse()
    mu_safe = jnp.maximum(seed.mu, 1e-8)
    p_cur = T_cur_ref.apply(seed.f / mu_safe[:, None])
    visible = (p_cur[..., 2] > 0.0) \
        & cam.is_in_frame(cam.world2cam(p_cur))
    return jnp.any(active & visible) | jnp.any(seed.active & too_old)


def init_seeds_from_detection(m: MapState, kf_slot: jnp.ndarray, det,
                              cam, depth_mean: jnp.ndarray,
                              depth_min: jnp.ndarray,
                              min_score: float = 20.0,
                              enable: jnp.ndarray | bool = True
                              ) -> MapState:
    """Seed allocation from precomputed detections.  ``enable`` may be a
    traced bool: when False the call is an exact no-op, so the fused step
    can run detection under a (small-output) lax.cond and allocate with
    masked scatters — keeping the big pools out of conditional dataflow."""
    good = det["valid"] & (det["score"] > min_score) & enable
    n = good.shape[0]
    kf_counter = m.kf_counter + jnp.where(enable, 1, 0).astype(jnp.int32)
    if "tile" in det:
        det_tile, det_tile_xy0 = det["tile"], det["tile_xy0"]
    else:
        det_tile, det_tile_xy0 = empty_tiles(n)

    seed = m.seed
    slots = free_slots(seed.active[:-1], n)   # last row = write scratch
    slots = jnp.where(good, slots, -1)
    f = cam.cam2world(det["px"])
    z_range = 1.0 / jnp.maximum(depth_min, 1e-6)
    seed = seed._replace(
        active=alloc_scatter(seed.active, slots, jnp.ones((n,), bool)),
        kf_slot=alloc_scatter(seed.kf_slot, slots,
                              jnp.full((n,), kf_slot, jnp.int32)),
        batch_id=alloc_scatter(seed.batch_id, slots,
                               jnp.full((n,), kf_counter, jnp.int32)),
        px=alloc_scatter(seed.px, slots, det["px"]),
        f=alloc_scatter(seed.f, slots, f),
        level=alloc_scatter(seed.level, slots, det["level"]),
        a=alloc_scatter(seed.a, slots, jnp.full((n,), INIT_A)),
        b=alloc_scatter(seed.b, slots, jnp.full((n,), INIT_B)),
        mu=alloc_scatter(seed.mu, slots,
                         jnp.full((n,), 1.0 / jnp.maximum(depth_mean, 1e-6))),
        z_range=alloc_scatter(seed.z_range, slots, jnp.full((n,), z_range)),
        sigma2=alloc_scatter(seed.sigma2, slots,
                             jnp.full((n,), (z_range * z_range) / 36.0)),
        ftype=alloc_scatter(seed.ftype, slots,
                            jnp.zeros((n,), jnp.int32)),
        grad=alloc_scatter(seed.grad, slots,
                           jnp.tile(jnp.array([1.0, 0.0], jnp.float32),
                                    (n, 1))),
        tile=alloc_scatter(seed.tile, slots, det_tile),
        tile_xy0=alloc_scatter(seed.tile_xy0, slots, det_tile_xy0),
        upd_count=alloc_scatter(seed.upd_count, slots,
                                jnp.zeros((n,), jnp.int32)),
    )
    # scratch row stays inactive regardless of what landed there
    seed = seed._replace(active=seed.active.at[
        seed.active.shape[0] - 1].set(False))
    return m._replace(seed=seed, kf_counter=kf_counter)


class SeedFieldUpdate(NamedTuple):
    """S-sized field deltas from one seed update — everything the update
    changes, WITHOUT the pool scatters.  Keeping pool-sized buffers (the
    point store, the seed tiles) out of this pytree lets the fused step
    run the update under a lax.cond with only tiny outputs and apply the
    allocation with masked scatters outside (a cond's outputs are fresh
    buffers: carrying the pools through it copied ~25 MB per frame)."""
    active: jnp.ndarray     # (S,)
    mu: jnp.ndarray         # (S,)
    sigma2: jnp.ndarray     # (S,)
    a: jnp.ndarray          # (S,)
    b: jnp.ndarray          # (S,)
    converged: jnp.ndarray  # (S,) -> allocate a CANDIDATE point
    p_w: jnp.ndarray        # (S, 3) world position for converged seeds
    upd_count: jnp.ndarray  # (S,) int32 service counter (fairness LRU)
    stats: "SeedUpdateStats"


def identity_seed_update(seed: SeedStore) -> SeedFieldUpdate:
    """The no-op update (lax.cond false branch)."""
    S = seed.active.shape[0]
    z = jnp.int32(0)
    return SeedFieldUpdate(
        seed.active, seed.mu, seed.sigma2, seed.a, seed.b,
        jnp.zeros((S,), bool), jnp.zeros((S, 3), jnp.float32),
        seed.upd_count,
        SeedUpdateStats(z, z, z, jnp.sum(seed.active).astype(jnp.int32)))


ALLOC_K = 256   # max candidate points allocated per frame


def apply_seed_update(m: MapState, upd: SeedFieldUpdate) -> MapState:
    """Write back seed fields and allocate points for converged seeds.

    Converged seeds are COMPACTED to at most ALLOC_K before allocation so
    the point-pool scatters (incl. the (TILE_R, TILE_R) tiles) touch
    ALLOC_K rows instead of the whole seed pool every frame.  Seeds
    converged beyond the cap stay alive and convert on a later frame.
    """
    seed = m.seed
    S = upd.converged.shape[0]

    # candidate allocation under a cond: the ~14 point-pool scatters and
    # the ALLOC_K seed-row gathers cost ~0.17 ms/frame run masked every
    # frame, while the cond-boundary copy of the point store is
    # bandwidth-priced (~50 µs) and the no-conversion branch is the
    # common steady-state case.
    def do_alloc(_):
        order, conv_c = mask_compact(upd.converged, ALLOC_K)
        pt, _ = alloc_points(
            m.pt, upd.p_w[order], TYPE_CANDIDATE, seed.kf_slot[order],
            seed.px[order], seed.f[order], seed.level[order], conv_c,
            orig_type=seed.ftype[order], orig_grad=seed.grad[order],
            orig_tile=seed.tile[order],
            orig_tile_xy0=seed.tile_xy0[order])
        tgt = jnp.where(conv_c, order, S)   # invalid rows -> dropped
        alloc = jnp.zeros((S + 128,), bool).at[tgt].set(conv_c)[:S]
        return pt, alloc

    pt, allocated = jax.lax.cond(
        jnp.any(upd.converged), do_alloc,
        lambda _: (m.pt, jnp.zeros((S,), bool)), None)
    active = upd.active | (upd.converged & ~allocated)
    seed = seed._replace(active=active, mu=upd.mu,
                         sigma2=upd.sigma2, a=upd.a, b=upd.b,
                         upd_count=upd.upd_count)
    return m._replace(seed=seed, pt=pt)


@functools.partial(jax.jit, static_argnames=("max_n_kfs", "conv_thresh",
                                             "max_steps", "update_k",
                                             "short_steps", "long_k",
                                             "max_level", "scan_rows"))
def update_seeds(m: MapState, cur_pyr: FlatPyramid, T_cur_w: SE3, cam,
                 max_n_kfs: int = 3, conv_thresh: float = 200.0,
                 max_steps: int = 256, update_k: int = 0,
                 cur_pad=None, short_steps: int = 0,
                 long_k: int = 0,
                 max_level: int = 2,
                 scan_rows: int = 8) -> Tuple[MapState, SeedUpdateStats]:
    """One batched update of ALL active seeds against the current frame
    (field computation + write-back/allocation in one call)."""
    upd = update_seeds_fields(
        m, cur_pyr, T_cur_w, cam, max_n_kfs=max_n_kfs,
        conv_thresh=conv_thresh, max_steps=max_steps, update_k=update_k,
        scan_rows=scan_rows,
        cur_pad=cur_pad, short_steps=short_steps, long_k=long_k,
        max_level=max_level)
    return apply_seed_update(m, upd), upd.stats


def update_seeds_fields(m: MapState, cur_pyr: FlatPyramid, T_cur_w: SE3,
                        cam, max_n_kfs: int = 3,
                        conv_thresh: float = 200.0,
                        max_steps: int = 256, update_k: int = 0,
                        cur_pad=None,
                        enable: jnp.ndarray | bool = True,
                        short_steps: int = 0, long_k: int = 0,
                        max_level: int = 2,
                        shard_axis: str = "",
                        scan_rows: int = 8) -> SeedFieldUpdate:
    """One batched update of ALL active seeds against the current frame.

    `update_k > 0` compacts the eligible seeds to at most that many before
    the epipolar search (gather -> match -> scatter), so the scan cost
    scales with LIVE seeds instead of the pool capacity.  Eligible seeds
    beyond the cap are skipped this frame (no Bayesian update, no outlier
    evidence) — the reference's mapping thread similarly only processes
    what fits in its time budget before the next frame preempts it
    (depth_filter.cpp:197-213).
    """
    seed = m.seed
    S = seed.active.shape[0]

    # --- aging (depth_filter.cpp:216-219)
    too_old = (m.kf_counter - seed.batch_id) > max_n_kfs
    active = seed.active & ~too_old

    # --- per-seed relative pose: T_cur_ref = T_cur_w * T_w_kf
    kf_idx = jnp.clip(seed.kf_slot, 0, m.kf.R.shape[0] - 1)
    # one-hot matmul, not a scattered gather (see onehot_gather_rows)
    T_kf_w = SE3(onehot_gather_rows(m.kf.R, kf_idx),
                 onehot_gather_rows(m.kf.t, kf_idx))          # batched (S,)
    T_cur_ref = T_cur_w * T_kf_w.inverse()
    T_ref_cur = T_cur_ref.inverse()

    # --- visibility (depth_filter.cpp:222-231)
    mu_safe = jnp.maximum(seed.mu, 1e-8)
    p_cur = T_cur_ref.apply(seed.f / mu_safe[:, None])
    px_cur = cam.world2cam(p_cur)
    visible = (p_cur[..., 2] > 0.0) & cam.is_in_frame(px_cur)
    # `enable` gates the whole update (a traced bool): used by the fused
    # step to skip non-due frames with a MASK rather than a lax.cond —
    # an exact no-op on the seed state when False
    eligible = active & visible & enable

    # --- epipolar search range in inverse depth (:236-238)
    sig = jnp.sqrt(jnp.maximum(seed.sigma2, 0.0))
    z_inv_min = seed.mu + sig                   # near (large inv depth)
    z_inv_max = jnp.maximum(seed.mu - sig, 1e-8)
    d_min = 1.0 / jnp.maximum(z_inv_min, 1e-8)
    d_max = 1.0 / z_inv_max

    def _tile_match(px, f, level, tile, tile_xy0, ftype, grad, T_cr,
                    d_est, dmin, dmax, elig):
        """Epipolar match with ref patches from the seeds' creation-time
        tiles — no keyframe-pyramid reads (see ops/patches.py)."""
        geom = epipolar_geometry(cam, T_cr, px, f, level, d_est, dmin,
                                 dmax, max_steps=max_steps,
                                 max_level=max_level)
        ref_b, okb = warp_affine_patches_tiles(
            geom.A, tile, tile_xy0, px, level, geom.search_level)
        ref_r, okr = warp_rotated_tiles(
            geom.A, tile, tile_xy0, px, level, geom.search_level,
            geom.dir_lvl)
        return epipolar_search(
            cur_pyr, cam, geom, T_cr, f, ref_b, ref_r, okb & okr, elig,
            max_steps=max_steps, ftr_type=ftype, ftr_grad=grad,
            cur_pad=cur_pad, short_steps=short_steps, long_k=long_k,
            scan_rows=scan_rows)

    def _gated_match(px, f, level, tile, tile_xy0, ftype, grad, T_cr,
                     d_est, dmin, dmax, elig):
        """Run _tile_match under a lax.cond on `enable` (small outputs:
        per-item match fields) so skip frames pay nothing for the
        epipolar scan — the expensive gathers live inside the branch."""
        if isinstance(enable, bool):
            if enable:
                mm = _tile_match(px, f, level, tile, tile_xy0, ftype,
                                 grad, T_cr, d_est, dmin, dmax, elig)
                return mm.px_cur, mm.depth_ref, mm.success, mm.scanned
            k = px.shape[0]
            return (jnp.zeros((k, 2), jnp.float32),
                    jnp.ones((k,), jnp.float32), jnp.zeros((k,), bool),
                    jnp.zeros((k,), bool))

        def yes(_):
            mm = _tile_match(px, f, level, tile, tile_xy0, ftype, grad,
                             T_cr, d_est, dmin, dmax, elig)
            return mm.px_cur, mm.depth_ref, mm.success, mm.scanned

        def no(_):
            k = px.shape[0]
            return (jnp.zeros((k, 2), jnp.float32),
                    jnp.ones((k,), jnp.float32), jnp.zeros((k,), bool),
                    jnp.zeros((k,), bool))

        return jax.lax.cond(enable, yes, no, None)

    px_error_angle = jnp.arctan(1.0 / (2.0 * cam.fx)) * 2.0

    if update_k and update_k < S:
        # compact: eligible seeds first (order-preserving O(S) cumsum
        # compaction — an argsort here pays a full sort network).  The
        # whole match + tau + Bayesian update then runs in the compacted
        # K-domain and scatters back ONCE — nothing per-frame iterates
        # over the full pool except the cheap eligibility masks.
        K = update_k
        # fairness under seed-dense load: mask_compact alone keeps the
        # FIRST K eligible seeds, so with eligible >> K the rest starve
        # until they age out (and sliding-window rotation chases moving
        # ranks as seeds converge).  Starvation-free priority instead:
        # each seed carries a service counter (upd_count, +1 whenever it
        # is selected); least-served seeds go first, so a seed at the
        # minimum count cannot be preempted and is served within
        # ceil(#min/K) updates of becoming minimal.  Remaining budget
        # fills with the other eligible seeds in index order.  Two O(S)
        # cumsum compactions, no sort.  With eligible <= K every
        # eligible seed is selected — identical to plain compaction.
        ev = seed.upd_count
        ev_min = jnp.min(jnp.where(eligible, ev, jnp.iinfo(jnp.int32).max))
        prio = eligible & (ev == ev_min)
        sel1, v1 = mask_compact(prio, K)
        sel2, v2 = mask_compact(eligible & ~prio, K)
        n1 = jnp.sum(v1).astype(jnp.int32)
        j = jnp.arange(K, dtype=jnp.int32)
        fill = sel2[jnp.clip(j - n1, 0, K - 1)]
        sel = jnp.where(v1, sel1, fill)
        elig_c = v1 | ((j - n1 >= 0) & (j - n1 < jnp.sum(v2)))
        sel = jnp.where(elig_c, sel, 0)
        if shard_axis:
            # mesh mode: the whole K-domain match + update below is
            # sharded over the seed-parallel axis; XLA partitions the
            # strip gathers (each shard reads the replicated pyramid)
            # and all-gathers the K-sized outputs for the scatter-back
            from rpg_svo_tpu.parallel.gspmd import shard_dim0
            sel = shard_dim0(sel, shard_axis)
            elig_c = shard_dim0(elig_c, shard_axis)
        gather = lambda a: a[sel]
        T_cr_k = jax.tree.map(gather, T_cur_ref)
        f_k = seed.f[sel]
        mu_k0 = seed.mu[sel]
        sigma2_k0 = seed.sigma2[sel]
        a_k0 = seed.a[sel]
        b_k0 = seed.b[sel]
        zr_k = seed.z_range[sel]
        _, depth_c, succ_c, scanned_c = _gated_match(
            seed.px[sel], f_k, seed.level[sel], seed.tile[sel],
            seed.tile_xy0[sel], seed.ftype[sel], seed.grad[sel],
            T_cr_k, gather(1.0 / mu_safe), gather(d_min), gather(d_max),
            elig_c)
        matched_k = succ_c & elig_c
        # deferred (two-tier long budget) seeds get no outlier evidence
        failed_k = elig_c & ~succ_c & scanned_c

        # failed match: outlier evidence b += 1 (:243-247)
        b_base = jnp.where(failed_k, b_k0 + 1.0, b_k0)
        # tau and Bayesian update (:249-255, :334-350)
        z_k = jnp.maximum(depth_c, 1e-8)
        tau_k = compute_tau(jax.tree.map(gather, T_ref_cur).t, f_k, z_k,
                            px_error_angle)
        tau_inv_k = 0.5 * (1.0 / jnp.maximum(1e-7, z_k - tau_k)
                           - 1.0 / (z_k + tau_k))
        mu2, sigma22, a2, b2 = seed_variance_update(
            mu_k0, sigma2_k0, a_k0, b_base, zr_k, 1.0 / z_k,
            tau_inv_k * tau_inv_k)
        mu_k = jnp.where(matched_k, mu2, mu_k0)
        sigma2_k = jnp.where(matched_k, sigma22, sigma2_k0)
        a_k = jnp.where(matched_k, a2, a_k0)
        b_k = jnp.where(matched_k, b2, b_base)
        conv_k = matched_k & (jnp.sqrt(jnp.maximum(sigma2_k, 0.0))
                              < zr_k / conv_thresh)
        T_w_kf_k = jax.tree.map(gather, T_kf_w).inverse()
        p_w_k = T_w_kf_k.apply(f_k / jnp.maximum(mu_k, 1e-8)[:, None])
        nan_k = ~jnp.isfinite(gather(z_inv_min)) | ~jnp.isfinite(mu_k)

        # one guarded scatter pass back to the pool (invalid compaction
        # rows point at slot 0; route them to a dropped overflow slot,
        # so their written values never land)
        tgt = jnp.where(elig_c, sel, S)
        # overflow region padded to 128 rows, not 1: odd-length (S+1,)
        # 1-D scatters are in the TPU layout-miscompile class that faults
        # the worker at execution (see CLAUDE.md)
        scat = lambda base, val: jnp.concatenate(
            [base, jnp.broadcast_to(base[:1], (128,) + base.shape[1:])]
        ).at[tgt].set(val)[:S]
        mu_out = scat(seed.mu, mu_k)
        sigma2_out = scat(seed.sigma2, sigma2_k)
        a_out = scat(seed.a, a_k)
        b_out = scat(seed.b, b_k)
        cnt_out = scat(seed.upd_count, seed.upd_count[sel] + 1)
        converged = jnp.zeros((S + 128,), bool).at[tgt].set(conv_k)[:S]
        p_w = jnp.zeros((S + 128, 3), jnp.float32).at[tgt].set(p_w_k)[:S]
        dead = jnp.zeros((S + 128,), bool).at[tgt].set(
            (conv_k | nan_k) & elig_c)[:S]
        active_out = jnp.where(enable, active & ~dead, seed.active)

        stats = SeedUpdateStats(
            n_updated=jnp.sum(matched_k).astype(jnp.int32),
            n_failed=jnp.sum(failed_k).astype(jnp.int32),
            n_converged=jnp.sum(conv_k).astype(jnp.int32),
            n_seeds=jnp.sum(active_out).astype(jnp.int32),
        )
        return SeedFieldUpdate(active_out, mu_out, sigma2_out, a_out,
                               b_out, converged, p_w, cnt_out, stats)

    _, depth_ref, succ, scanned = _gated_match(
        seed.px, seed.f, seed.level, seed.tile, seed.tile_xy0,
        seed.ftype, seed.grad, T_cur_ref, 1.0 / mu_safe, d_min, d_max,
        eligible)
    matched = eligible & succ
    failed_search = eligible & ~succ & scanned

    # --- failed match: outlier evidence b += 1 (:243-247)
    b_new = jnp.where(failed_search, seed.b + 1.0, seed.b)

    # --- tau and Bayesian update (:249-255)
    z = jnp.maximum(depth_ref, 1e-8)
    tau = compute_tau(T_ref_cur.t, seed.f, z, px_error_angle)
    tau_inv = 0.5 * (1.0 / jnp.maximum(1e-7, z - tau) - 1.0 / (z + tau))
    mu2, sigma22, a2, b2 = seed_variance_update(
        seed.mu, seed.sigma2, seed.a, b_new, seed.z_range,
        1.0 / z, tau_inv * tau_inv)
    mu_out = jnp.where(matched, mu2, seed.mu)
    sigma2_out = jnp.where(matched, sigma22, seed.sigma2)
    a_out = jnp.where(matched, a2, seed.a)
    b_out = jnp.where(matched, b2, b_new)

    # --- convergence => new CANDIDATE points (:260-282)
    converged = matched & (jnp.sqrt(jnp.maximum(sigma2_out, 0.0))
                           < seed.z_range / conv_thresh)
    T_w_kf = T_kf_w.inverse()
    p_w = T_w_kf.apply(seed.f / jnp.maximum(mu_out, 1e-8)[:, None])

    # --- prune: converged, NaN, aged-out (no-op on skipped frames)
    nan_seed = ~jnp.isfinite(z_inv_min) | ~jnp.isfinite(mu_out)
    active_out = jnp.where(enable, active & ~converged & ~nan_seed,
                           seed.active)

    stats = SeedUpdateStats(
        n_updated=jnp.sum(matched).astype(jnp.int32),
        n_failed=jnp.sum(failed_search).astype(jnp.int32),
        n_converged=jnp.sum(converged).astype(jnp.int32),
        n_seeds=jnp.sum(active_out).astype(jnp.int32),
    )
    cnt_out = seed.upd_count + eligible.astype(jnp.int32)
    return SeedFieldUpdate(active_out, mu_out, sigma2_out, a_out, b_out,
                           converged, p_w, cnt_out, stats)
