"""Speed-of-light table generator (VERDICT r4 #6 — ROOFLINE.md).

Merges the measured per-stage device times (written by
tools_profile_step.py to /tmp/svo_fused_stages_{fast,accurate}.json)
with ANALYTIC floors for each stage's dominant primitive, so the
"kernels at speed-of-light" claim is auditable: every floor formula is
printed next to the measured number.

Floor constants (measured on this chip, CLAUDE.md):
- scattered gather/scatter: ~9 ns/element (GATHER_NS; flat-1-D indexed)
- strip-scan samples: ~7 ns/sample (the df scan's measured class)
- HBM stream: ~8.2e11 B/s (v5e-class effective)
- MXU f32-HIGHEST: ~2.0e13 FLOP/s effective (6-pass of the ~1.97e14
  bf16 peak, with fusion overheads)

Usage: run tools_profile_step.py for each preset first (PROF_PRESET=
fast / accurate), then `python tools_roofline.py > ROOFLINE.md` (the
comm-budget section from tools_comm_budget.py is appended separately).
"""
import json
import os

GATHER_NS = 9e-9
SCAN_NS = 7e-9
HBM_BS = 8.2e11
MXU_F32 = 2.0e13


def floors(preset: str):
    """{stage: (floor_ms, formula_str)} from the preset's config."""
    from rpg_svo_tpu.config import fast_preset, accurate_preset
    if preset == "accurate":
        cfg = accurate_preset(epi_long_k=128, grid_size=20,
                              df_update_k=256, epi_max_steps=32,
                              epi_short_steps=8, epi_scan_rows=4)
    else:
        cfg = fast_preset(grid_size=25, df_update_k=256, epi_max_steps=32,
                          epi_short_steps=8, epi_scan_rows=4)
    H, W = 480, 752
    PATCH = 8
    out = {}

    # pyramid: pure HBM stream (read lvl l, write lvl l+1), 4/3 px total
    pyr_bytes = H * W * 4 * (4.0 / 3.0) * 2
    out["pyramid_creation"] = (pyr_bytes / HBM_BS * 1e3,
                               f"{pyr_bytes / 1e6:.1f} MB HBM stream")

    # sparse alignment: Pallas whole-level kernel; floor = streaming the
    # klt levels into VMEM once per level pass (3 levels, 2 images)
    al_bytes = sum((H >> l) * (W >> l) * 4 * 2
                   for l in range(cfg.klt_min_level,
                                  cfg.klt_max_level + 1))
    out["sparse_img_align"] = (al_bytes / HBM_BS * 1e3,
                               f"{al_bytes / 1e6:.2f} MB level loads")

    # depth filter: strip-scan samples + K-domain tile/logic gathers
    K = cfg.df_update_k
    samples = (K * (cfg.epi_short_steps + PATCH) * cfg.epi_scan_rows
               + cfg.epi_long_k * (cfg.epi_max_steps + PATCH)
               * cfg.epi_scan_rows)
    tile_g = K * 17 * 17            # align tile per matched seed
    df_floor = (samples * SCAN_NS + tile_g * GATHER_NS) * 1e3
    out["depth_filter"] = (
        df_floor,
        f"{samples} scan samples x 7ns + {tile_g} align-tile gathers")

    # reprojection: per-cell candidate tile loads (Pallas aligned: ~0.4
    # us/640 tiles => treat as gather at 24x128 aligned-load cost) +
    # feature-align window tiles
    ncx, ncy = -(-W // cfg.grid_size), -(-H // cfg.grid_size)
    C = ncx * ncy
    F = min(-(-C // 8) * 8, -(-cfg.max_fts // 128) * 128)
    rep_tiles = C * 24 * 128 / 128      # aligned rows (sublane-wide)
    rep_floor = (rep_tiles * GATHER_NS + F * 17 * 17 * GATHER_NS) * 1e3
    out["reproject"] = (
        rep_floor, f"{C} cell tiles (aligned rows) + {F} align tiles")
    out["feature_align"] = (F * 17 * 17 * GATHER_NS * 1e3,
                            f"{F} window tiles x 17^2")

    # pose/point opt: tiny-system GN chains — dispatch-bound; floor =
    # kernel-count x ~2.5 us dispatch (measured inter-kernel gap class)
    out["pose_optimizer"] = (0.02, "~8 fused kernels x 2.5 us")
    out["point_optimizer"] = (0.02, "~8 fused kernels x 2.5 us")

    # local BA (accurate only): MXU contractions per GN iteration
    if cfg.loba_num_iter:
        P, M, Kc = 4096, cfg.max_obs_per_point + 1, cfg.max_kfs_pool
        per_iter = (P * M * Kc * 12 * 2) * 6      # _cam_rows f32 HIGHEST
        per_iter += (128 * 3 * P * 128 * 2)       # S128 matmul (padded)
        n_it = 5                                   # measured plateau exit
        ba_ms = per_iter * n_it / MXU_F32 * 1e3
        kf_every = 7                               # bench-scene KF cadence
        out["local_ba"] = (
            ba_ms / kf_every,
            f"{per_iter / 1e6:.0f} MFLOP x {n_it} iters / {kf_every} frames")

    # detector (KF frames only, amortized): blocked reduces ~ bandwidth
    out["detect"] = (H * W * 4 * 3 / HBM_BS * 1e3 / 7,
                     "3x level-0 stream / 7-frame KF cadence")
    out["map_ops"] = (0.03, "pool row scatters (bandwidth-priced)")
    return out


def main():
    print("# ROOFLINE — measured stage time vs speed-of-light floor")
    print()
    print("Floors: scattered gather 9 ns/elt, strip-scan sample 7 ns,")
    print("HBM 820 GB/s, MXU f32-HIGHEST ~20 TFLOP/s (measured classes,")
    print("CLAUDE.md).  Measured = per-line device-time attribution from")
    print("tools_profile_step.py (profiler trace, xplane parse).")
    print()
    for preset in ("fast", "accurate"):
        path = f"/tmp/svo_fused_stages_{preset}.json"
        if not os.path.exists(path):
            print(f"(no profile for {preset}: run PROF_PRESET={preset} "
                  "tools_profile_step.py)")
            continue
        meas = json.load(open(path))
        fl = floors(preset)
        print(f"## {preset} preset (ms/frame)")
        print()
        print("| stage | measured | floor | headroom | floor formula |")
        print("|---|---|---|---|---|")
        tot_m = tot_f = 0.0
        for stage, m in sorted(meas.items(), key=lambda kv: -kv[1]):
            f, formula = fl.get(stage, (None, "—"))
            tot_m += m
            if f:
                tot_f += f
                print(f"| {stage} | {m:.3f} | {f:.3f} | {m / f:.1f}x "
                      f"| {formula} |")
            else:
                print(f"| {stage} | {m:.3f} | — | — | {formula} |")
        print(f"| **total** | **{tot_m:.3f}** | **{tot_f:.3f}** | "
              f"**{tot_m / max(tot_f, 1e-9):.1f}x** | |")
        print()


if __name__ == "__main__":
    main()
