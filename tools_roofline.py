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
VPU_FS = 4.0e12          # effective VPU f32 FLOP/s with fusion overhead
PALLAS_TILE_NS = 0.7e-9  # aligned tile loads: ~0.4 us / 640 (24,128)
DISPATCH_S = 2.5e-6      # measured inter-kernel dispatch gap class


def floors(preset: str):
    """{stage: (floor_ms, formula_str)} from the preset's config."""
    from rpg_svo_tpu.config import fast_preset, accurate_preset
    if preset == "accurate":
        cfg = accurate_preset(epi_long_k=128, grid_size=25,
                              df_update_k=192, epi_max_steps=32,
                              epi_short_steps=8, epi_scan_rows=4,
                              reproj_attempt_factor=1.5)
    else:
        cfg = fast_preset(grid_size=25, df_update_k=192, epi_max_steps=32,
                          epi_short_steps=8, epi_scan_rows=4,
                          reproj_attempt_factor=1.5)
    H, W = 480, 752
    PATCH = 8
    out = {}

    # pyramid: pure HBM stream (read lvl l, write lvl l+1), 4/3 px total
    pyr_bytes = H * W * 4 * (4.0 / 3.0) * 2
    out["pyramid_creation"] = (pyr_bytes / HBM_BS * 1e3,
                               f"{pyr_bytes / 1e6:.1f} MB HBM stream")

    # sparse alignment: Pallas whole-level kernel — floor = level loads
    # into VMEM + the GN iteration FLOPs (N patches x 16 px x ~10 ops x
    # iters per level) on the VPU
    al_bytes = sum((H >> l) * (W >> l) * 4 * 2
                   for l in range(cfg.klt_min_level,
                                  cfg.klt_max_level + 1))
    n_lv = cfg.klt_max_level - cfg.klt_min_level + 1
    gn_flops = cfg.max_fts * 16 * 60 * 10 * n_lv
    out["sparse_img_align"] = (
        al_bytes / HBM_BS * 1e3 + gn_flops / VPU_FS * 1e3,
        f"{al_bytes / 1e6:.2f} MB level loads + GN VPU flops")

    # depth filter: strip-scan samples + K-domain tile/logic gathers
    K = cfg.df_update_k
    samples = (K * (cfg.epi_short_steps + PATCH) * cfg.epi_scan_rows
               + cfg.epi_long_k * (cfg.epi_max_steps + PATCH)
               * cfg.epi_scan_rows)
    every = max(cfg.df_update_every, 1)
    df_floor = samples * SCAN_NS * 1e3 / every
    out["depth_filter"] = (
        df_floor,
        f"{samples} strip-scan samples x 7 ns / every-{every} cadence"
        " (align tiles ride the Pallas aligned loader, ~0)")

    # reprojection: per-cell candidate tile loads (Pallas aligned: ~0.4
    # us/640 tiles => treat as gather at 24x128 aligned-load cost) +
    # feature-align window tiles
    ncx, ncy = -(-W // cfg.grid_size), -(-H // cfg.grid_size)
    C = ncx * ncy
    F = min(-(-C // 8) * 8, -(-cfg.max_fts // 128) * 128)
    P = cfg.max_points
    A = min(C, -(-max(2 * cfg.max_fts, 256) // 8) * 8)
    # dominated by the P-domain per-cell segment_max scatter (9 ns/elt);
    # warp/align tile loads ride the Pallas aligned loader
    rep_floor = (P * GATHER_NS + A * 24 * PALLAS_TILE_NS * 24) * 1e3
    out["reproject"] = (
        rep_floor,
        f"{P}-elt cell segment-max scatter + {A} Pallas warp tiles")
    # feature-align work mostly lands in the reproject/df attributions
    # (cond call sites); no separate floor to avoid double counting

    # pose/point opt: tiny-system GN chains — dispatch-bound; floor =
    # kernel-count x ~2.5 us dispatch (measured inter-kernel gap class)
    out["pose_optimizer"] = (3 * DISPATCH_S * 1e3,
                             "~3 irreducible kernel dispatches")
    out["point_optimizer"] = (3 * DISPATCH_S * 1e3,
                              "~3 irreducible kernel dispatches")

    # local BA (accurate only): MXU contractions per GN iteration
    if cfg.loba_num_iter:
        Pb, M, Kc = 4096, cfg.max_obs_per_point + 1, cfg.max_kfs_pool
        per_iter = (Pb * M * Kc * 12 * 2) * 6     # _cam_rows f32 HIGHEST
        per_iter += (128 * 3 * Pb * 128 * 2)      # S128 matmul (padded)
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
