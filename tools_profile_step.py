"""Profile the fused vo_scan on TPU: capture a jax profiler trace and
print per-op device time aggregated by op name prefix.

Parses the xplane.pb directly with tensorflow's xplane_pb2 under the
pure-python protobuf implementation (the tensorboard-plugin converter is
broken in this image).
"""
import glob
import os
import sys
from collections import defaultdict

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rpg_svo_tpu.config import fast_preset, accurate_preset
from rpg_svo_tpu.core.pipeline import FrameHandler
from rpg_svo_tpu.core import fused
from rpg_svo_tpu.utils.synthetic import SyntheticDataset

PRESET = os.environ.get("PROF_PRESET", "fast")
n_frames = int(os.environ.get("PROF_FRAMES", "40"))
CHUNK = int(os.environ.get("PROF_CHUNK", "10"))
# the traced slices below are imgs[CHUNK:2C] and imgs[2C:3C] of the
# (n_frames-1)-frame stack; short counts silently shorten them and the
# ms/frame denominator overstates (plus an odd-length chunk recompiles)
assert n_frames >= 3 * CHUNK + 1, \
    f"PROF_FRAMES={n_frames} must be >= 3*PROF_CHUNK+1={3 * CHUNK + 1}"
ds = SyntheticDataset(n_frames=n_frames, trajectory="circle",
                      radius=0.25, revolutions=0.5)
_kw = dict(grid_size=int(os.environ.get("BENCH_GRID", "25")),
           epi_max_steps=int(os.environ.get("BENCH_EPI", "32")),
           epi_short_steps=int(os.environ.get("BENCH_SHORT", "8")),
           df_update_k=int(os.environ.get("BENCH_K", "192")),
           epi_scan_rows=int(os.environ.get("BENCH_SCANROWS", "4")),
           reproj_attempt_factor=float(os.environ.get("BENCH_ATTF",
                                                      "1.5")))
if PRESET == "accurate":
    # must mirror bench.py::make_cfg exactly to hit the same cached program
    cfg = accurate_preset(epi_long_k=128, **_kw)
else:
    cfg = fast_preset(**_kw)
fh = FrameHandler(ds.cam, cfg)
imgs = []
for i in range(n_frames):
    img, depth, T = ds.frame(i)
    imgs.append(img)
    if i == 0:
        img0, depth0, T0 = img, depth, T
imgs = jnp.stack(imgs[1:])
jax.block_until_ready(imgs)
fh.set_first_frame_with_depth(jnp.array(img0, copy=True),
                              T0.inverse(), depth0)
state = fused.state_from_handler(fh)


def scan(st, chunk_imgs):
    return fused.vo_scan_donated(st, chunk_imgs, ds.cam, cfg, fh.ncx,
                                 fh.ncy, fh.img_shape)


try:
    state, outs = scan(state, imgs[:CHUNK])
    jax.block_until_ready(outs.t_wc)
except Exception as e:   # noqa: BLE001 — intermittent worker fault on a
    # fresh first execution (see CLAUDE.md); re-exec a new interpreter
    import time
    attempt = int(os.environ.get("PROF_ATTEMPT", "0"))
    print(f"# attempt {attempt} failed: {type(e).__name__}",
          file=sys.stderr)
    if attempt >= 3:
        raise
    time.sleep(120)
    os.environ["PROF_ATTEMPT"] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)

logdir = "/tmp/jaxprof"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    state, outs = scan(state, imgs[CHUNK:2 * CHUNK])
    jax.block_until_ready(outs.t_wc)
    state, outs = scan(state, imgs[2 * CHUNK:3 * CHUNK])
    jax.block_until_ready(outs.t_wc)

paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths, file=sys.stderr)

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

# Leaf-op aggregation by SOURCE LOCATION (while/cond container spans are
# skipped — they cover their bodies and would double-count).  The source
# file maps onto the reference's SVO_TRACE stage names so the fused
# path gets per-stage device timings (frame_handler_base.cpp:46-74).
# the whole df-update cond branch is attributed to its CALL-SITE line
# (lax.cond gotcha, CLAUDE.md) — find that line by marker so edits to
# fused.py can't silently shunt the depth-filter time into fused_glue
import rpg_svo_tpu.core.fused as _fused_mod
_df_line = next(i + 1 for i, l in enumerate(
    open(_fused_mod.__file__).read().splitlines())
    if "upd = jax.lax.cond(" in l)
STAGES = [
    ("ops/pyramid", "pyramid_creation"),
    ("ops/pallas_align", "sparse_img_align"),
    ("ops/sparse_align", "sparse_img_align"),
    (f"core/fused.py:{_df_line}", "depth_filter"),  # df cond call site
    ("geometry/", "geometry_chains"),
    ("core/fused", "fused_glue"),
    ("core/reprojector", "reproject"),
    ("ops/feature_align", "feature_align"),
    ("ops/matcher", "reproject"),
    ("ops/pose_opt", "pose_optimizer"),
    ("ops/point_opt", "point_optimizer"),
    ("core/fused.py:2", "depth_filter"),   # the df-update cond call site
    ("core/depth_filter", "depth_filter"),
    ("ba/", "local_ba"),
    ("core/local_ba", "local_ba"),
    ("ops/detector", "detect"),
    ("core/map", "map_ops"),
    ("ops/pallas_tiles", "reproject"),
]
by_src = defaultdict(float)
by_stage = defaultdict(float)
total = 0.0
for path in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        smeta = plane.stat_metadata
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                stats = {}
                for st in md.stats:
                    k = smeta[st.metadata_id].name
                    stats[k] = st.str_value or st.ref_value \
                        or st.int64_value or st.double_value
                if stats.get("hlo_category") in ("while", "conditional"):
                    continue
                dur = ev.duration_ps / 1e9   # ms
                total += dur
                src = str(stats.get("source", "<none>"))
                by_src[src] += dur
                stage = "other"
                for pat, name in STAGES:
                    if pat in src:
                        stage = name
                        break
                by_stage[stage] += dur

NPROF = 2 * CHUNK
print(f"total device op time: {total:.2f} ms over {NPROF} frames "
      f"({total/NPROF:.3f} ms/frame)")
print("--- per stage (ms/frame) ---")
for k, v in sorted(by_stage.items(), key=lambda kv: -kv[1]):
    print(f"{v/NPROF:8.4f}  {k}")
print("--- per source line (ms/frame, top 40) ---")
for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{v/NPROF:8.4f}  {k}")
import json                                   # noqa: E402
with open(f"/tmp/svo_fused_stages_{PRESET}.json", "w") as f:
    json.dump({k: v / NPROF for k, v in by_stage.items()}, f, indent=1)
print(f"stage ms/frame written to /tmp/svo_fused_stages_{PRESET}.json")
