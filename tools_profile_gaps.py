"""Inter-kernel gap analysis of the latest jax profiler trace.

Reads the newest xplane.pb under /tmp/jaxprof (produced by
tools_profile_step.py), sorts all leaf XLA ops by device start time, and
attributes every idle gap between consecutive ops to the FOLLOWING op's
source line.  The fused VO step is kernel-count-bound: its module wall
time exceeds the leaf-op device time by the sum of these gaps
(~0.25-4 us sequential dispatch per kernel), so this view says which
code region to restructure for fewer/bigger kernels.

Usage: python tools_profile_gaps.py [n_frames]   (default 80)
"""
import glob
import os
import sys
from collections import defaultdict

os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"

NPROF = int(sys.argv[1]) if len(sys.argv) > 1 else 80

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

path = sorted(glob.glob("/tmp/jaxprof/plugins/profile/*/vm.xplane.pb"),
              key=os.path.getmtime)[-1]
print("trace:", path)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if plane.name != "/device:TPU:0":
        continue
    smeta = plane.stat_metadata
    emeta = plane.event_metadata
    evs = []
    tot_leaf = 0.0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = emeta[ev.metadata_id]
            stats = {}
            for st in md.stats:
                stats[smeta[st.metadata_id].name] = \
                    st.str_value or st.ref_value or st.int64_value
            if stats.get("hlo_category") in ("while", "conditional"):
                continue     # container spans cover their bodies
            tot_leaf += ev.duration_ps / 1e9
            evs.append((ev.offset_ps, ev.duration_ps,
                        str(stats.get("source", "<none>"))
                        .replace("/root/repo/", ""),
                        md.display_name.split(".")[0]))
    evs.sort()
    gap_by = defaultdict(float)
    cnt = defaultdict(int)
    tot_gap = 0.0
    prev_end = None
    for off, dur, src, name in evs:
        if prev_end is not None and off > prev_end:
            g = (off - prev_end) / 1e9
            if g < 5.0:       # skip inter-chunk host gaps
                tot_gap += g
                gap_by[(src, name)] += g
                cnt[(src, name)] += 1
        prev_end = max(prev_end or 0, off + dur)
    print(f"leaf ops {tot_leaf/NPROF:.3f} ms/frame, "
          f"gaps {tot_gap/NPROF:.3f} ms/frame")
    print("--- gaps attributed to the following op (top 30) ---")
    for k, v in sorted(gap_by.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v/NPROF:8.4f} ms/frame x{cnt[k]/NPROF:7.1f}  "
              f"before {k[1]:26s} {k[0]}")
