"""Timing analysis of trace CSVs.

Equivalent of svo_analysis/analyse_timing.py (:27-69): per-stage timing
statistics from the trace.csv written by io.trace.TraceWriter (same
column schema as the reference's SVO_TRACE output).
"""

from __future__ import annotations

import csv
from typing import Dict, List

import numpy as np

from rpg_svo_tpu.io.trace import TIMERS


def load_trace(path: str) -> Dict[str, np.ndarray]:
    with open(path) as f:
        rows = list(csv.DictReader(f))
    out = {}
    if not rows:
        return out
    for k in rows[0].keys():
        try:
            out[k] = np.asarray([float(r[k]) for r in rows])
        except ValueError:
            pass
    return out


def timing_stats(trace: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Per-stage mean/median/p90 in milliseconds."""
    stats = {}
    for k in TIMERS:
        if k not in trace or len(trace[k]) == 0:
            continue
        v = trace[k] * 1000.0
        stats[k] = {
            "mean_ms": float(v.mean()),
            "median_ms": float(np.median(v)),
            "p90_ms": float(np.percentile(v, 90)),
            "max_ms": float(v.max()),
        }
    return stats


def log_stats(trace: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Tracking health metrics (analyse_logs.py equivalent)."""
    out = {}
    for k in ("img_align_n_tracked", "repr_n_mps",
              "repr_n_new_references", "sfba_n_edges_final",
              "sfba_error_final", "n_candidates"):
        if k in trace and len(trace[k]):
            v = trace[k]
            out[k] = {"mean": float(v.mean()),
                      "median": float(np.median(v)),
                      "min": float(v.min()), "max": float(v.max())}
    if "dropout" in trace and len(trace["dropout"]):
        out["n_dropouts"] = int(trace["dropout"].sum())
    return out
