"""GSPMD sharding annotations for the fused step's batched internals.

The scaling-book recipe: pick a mesh, annotate shardings inside the one
jitted program, and let XLA place the collectives.  The fused VO step is
mostly replicated per-frame control + image ops; its two heavy batched
domains — the depth-filter's K-compacted epipolar scan and the local-BA
point blocks — carry a `with_sharding_constraint` on their leading dim
when `Config.shard_axis` names a mesh axis.  XLA then partitions the
strip gathers / Schur einsums across that axis and inserts the
all-gathers/psums itself (the hand-written shard_map equivalents live in
parallel/sharded.py and parallel/ba.py; this path runs the SAME fused
program the single-chip bench uses, just annotated).

Requires an ambient mesh (``with jax.set_mesh(mesh):`` around the call)
whose axis names include `axis`; see parallel/fused_mesh.py.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def shard_dim0(x, axis: str):
    """Constrain leading dim of every array leaf to be sharded on `axis`.

    No-op when axis is empty (single-chip path compiles byte-identically).
    """
    if not axis:
        return x

    def one(a):
        if not hasattr(a, "ndim") or a.ndim == 0:
            return a
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, spec)

    return jax.tree.map(one, x)
