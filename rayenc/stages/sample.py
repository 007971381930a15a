"""Deterministic sampling stages.

Hash-based sampling (no RNG): reproducible across engines, runs and
cluster sizes, and oracle-checkable in SQL — the scale pattern behind
'Stratified Random Sampling over Streaming and Stored Data' (see
PAPERS.md). Pure map_batches filters: no shuffle, no driver
materialization; compose them mid-pipeline like any other Dataset op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_KNUTH = np.uint64(2654435761)  # Knuth multiplicative hash constant
_MOD = np.uint64(4294967296)  # 2^32


def hash_sample(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    fraction: float = 0.1,
) -> "ray.data.Dataset":
    """Keep rows whose Knuth-multiplicative-hashed id falls in the lowest
    `fraction` of the 32-bit hash space. Deterministic per id: the same
    row is kept at every scale and on every run (so samples of nested
    pipelines stay consistent), and the filter vectorizes to three numpy
    ops per batch."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = np.uint64(int(fraction * float(_MOD)))

    def pick(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * _KNUTH) % _MOD
        return b.filter(pa.array(h < cut))

    return ds.map_batches(pick, batch_format="pyarrow")
