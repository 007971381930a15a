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
_M32 = np.uint64(4294967295)  # 2^32 - 1


def hash_sample(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    fraction: float = 0.1,
) -> "ray.data.Dataset":
    """Keep rows whose hashed id falls in the lowest `fraction` of the
    32-bit hash space. Deterministic per id: the same row is kept at
    every scale and on every run (so samples of nested pipelines stay
    consistent), and the filter vectorizes to a few numpy ops per batch.

    Hash = Knuth-multiplicative over the id's high bits XOR-folded into
    the low 32 (round-4 self-review: the bare ``(id * K) % 2^32`` read
    only the low 32 bits, so composite ids like ``shard << 32 | row``
    sampled every shard identically). Deliberately SQL-expressible so
    the DuckDB oracle replicates it bit-for-bit — ids must be
    NON-NEGATIVE int64 for that parity (>> differs on negatives). Null
    ids are dropped, matching SQL ``WHERE`` on a null expression."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = np.uint64(int(fraction * float(_MOD)))

    def pick(b: pa.Table) -> pa.Table:
        # pa.Table columns are always ChunkedArray: combine unconditionally
        col = b[id_col].combine_chunks()
        valid = np.ones(b.num_rows, dtype=bool)
        if col.null_count:
            valid = np.asarray(col.is_valid())
            col = col.fill_null(0)
        ids = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        fold = ((ids >> np.uint64(32)) ^ ids) & _M32
        h = (fold * _KNUTH) % _MOD
        return b.filter(pa.array((h < cut) & valid))

    return ds.map_batches(pick, batch_format="pyarrow")
