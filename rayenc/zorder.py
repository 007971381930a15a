"""Z-order (Morton) multi-column clustering keys.

`cluster_by` with the default lexicographic sort gives tight zones on
the FIRST key only: a filter on the second column alone still touches
every block, because each block spans the second column's full range.
Z-ordering interleaves the bits of per-column quantile ranks so every
cluster column gets a bounded per-block range, and zonemap pruning
(rayenc/decode.py) works on any of them — the standard data-layout
lever for multi-dimension scans at lake scale (public precedent:
Morton curves in Delta Lake / Iceberg `ZORDER BY`; the reference's
static layout has no analog, cited for contrast:
/root/reference/src/bin/js2pq/main.rs:96-114 fixes one column order).

Ranks, not raw values, are interleaved: quantile ranks make the curve
insensitive to value distribution (a skewed int column and a string
column both map onto a uniform [0, 2^bits) grid), and give one uniform
path for every orderable Arrow type — ints, floats, decimals,
temporals, strings, binary. Ties share a rank (dense rank), so equal
values always land in the same grid cell; nulls rank after every
value, matching the `sort_by` null placement of the lex mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["zorder_key", "zorder_sort_indices"]

# 16 bits/column caps the grid at 65536 quantile buckets — finer than
# any realistic block count per partition (a 1 GiB partition of 8k-row
# blocks has ~100 blocks; 2^16 cells per axis is already oversampled).
_MAX_BITS = 16


def _dense_ranks(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, int]:
    """Dense rank (0-based; ties share a rank) of each row in the
    column's ascending sort order; nulls rank after every non-null
    value. Returns ``(ranks, n_ranks)`` with ``ranks < n_ranks``."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_nested(arr.type):
        raise ValueError(
            f"zorder cluster column has nested type {arr.type}; "
            "z-ordering needs an orderable primitive (int/float/decimal/"
            "temporal/string/binary) column"
        )
    if isinstance(arr, pa.DictionaryArray):
        enc = arr
    else:
        enc = arr.dictionary_encode()
    null_mask = pc.is_null(enc.indices).to_numpy(zero_copy_only=False)
    codes = enc.indices.fill_null(0).to_numpy(zero_copy_only=False)
    codes = np.asarray(codes, dtype=np.int64)
    n_uniq = len(enc.dictionary)
    # rank each unique value once (n_uniq <= n_rows), then gather
    order = pc.sort_indices(enc.dictionary).to_numpy(zero_copy_only=False)
    rank_of_code = np.empty(n_uniq, dtype=np.int64)
    rank_of_code[np.asarray(order, dtype=np.int64)] = np.arange(n_uniq)
    ranks = rank_of_code[codes] if n_uniq else np.zeros(len(codes), np.int64)
    if null_mask.any():
        ranks[null_mask] = n_uniq
        return ranks, n_uniq + 1
    return ranks, max(n_uniq, 1)


def zorder_key(table: pa.Table, cols: list[str]) -> np.ndarray:
    """uint64 Morton key per row: per-column dense ranks scaled to
    ``bits = min(16, 64 // k)`` quantile buckets, bits interleaved
    column-major (bit ``b`` of column ``j`` lands at position
    ``b*k + j``). Deterministic for a given table content."""
    k = len(cols)
    if k < 2:
        raise ValueError(
            "zorder_key needs >= 2 cluster columns; with one column "
            "z-order degenerates to a plain sort — use cluster_mode='lex'"
        )
    if k > 32:
        raise ValueError(f"zorder_key supports at most 32 columns, got {k}")
    missing = [c for c in cols if c not in table.column_names]
    if missing:
        raise ValueError(f"zorder cluster column(s) {missing} not in table")
    bits = min(_MAX_BITS, 64 // k)
    z = np.zeros(table.num_rows, dtype=np.uint64)
    for j, c in enumerate(cols):
        ranks, n_ranks = _dense_ranks(table[c])
        # ranks < n_ranks  =>  bucket <= (n_ranks-1)*2^bits // n_ranks < 2^bits
        buckets = (ranks.astype(np.uint64) * np.uint64(1 << bits)) // np.uint64(
            n_ranks
        )
        for b in range(bits):
            z |= ((buckets >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * k + j)
    return z


def zorder_sort_indices(table: pa.Table, cols: list[str]) -> np.ndarray:
    """Row indices that order ``table`` along the Morton curve over
    ``cols``. Stable: rows with equal z-keys keep their input order, so
    the layout is a pure function of table content."""
    return np.argsort(zorder_key(table, cols), kind="stable")
