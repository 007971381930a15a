"""Per-block Bloom filters for equality-predicate pruning.

Zone maps (min/max) prune range predicates but are blind to point
lookups on high-cardinality columns whose values interleave across
blocks (every block's [min, max] covers the probe). A small per-block
Bloom filter closes that: `col == v` skips any block whose filter
proves v absent — the standard columnar-store companion to zone stats
(Parquet's own column index has the same pair). Complements the
reference's stats-granularity axis (/root/reference/src/bin/js2pq/
main.rs:18-26) with a third structure beside block zones and page zones.

Construction is fully vectorized: one batched xxhash pass per column
(stages.hashing), k probe positions derived from the classic
double-hashing scheme h1 + i*h2 (Kirsch & Mitzenmacher, "Less Hashing,
Same Performance", ESA 2006). Filters serialize as hex into the block's
zonemap JSON under the reserved key "__bloom__", so the decode-side
pruning path needs no schema change and old block tables (no blooms)
simply never prune — the safe default.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_DEFAULT_BITS_PER_KEY = 10  # ~1% false-positive rate at k=7
_K_PROBES = 7


def _probe_positions(h1: np.ndarray, h2: np.ndarray, m: int) -> np.ndarray:
    """(n, k) probe bit positions via double hashing; h2 forced odd so
    the probe stride never degenerates on power-of-two m."""
    i = np.arange(_K_PROBES, dtype=np.uint64)[None, :]
    h2 = h2 | np.uint64(1)
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _canon(arr: pa.Array) -> pa.Array | None:
    """Canonical hash dtype: ints/timestamps/dates -> int64, strings ->
    string; anything else (floats, nested, binary) gets no bloom —
    equality probes on those either don't arise or can't be matched
    dtype-stably against a Python predicate value."""
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_integer(t):
        return arr.cast(pa.int64())
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return arr.cast(pa.string())
    return None


def _canon_value(value) -> pa.Array | None:
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        return None
    if isinstance(value, int):
        return pa.array([value], type=pa.int64())
    return pa.array([value], type=pa.string())


def bloom_build(arr: pa.Array | pa.ChunkedArray, bits_per_key: int = _DEFAULT_BITS_PER_KEY) -> str | None:
    """Build a hex-serialized Bloom filter over a column chunk's non-null
    values. Returns None for empty/all-null chunks and for unsupported
    types (no filter — never prunes)."""
    from .stages.hashing import hash_array_64

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    canon = _canon(arr)
    if canon is None:
        return None
    vals = canon.drop_null()
    n = len(vals)
    if n == 0:
        return None
    m = max(64, 1 << int(np.ceil(np.log2(n * bits_per_key))))  # power of two
    h1 = hash_array_64(vals, seed=101)
    h2 = hash_array_64(vals, seed=202)
    pos = _probe_positions(h1, h2, m)
    bits = np.zeros(m, dtype=np.uint8)
    bits[pos.reshape(-1)] = 1
    return np.packbits(bits, bitorder="little").tobytes().hex()


def bloom_may_contain(hex_filter: str, value) -> bool:
    """True unless the filter PROVES the value absent (missing/invalid
    filters never prune)."""
    from .stages.hashing import hash_array_64

    try:
        packed = np.frombuffer(bytes.fromhex(hex_filter), dtype=np.uint8)
    except ValueError:
        return True
    m = len(packed) * 8
    if m == 0:
        return True
    arr = _canon_value(value)
    if arr is None:
        return True  # unprobeable value type: never prune
    h1 = hash_array_64(arr, seed=101)
    h2 = hash_array_64(arr, seed=202)
    pos = _probe_positions(h1, h2, m)[0]
    byte_idx = pos >> 3
    bit_idx = (pos & 7).astype(np.uint8)
    return bool(np.all((packed[byte_idx] >> bit_idx) & 1))
