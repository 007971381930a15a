"""Per-block Bloom filters for equality-predicate pruning.

Zone maps (min/max) prune range predicates but are blind to point
lookups on high-cardinality columns whose values interleave across
blocks (every block's [min, max] covers the probe). A small per-block
Bloom filter closes that: `col == v` skips any block whose filter
proves v absent — the standard columnar-store companion to zone stats
(Parquet's own column index has the same pair). Complements the
reference's stats-granularity axis (/root/reference/src/bin/js2pq/
main.rs:18-26) with a third structure beside block zones and page zones.

Hash stability is load-bearing: filters PERSIST in the block table, so
the bits must reproduce in any decoding environment (the run-internal
xxhash kernel in stages.hashing explicitly must NOT be stored). Ints
hash with splitmix64 (our own pure-numpy function, public-domain
constants — environment-independent); strings with blake2b-128 per
DISTINCT value (hashlib, stable by spec; distinct counts per block are
small, so the per-unique Python loop is off the hot path). k probe
positions derive from the classic double-hashing scheme h1 + i*h2
(Kirsch & Mitzenmacher, "Less Hashing, Same Performance", ESA 2006).

Filters are sized by DISTINCT count (not rows), skip payload-like
columns (avg value > _MAX_AVG_VAL_BYTES — nobody equality-probes whole
file bodies), and serialize as hex into the block's zonemap JSON under
the reserved key "__bloom__" — old block tables without blooms simply
never prune (the safe default).
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pyarrow as pa

_DEFAULT_BITS_PER_KEY = 10  # ~1% false-positive rate at k=7
_K_PROBES = 7
_MAX_AVG_VAL_BYTES = 256  # skip blob-like columns (content payloads)
_MAX_BITS = 1 << 18  # 32 KiB filter cap per column per block
_SEED1 = np.uint64(0xA24BAED4963EE407)
_SEED2 = np.uint64(0x9FB21C651E98DF25)


def _int_hashes(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from .stages.hashing import splitmix64

    u = vals.astype(np.uint64)
    return splitmix64(u ^ _SEED1), splitmix64(u ^ _SEED2)


def _str_hashes(values: list) -> tuple[np.ndarray, np.ndarray]:
    h1 = np.empty(len(values), dtype=np.uint64)
    h2 = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(v.encode() if isinstance(v, str) else v, digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return h1, h2


def _probe_positions(h1: np.ndarray, h2: np.ndarray, m: int) -> np.ndarray:
    """(n, k) probe bit positions via double hashing; h2 forced odd so
    the probe stride never degenerates on power-of-two m."""
    i = np.arange(_K_PROBES, dtype=np.uint64)[None, :]
    h2 = h2 | np.uint64(1)
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _column_hashes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray] | None:
    """(h1, h2) over the DISTINCT non-null values, or None when the type
    is unsupported or the column looks like a payload."""
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_integer(t):
        vals = arr.drop_null()
        if len(vals) == 0:
            return None
        # date32 has no direct int64 cast; uint64 values >= 2^63 overflow an
        # int64 cast. Normalize every integer-like column to its uint64 BIT
        # pattern (int64 negatives wrap mod 2^64), which is exactly how
        # _probe_hash maps probe ints, so build and probe always agree.
        try:
            from .codecs.util import epoch_int_view

            ints = vals if pa.types.is_uint64(t) else epoch_int_view(vals)
            np_vals = ints.to_numpy(zero_copy_only=False)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, OverflowError):
            return None  # unsupported type -> no filter, never prunes
        u = np.unique(np_vals)
        return _int_hashes(u)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        vals = arr.drop_null()
        n = len(vals)
        if n == 0 or vals.nbytes / n > _MAX_AVG_VAL_BYTES:
            return None
        uniq = pc.unique(vals).to_pylist()
        return _str_hashes(uniq)
    return None


def array_probe_hashes(
    arr: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """PER-ROW (h1, h2, valid) probe hashes for a whole array — the
    vectorized companion to the scalar `_probe_hash`, using the same
    value normalization (int64 negatives wrap to their uint64 bit
    pattern; strings/binary hash per DISTINCT value via blake2b and
    gather back through dictionary indices). `valid` is False for null
    rows (a null never equals any key). Returns None for unsupported
    types — callers must treat that as "no filter, never prune"."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    t = arr.type
    valid = np.asarray(pc.is_valid(arr).to_numpy(zero_copy_only=False), dtype=bool)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64), valid
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_integer(t):
        try:
            from .codecs.util import epoch_int_view

            ints = arr if pa.types.is_uint64(t) else epoch_int_view(arr)
            np_vals = pc.fill_null(ints, 0).to_numpy(zero_copy_only=False)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, OverflowError):
            return None
        h1, h2 = _int_hashes(np.asarray(np_vals))
        return h1, h2, valid
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        d = pc.dictionary_encode(arr)
        uniq = d.dictionary.to_pylist()
        if not uniq:
            return np.zeros(n, np.uint64), np.zeros(n, np.uint64), valid
        uh1, uh2 = _str_hashes(uniq)
        idx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False)
        idx = np.asarray(idx, dtype=np.int64)
        return uh1[idx], uh2[idx], valid
    return None


def bloom_build(
    arr: pa.Array | pa.ChunkedArray, bits_per_key: int = _DEFAULT_BITS_PER_KEY
) -> str | None:
    """Build a hex-serialized Bloom filter over a column chunk's distinct
    non-null values. Returns None for empty/all-null chunks, unsupported
    types, payload-like columns, and cardinalities past the size cap (no
    filter — never prunes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        hashed = _column_hashes(arr)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, OverflowError):
        hashed = None  # docstring contract: unsupported types -> no filter
    if hashed is None:
        return None
    h1, h2 = hashed
    want_bits = max(64, len(h1) * bits_per_key)
    if want_bits > _MAX_BITS:
        return None  # cardinality past the cap: skip rather than bloat
    m = 1 << int(np.ceil(np.log2(want_bits)))  # power of two
    pos = _probe_positions(h1, h2, m)
    bits = np.zeros(m, dtype=np.uint8)
    bits[pos.reshape(-1)] = 1
    return np.packbits(bits, bitorder="little").tobytes().hex()


# ---------------------------------------------------------------------------
# n-gram Bloom filters: substring-predicate ("contains") pruning
# ---------------------------------------------------------------------------
# The value-level filter above answers "col == v"; it is useless for
# substring search, the bread-and-butter probe on a source-code table
# (grep for an identifier across 10^12 files). The standard metadata
# companion (ClickHouse's tokenbf/ngrambf skip indexes, Lucene's n-gram
# fields) is a Bloom filter over the DISTINCT byte n-grams of every
# value in the block: if any n-gram of the needle is provably absent,
# no row can contain the needle. Byte-level trigrams are sound for
# UTF-8 text because UTF-8 is self-synchronizing — a needle's byte
# sequence appears in a value's bytes iff the character sequence
# appears. Needles shorter than n bytes never prune (no complete
# n-gram to probe — the safe default).
#
# Saturation beats skipping: a block whose distinct-trigram count
# overflows the size cap gets a CLAMPED filter (higher false-positive
# rate, prunes less) rather than none — soundness only needs "no false
# negatives", which clamping preserves.

_NGRAM_N = 3
_NGRAM_MAX_BITS = 1 << 21  # 256 KiB per column per block, then clamp


def _ngram_codes(data: np.ndarray, offsets: np.ndarray, n: int) -> np.ndarray:
    """Distinct uint64 codes of every byte n-gram that lies entirely
    inside one value of the concatenated buffer `data` (value i spans
    data[offsets[i]:offsets[i+1]]). Windows spanning a value boundary
    are excluded — they exist in no row."""
    L = len(data)
    if L < n:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(data, n)  # (L-n+1, n)
    starts = np.arange(L - n + 1, dtype=np.int64)
    # value containing each window start; window valid iff it ends
    # inside that same value
    idx = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + n <= offsets[idx + 1]
    win = win[valid]
    if len(win) == 0:
        return np.empty(0, dtype=np.uint64)
    codes = np.zeros(len(win), dtype=np.uint64)
    for j in range(n):
        codes = (codes << np.uint64(8)) | win[:, j].astype(np.uint64)
    return np.unique(codes)


def _string_bytes_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray] | None:
    """(data, offsets) numpy views over the non-null values' UTF-8/byte
    payload, offsets rebased to 0. None for unsupported types."""
    t = arr.type
    if not (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        return None
    vals = arr.drop_null()
    if len(vals) == 0:
        return None
    vals = vals.cast(pa.large_binary())
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    bufs = vals.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[
        vals.offset : vals.offset + len(vals) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    return data, (offsets - offsets[0])


def ngram_bloom_build(
    arr: pa.Array | pa.ChunkedArray,
    n: int = _NGRAM_N,
    bits_per_key: int = _DEFAULT_BITS_PER_KEY,
) -> dict | None:
    """Bloom filter over the distinct byte n-grams of a string/binary
    column chunk, as {"n": n, "f": hex}. None for empty/all-null chunks
    and unsupported types (no filter — never prunes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    view = _string_bytes_view(arr)
    if view is None:
        return None
    codes = _ngram_codes(view[0], view[1], n)
    if len(codes) == 0:
        return None
    want_bits = max(64, len(codes) * bits_per_key)
    m = 1 << int(np.ceil(np.log2(want_bits)))
    m = min(m, _NGRAM_MAX_BITS)  # clamp, don't skip (see module note)
    h1, h2 = _int_hashes(codes)
    pos = _probe_positions(h1, h2, m)
    bits = np.zeros(m, dtype=np.uint8)
    bits[pos.reshape(-1)] = 1
    return {"n": n, "f": np.packbits(bits, bitorder="little").tobytes().hex()}


def ngram_bloom_may_contain(entry: dict, needle: str | bytes) -> bool:
    """True unless the filter PROVES no row can contain `needle` as a
    substring (some n-gram of the needle is absent). Malformed entries
    and sub-n needles never prune."""
    if not isinstance(entry, dict) or not isinstance(needle, (str, bytes)):
        return True
    try:
        n = int(entry["n"])
        packed = np.frombuffer(bytes.fromhex(entry["f"]), dtype=np.uint8)
    except (KeyError, TypeError, ValueError):
        return True
    m = len(packed) * 8
    nb = np.frombuffer(
        needle.encode() if isinstance(needle, str) else needle, dtype=np.uint8
    )
    if m == 0 or n <= 0 or len(nb) < n:
        return True
    codes = _ngram_codes(nb, np.array([0, len(nb)], dtype=np.int64), n)
    if len(codes) == 0:
        return True
    h1, h2 = _int_hashes(codes)
    pos = _probe_positions(h1, h2, m)  # (n_codes, k)
    byte_idx = pos >> 3
    bit_idx = (pos & 7).astype(np.uint8)
    hit = (packed[byte_idx] >> bit_idx) & 1
    # every probed position of EVERY n-gram must be set for a maybe
    return bool(np.all(hit))


@functools.lru_cache(maxsize=1024)
def _probe_hash(value) -> tuple[int, int] | None:
    """Stable (h1, h2) for a scalar probe value, memoized — zone pruning
    probes the same constant against every block row."""
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        if not -(1 << 63) <= value < (1 << 64):
            return None  # outside every integer column's domain
        # Same uint64 bit-pattern normalization as the build side: int64
        # negatives wrap mod 2^64; uint64 values pass through unchanged.
        h1, h2 = _int_hashes(np.array([value & ((1 << 64) - 1)], dtype=np.uint64))
        return int(h1[0]), int(h2[0])
    if isinstance(value, str):
        h1, h2 = _str_hashes([value])
        return int(h1[0]), int(h2[0])
    return None


def bloom_may_contain(hex_filter: str, value) -> bool:
    """True unless the filter PROVES the value absent (missing/invalid
    filters and unprobeable value types never prune)."""
    if not isinstance(value, (int, str)):
        return True  # also keeps unhashables out of the lru_cache
    probe = _probe_hash(value)
    if probe is None:
        return True
    try:
        packed = np.frombuffer(bytes.fromhex(hex_filter), dtype=np.uint8)
    except ValueError:
        return True
    m = len(packed) * 8
    if m == 0:
        return True
    h1 = np.array([probe[0]], dtype=np.uint64)
    h2 = np.array([probe[1]], dtype=np.uint64)
    pos = _probe_positions(h1, h2, m)[0]
    byte_idx = pos >> 3
    bit_idx = (pos & 7).astype(np.uint8)
    return bool(np.all((packed[byte_idx] >> bit_idx) & 1))
