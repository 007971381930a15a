"""Low-level vectorized primitives shared by all codecs.

Everything here is pure numpy / pyarrow — zero Ray dependencies — so the
codec library can be unit-tested and reused outside the pipeline. The
bit-packing primitives are the Python analog of the reference's
level/value decode loops (/root/reference/src/vec_pq_reader.rs:109-242),
but vectorized: a Python per-value loop in a hot path is a design bug
here (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# --------------------------------------------------------------------------
# zstd (general-purpose backstop container compression, the analog of the
# reference's ZSTD(3) writer default, /root/reference/src/bin/js2pq/main.rs:91)
# --------------------------------------------------------------------------

_ZSTD_CACHE: dict[int, pa.Codec] = {}


def epoch_int_view(arr: "pa.Array | pa.ChunkedArray"):
    """Temporal (or plain int) column -> int64 epoch-int view. date32 and
    time32 are 32-bit physical with no direct int64 cast (Arrow gap):
    hop via int32. This is THE one normalization that zone bounds, Bloom
    hashes, KLL sketches, the zone audit, and the exact row filter must
    agree on byte-for-byte — fix it here, never per call site (review
    finding: four hand-copied variants had already accumulated)."""
    t = arr.type
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return arr.cast(pa.int32()).cast(pa.int64())
    return arr.cast(pa.int64())


def zstd_codec(level: int = 3) -> pa.Codec:
    c = _ZSTD_CACHE.get(level)
    if c is None:
        c = pa.Codec("zstd", compression_level=level)
        _ZSTD_CACHE[level] = c
    return c


def zstd_compress(data: bytes | memoryview | np.ndarray, level: int = 3) -> bytes:
    buf = data.tobytes() if isinstance(data, np.ndarray) else bytes(data)
    if len(buf) == 0:
        return b""
    return zstd_codec(level).compress(buf, asbytes=True)


def zstd_decompress(data: bytes, uncompressed_size: int) -> bytes:
    if uncompressed_size == 0:
        return b""
    return zstd_codec().decompress(data, decompressed_size=uncompressed_size, asbytes=True)


# --------------------------------------------------------------------------
# bit packing (uint64 values < 2**width -> packed little-endian bit stream)
# --------------------------------------------------------------------------


def bit_width(max_value: int) -> int:
    """Bits needed to represent max_value (0 -> 0 bits)."""
    if max_value < 0:
        raise ValueError("bit_width expects non-negative max")
    return int(max_value).bit_length()


def _carrier_bytes(width: int) -> int:
    """Smallest power-of-two byte width holding `width` bits."""
    for k in (1, 2, 4, 8):
        if width <= 8 * k:
            return k
    raise ValueError(f"width {width} > 64")


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into `width` bits each (LSB-first).

    Implemented on C-native np.unpackbits/packbits over the smallest
    carrier integer — the shift-matrix formulation allocated
    O(n * width) uint64 temporaries and dominated whole-block encode
    profiles at token-stream scales."""
    n = len(values)
    if n == 0 or width == 0:
        return b""
    k = _carrier_bytes(width)
    v = np.ascontiguousarray(values, dtype=np.uint64).astype(f"<u{k}")
    bits = np.unpackbits(v.view(np.uint8).reshape(n, k), axis=1, bitorder="little")
    return np.packbits(bits[:, :width].ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of pack_bits -> uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    k = _carrier_bytes(width)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little").reshape(n, width)
    full = np.zeros((n, 8 * k), dtype=np.uint8)
    full[:, :width] = bits
    carriers = np.packbits(full, axis=1, bitorder="little").view(f"<u{k}").reshape(n)
    return carriers.astype(np.uint64)


def pack_planes(values: np.ndarray, width: int) -> bytes:
    """Bit-PLANE-major packing: plane j holds bit j of every value
    (BitWeaving/bit-slicing layout, public technique). Replaces the
    element-major `pack_bits` on every zstd-wrapped path: the
    element-major form pays a strided `bits[:, :width].ravel()` copy
    that collapses at non-byte widths (measured 1.5-6 s per 500k values
    at w=12-40 vs 7-38 ms plane-major), and plane-major exposes
    near-constant high planes to zstd (sorted 24-bit stream: 1.40 MB ->
    0.60 MB at the same level). fsst's token stream keeps `pack_bits`
    (its C kernel writes that layout)."""
    n = len(values)
    if n == 0 or width == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    per = (n + 7) // 8
    out = np.empty((width, per), dtype=np.uint8)
    for j in range(width):
        out[j] = np.packbits(
            ((v >> np.uint64(j)) & np.uint64(1)).astype(np.uint8),
            bitorder="little",
        )
    return out.tobytes()


def unpack_planes(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of pack_planes -> uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    per = (n + 7) // 8
    planes = np.frombuffer(buf, dtype=np.uint8).reshape(width, per)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        bits = np.unpackbits(planes[j], count=n, bitorder="little")
        out |= bits.astype(np.uint64) << np.uint64(j)
    return out


def pack_bits_z(values: np.ndarray, width: int, level: int = 3) -> bytes:
    """bit-pack (plane-major) then zstd."""
    return zstd_compress(pack_planes(values, width), level)


def unpack_bits_z(buf: bytes, width: int, n: int) -> np.ndarray:
    packed_len = width * ((n + 7) // 8)
    return unpack_planes(zstd_decompress(buf, packed_len), width, n)


# --------------------------------------------------------------------------
# zigzag (signed -> unsigned, for delta streams)
# --------------------------------------------------------------------------


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    s = np.ascontiguousarray(v, dtype=np.int64)
    return ((s.astype(np.uint64) << np.uint64(1)) ^ (s >> np.int64(63)).astype(np.uint64))


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


# --------------------------------------------------------------------------
# arrow type <-> string (stored in block headers)
# --------------------------------------------------------------------------

_SIMPLE_TYPES = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "date32[day]": pa.date32(),
    "date64[ms]": pa.date64(),
}


def type_to_str(t: pa.DataType) -> str:
    return str(t)


def type_from_str(s: str) -> pa.DataType:
    t = _SIMPLE_TYPES.get(s)
    if t is not None:
        return t
    if s.startswith("fixed_size_binary["):
        return pa.binary(int(s[len("fixed_size_binary[") : -1]))
    if s.startswith("timestamp["):
        inner = s[len("timestamp[") : -1]
        if "," in inner:
            unit, tz = inner.split(",", 1)
            tz = tz.strip().removeprefix("tz=")
            return pa.timestamp(unit.strip(), tz=tz)
        return pa.timestamp(inner.strip())
    if s.startswith("time32["):
        return pa.time32(s[len("time32[") : -1])
    if s.startswith("time64["):
        return pa.time64(s[len("time64[") : -1])
    if s.startswith("duration["):
        return pa.duration(s[len("duration[") : -1])
    if s.startswith("decimal128(") or s.startswith("decimal256("):
        ctor = pa.decimal128 if s.startswith("decimal128") else pa.decimal256
        prec, scale = s[s.index("(") + 1 : -1].split(",")
        return ctor(int(prec), int(scale))
    raise ValueError(f"unsupported arrow type string: {s!r}")


# --------------------------------------------------------------------------
# string array <-> (bytes, lengths) without per-row Python
# --------------------------------------------------------------------------


def string_array_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (data_bytes uint8 array, per-row byte lengths int64).

    `arr` must be a null-free string/large_string/binary/large_binary array.
    Zero-copy views onto the Arrow buffers.
    """
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    off_buf, data_buf = bufs[1], bufs[2]
    offsets = np.frombuffer(off_buf, dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    if data_buf is None:
        data = np.empty(0, dtype=np.uint8)
    else:
        data = np.frombuffer(data_buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets).astype(np.int64)
    return data, lengths


def strings_from_parts(
    data: np.ndarray, lengths: np.ndarray, typ: pa.DataType
) -> pa.Array:
    """Rebuild a null-free string/binary array from concatenated bytes + lengths."""
    n = len(lengths)
    total = int(lengths.sum()) if n else 0
    large = pa.types.is_large_string(typ) or pa.types.is_large_binary(typ)
    if not large and total > (1 << 31) - 1:
        raise ValueError("block too large for 32-bit offsets; lower block size")
    off_dtype = np.int64 if large else np.int32
    offsets = np.zeros(n + 1, dtype=off_dtype)
    np.cumsum(lengths, out=offsets[1:])
    data = np.ascontiguousarray(data, dtype=np.uint8)
    # zero-copy: py_buffer wraps the numpy buffers directly and keeps them
    # alive; the old .tobytes() round-trip copied the full payload twice
    # per block on the decode hot path
    return pa.Array.from_buffers(
        typ, n, [None, pa.py_buffer(offsets), pa.py_buffer(data)]
    )


def encode_lengths(lengths: np.ndarray, level: int = 3) -> tuple[dict, bytes]:
    """Compact representation for a lengths array: FOR + bit-pack + zstd."""
    if len(lengths) == 0:
        return {"ref": 0, "w": 0}, b""
    lo = int(lengths.min())
    hi = int(lengths.max())
    w = bit_width(hi - lo)
    meta = {"ref": lo, "w": w}
    return meta, pack_bits_z(lengths.astype(np.int64) - lo, w, level)


def decode_lengths(meta: dict, buf: bytes, n: int) -> np.ndarray:
    vals = unpack_bits_z(buf, meta["w"], n).astype(np.int64)
    return vals + int(meta["ref"])
