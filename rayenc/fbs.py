"""FlatBuffers wire interop for the reference's opaque histogram layout.

The reference's `--use-flatbuffers` mode packs each series into ONE
`binary_data: Binary` column value holding a FlatBuffers `Histogram`
table of four vectors (/root/reference/flatbuffers/histogram.fbs:1-8,
encode at /root/reference/src/flatbuffers.rs:10-41, schema at
/root/reference/src/schema.rs:36-38). A user migrating reference-written
parquet needs to READ those buffers; the `flatbuffers` pip package is
not in this environment, so this module implements the wire format
directly for this schema (it is a standard root-table + vtable + four
typed vectors — the generic table/vector layout from the public
FlatBuffers spec):

- buffer starts with a u32 root uoffset to the root table;
- a table starts with an i32 soffset to its vtable
  (vtable_pos = table_pos - soffset), the vtable holds u16 vtable/table
  sizes then one u16 per field slot (offset within the table, 0 = field
  absent);
- a vector field is a u32 uoffset (forward) to [u32 length | elements].

Field ids follow declaration order in histogram.fbs: ts=0, count=1,
sums_double=2, sums_long=3.

NOTE the reference encode is LOSSY by construction: null elements of
sums_double/sums_long are silently dropped
(/root/reference/src/flatbuffers.rs:14-30), so those vectors can be
SHORTER than ts — decode faithfully reproduces that, it cannot invent
the nulls back. The repo's own opaque layout (rayenc.opaque, msgpack)
remains the lossless option.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

_FIELDS = (("ts", "<i8"), ("count", "<i8"), ("sums_double", "<f8"), ("sums_long", "<i8"))


def histogram_from_flatbuffers(buf: bytes | memoryview) -> dict[str, np.ndarray]:
    """Parse one reference-layout Histogram buffer -> dict of numpy
    arrays (ts, count, sums_double, sums_long; absent fields decode as
    empty, matching generated-accessor semantics)."""
    mv = memoryview(buf)
    (root,) = struct.unpack_from("<I", mv, 0)
    t = root
    (soff,) = struct.unpack_from("<i", mv, t)
    vt = t - soff
    (vt_size,) = struct.unpack_from("<H", mv, vt)
    out: dict[str, np.ndarray] = {}
    for field_id, (name, dtype) in enumerate(_FIELDS):
        slot = 4 + 2 * field_id
        foff = 0
        if slot + 2 <= vt_size:
            (foff,) = struct.unpack_from("<H", mv, vt + slot)
        if foff == 0:
            out[name] = np.empty(0, dtype=dtype)
            continue
        fpos = t + foff
        (rel,) = struct.unpack_from("<I", mv, fpos)
        vpos = fpos + rel
        (n,) = struct.unpack_from("<I", mv, vpos)
        out[name] = np.frombuffer(mv, dtype=dtype, count=n, offset=vpos + 4).copy()
    return out


def histogram_to_flatbuffers(
    ts, count, sums_double, sums_long
) -> bytes:
    """Serialize one histogram in the reference's wire layout (the
    fixture-side twin of /root/reference/src/flatbuffers.rs:10-41; like
    the reference, callers must pre-drop null elements). Forward layout:
    root u32 | table | vtable | four [len|elems] vectors, all offsets
    conforming to the spec so any FlatBuffers reader accepts it."""
    for fname, seq in (("ts", ts), ("count", count)):
        if any(v is None for v in seq):
            # a None element would die as an opaque numpy TypeError deep
            # below; name the field and the remedy at the shared layer
            # (the reference drops nulls, flatbuffers.rs:14-30)
            raise ValueError(
                f"histogram field {fname!r} contains null elements; drop "
                "them before serializing (the reference wire format has "
                "no null representation)"
            )
    vals = [
        np.asarray(ts, dtype="<i8"),
        np.asarray(count, dtype="<i8"),
        np.asarray(sums_double, dtype="<f8"),
        np.asarray(sums_long, dtype="<i8"),
    ]
    buf = bytearray(4)  # root uoffset placeholder
    t_pos = len(buf)  # table right after root
    buf += b"\x00" * 4  # i32 soffset placeholder
    field_pos = []
    for _ in vals:
        field_pos.append(len(buf))
        buf += b"\x00" * 4  # u32 uoffset placeholders
    vt_pos = len(buf)
    n_fields = len(vals)
    vt_size = 4 + 2 * n_fields
    table_size = 4 + 4 * n_fields
    buf += struct.pack("<HH", vt_size, table_size)
    for i in range(n_fields):
        buf += struct.pack("<H", 4 + 4 * i)  # field i at table offset 4+4i
    # vectors: u32 length must sit at (pos % 8) == 4 so elements align to 8
    vec_pos = []
    for v in vals:
        while len(buf) % 8 != 4:
            buf += b"\x00"
        vec_pos.append(len(buf))
        buf += struct.pack("<I", len(v))
        buf += v.tobytes()
    struct.pack_into("<I", buf, 0, t_pos)
    struct.pack_into("<i", buf, t_pos, t_pos - vt_pos)  # negative: vtable after
    for fpos, vpos in zip(field_pos, vec_pos):
        struct.pack_into("<I", buf, fpos, vpos - fpos)
    return bytes(buf)


def series_to_flatbuffers(series: dict) -> bytes:
    """One Metric-series dict (rayenc.histograms shape) -> reference
    wire bytes, reproducing the reference's null-dropping
    (/root/reference/src/flatbuffers.rs:14-30)."""
    return histogram_to_flatbuffers(
        series.get("ts", []),
        series.get("count", []),
        [d for d in series.get("sumsDouble", []) if d is not None],
        [d for d in series.get("sumsLong", []) if d is not None],
    )


def decode_flatbuffers_column(
    batch: pa.Table, bin_col: str = "binary_data"
) -> pa.Table:
    """map_batches stage: a reference-opaque block (tag columns + one
    binary_data column) -> the shredded layout (tag columns + four list
    columns). Tag columns pass through untouched."""
    keep = [c for c in batch.column_names if c != bin_col]
    cols: dict = {c: batch[c] for c in keep}
    parsed = [
        histogram_from_flatbuffers(v) if v is not None else None
        for v in batch[bin_col].to_pylist()
    ]
    for name, _ in _FIELDS:
        typ = pa.list_(pa.float64() if name == "sums_double" else pa.int64())
        cols[name] = pa.array(
            [None if p is None else p[name] for p in parsed], type=typ
        )
    return pa.table(cols)


def read_reference_opaque_parquet(
    path: str | list[str], bin_col: str = "binary_data"
) -> "ray.data.Dataset":
    """Read a parquet table written by the reference's js2pq
    --use-flatbuffers (/root/reference/src/bin/js2pq/main.rs:101-118)
    and shred the binary_data column back to typed list columns —
    modulo the reference encode's documented null loss."""
    ds = ray.data.read_parquet(path)
    return ds.map_batches(
        lambda b: decode_flatbuffers_column(b, bin_col), batch_format="pyarrow"
    )
