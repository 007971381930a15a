"""Opaque single-column row-payload layout (user-facing schema option).

The reference offers a layout where the whole nested record is packed
into ONE opaque binary column via FlatBuffers
(/root/reference/src/schema.rs:36-38, /root/reference/src/flatbuffers.rs:10-45)
— at the cost of silently dropping nulls (its `unwrap_or_default`).
This module is that layout as a first-class option, minus the data
loss: rows serialize to msgpack (binary, deterministic, preserves
None/int/float/str/bytes/lists exactly), so pack -> unpack is
value-identical including nulls — the property the reference's
empty-vs-null tests demand but its opaque path breaks.

Both directions are map_batches-able. The per-row serialization loop
runs in msgpack's C extension; this is a compatibility layout for
record-shaped payloads, not the engine's columnar hot path (the block
container in rayenc.blocks is the performant representation).
"""

from __future__ import annotations

import pyarrow as pa

try:  # ships with ray; guard per the import-try rule
    import msgpack

    _HAS_MSGPACK = True
except Exception:  # pragma: no cover
    _HAS_MSGPACK = False


def _require_msgpack() -> None:
    if not _HAS_MSGPACK:  # pragma: no cover
        # no silent JSON fallback: json cannot represent bytes values or
        # non-string map keys, so it would break this module's documented
        # lossless contract — fail loudly instead
        raise ImportError(
            "rayenc.opaque requires msgpack (ships with ray); the JSON "
            "fallback was removed because it cannot losslessly represent "
            "bytes values or int/float map keys"
        )


def _packb(obj) -> bytes:
    _require_msgpack()
    return msgpack.packb(obj, use_bin_type=True)


def _unpackb(b: bytes):
    _require_msgpack()
    return msgpack.unpackb(b, raw=False, strict_map_key=False)


def pack_opaque(
    batch: pa.Table,
    columns: list[str] | None = None,
    out_col: str = "record",
    keep: list[str] | None = None,
) -> pa.Table:
    """Serialize each row's `columns` into one binary value. `keep` lists
    pass-through columns (e.g. a key) retained alongside the payload."""
    cols = columns or batch.column_names
    rows = batch.select(cols).to_pylist()
    payload = pa.array([_packb(r) for r in rows], type=pa.binary())
    out = {}
    for k in keep or []:
        out[k] = batch[k]
    out[out_col] = payload
    return pa.table(out)


def unpack_opaque(
    batch: pa.Table,
    schema: pa.Schema,
    in_col: str = "record",
    keep: list[str] | None = None,
) -> pa.Table:
    """Inverse of pack_opaque: rebuild typed columns per `schema`."""
    rows = [_unpackb(v) for v in batch[in_col].to_pylist()]
    out = {}
    for k in keep or []:
        out[k] = batch[k]
    for field in schema:
        out[field.name] = pa.array(
            [r.get(field.name) for r in rows], type=field.type
        )
    return pa.table(out)
