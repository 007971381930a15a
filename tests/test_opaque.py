"""Opaque single-column payload layout: lossless pack/unpack round-trip
(the reference's FlatBuffers layout WITHOUT its null-dropping,
/root/reference/src/flatbuffers.rs:14-30)."""

from __future__ import annotations

import pyarrow as pa

from rayenc.opaque import pack_opaque, unpack_opaque

T = pa.table(
    {
        "name": pa.array(["a", None, "c"]),
        "value": pa.array([1.5, 2.0, None], type=pa.float64()),
        "counts": pa.array([[1, 2], None, []], type=pa.list_(pa.int64())),
        "key": pa.array([10, 20, 30], type=pa.int64()),
    }
)


def test_pack_unpack_roundtrip_preserves_nulls():
    packed = pack_opaque(T, columns=["name", "value", "counts"], keep=["key"])
    assert packed.column_names == ["key", "record"]
    schema = pa.schema(
        [
            ("name", pa.string()),
            ("value", pa.float64()),
            ("counts", pa.list_(pa.int64())),
        ]
    )
    out = unpack_opaque(packed, schema, keep=["key"])
    assert out["key"].to_pylist() == [10, 20, 30]
    for c in ("name", "value", "counts"):
        assert out[c].to_pylist() == T[c].to_pylist()


def test_opaque_binary_column_encodes_through_blocks():
    from rayenc.blocks import decode_column, encode_column

    packed = pack_opaque(T, columns=["name", "value"])
    blob = encode_column(packed["record"].combine_chunks(), "plain")
    assert decode_column(blob).equals(packed["record"].combine_chunks())


def test_float_exactness():
    t = pa.table({"x": pa.array([0.1 + 0.2, 1e-300, -0.0], type=pa.float64())})
    packed = pack_opaque(t)
    out = unpack_opaque(packed, pa.schema([("x", pa.float64())]))
    assert out["x"].to_pylist() == t["x"].to_pylist()


def test_histogram_opaque_layout_roundtrip(tmp_path):
    """js2pq opaque layout: shredded table -> metric + binary record
    column -> unpack == shredded (the reference's FlatBuffers axis,
    lossless)."""
    from rayenc.histograms import (
        gen_histograms,
        metric_tag_keys,
        pivot_metric,
        read_opaque_parquet,
        write_opaque_parquet,
    )

    m = gen_histograms(n_series=20, seed=5, metric="m0")
    keys = sorted(metric_tag_keys(m))
    table = pivot_metric(m, keys)
    p = str(tmp_path / "opaque.parquet")
    write_opaque_parquet(table, p)
    import pyarrow.parquet as pq

    packed = pq.read_table(p)
    assert set(packed.column_names) == {"metric", "record"}
    schema = pa.schema([f for f in table.schema if f.name != "metric"])
    back = read_opaque_parquet(p, schema)
    for c in table.column_names:
        assert back[c].to_pylist() == table[c].to_pylist(), c
