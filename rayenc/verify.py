"""Verification: sha256-bit-identical decode + size vs reference Parquet.

Two obligations from BASELINE.json:
1. decoded output reproduces every content value sha256-bit-identical —
   checked streaming: each block stores the chain hash of its rows'
   content digests at encode time; verify decodes and recomputes (no
   join, no driver materialization);
2. total compressed size <= the reference Parquet encoder's output —
   the reference writer is reproduced with pyarrow
   (zstd level 3, dictionary on, format v2.6), the Python twin of
   /root/reference/src/bin/js2pq/main.rs:91-100,98.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from .decode import BlockDecoder
from .rowhash import chain_hash


def verify_blocks(blocks: "ray.data.Dataset", hash_column: str = "content") -> dict:
    """Decode every block, recompute the content chain hash, compare.

    Distributed map over block rows; the driver only sees per-block
    booleans (the streaming analog of the reference's positional
    round-trip asserts, /root/reference/src/vec_pq_reader.rs:828-831).
    """

    def check(batch: pa.Table) -> pa.Table:
        dec = BlockDecoder(columns=[hash_column])
        ok = []
        rows = []
        for i in range(batch.num_rows):
            try:
                blob = memoryview(batch[f"col_{hash_column}"][i].as_buffer())
                arr = dec.decode_block_row([hash_column], [blob], "", 0)[hash_column]
                ok.append(chain_hash(arr) == batch["content_sha256"][i].as_py())
                rows.append(len(arr))
            except Exception:
                # a corrupted blob is a VERIFICATION FAILURE, not a job
                # crash: report the block and keep checking the rest
                ok.append(False)
                rows.append(0)
        return pa.table(
            {
                "block_id": batch["block_id"],
                "ok": pa.array(ok, type=pa.bool_()),
                "rows": pa.array(rows, type=pa.int64()),
            }
        )

    res = blocks.map_batches(check, batch_format="pyarrow", batch_size=8)
    agg = res.map_batches(
        lambda t: pa.table(
            {
                "blocks": [t.num_rows],
                "bad": [t.num_rows - int(pa.compute.sum(t["ok"]).as_py() or 0)],
                "rows": [int(pa.compute.sum(t["rows"]).as_py() or 0)],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return {
        "blocks": int(agg["blocks"].sum()),
        "rows": int(agg["rows"].sum()),
        "bad_blocks": int(agg["bad"].sum()),
        "ok": bool(agg["bad"].sum() == 0),
    }


def reference_parquet_bytes(table: pa.Table) -> int:
    """Size of the reference encoder's output on this table: pyarrow
    writer with ZSTD(3) + dictionary + format 2.6 — the faithful twin of
    the reference's writer properties
    (/root/reference/src/bin/js2pq/main.rs:85-118)."""
    sink = io.BytesIO()
    pq.write_table(
        table,
        sink,
        compression="zstd",
        compression_level=3,
        use_dictionary=True,
        version="2.6",
    )
    return sink.getbuffer().nbytes


def tables_bit_identical(a: pa.Table, b: pa.Table) -> bool:
    """Small-scale helper for tests: positional, null-aware equality."""
    if a.schema.names != b.schema.names or a.num_rows != b.num_rows:
        return False
    a = a.combine_chunks()
    b = b.combine_chunks()
    return all(a[c].equals(b[c]) for c in a.schema.names)
