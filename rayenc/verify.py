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


def _bloom_probe_sample(arr: pa.Array) -> list:
    """~256 spread non-null values of `arr`, normalized the way the
    filter build normalized them (bloom._column_hashes): timestamp/date
    columns become their epoch ints — zone_may_match probes those blooms
    with the predicate's epoch-int, so auditing with datetime objects
    would vacuously pass (bloom_may_contain keeps non-int/str types)."""
    import numpy as np

    vals = arr.drop_null()
    if len(vals) == 0:
        return []
    t = vals.type
    if pa.types.is_date(t) or pa.types.is_timestamp(t):
        from .codecs.util import epoch_int_view

        vals = epoch_int_view(vals)
    step = max(1, len(vals) // 256)
    # take() the spread indices: a full to_pylist would materialize every
    # value as a Python object just to keep 1 in `step`
    return vals.take(np.arange(0, len(vals), step)).to_pylist()


def _zone_mismatches(
    batch: pa.Table,
    i: int,
    names: list[str],
    predecoded: dict[str, pa.Array] | None = None,
) -> int:
    """Paranoid stats audit for one block row: re-derive every stored
    column zone from the DECODED data and recompute a Bloom probe sample
    — a wrong zone or a bloom false negative silently drops rows on
    every future filtered decode, which no hash check can see (the hash
    only proves the unfiltered path). Returns the mismatch count.

    `predecoded` carries columns the caller already decoded (the chain-
    hash check decodes the hash column — usually the block's largest
    blob — so the audit must not pay that decode twice)."""
    import json as _json

    from .bloom import bloom_may_contain
    from .encode import column_hll, column_zone

    zm = _json.loads(batch["zonemap"][i].as_py() or "{}")
    bad = 0
    decoded: dict[str, pa.Array] = dict(predecoded or {})
    dec = BlockDecoder()

    def col(name: str) -> pa.Array:
        if name not in decoded:
            blob = memoryview(batch[f"col_{name}"][i].as_buffer())
            decoded[name] = dec.decode_block_row([name], [blob], "", 0)[name]
        return decoded[name]

    for name in names:
        stored = zm.get(name)
        if stored is None:
            continue
        want = column_zone(col(name))
        # "sum" audited only when stored (legacy blocks predate it); a
        # corrupt stored sum silently skews agg_sum like a zone lie
        keys = (
            ("min", "max", "null_count")
            + (("sum",) if "sum" in stored else ())
            + (("nan",) if "nan" in stored else ())
        )
        if want is None or any(want.get(k) != stored.get(k) for k in keys):
            bad += 1
    for name, bf in (zm.get("__bloom__") or {}).items():
        if name not in names:
            bad += 1  # bloom for a column the block doesn't carry
            continue
        # no-false-negative audit on a bounded sample (full scan would be
        # a per-value python probe; 256 spread values catch systematic
        # hash drift, which is the realistic failure mode)
        for v in _bloom_probe_sample(col(name)):
            if not bloom_may_contain(bf, v):
                bad += 1
                break
    for name, nf in (zm.get("__ngram__") or {}).items():
        # the n-gram filter is a pure function of the column's bytes
        # (fixed splitmix64 seeds), so the audit is exact: re-derive and
        # compare. A corrupt filter silently drops rows on 'contains'
        # decodes — the same invisible-to-the-hash class as a zone lie.
        from .bloom import ngram_bloom_build

        if name not in names:
            bad += 1
            continue
        n = nf.get("n", 3) if isinstance(nf, dict) else 3
        if ngram_bloom_build(col(name), n) != nf:
            bad += 1
    for name, s in (zm.get("__kll__") or {}).items():
        # the KLL compaction seed is a CRC of the column content, so the
        # sketch is a pure function of the decoded values: re-derive and
        # compare the JSON byte-exact (a corrupt sketch silently skews
        # agg_approx_quantiles, invisible to the content hash)
        from .encode import column_kll

        if name not in names:
            bad += 1
            continue
        k = _json.loads(s).get("k", 128)
        if column_kll(col(name), k) != s:
            bad += 1
    for name, h in (zm.get("__hll__") or {}).items():
        # HLL registers are a pure function of the column's content (fixed
        # hash seed), so the audit is exact: re-derive and compare bytes.
        # A corrupt sketch silently skews agg_approx_distinct — like a
        # zone lie, invisible to the content hash.
        import base64 as _b64

        if name not in names:
            bad += 1
            continue
        regs = _b64.b64decode(h)
        want_h = column_hll(col(name), (len(regs)).bit_length() - 1)
        if want_h is None or _b64.b64decode(want_h) != regs:
            bad += 1
    return bad


def verify_blocks(
    blocks: "ray.data.Dataset",
    hash_column: str = "content",
    check_zones: bool = False,
) -> dict:
    """Decode every block, recompute the content chain hash, compare.

    Distributed map over block rows; the driver only sees per-block
    booleans (the streaming analog of the reference's positional
    round-trip asserts, /root/reference/src/vec_pq_reader.rs:828-831).

    `check_zones=True` additionally audits the pruning metadata: every
    stored zone's min/max/null_count is re-derived from the decoded
    columns and each Bloom filter is probed with a sample of its own
    values — corrupt stats silently drop rows on FILTERED decodes, a
    failure class the content hash cannot observe."""

    def check(batch: pa.Table) -> pa.Table:
        # hash_column=None: the table was encoded without a chain-hash
        # column — the content check has nothing to compare, but the
        # zone/bloom/HLL audit still runs (that metadata is per-column)
        dec = BlockDecoder(columns=[hash_column]) if hash_column else None
        all_names = [c[4:] for c in batch.column_names if c.startswith("col_")]
        ok = []
        rows = []
        zone_bad = []
        for i in range(batch.num_rows):
            arr = None
            if hash_column is None:
                ok.append(True)
                rows.append(int(batch["n_rows"][i].as_py()))
            else:
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
            zb = 0
            if check_zones and "zonemap" in batch.column_names:
                try:
                    pre = {hash_column: arr} if arr is not None else None
                    zb = _zone_mismatches(batch, i, all_names, pre)
                except Exception:
                    zb = 1  # an unparseable zonemap is itself a mismatch
            zone_bad.append(zb)
        return pa.table(
            {
                "block_id": batch["block_id"],
                "ok": pa.array(ok, type=pa.bool_()),
                "rows": pa.array(rows, type=pa.int64()),
                "zone_bad": pa.array(zone_bad, type=pa.int64()),
            }
        )

    res = blocks.map_batches(check, batch_format="pyarrow", batch_size=8)
    agg = res.map_batches(
        lambda t: pa.table(
            {
                "blocks": [t.num_rows],
                "bad": [t.num_rows - int(pa.compute.sum(t["ok"]).as_py() or 0)],
                "rows": [int(pa.compute.sum(t["rows"]).as_py() or 0)],
                "zone_bad": [int(pa.compute.sum(t["zone_bad"]).as_py() or 0)],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    out = {
        "blocks": int(agg["blocks"].sum()),
        "rows": int(agg["rows"].sum()),
        "bad_blocks": int(agg["bad"].sum()),
        "ok": bool(agg["bad"].sum() == 0),
    }
    if check_zones:
        out["zone_mismatches"] = int(agg["zone_bad"].sum())
        out["ok"] = out["ok"] and out["zone_mismatches"] == 0
    return out


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
