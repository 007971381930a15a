"""Regression tests for the round-2 self-review findings (timezone-safe
row-group stats, empty-partition ordered encode, composite codec spec
caching, empty take_rows, ordered+filtered decode)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_rg_zone_is_timezone_safe(tmp_path, monkeypatch):
    """Plan-time timestamp bounds must be unit-correct and UTC-stable:
    datetime.timestamp() on a naive stat shifted them by the machine's
    UTC offset (reproduced under TZ=America/New_York)."""
    import time

    t = pa.table(
        {
            "ts": pa.array([1_706_400_000_000_000, 1_706_500_000_000_000], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "v": pa.array([1, 2], type=pa.int64()),
        }
    )
    p = tmp_path / "t.parquet"
    pq.write_table(t, p, row_group_size=2)
    monkeypatch.setenv("TZ", "America/New_York")
    time.tzset()
    try:
        from rayenc.jobs import plan_partitions

        # predicate exactly at the true min: the row-group must be KEPT
        kept = plan_partitions([str(p)], filter=[("ts", ">=", 1_706_400_000_000_000)])
        assert len(kept) == 1
        # predicate above the true max: pruned
        pruned = plan_partitions([str(p)], filter=[("ts", ">", 1_706_500_000_000_000)])
        assert len(pruned) == 0
    finally:
        monkeypatch.delenv("TZ")
        time.tzset()


def test_ordered_encode_handles_empty_shard(ray_session, tmp_path):
    import ray.data as rd  # noqa: F401

    from rayenc.jobs import encode_dataset_ordered

    empty = pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.string())})
    full = pa.table({"a": pa.array([1, 2], type=pa.int64()), "b": pa.array(["x", "y"])})
    pq.write_table(empty, tmp_path / "part-0.parquet")
    pq.write_table(full, tmp_path / "part-1.parquet")
    blocks = encode_dataset_ordered(
        str(tmp_path), hash_column=None, concurrency=(1, 2)
    ).materialize()
    rows = sum(r["n_rows"] for r in blocks.select_columns(["n_rows"]).take_all())
    assert rows == 2


def test_composite_codec_choice_is_cacheable():
    """The selector returns a struct:{json} spec so later blocks encode
    with ZERO trials (a cached literal 'auto' re-ran selection)."""
    from rayenc.blocks import decode_column, encode_column
    from rayenc.selector import encode_column_auto

    t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    arr = pa.array(
        [{"a": i % 5, "b": f"s{i % 3}"} for i in range(500)], type=t
    )
    blob, choice = encode_column_auto(arr)
    assert choice.codec.startswith("struct:{"), choice.codec
    # the cached spec string re-encodes directly and round-trips
    blob2 = encode_column(arr, choice.codec)
    assert decode_column(blob2).equals(arr)


def test_map_codec_choice_is_cacheable():
    from rayenc.blocks import decode_column, encode_column
    from rayenc.selector import encode_column_auto

    t = pa.map_(pa.string(), pa.int64())
    arr = pa.array([[("k", 1)], [("a", 2), ("b", 3)], None], type=t)
    blob, choice = encode_column_auto(arr)
    assert choice.codec.startswith("struct:{"), choice.codec
    out = decode_column(encode_column(arr, choice.codec))
    assert out.to_pylist() == arr.to_pylist()


def test_take_rows_empty_indices(ray_session, corpus_parquet):
    import ray.data as rd  # noqa: F401

    from rayenc.decode import take_rows
    from rayenc.jobs import encode_dataset_ordered

    blocks = encode_dataset_ordered(
        corpus_parquet, columns=["repo", "path"], block_rows=1000,
        hash_column=None, concurrency=(1, 2),
    ).materialize()
    out = take_rows(blocks, [])
    assert out.num_rows == 0
    assert set(out.column_names) == {"repo", "path"}


def test_decode_ordered_applies_filter(ray_session, corpus_parquet, tmp_path):
    import ray.data as rd

    from rayenc.decode import decode_ordered
    from rayenc.jobs import run_encode_job

    out = str(tmp_path / "job")
    run_encode_job(corpus_parquet, out, block_rows=700, max_partition_bytes=1 << 20, concurrency=2)
    blocks = rd.read_parquet(f"{out}/blocks")
    src = pq.read_table(corpus_parquet)
    cut = sorted(set(src["repo"].to_pylist()))[0]
    dec = decode_ordered(blocks, filter=[("repo", "==", cut)]).to_pandas()
    want = src.filter(pa.compute.equal(src["repo"], cut))
    assert len(dec) == want.num_rows
    assert (dec["repo"] == cut).all()
    # order preserved among surviving rows
    assert dec["path"].tolist() == want["path"].to_pylist()
