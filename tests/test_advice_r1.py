"""Regression tests for the round-1 ADVICE findings.

Each test reproduces the exact failure named in ADVICE.md and asserts
the fix: all-null fixed_size_list decode, duplicate-basename partition
ids, block_id collisions without a hash column, empty-batch decode.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from rayenc.blocks import decode_column, encode_column


def test_all_null_fixed_size_list_roundtrip():
    # ADVICE high: encode succeeded but decode raised ArrowIndexError
    arr = pa.array([None] * 3, type=pa.list_(pa.float32(), 2))
    blob = encode_column(arr, "plain")
    out = decode_column(blob)
    assert out.equals(arr)


def test_all_null_list_and_large_list_roundtrip():
    for t in (pa.list_(pa.int64()), pa.large_list(pa.string())):
        arr = pa.array([None, None], type=t)
        out = decode_column(encode_column(arr, "plain"))
        assert out.equals(arr)


def test_mixed_null_fixed_size_list_roundtrip():
    arr = pa.array([[1.0, 2.0], None, [3.0, 4.0], None], type=pa.list_(pa.float64(), 2))
    out = decode_column(encode_column(arr, "plain"))
    assert out.equals(arr)


def test_plan_partitions_distinct_ids_for_same_basename(tmp_path):
    # ADVICE medium: part-00000.parquet in two dirs must not collide
    t = pa.table({"x": pa.array(range(10), type=pa.int64())})
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(t, d / "part-00000.parquet")
    from rayenc.jobs import plan_partitions

    parts = plan_partitions(
        [str(tmp_path / "a" / "part-00000.parquet"), str(tmp_path / "b" / "part-00000.parquet")]
    )
    ids = [p["partition_id"] for p in parts]
    assert len(ids) == len(set(ids)) == 2


def test_block_id_unique_without_hash_column():
    # ADVICE low: same codec + row count used to share a 64-byte prefix
    from rayenc.encode import BlockEncoder

    enc = BlockEncoder(hash_column=None, forced_codecs={"v": "plain"})
    t1 = pa.table({"v": pa.array(list(range(100)), type=pa.int64())})
    t2 = pa.table({"v": pa.array(list(range(100, 200)), type=pa.int64())})
    b1 = enc.encode_table(t1)["block_id"][0].as_py()
    b2 = enc.encode_table(t2)["block_id"][0].as_py()
    assert b1 != b2


def test_block_decoder_empty_batch():
    # ADVICE low: concat_tables([]) raised on a zero-row batch
    from rayenc.decode import BlockDecoder

    dec = BlockDecoder()
    empty = pa.table(
        {
            "block_id": pa.array([], type=pa.string()),
            "col_x": pa.array([], type=pa.binary()),
        }
    )
    out = dec(empty)
    assert out.num_rows == 0
