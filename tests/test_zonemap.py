"""Zone maps + predicate-pushdown decode (reference stats-granularity
axis, /root/reference/src/bin/js2pq/main.rs:18-26, at block level)."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from rayenc.decode import zone_may_match
from rayenc.encode import BlockEncoder, _bound_max_str, column_zone


def test_column_zone_ints_and_nulls():
    z = column_zone(pa.array([5, 1, None, 9], type=pa.int64()))
    assert z == {"min": 1, "max": 9, "null_count": 1, "sum": 15}


def test_column_zone_sum_rules():
    # overflow-risk ints skip the stored sum (agg_sum decodes instead)
    big = pa.array([2**62, 2**62 - 1], type=pa.int64())
    assert "sum" not in column_zone(big)
    # floats store a finite sum, skip NaN/inf (JSON-uncomparable)
    assert column_zone(pa.array([1.5, 2.5]))["sum"] == 4.0
    assert "sum" not in column_zone(pa.array([1.0, float("nan")]))
    assert "sum" not in column_zone(pa.array([1.0, float("inf")]))
    # bools sum to their true-count; all-null numerics store SQL NULL
    assert column_zone(pa.array([True, False, True]))["sum"] == 2
    assert column_zone(pa.array([None, None], type=pa.int64()))["sum"] is None
    # strings and temporals never carry one
    assert "sum" not in column_zone(pa.array(["a", "b"]))
    import pyarrow as _pa

    ts = _pa.array([1_000_000], type=_pa.timestamp("us"))
    assert "sum" not in column_zone(ts)


def test_column_zone_all_null():
    z = column_zone(pa.array([None, None], type=pa.int64()))
    assert z["min"] is None and z["max"] is None and z["null_count"] == 2


def test_column_zone_strings_truncated():
    long = "x" * 200
    z = column_zone(pa.array(["abc", long]))
    assert z["min"] == "abc"
    # truncated max must still upper-bound the true max
    assert z["max"] is not None and z["max"] >= long[:64]
    assert len(z["max"]) <= 64


def test_bound_max_str_increments():
    s = "a" * 100
    b = _bound_max_str(s)
    assert b is not None and b > s


def test_column_zone_timestamp_as_int():
    arr = pa.array([1_000_000, 2_000_000], type=pa.int64()).cast(
        pa.timestamp("us")
    )
    z = column_zone(arr)
    assert z == {"min": 1_000_000, "max": 2_000_000, "null_count": 0}


def test_column_zone_nested_is_none():
    assert column_zone(pa.array([[1, 2]], type=pa.list_(pa.int64()))) is None


@pytest.mark.parametrize(
    "zone,pred,expected",
    [
        ({"x": {"min": 10, "max": 20, "null_count": 0}}, ("x", "<", 5), False),
        ({"x": {"min": 10, "max": 20, "null_count": 0}}, ("x", "<", 15), True),
        ({"x": {"min": 10, "max": 20, "null_count": 0}}, ("x", ">", 20), False),
        ({"x": {"min": 10, "max": 20, "null_count": 0}}, ("x", ">=", 20), True),
        ({"x": {"min": 10, "max": 20, "null_count": 0}}, ("x", "==", 25), False),
        ({"x": {"min": 10, "max": 20, "null_count": 0}}, ("x", "==", 15), True),
        ({"x": {"min": None, "max": None, "null_count": 4}}, ("x", "==", 1), False),
        ({}, ("x", "==", 1), True),  # no stats -> never prune
    ],
)
def test_zone_may_match(zone, pred, expected):
    assert zone_may_match(zone, [pred]) is expected


def test_block_encoder_emits_zonemap():
    enc = BlockEncoder(hash_column=None)
    t = pa.table(
        {
            "a": pa.array([3, 1, 2], type=pa.int64()),
            "s": pa.array(["b", "a", "c"]),
        }
    )
    row = enc.encode_table(t)
    zm = json.loads(row["zonemap"][0].as_py())
    assert zm["a"] == {"min": 1, "max": 3, "null_count": 0, "sum": 6}
    assert zm["s"] == {"min": "a", "max": "c", "null_count": 0}


def test_stats_none_emits_empty_zonemap():
    enc = BlockEncoder(hash_column=None, stats="none")
    t = pa.table({"a": pa.array([1], type=pa.int64())})
    row = enc.encode_table(t)
    assert json.loads(row["zonemap"][0].as_py()) == {}


def test_filtered_decode_roundtrip(ray_session):
    import ray.data as rd

    from rayenc.decode import count_decoded_blocks, decode_dataset
    from rayenc.encode import encode_dataset

    t = pa.table(
        {
            "k": pa.array(range(1000), type=pa.int64()),
            "v": pa.array([f"val{i}" for i in range(1000)]),
        }
    )
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=100, hash_column=None, concurrency=2
    ).materialize()
    pred = [("k", ">=", 900)]
    counts = count_decoded_blocks(blocks, pred)
    assert counts["decoded_blocks"] < counts["total_blocks"]
    out = pa.concat_tables(
        decode_dataset(blocks, filter=pred, concurrency=2).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).sort_by("k")
    assert out.equals(t.filter(pa.compute.greater_equal(t["k"], 900)))


def test_filtered_decode_with_projection_excluding_filter_col(ray_session):
    """filter on a column not in the projection: it decodes for the
    filter then drops from the output."""
    import ray.data as rd

    from rayenc.decode import decode_dataset
    from rayenc.encode import encode_dataset

    t = pa.table(
        {
            "k": pa.array(range(200), type=pa.int64()),
            "v": pa.array([f"v{i}" for i in range(200)]),
        }
    )
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=50, hash_column=None, concurrency=1
    ).materialize()
    out = pa.concat_tables(
        decode_dataset(
            blocks, columns=["v"], filter=[("k", ">=", 150)], concurrency=1
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert out.column_names == ["v"]
    assert sorted(out["v"].to_pylist()) == sorted(f"v{i}" for i in range(150, 200))


def test_take_rows_rejects_unordered_blocks(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from rayenc.decode import take_rows
    from rayenc.encode import encode_dataset

    t = pa.table({"k": pa.array(range(300), type=pa.int64())})
    blocks = encode_dataset(
        rd.from_arrow(t).repartition(3), block_rows=100, hash_column=None, concurrency=1
    ).materialize()
    # plain streaming encode records no row_start (its blocks have no
    # meaningful total order) -> the named random-access refusal
    with _pytest.raises(ValueError, match="row_start"):
        take_rows(blocks, [0])


def test_verify_check_zones_clean_and_corrupt(ray_session):
    """Paranoid stats audit: a clean encode passes check_zones; a block
    whose stored zone lies about max (the silent-row-loss class: filtered
    decode would prune rows the block actually holds) or whose bloom is
    zeroed (false negatives on every probe) is reported — failures the
    content hash can never see."""
    import json

    import ray.data as rd

    from rayenc.encode import BlockEncoder
    from rayenc.verify import verify_blocks

    t = pa.table(
        {
            "a": pa.array(list(range(100)), type=pa.int64()),
            "content": pa.array([f"row {i}" for i in range(100)]),
        }
    )
    blocks = BlockEncoder().encode_table(t)
    v = verify_blocks(rd.from_arrow(blocks), check_zones=True)
    assert v["ok"] and v["zone_mismatches"] == 0

    zm = json.loads(blocks["zonemap"][0].as_py())
    zm["a"]["max"] = 10  # lie: rows 11..99 would be pruned by a > filter
    zm["__bloom__"]["a"] = "00" * len(zm["__bloom__"]["a"][::2])  # all-zero filter
    corrupt = blocks.set_column(
        blocks.column_names.index("zonemap"),
        "zonemap",
        pa.array([json.dumps(zm)], type=pa.string()),
    )
    v2 = verify_blocks(rd.from_arrow(corrupt), check_zones=True)
    assert not v2["ok"]
    assert v2["zone_mismatches"] >= 2  # the zone lie AND the dead bloom
    assert v2["bad_blocks"] == 0  # content hash is blind to both

def test_verify_check_zones_catches_timestamp_bloom_corruption(ray_session):
    """Blooms over timestamp/date columns are built on epoch ints and
    probed by filters with epoch ints — the audit must probe with the
    same normalization, or a dead timestamp bloom passes vacuously
    (bloom_may_contain keeps any non-int/str probe value)."""
    import json

    import ray.data as rd

    from rayenc.encode import BlockEncoder
    from rayenc.verify import verify_blocks

    ts = pa.array(
        [1_000_000 + i * 60_000_000 for i in range(100)], type=pa.int64()
    ).cast(pa.timestamp("us"))
    t = pa.table({"ts": ts, "content": pa.array([f"row {i}" for i in range(100)])})
    blocks = BlockEncoder().encode_table(t)
    zm = json.loads(blocks["zonemap"][0].as_py())
    assert "ts" in zm.get("__bloom__", {}), "timestamp column must carry a bloom"
    v = verify_blocks(rd.from_arrow(blocks), check_zones=True)
    assert v["ok"] and v["zone_mismatches"] == 0

    zm["__bloom__"]["ts"] = "00" * (len(zm["__bloom__"]["ts"]) // 2)
    corrupt = blocks.set_column(
        blocks.column_names.index("zonemap"),
        "zonemap",
        pa.array([json.dumps(zm)], type=pa.string()),
    )
    v2 = verify_blocks(rd.from_arrow(corrupt), check_zones=True)
    assert v2["zone_mismatches"] >= 1 and not v2["ok"]

def test_filtered_decode_on_temporal_columns(ray_session):
    """Predicates on date32/time/duration columns: zone pruning stores
    epoch ints, but the exact row filter used to crash on date32 (no
    direct int64 cast) and on time/duration (no compare kernel against
    int64 at all). The whole filtered-decode path must work."""
    import ray.data as rd

    from rayenc.decode import decode_dataset
    from rayenc.encode import BlockEncoder

    t = pa.table(
        {
            "d32": pa.array([18000 + i for i in range(100)], type=pa.date32()),
            "t64": pa.array(
                [1_000_000 * i for i in range(100)], type=pa.time64("us")
            ),
            "dur": pa.array([10 * i for i in range(100)], type=pa.duration("ms")),
            "content": pa.array([f"row {i}" for i in range(100)]),
        }
    )
    blocks = rd.from_arrow(BlockEncoder().encode_table(t))
    got = decode_dataset(blocks, filter=[("d32", ">=", 18090)]).to_pandas()
    assert len(got) == 10
    got2 = decode_dataset(blocks, filter=[("t64", "<", 5_000_000)]).to_pandas()
    assert len(got2) == 5
    got3 = decode_dataset(blocks, filter=[("dur", "==", 500)]).to_pandas()
    assert len(got3) == 1 and got3["content"][0] == "row 50"
