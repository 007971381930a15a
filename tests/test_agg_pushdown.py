"""Aggregate pushdown over the block table: zone-proven counts and
zones-only min/max — boundary blocks are the only ones that decode."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rayenc import encode_dataset
from rayenc.decode import agg_count, agg_min_max, zone_must_match


def test_zone_must_match_rules():
    z = {"k": {"min": 10, "max": 20, "null_count": 0}}
    assert zone_must_match(z, [("k", ">=", 10)])
    assert zone_must_match(z, [("k", "<=", 20)])
    assert zone_must_match(z, [("k", ">", 9)])
    assert zone_must_match(z, [("k", "<", 21)])
    assert zone_must_match(z, [("k", "!=", 5)])
    assert not zone_must_match(z, [("k", ">=", 11)])
    assert not zone_must_match(z, [("k", "==", 10)])
    assert zone_must_match({"k": {"min": 7, "max": 7, "null_count": 0}}, [("k", "==", 7)])
    assert zone_must_match(
        {"k": {"min": 7, "max": 7, "null_count": 0}}, [("k", "in", [6, 7])]
    )
    # nulls, missing zones, incomparable types never prove
    assert not zone_must_match({"k": {"min": 10, "max": 20, "null_count": 1}}, [("k", ">", 0)])
    assert not zone_must_match({}, [("k", ">", 0)])
    assert not zone_must_match(z, [("k", ">", "str")])
    assert not zone_must_match(z, [("k", "~op~", 1)])


def _blocks(ray_session_tag=None):
    ids = np.arange(1000, dtype=np.int64)
    vals = np.where(ids % 97 == 0, None, ids * 3)
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "v": pa.array(vals, type=pa.int64()),  # has nulls
            "body": pa.array(["x" * 50] * 1000),
        }
    )
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=100, hash_column=None, concurrency=2,
        stats="page", page_rows=25,
    ).materialize()
    return t, blocks


def test_agg_count_matches_exact(ray_session):
    t, blocks = _blocks()
    ids = t["doc_id"].to_numpy()
    v = t["v"].to_numpy(zero_copy_only=False)

    assert agg_count(blocks) == 1000  # unfiltered: pure n_rows sum

    # range straddling block boundaries: interior blocks prove ALL,
    # boundary blocks decode
    assert agg_count(blocks, [("doc_id", ">=", 150), ("doc_id", "<", 730)]) == int(
        ((ids >= 150) & (ids < 730)).sum()
    )
    # nulls never match a comparison (v has nulls -> blocks can't prove)
    got = agg_count(blocks, [("v", ">=", 300)])
    expect = int((~np.isnan(v.astype(float)) & (v.astype(float) >= 300)).sum())
    assert got == expect
    # equality + in + DNF
    assert agg_count(blocks, [("doc_id", "==", 42)]) == 1
    assert agg_count(blocks, [("doc_id", "in", [5, 500, 5000])]) == 2
    assert agg_count(blocks, [[("doc_id", "<", 10)], [("doc_id", ">=", 990)]]) == 20
    # empty result
    assert agg_count(blocks, [("doc_id", ">", 10_000)]) == 0


def test_agg_count_timestamp_filter(ray_session):
    """Temporal columns count on their epoch-int view (the filter and
    zone convention): a late-window predicate proves most blocks out."""
    us = np.arange(0, 2_000_000, 1000, dtype=np.int64)  # 2000 ts-ordered rows
    t = pa.table({"ts": pa.array(us, type=pa.timestamp("us"))})
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=200, hash_column=None, concurrency=2
    ).materialize()
    cut = int(us[1700])
    assert agg_count(blocks, [("ts", ">=", cut)]) == int((us >= cut).sum())
    assert agg_count(blocks, [("ts", "<", int(us[37]))]) == 37


def test_agg_min_max_zones_only(ray_session):
    t, blocks = _blocks()
    r = agg_min_max(blocks, "doc_id")
    assert (r["min"], r["max"], r["null_count"], r["n_rows"]) == (0, 999, 0, 1000)
    rv = agg_min_max(blocks, "v")
    vv = t["v"].to_numpy(zero_copy_only=False).astype(float)
    assert rv["min"] == int(np.nanmin(vv)) and rv["max"] == int(np.nanmax(vv))
    assert rv["null_count"] == int(np.isnan(vv).sum())
    # no zone for the column -> named error, never a silent decode
    none_blocks = encode_dataset(
        rd.from_arrow(t.select(["doc_id"])), block_rows=500, hash_column=None,
        concurrency=1, stats="none",
    ).materialize()
    # the ValueError surfaces wrapped in Ray's task-error envelope
    with pytest.raises(Exception, match="no zone"):
        agg_min_max(none_blocks, "doc_id")
