"""Filtered-decode predicate extensions: `in` / `!=` ops and DNF
(OR-of-ANDs) filters across all three pruning stages — block zones +
Blooms, page zones, and the exact row filter."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from rayenc import decode_dataset, encode_dataset
from rayenc.decode import (
    count_decoded_blocks,
    filter_table,
    filter_table_dnf,
    normalize_dnf,
    zone_may_match,
    zone_may_match_any,
)


def _table(n=400, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(rng.choice(["py", "go", "rs", "js"], size=n)),
            "n_chars": pa.array(rng.integers(10, 5000, size=n).astype(np.int64)),
        }
    )


def test_normalize_dnf_shapes():
    conj = [("a", "==", 1), ("b", "<", 2)]
    assert normalize_dnf(conj) == [conj]
    dnf = [[("a", "==", 1)], [("b", "<", 2), ("c", ">", 3)]]
    assert normalize_dnf(dnf) == dnf
    assert normalize_dnf([]) == []
    assert normalize_dnf(None) == []


def test_zone_in_and_ne_ops():
    zone = {"x": {"min": 10, "max": 20}}
    assert zone_may_match(zone, [("x", "in", [5, 15])])
    assert not zone_may_match(zone, [("x", "in", [5, 30])])
    assert not zone_may_match(zone, [("x", "in", [])])  # empty set: nothing
    assert zone_may_match(zone, [("x", "!=", 15)])
    const = {"x": {"min": 7, "max": 7}}
    assert not zone_may_match(const, [("x", "!=", 7)])  # constant == val
    assert zone_may_match(const, [("x", "!=", 8)])
    # DNF: survives if ANY disjunct may match
    assert zone_may_match_any(zone, [[("x", "==", 99)], [("x", "<=", 12)]])
    assert not zone_may_match_any(zone, [[("x", "==", 99)], [("x", ">", 25)]])


def test_filter_table_in_ne_and_dnf():
    t = _table()
    got = filter_table(t, [("lang", "in", ["py", "rs"]), ("n_chars", ">", 1000)])
    ref = t.filter(
        pc.and_(
            pc.is_in(t["lang"], value_set=pa.array(["py", "rs"])),
            pc.greater(t["n_chars"], 1000),
        )
    )
    assert got.equals(ref)
    got = filter_table(t, [("lang", "!=", "py")])
    assert got.equals(t.filter(pc.not_equal(t["lang"], "py")))
    # DNF: (lang == py AND n_chars > 4000) OR (doc_id < 5)
    dnf = [[("lang", "==", "py"), ("n_chars", ">", 4000)], [("doc_id", "<", 5)]]
    got = filter_table_dnf(t, dnf)
    ref_mask = pc.or_(
        pc.and_(pc.equal(t["lang"], "py"), pc.greater(t["n_chars"], 4000)),
        pc.less(t["doc_id"], 5),
    )
    assert got.equals(t.filter(ref_mask))


def test_decode_dataset_dnf_end_to_end(ray_session):
    t = _table()
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=50, stats="block", concurrency=2
    ).materialize()
    dnf = [
        [("doc_id", "<", 30), ("lang", "in", ["py", "go"])],
        [("n_chars", ">=", 4900)],
    ]
    out = pa.concat_tables(
        decode_dataset(blocks, filter=dnf, concurrency=2).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    m1 = pc.and_(
        pc.less(t["doc_id"], 30), pc.is_in(t["lang"], value_set=pa.array(["py", "go"]))
    )
    ref = t.filter(pc.or_(m1, pc.greater_equal(t["n_chars"], 4900))).sort_by("doc_id")
    assert out.select(ref.column_names).equals(ref)
    assert len(ref) > 0  # the fixture actually exercises both disjuncts

    # block pruning: a one-sided doc_id disjunct prunes blocks (sorted col)
    res = count_decoded_blocks(blocks, [[("doc_id", "<", 30)]])
    assert res["decoded_blocks"] < res["total_blocks"]
    # and an `in` probe against the Bloom prunes too
    res = count_decoded_blocks(blocks, [("doc_id", "in", [7, 12])])
    assert res["decoded_blocks"] < res["total_blocks"]


def test_decode_dataset_in_filter_with_projection(ray_session):
    t = _table()
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=64, stats="page", page_rows=16, concurrency=2
    ).materialize()
    out = pa.concat_tables(
        decode_dataset(
            blocks,
            columns=["doc_id"],
            filter=[("doc_id", "in", [3, 333, 999999])],
            concurrency=2,
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("doc_id")
    assert out["doc_id"].to_pylist() == [3, 333]
    assert out.column_names == ["doc_id"]


def test_validation_rejects_bad_in_and_encode_dnf(ray_session, tmp_path):
    t = _table(50)
    blocks = encode_dataset(rd.from_arrow(t), block_rows=25, concurrency=2).materialize()
    with pytest.raises(ValueError, match="'in' predicate"):
        decode_dataset(blocks, filter=[("lang", "in", "py")]).materialize()
    import pyarrow.parquet as pq

    from rayenc.jobs import run_encode_job

    src = str(tmp_path / "t.parquet")
    pq.write_table(t, src)
    with pytest.raises(ValueError, match="flat"):
        run_encode_job(
            src,
            str(tmp_path / "job"),
            block_rows=25,
            concurrency=2,
            filter=[[("doc_id", "<", 10)], [("lang", "==", "py")]],
        )


def test_zone_prefix_prune_and_keep():
    from rayenc.decode import zone_must_match

    # range entirely below the prefix
    assert not zone_may_match({"path": {"min": "a/x", "max": "b/z"}}, [("path", "prefix", "src/")])
    # range entirely above: lo's first len(p) chars already exceed it
    assert not zone_may_match({"path": {"min": "tests/a", "max": "zz"}}, [("path", "prefix", "src/")])
    # straddling range survives
    assert zone_may_match({"path": {"min": "lib/a", "max": "src/zz"}}, [("path", "prefix", "src/")])
    # truncated-lower-bound semantics: stored lo "sr" (prefix cut of
    # "src/...") must NOT prune a "src/" probe
    assert zone_may_match({"path": {"min": "sr", "max": "t"}}, [("path", "prefix", "src/")])
    # all-null block prunes
    assert not zone_may_match({"path": {"min": None, "max": None}}, [("path", "prefix", "s")])
    # missing zone never prunes
    assert zone_may_match({}, [("path", "prefix", "s")])
    # must-match proof: both bounds inside the prefix range
    z = {"path": {"min": "src/a", "max": "src/zz", "null_count": 0}}
    assert zone_must_match(z, [("path", "prefix", "src/")])
    assert not zone_must_match(
        {"path": {"min": "src/a", "max": "tests/b", "null_count": 0}},
        [("path", "prefix", "src/")],
    )
    # nulls break the proof (a null row fails every predicate)
    assert not zone_must_match(
        {"path": {"min": "src/a", "max": "src/z", "null_count": 3}},
        [("path", "prefix", "src/")],
    )


def test_filter_table_prefix():
    t = pa.table({"path": pa.array(["src/a.py", "src/b.rs", "tests/a.py", None, "README"])})
    out = filter_table(t, [("path", "prefix", "src/")])
    assert out["path"].to_pylist() == ["src/a.py", "src/b.rs"]
    # DNF with a prefix disjunct
    out2 = filter_table_dnf(t, [[("path", "prefix", "tests/")], [("path", "==", "README")]])
    assert sorted(out2["path"].to_pylist()) == ["README", "tests/a.py"]


def test_decode_dataset_prefix_end_to_end(ray_session):
    """Sorted path column -> blocks carry disjoint string zones -> a
    prefix filter must prune blocks AND return exactly the matching
    rows; agg_count over the same filter folds interior blocks from
    metadata."""
    from rayenc.decode import agg_count

    n = 600
    paths = pa.array(
        sorted(
            [f"src/m{i:03d}.py" for i in range(n // 3)]
            + [f"lib/l{i:03d}.rs" for i in range(n // 3)]
            + [f"tests/t{i:03d}.py" for i in range(n // 3)]
        )
    )
    t = pa.table({"path": paths, "sz": pa.array(np.arange(n, dtype=np.int64))})
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=50, hash_column=None, concurrency=2
    ).materialize()
    pred = [("path", "prefix", "src/")]
    counts = count_decoded_blocks(blocks, pred)
    assert counts["decoded_blocks"] < counts["total_blocks"], counts
    got = (
        decode_dataset(blocks, filter=pred)
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    ref = t.to_pandas()[t.to_pandas()["path"].str.startswith("src/")].sort_values(
        "path"
    ).reset_index(drop=True)
    assert list(got["path"]) == list(ref["path"])
    assert list(got["sz"]) == list(ref["sz"])
    assert agg_count(blocks, pred) == len(ref)


def test_prefix_validation_rejects_non_string():
    from rayenc.decode import validate_predicate_shapes

    with pytest.raises(ValueError, match="prefix"):
        validate_predicate_shapes([("path", "prefix", 7)], set(), "x")
    with pytest.raises(ValueError, match="prefix"):
        validate_predicate_shapes([("path", "prefix", "")], set(), "x")
