"""Top-k pushdown over block zones (agg_topk) and cluster_by encode
layout: clustered partitions give disjoint zones, so a top-k or range
scan decodes a handful of boundary blocks, not the table."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from rayenc import encode_dataset, run_encode_job
from rayenc.decode import (
    agg_topk,
    count_decoded_blocks,
    decode_dataset,
    prune_blocks,
)


def _table(n=1000, seed=7):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    score = rng.permutation(n).astype(np.int64)  # unsorted, unique
    vals = np.where(ids % 91 == 0, None, score)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "score": pa.array(vals, type=pa.int64()),  # has nulls
            "body": pa.array(["y" * 40] * n),
        }
    )


def _encode(t, **kw):
    return encode_dataset(
        rd.from_arrow(t), block_rows=100, hash_column=None, concurrency=2, **kw
    ).materialize()


def _ref_topk(t, col, k, descending=True, tie=None):
    keys = [(col, "descending" if descending else "ascending")]
    if tie:
        keys.append((tie, "ascending"))
    kept = t.filter(pa.compute.is_valid(t[col]))
    return kept.sort_by(keys).slice(0, k)


def test_agg_topk_matches_full_sort(ray_session):
    t = _table()
    blocks = _encode(t)
    for descending in (True, False):
        got = agg_topk(
            blocks, "score", 17, descending=descending,
            extra_cols=["doc_id"], tie_cols=["doc_id"],
        )
        want = _ref_topk(t, "score", 17, descending, tie="doc_id")
        assert got.column_names == ["score", "doc_id"]
        assert got["score"].to_pylist() == want["score"].to_pylist()
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()


def test_agg_topk_k_exceeds_rows(ray_session):
    t = _table(150)
    blocks = _encode(t)
    got = agg_topk(blocks, "score", 10_000, tie_cols=["doc_id"])
    want = _ref_topk(t, "score", 10_000, tie="doc_id")
    assert got["score"].to_pylist() == want["score"].to_pylist()
    # nulls never appear in the result
    assert all(v is not None for v in got["score"].to_pylist())


def test_agg_topk_strings_with_truncated_zones(ray_session):
    # long strings exercise the prefix-cut/bumped zone bounds; the
    # candidate set may widen but the answer must stay exact
    words = [f"{chr(97 + i % 23)}{'z' * 120}{i:05d}" for i in range(400)]
    t = pa.table(
        {"doc_id": pa.array(np.arange(400, dtype=np.int64)),
         "w": pa.array(words)}
    )
    blocks = _encode(t)
    got = agg_topk(blocks, "w", 9, tie_cols=["doc_id"])
    want = _ref_topk(t, "w", 9, tie="doc_id")
    assert got["w"].to_pylist() == want["w"].to_pylist()


def test_agg_topk_validation(ray_session):
    t = _table(100)
    blocks = _encode(t)
    with pytest.raises(ValueError, match="k must be positive"):
        agg_topk(blocks, "score", 0)
    with pytest.raises(ValueError, match="not in the block table"):
        agg_topk(blocks, "nope", 3)
    nostats = _encode(t, stats="none")
    with pytest.raises(Exception, match="no zone"):  # raised in the worker
        agg_topk(nostats, "score", 3)


def test_agg_topk_prunes_on_clustered_layout(ray_session, tmp_path):
    """The scale claim: on a cluster_by layout the threshold proves all
    but the edge blocks out; on the unsorted layout it cannot."""
    t = _table(4000)
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=500)
    out = tmp_path / "job"
    run_encode_job(
        str(src), str(out), block_rows=100, hash_column=None,
        max_partition_bytes=1 << 40, cluster_by=["score"], concurrency=2,
    )
    blocks = rd.read_parquet(str(out / "blocks"))
    got = agg_topk(blocks, "score", 12, extra_cols=["doc_id"], tie_cols=["doc_id"])
    want = _ref_topk(t, "score", 12, tie="doc_id")
    assert got["score"].to_pylist() == want["score"].to_pylist()
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    # pruning proof: the top-12 of a clustered layout lives in one block
    # (plus neighbors sharing the boundary value) — assert via the same
    # zone test agg_topk phase 2 uses
    zones = [
        __import__("json").loads(z)["score"]
        for z in blocks.select_columns(["zonemap"]).to_pandas()["zonemap"]
    ]
    tau_candidates = sorted((z["min"] for z in zones if z["min"] is not None),
                            reverse=True)
    assert sum(1 for z in zones if z["max"] >= tau_candidates[0]) <= 2


def test_cluster_by_layout_and_contents(ray_session, tmp_path):
    """cluster_by keeps the exact row multiset, orders rows by the key
    within each partition, and makes range filters prune blocks."""
    t = _table(3000)
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=300)
    out_c = tmp_path / "clustered"
    run_encode_job(
        str(src), str(out_c), block_rows=100, hash_column=None,
        max_partition_bytes=1 << 40, cluster_by=["score"], concurrency=2,
    )
    out_u = tmp_path / "unsorted"
    run_encode_job(
        str(src), str(out_u), block_rows=100, hash_column=None,
        max_partition_bytes=1 << 40, concurrency=2,
    )
    bc = rd.read_parquet(str(out_c / "blocks"))
    bu = rd.read_parquet(str(out_u / "blocks"))

    # identical row multiset
    dec = pa.concat_tables(
        decode_dataset(bc).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert dec.sort_by("doc_id").equals(
        t.select(dec.column_names).sort_by("doc_id")
    )

    # range filter prunes most clustered blocks, few unsorted ones
    filt = [("score", ">=", 1000), ("score", "<", 1200)]
    c = count_decoded_blocks(bc, filt)
    u = count_decoded_blocks(bu, filt)
    assert c["total_blocks"] == u["total_blocks"]
    assert c["decoded_blocks"] <= 4
    assert u["decoded_blocks"] == u["total_blocks"]  # random perm: no prune
    # and the filtered rows are exact on the clustered layout
    got = pa.concat_tables(
        decode_dataset(prune_blocks(bc, filt), filter=filt)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    v = t["score"].to_numpy(zero_copy_only=False).astype(float)
    assert len(got) == int(((v >= 1000) & (v < 1200)).sum())


def test_cluster_by_is_strict_resume_key(ray_session, tmp_path):
    t = _table(500)
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=100)
    out = tmp_path / "job"
    run_encode_job(
        str(src), str(out), block_rows=100, hash_column=None,
        cluster_by=["score"], concurrency=2,
    )
    with pytest.raises(ValueError, match="mismatch"):
        run_encode_job(
            str(src), str(out), block_rows=100, hash_column=None,
            cluster_by=["doc_id"], concurrency=2,
        )
    with pytest.raises(ValueError, match="mismatch"):
        run_encode_job(str(src), str(out), block_rows=100, hash_column=None,
                       concurrency=2)
    # same key: clean no-op resume
    s = run_encode_job(
        str(src), str(out), block_rows=100, hash_column=None,
        cluster_by=["score"], concurrency=2,
    )
    assert s["partitions_encoded"] == 0


def test_cluster_by_missing_column_fails_fast(ray_session, tmp_path):
    t = _table(100)
    src = tmp_path / "src.parquet"
    pq.write_table(t, src)
    with pytest.raises(ValueError, match="cluster_by column"):
        run_encode_job(str(src), str(tmp_path / "j"), cluster_by=["nope"],
                       concurrency=2)


def test_cluster_by_projected_out_key(ray_session, tmp_path):
    """Clustering by a column excluded from `columns` still sorts, and
    the key column does not appear in the encoded schema."""
    t = _table(600)
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=100)
    out = tmp_path / "job"
    run_encode_job(
        str(src), str(out), block_rows=100, hash_column=None,
        columns=["doc_id", "body"], cluster_by=["score"],
        max_partition_bytes=1 << 40, concurrency=2,
    )
    blocks = rd.read_parquet(str(out / "blocks"))
    cols = {c[4:] for c in blocks.schema().names if c.startswith("col_")}
    assert cols == {"doc_id", "body"}
    dec = pa.concat_tables(
        decode_dataset(blocks).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert sorted(dec["doc_id"].to_pylist()) == list(range(600))


def test_agg_topk_all_null_column_returns_typed_empty(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "score": pa.array([None] * 200, type=pa.int64()),
        }
    )
    blocks = _encode(t)
    got = agg_topk(blocks, "score", 5, extra_cols=["doc_id"])
    assert got.num_rows == 0
    assert got.schema.field("score").type == pa.int64()
    assert got.schema.field("doc_id").type == pa.int64()


def _ref_topk_filtered(t, col, k, mask, tie=None, descending=True):
    kept = t.filter(mask)
    kept = kept.filter(pa.compute.is_valid(kept[col]))
    keys = [(col, "descending" if descending else "ascending")]
    if tie:
        keys.append((tie, "ascending"))
    return kept.sort_by(keys).slice(0, k)


def test_agg_topk_with_filter_matches_filtered_sort(ray_session):
    """Filtered top-k: threshold counts only zone-proven-full blocks,
    candidates drop proven-empty blocks, exact DNF runs after decode —
    result equals filter-then-sort over the source."""
    import pyarrow.compute as pc

    t = _table(1200)
    blocks = _encode(t)
    ids = t["doc_id"]
    score = t["score"]

    # range predicate on the sort column itself
    got = agg_topk(blocks, "score", 11, extra_cols=["doc_id"],
                   tie_cols=["doc_id"], filter=[("score", "<", 600)])
    want = _ref_topk_filtered(
        t, "score", 11, pc.less(score, 600), tie="doc_id")
    assert got["score"].to_pylist() == want["score"].to_pylist()
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()

    # predicate on a different column (id-ordered zones -> prunable)
    got = agg_topk(blocks, "score", 11, extra_cols=["doc_id"],
                   tie_cols=["doc_id"], filter=[("doc_id", "<", 300)])
    want = _ref_topk_filtered(
        t, "score", 11, pc.less(ids, 300), tie="doc_id")
    assert got["score"].to_pylist() == want["score"].to_pylist()

    # DNF (OR of ranges) + ascending
    dnf = [[("doc_id", "<", 100)], [("doc_id", ">=", 1100)]]
    got = agg_topk(blocks, "score", 7, descending=False,
                   extra_cols=["doc_id"], tie_cols=["doc_id"], filter=dnf)
    m = pc.or_(pc.less(ids, 100), pc.greater_equal(ids, 1100))
    want = _ref_topk_filtered(t, "score", 7, m, tie="doc_id",
                              descending=False)
    assert got["score"].to_pylist() == want["score"].to_pylist()

    # filter matching nothing -> typed empty
    got = agg_topk(blocks, "score", 3, filter=[("doc_id", ">", 10_000)])
    assert got.num_rows == 0 and got.schema.field("score").type == pa.int64()

    # unknown filter column fails fast on the driver
    with pytest.raises(ValueError, match="not in"):
        agg_topk(blocks, "score", 3, filter=[("nope", "==", 1)])


def test_agg_topk_float_nan_rows_sort_last_and_never_displace(ray_session):
    """A NaN-heavy block must not inflate the threshold: NaNs sort last
    (arrow ordering) and are excluded from the guaranteed counts, so the
    finite top-k from other blocks always wins."""
    # block 0: one finite 100 + 99 NaN; block 1: finite 0..99
    a = np.full(100, np.nan)
    a[0] = 100.0
    b = np.arange(100, dtype=np.float64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "score": pa.array(np.concatenate([a, b])),
        }
    )
    blocks = _encode(t)
    got = agg_topk(blocks, "score", 5, extra_cols=["doc_id"], tie_cols=["doc_id"])
    assert got["score"].to_pylist() == [100.0, 99.0, 98.0, 97.0, 96.0]


def test_agg_topk_unbumpable_string_max_still_decodes(ray_session):
    """A >64-char string whose truncated max prefix cannot be bumped
    stores zone max=None (encode._bound_max_str): the candidate filter
    must decode that block, not treat it as all-null — its unbounded
    values may be the table's top (review finding, reproduced)."""
    big = "\U0010ffff" * 65  # sorts above everything; max bound is None
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "w": pa.array([big] * 100 + [f"zebra{i:03d}" for i in range(100)]),
        }
    )
    blocks = _encode(t)  # 100-row blocks: one block is all `big`
    got = agg_topk(blocks, "w", 3, tie_cols=["doc_id"])
    assert got["w"].to_pylist() == [big, big, big]
    # ascending still exact (min bounds always exist for non-null blocks)
    got_asc = agg_topk(blocks, "w", 2, descending=False, tie_cols=["doc_id"])
    assert got_asc["w"].to_pylist() == ["zebra000", "zebra001"]


def test_cluster_by_unlocks_front_coding_on_shuffled_paths(ray_session, tmp_path):
    """cluster_by x fc synergy: a shuffled path column gives front coding
    little shared prefix between consecutive rows, but clustering by the
    path sorts each partition first — the selector's measured
    prefix_ratio crosses the fc gate and the path blobs shrink. The two
    layouts must hold the identical row multiset either way."""
    import json

    from rayenc.corpus import gen_corpus

    rng = np.random.default_rng(11)
    n = 6000
    paths = sorted(gen_corpus(n)["path"].to_pylist())
    order = rng.permutation(n)
    t = pa.table(
        {
            "path": pa.array([paths[i] for i in order]),
            "doc_id": pa.array(order.astype(np.int64)),
        }
    )
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=1000)
    out_c, out_u = tmp_path / "clustered", tmp_path / "unsorted"
    for out, cluster in ((out_c, ["path"]), (out_u, None)):
        run_encode_job(
            str(src), str(out), block_rows=1000, hash_column=None,
            max_partition_bytes=1 << 40, cluster_by=cluster, concurrency=2,
        )
    bc = rd.read_parquet(str(out_c / "blocks")).materialize()
    bu = rd.read_parquet(str(out_u / "blocks")).materialize()

    def path_codecs_and_bytes(blocks):
        rows = blocks.select_columns(["lineage", "col_path"]).take_all()
        codecs = {json.loads(r["lineage"])["path"]["codec"] for r in rows}
        return codecs, sum(len(r["col_path"]) for r in rows)

    codecs_c, bytes_c = path_codecs_and_bytes(bc)
    codecs_u, bytes_u = path_codecs_and_bytes(bu)
    assert any(c.startswith("fc") for c in codecs_c), codecs_c
    assert bytes_c < bytes_u, (bytes_c, bytes_u)

    # same rows either way (clustered order differs; multiset identical)
    for blocks in (bc, bu):
        dec = pa.concat_tables(
            decode_dataset(blocks).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
        assert dec.sort_by("doc_id").equals(t.sort_by("doc_id"))
