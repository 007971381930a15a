"""Resumable decode-export job (rayenc.jobs.run_export_job): committed
block partitions -> one atomically-published parquet of ORIGINAL rows
per partition. The read-side sibling of the encode job's resume
contract — the brief's "resumable output" rule applied to the decode
direction (the reference reprocesses everything on rerun,
/root/reference/scripts/process.sh:42-59)."""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayenc import run_encode_job
from rayenc.jobs import run_export_job


@pytest.fixture(scope="module")
def encoded_root(ray_session, corpus_parquet, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp") / "job")
    s = run_encode_job(
        corpus_parquet, out, block_rows=500, max_partition_bytes=1 << 20, concurrency=2
    )
    assert s["partitions_total"] > 1
    return out, corpus_parquet


def _read_export(out_dir: str) -> pa.Table:
    files = sorted(Path(out_dir).glob("part-*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")


def test_export_bit_identical_and_source_ordered(encoded_root, tmp_path):
    root, src = encoded_root
    out = str(tmp_path / "export")
    s = run_export_job(root, out, concurrency=2)
    assert s["partitions_exported"] == s["partitions_total"] > 1
    table = pq.read_table(src)
    got = _read_export(out)
    assert s["rows"] == table.num_rows
    # ordered export: sorted file names + block_seq sort inside each file
    # reproduce the ORIGINAL row order exactly
    got = got.select(table.column_names)
    assert got.equals(table), "export must reproduce source rows in order"


def test_export_rerun_skips_published(encoded_root, tmp_path):
    root, _ = encoded_root
    out = str(tmp_path / "export")
    s1 = run_export_job(root, out, concurrency=2)
    s2 = run_export_job(root, out, concurrency=2)
    assert s2["partitions_exported"] == 0
    assert s2["partitions_skipped"] == s1["partitions_total"]


def test_export_partial_resume_exports_only_rest(encoded_root, tmp_path):
    root, src = encoded_root
    out = str(tmp_path / "export")
    full = run_export_job(root, out, concurrency=2)
    # simulate a crash that lost all but one published partition
    files = sorted(Path(out).glob("part-*.parquet"))
    for f in files[1:]:
        os.unlink(f)
    s = run_export_job(root, out, concurrency=2)
    assert s["partitions_skipped"] == 1
    assert s["partitions_exported"] == full["partitions_total"] - 1
    got = _read_export(out)
    assert got.num_rows == pq.read_table(src).num_rows


def test_export_filter_and_projection(encoded_root, tmp_path):
    root, src = encoded_root
    out = str(tmp_path / "export")
    pred = [("lang", "==", "python"), ("path", "prefix", "src/module00")]
    s = run_export_job(root, out, columns=["repo", "path"], filter=pred, concurrency=2)
    table = pq.read_table(src)
    import pyarrow.compute as pc

    mask = pc.and_(
        pc.equal(table["lang"], "python"),
        pc.starts_with(table["path"], pattern="src/module00"),
    )
    ref = table.filter(mask).select(["repo", "path"])
    got = _read_export(out).select(["repo", "path"])
    assert s["rows"] == ref.num_rows
    assert got.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        ref.sort_by([("repo", "ascending"), ("path", "ascending")])
    )


def test_export_refuses_param_drift_on_half_finished_dir(encoded_root, tmp_path):
    root, _ = encoded_root
    out = str(tmp_path / "export")
    run_export_job(root, out, concurrency=2)
    with pytest.raises(ValueError, match="mismatch"):
        run_export_job(root, out, filter=[("lang", "==", "python")], concurrency=2)
    with pytest.raises(ValueError, match="mismatch"):
        run_export_job(root, out, columns=["repo"], concurrency=2)


def test_export_validates_filter_and_empty_root(tmp_path):
    with pytest.raises(ValueError, match="no committed partitions"):
        run_export_job(str(tmp_path / "nothing"), str(tmp_path / "o"))


def test_export_unknown_filter_column_fails_fast(encoded_root, tmp_path):
    root, _ = encoded_root
    with pytest.raises(ValueError, match="not in block table"):
        run_export_job(root, str(tmp_path / "o"), filter=[("nope", "==", 1)])


def test_export_skips_zero_block_partitions(ray_session, tmp_path):
    """A filtered ENCODE commits a partition with zero blocks (no blocks
    parquet on disk) when row-group stats straddle the predicate but the
    exact filter leaves nothing. Export must treat it as done — not
    crash on the missing file, not re-schedule it forever."""
    import numpy as np

    src = str(tmp_path / "src.parquet")
    # rg0 contains k=50; rg1's stats straddle 50 (min 0, max 100) but no row matches
    t = pa.table(
        {
            "k": pa.array([50] * 500 + [0, 100] * 250, type=pa.int64()),
            "content": pa.array([f"row{i}" for i in range(1000)]),
        }
    )
    pq.write_table(t, src, row_group_size=500)
    root = str(tmp_path / "job")
    s = run_encode_job(
        src, root, block_rows=200, max_partition_bytes=1, filter=[("k", "==", 50)],
        concurrency=2,
    )
    assert s["partitions_total"] == 2 and s["rows"] == 500
    out = str(tmp_path / "export")
    e1 = run_export_job(root, out, concurrency=2)
    assert e1["rows"] == 500
    assert e1["partitions_exported"] == 1
    assert e1["partitions_skipped"] == 1  # the empty partition
    e2 = run_export_job(root, out, concurrency=2)
    assert e2["partitions_exported"] == 0
    assert e2["partitions_skipped"] == 2
    assert _read_export(out).num_rows == 500


def test_export_resume_with_in_filter_tuple_and_set(encoded_root, tmp_path):
    """'in' values arrive as tuple/set: the export record must normalize
    them so (a) the record is JSON-serializable at all and (b) the exact
    same call resumes cleanly instead of refusing a phantom mismatch."""
    root, src = encoded_root
    langs = pq.read_table(src, columns=["lang"])["lang"].to_pylist()
    pick = tuple(sorted(set(langs))[:2])
    out = str(tmp_path / "export")
    filt = [("lang", "in", pick)]
    e1 = run_export_job(root, out, filter=filt, concurrency=2)
    # identical rerun (tuple) and an equal-set rerun must both no-op
    e2 = run_export_job(root, out, filter=[("lang", "in", tuple(pick))], concurrency=2)
    e3 = run_export_job(root, out, filter=[("lang", "in", set(pick))], concurrency=2)
    assert e2["partitions_exported"] == e3["partitions_exported"] == 0
    want = sum(1 for l in langs if l in pick)
    assert _read_export(out).num_rows == want == e1["rows"]


def test_export_filtered_all_empty_job_returns_empty_summary(ray_session, tmp_path):
    """Every committed partition empty + a filter: a valid (if vacuous)
    export — must return an empty summary, not raise."""
    src = str(tmp_path / "src.parquet")
    # row-group stats (min 1, max 200) straddle the predicate so the
    # plan keeps the partition, but no exact row matches -> the encode
    # commits ONLY a zero-block partition
    t = pa.table({"k": pa.array([1, 200], type=pa.int64()),
                  "content": pa.array(["a", "b"])})
    pq.write_table(t, src)
    root = str(tmp_path / "job")
    s = run_encode_job(src, root, filter=[("k", "==", 100)], concurrency=2)
    assert s["partitions_total"] == 1 and s["rows"] == 0
    out = str(tmp_path / "export")
    e = run_export_job(root, out, filter=[("k", "==", 1)], concurrency=2)
    assert e["partitions_exported"] == 0 and e["rows"] == 0


def test_export_projection_never_reads_unneeded_blobs(encoded_root, tmp_path):
    """The per-partition file read projects to the decoded col_* set: a
    2-column export of a content-heavy table must not deserialize the
    content blobs (asserted structurally on the exporter's read set)."""
    root, _ = encoded_root
    from rayenc.jobs import PartitionExporter

    exp = PartitionExporter(root, str(tmp_path / "o"), columns=["repo", "path"])
    assert exp.decode_cols == ["repo", "path"]
    first = sorted(Path(root, "blocks").glob("*.parquet"))[0]
    names = pq.read_schema(str(first)).names
    keep = [c for c in names if not c.startswith("col_")] + [
        c for c in names if c.startswith("col_") and c[4:] in exp.decode_cols
    ]
    assert "col_content" in names and "col_content" not in keep
    # and the export itself still round-trips the projection
    out = str(tmp_path / "export")
    s = run_export_job(root, out, columns=["repo", "path"], concurrency=2)
    got = _read_export(out)
    assert got.column_names == ["repo", "path"] and got.num_rows == s["rows"] > 0


def _read_hive(out_dir: str) -> pa.Table:
    files = sorted(Path(out_dir).rglob("part-*.parquet"))
    return pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )


def test_export_partition_by_hive_layout(encoded_root, tmp_path):
    """partition_by=lang publishes one lang=value/ dir per distinct key,
    each file holds ONLY its key's rows, key columns stay in the files,
    and the union equals the plain export row-for-row as a multiset."""
    root, src = encoded_root
    out = str(tmp_path / "hive")
    s = run_export_job(root, out, partition_by=["lang"], concurrency=2)
    assert s["partitions_exported"] == s["partitions_total"] > 1

    table = pq.read_table(src)
    langs = set(table["lang"].to_pylist())
    dirs = {p.name for p in Path(out).iterdir() if p.is_dir()}
    assert dirs == {f"lang={v}" for v in langs}
    for d in Path(out).iterdir():
        if not d.is_dir():
            continue
        v = d.name.split("=", 1)[1]
        sub = _read_hive(str(d))
        assert set(sub["lang"].to_pylist()) == {v}
    got = _read_hive(out).select(table.column_names)
    assert got.num_rows == table.num_rows
    key = [("repo", "ascending"), ("path", "ascending"), ("commit", "ascending")]
    assert got.sort_by(key).equals(table.sort_by(key))
    # markers are underscore-prefixed: a recursive parquet dataset read
    # over out_root must not trip on them
    assert all(f.name.startswith("_done-") for f in Path(out).glob("_done-*"))


def test_export_partition_by_resume_and_crash_recovery(encoded_root, tmp_path):
    """The _done marker is the commit token: a rerun skips marked
    partitions; deleting one marker (simulating a crash after some key
    files landed) re-exports exactly that partition and converges to the
    same bytes."""
    root, _ = encoded_root
    out = str(tmp_path / "hive")
    s1 = run_export_job(root, out, partition_by=["lang"], concurrency=2)
    s2 = run_export_job(root, out, partition_by=["lang"], concurrency=2)
    assert s2["partitions_exported"] == 0
    assert s2["partitions_skipped"] == s1["partitions_total"]

    before = {
        str(f.relative_to(out)): f.stat().st_size
        for f in Path(out).rglob("part-*.parquet")
    }
    markers = sorted(Path(out).glob("_done-*"))
    markers[0].unlink()  # crash simulation: marker lost, key files remain
    s3 = run_export_job(root, out, partition_by=["lang"], concurrency=2)
    assert s3["partitions_exported"] == 1
    after = {
        str(f.relative_to(out)): f.stat().st_size
        for f in Path(out).rglob("part-*.parquet")
    }
    assert before == after  # idempotent re-publish, same content


def test_export_partition_by_param_drift_refused(encoded_root, tmp_path):
    root, _ = encoded_root
    out = str(tmp_path / "hive")
    run_export_job(root, out, partition_by=["lang"], concurrency=2)
    with pytest.raises(ValueError, match="mismatch"):
        run_export_job(root, out, partition_by=["repo"], concurrency=2)
    with pytest.raises(ValueError, match="mismatch"):
        run_export_job(root, out, concurrency=2)  # plain onto a hive dir


def test_export_partition_by_validation(encoded_root, tmp_path):
    root, _ = encoded_root
    with pytest.raises(ValueError, match="not in the block table"):
        run_export_job(
            root, str(tmp_path / "h1"), partition_by=["nope"], concurrency=2
        )
    with pytest.raises(ValueError, match="must be included in the"):
        run_export_job(
            root,
            str(tmp_path / "h2"),
            columns=["repo", "path"],
            partition_by=["lang"],
            concurrency=2,
        )


def test_export_partition_by_null_key_and_filter(ray_session, tmp_path):
    """Null keys route to the hive default-partition directory; a row
    filter composes with the hive layout; float keys are refused with a
    named error."""
    import numpy as np

    n = 400
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "grp": pa.array(
                [None if i % 5 == 0 else f"g{i % 3}" for i in range(n)],
                type=pa.string(),
            ),
            "score": pa.array(np.linspace(0, 1, n), type=pa.float64()),
        }
    )
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=100)
    root = str(tmp_path / "job")
    run_encode_job(str(src), root, block_rows=64, hash_column=None, concurrency=2)

    out = str(tmp_path / "hive")
    s = run_export_job(
        root,
        out,
        partition_by=["grp"],
        filter=[("doc_id", "<", 200)],
        concurrency=2,
    )
    assert s["rows"] == 200
    dirs = {p.name for p in Path(out).iterdir() if p.is_dir()}
    assert dirs == {"grp=__HIVE_DEFAULT_PARTITION__", "grp=g0", "grp=g1", "grp=g2"}
    null_rows = _read_hive(str(Path(out) / "grp=__HIVE_DEFAULT_PARTITION__"))
    assert set(null_rows["grp"].to_pylist()) == {None}
    ids = null_rows["doc_id"].to_pylist()
    assert ids == [i for i in range(200) if i % 5 == 0]
    got = _read_hive(out)
    assert sorted(got["doc_id"].to_pylist()) == list(range(200))

    with pytest.raises(Exception, match="float keys"):
        run_export_job(
            root, str(tmp_path / "hf"), partition_by=["score"], concurrency=2
        )


def test_export_partition_by_all_empty_still_counts_as_published(
    encoded_root, tmp_path
):
    """An all-filtered-out hive export publishes ONLY _done markers (no
    part files); a later param-drift rerun must still REFUSE — markers
    are the hive commit token and count as 'published' (review finding:
    the record was silently rewritten while stale markers skipped every
    partition, leaving an empty export claiming the new filter ran)."""
    root, _ = encoded_root
    out = str(tmp_path / "hive")
    s = run_export_job(
        root,
        out,
        partition_by=["lang"],
        filter=[("repo", "==", "no-such-repo")],
        concurrency=2,
    )
    assert s["rows"] == 0
    assert not list(Path(out).rglob("part-*.parquet"))
    assert list(Path(out).glob("_done-*"))
    with pytest.raises(ValueError, match="mismatch"):
        run_export_job(root, out, partition_by=["lang"], concurrency=2)


def test_export_partition_by_case_folded_collision_refused(ray_session, tmp_path):
    """Key values differing only by case would merge into one directory
    (and one identical file name) on a case-insensitive filesystem,
    silently dropping rows — refused on every platform."""
    t = pa.table(
        {
            "doc_id": pa.array(range(40), type=pa.int64()),
            "k": pa.array(["Cc" if i % 2 else "cC" for i in range(40)]),
        }
    )
    src = tmp_path / "src.parquet"
    pq.write_table(t, src)
    root = str(tmp_path / "job")
    run_encode_job(str(src), root, block_rows=16, hash_column=None, concurrency=2)
    with pytest.raises(Exception, match="case-folded"):
        run_export_job(
            root, str(tmp_path / "hive"), partition_by=["k"], concurrency=2
        )


def test_export_partition_by_float_key_refused_at_driver(ray_session, tmp_path):
    """The float/nested key-type gate runs on the DRIVER before the
    export record is written or any actor decodes a partition."""
    from rayenc.jobs import export_record_path

    t = pa.table(
        {
            "doc_id": pa.array(range(30), type=pa.int64()),
            "score": pa.array([i / 7 for i in range(30)], type=pa.float64()),
        }
    )
    src = tmp_path / "src.parquet"
    pq.write_table(t, src)
    root = str(tmp_path / "job")
    run_encode_job(str(src), root, block_rows=16, hash_column=None, concurrency=2)
    out = str(tmp_path / "hive")
    with pytest.raises(ValueError, match="float keys"):
        run_export_job(root, out, partition_by=["score"], concurrency=2)
    assert not export_record_path(out).exists()  # refused BEFORE recording
