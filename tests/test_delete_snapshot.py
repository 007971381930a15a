"""Copy-on-write delete_rows and snapshot read-as-of (read_blocks_at):
deletes remove exactly the matching rows and rewrite only the
partitions/blocks that hold them; snapshots pin the committed set over
append growth and fail loudly once a delete rewrites pinned rows."""

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from rayenc import (
    decode_dataset,
    delete_rows,
    read_blocks_at,
    run_encode_job,
    verify_blocks,
)
from rayenc.manifest import Manifest


def _table(n=2000, id_start=0, seed=3):
    rng = np.random.default_rng(seed + id_start)
    ids = np.arange(id_start, id_start + n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "lang": pa.array(rng.choice(["en", "de", "fr"], n).tolist()),
            "body": pa.array([f"text-{i}" for i in ids]),
        }
    )


def _decode_all(blocks) -> pa.Table:
    return pa.concat_tables(
        decode_dataset(blocks).iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("doc_id")


def _job(tmp_path, n=2000, files=1, **kw):
    srcs = []
    for f in range(files):
        p = tmp_path / f"src{f:02d}.parquet"
        pq.write_table(_table(n, id_start=f * n), p, row_group_size=max(100, n // 4))
        srcs.append(str(p))
    out = tmp_path / "job"
    kw.setdefault("block_rows", 100)
    kw.setdefault("hash_column", "body")
    kw.setdefault("concurrency", 2)
    run_encode_job(srcs, str(out), **kw)
    return srcs, out


def test_delete_removes_exactly_matching_rows(ray_session, tmp_path):
    srcs, out = _job(tmp_path, n=2000, files=2, max_partition_bytes=20_000)
    src = pa.concat_tables(pq.read_table(s) for s in srcs)

    s = delete_rows(str(out), [("doc_id", ">=", 500), ("doc_id", "<", 700)])
    assert s["rows_deleted"] == 200
    # zone-bounded rewrite: the doc_id range lives in a few partitions
    assert 0 < s["partitions_rewritten"] < s["partitions_total"]

    got = _decode_all(rd.read_parquet(str(out / "blocks")))
    v = src["doc_id"].to_numpy()
    want = src.filter(pa.array(~((v >= 500) & (v < 700)))).sort_by("doc_id")
    assert got.select(want.column_names).equals(want)
    # sha256 chains still verify after the rewrite
    assert verify_blocks(rd.read_parquet(str(out / "blocks")), hash_column="body")["ok"]
    # manifest row counts agree
    assert Manifest(str(out)).summary()["rows"] == 4000 - 200
    # audit line landed
    log = (out / "deletes.log").read_text().strip().splitlines()
    assert json.loads(log[-1])["rows_deleted"] == 200


def test_delete_is_idempotent_and_skips_untouched_files(ray_session, tmp_path):
    srcs, out = _job(tmp_path, n=2000, files=2, max_partition_bytes=20_000)
    filt = [("doc_id", "<", 150)]
    s1 = delete_rows(str(out), filt)
    assert s1["rows_deleted"] == 150
    untouched = {
        f.name: f.stat().st_mtime_ns
        for f in (out / "blocks").glob("*.parquet")
    }
    s2 = delete_rows(str(out), filt)
    assert s2["rows_deleted"] == 0 and s2["partitions_rewritten"] == 0
    after = {f.name: f.stat().st_mtime_ns for f in (out / "blocks").glob("*.parquet")}
    assert after == untouched  # a no-match delete rewrites nothing


def test_delete_can_empty_whole_partitions(ray_session, tmp_path):
    srcs, out = _job(tmp_path, n=1000, files=2, max_partition_bytes=10_000)
    s = delete_rows(str(out), [("doc_id", "<", 1000)])  # all of file 0
    assert s["rows_deleted"] == 1000
    got = _decode_all(rd.read_parquet(str(out / "blocks")))
    assert got.num_rows == 1000
    assert int(got["doc_id"][0].as_py()) == 1000
    assert verify_blocks(rd.read_parquet(str(out / "blocks")), hash_column="body")["ok"]


def test_delete_keeps_row_start_random_access_valid(ray_session, tmp_path):
    """delete re-derives block_seq/row_start; take_rows' integrity fold
    (telescoping row_start sums) must accept the rewritten partitions
    and global row numbers must re-address to the survivors."""
    from rayenc.decode import take_rows

    srcs, out = _job(tmp_path, n=1500, files=2, max_partition_bytes=20_000)
    delete_rows(str(out), [("doc_id", ">=", 1000), ("doc_id", "<", 1500)])
    blocks = rd.read_parquet(str(out / "blocks"))
    got = take_rows(blocks, [0, 999, 1000, 2499]).sort_by("doc_id")
    assert got["doc_id"].to_pylist() == [0, 999, 1500, 2999]


def test_delete_validates_filter(ray_session, tmp_path):
    srcs, out = _job(tmp_path, n=200)
    with pytest.raises(ValueError, match="non-empty"):
        delete_rows(str(out), [])
    with pytest.raises(ValueError, match="not in encoded columns|not in"):
        delete_rows(str(out), [("nope", "==", 1)])
    with pytest.raises(ValueError, match="no job record"):
        delete_rows(str(tmp_path / "not_a_job"), [("doc_id", "==", 1)])


def test_snapshot_read_as_of_append_growth(ray_session, tmp_path):
    # encode file 0, snapshot v1, append file 1, snapshot v2
    p0 = tmp_path / "a_src0.parquet"
    p1 = tmp_path / "b_src1.parquet"
    pq.write_table(_table(800, id_start=0), p0, row_group_size=200)
    out = tmp_path / "job"
    run_encode_job([str(p0)], str(out), block_rows=100, hash_column="body",
                   concurrency=2, max_partition_bytes=10_000)
    m = Manifest(str(out))
    v1 = m.snapshot(note="after file 0")["version"]
    pq.write_table(_table(800, id_start=800), p1, row_group_size=200)
    run_encode_job([str(p0), str(p1)], str(out), block_rows=100,
                   hash_column="body", concurrency=2,
                   max_partition_bytes=10_000, append=True)
    v2 = m.snapshot(note="after file 1")["version"]
    assert m.snapshot_versions() == [v1, v2] == [1, 2]

    as_of_1 = _decode_all(read_blocks_at(str(out), v1))
    assert as_of_1.num_rows == 800
    assert int(as_of_1["doc_id"][-1].as_py()) == 799
    as_of_2 = _decode_all(read_blocks_at(str(out), v2))
    assert as_of_2.num_rows == 1600

    # a delete bumps rewritten partitions' generation: both snapshots
    # pinned those rows, so both now refuse
    delete_rows(str(out), [("doc_id", "<", 10)])
    with pytest.raises(ValueError, match="rewritten by delete_rows"):
        read_blocks_at(str(out), v1)
    # a fresh snapshot reads the post-delete state fine
    v3 = m.snapshot()["version"]
    assert _decode_all(read_blocks_at(str(out), v3)).num_rows == 1590


def test_snapshot_record_errors(ray_session, tmp_path):
    srcs, out = _job(tmp_path, n=200)
    m = Manifest(str(out))
    with pytest.raises(ValueError, match="no snapshot"):
        m.snapshot_record(7)
    v = m.snapshot()["version"]
    rec = m.snapshot_record(v)
    assert rec["rows"] == 200 and rec["partitions"]
