"""Z-order clustering: Morton keys (rayenc.zorder) and the
cluster_mode='zorder' encode layout. The claim under test: a lex sort
on (a, b) prunes range scans on `a` only; the z-order layout bounds
every cluster column's per-block range, so a scan on `b` alone also
prunes — at the cost of looser zones on `a`."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from rayenc import run_encode_job
from rayenc.decode import count_decoded_blocks, decode_dataset, prune_blocks
from rayenc.zorder import zorder_key, zorder_sort_indices


def _table(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "a": pa.array(rng.integers(0, 10_000, n)),
            "b": pa.array(rng.integers(0, 10_000, n)),
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "body": pa.array(["z" * 40] * n),
        }
    )


# ---------------------------------------------------------------- keys


def test_zorder_key_ties_share_cell_and_is_stable():
    t = pa.table(
        {
            "x": pa.array([5, 5, 5, 1, 9], type=pa.int32()),
            "y": pa.array([2, 2, 2, 2, 2], type=pa.int64()),
        }
    )
    z = zorder_key(t, ["x", "y"])
    assert z.dtype == np.uint64
    # equal (x, y) pairs -> identical keys
    assert z[0] == z[1] == z[2]
    # stable argsort keeps input order among equals
    idx = zorder_sort_indices(t, ["x", "y"])
    pos = {v: i for i, v in enumerate(idx)}
    assert pos[0] < pos[1] < pos[2]


def test_zorder_key_orders_along_both_axes():
    # 2D grid: the Morton curve visits quadrants in z order, so points
    # in the low-low quadrant sort before the high-high quadrant
    t = pa.table(
        {
            "x": pa.array([0, 100, 0, 100]),
            "y": pa.array([0, 0, 100, 100]),
        }
    )
    z = zorder_key(t, ["x", "y"])
    assert z[0] == z.min() and z[3] == z.max()


def test_zorder_key_nulls_rank_last():
    t = pa.table(
        {
            "x": pa.array([None, 1, 2], type=pa.int64()),
            "y": pa.array([0, 0, 0]),
        }
    )
    z = zorder_key(t, ["x", "y"])
    assert z[0] == z.max()


def test_zorder_key_strings_and_floats():
    t = pa.table(
        {
            "s": pa.array(["b", "a", "c", "a"]),
            "f": pa.array([2.5, 0.5, 9.0, 0.5]),
        }
    )
    idx = zorder_sort_indices(t, ["s", "f"])
    assert sorted(idx.tolist()) == [0, 1, 2, 3]
    # equal ("a", 0.5) rows share a key
    z = zorder_key(t, ["s", "f"])
    assert z[1] == z[3]


def test_zorder_key_validation():
    t = pa.table({"x": pa.array([1]), "nested": pa.array([[1, 2]])})
    with pytest.raises(ValueError, match=">= 2 cluster columns"):
        zorder_key(t, ["x"])
    with pytest.raises(ValueError, match="not in table"):
        zorder_key(t, ["x", "missing"])
    with pytest.raises(ValueError, match="nested"):
        zorder_key(t, ["x", "nested"])


# -------------------------------------------------------------- layout


def test_zorder_layout_prunes_on_every_cluster_key(ray_session, tmp_path):
    t = _table()
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=500)

    out_lex = tmp_path / "lex"
    out_z = tmp_path / "zorder"
    common = dict(
        block_rows=100,
        hash_column=None,
        max_partition_bytes=1 << 40,
        concurrency=2,
    )
    run_encode_job(str(src), str(out_lex), cluster_by=["a", "b"], **common)
    run_encode_job(
        str(src), str(out_z), cluster_by=["a", "b"], cluster_mode="zorder", **common
    )
    bl = rd.read_parquet(str(out_lex / "blocks"))
    bz = rd.read_parquet(str(out_z / "blocks"))

    # identical row multiset either way
    dec = pa.concat_tables(
        decode_dataset(bz).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert dec.sort_by("doc_id").equals(t.select(dec.column_names).sort_by("doc_id"))

    # a 10%-of-range scan on the SECOND key: lex cannot prune (every
    # block spans b's full range), zorder bounds b per block
    filt_b = [("b", ">=", 4000), ("b", "<", 5000)]
    lex_b = count_decoded_blocks(bl, filt_b)
    z_b = count_decoded_blocks(bz, filt_b)
    assert lex_b["total_blocks"] == z_b["total_blocks"]
    assert lex_b["decoded_blocks"] == lex_b["total_blocks"]
    assert z_b["decoded_blocks"] < lex_b["decoded_blocks"] // 2

    # the FIRST key still prunes under zorder (looser than lex, by design)
    filt_a = [("a", ">=", 4000), ("a", "<", 5000)]
    lex_a = count_decoded_blocks(bl, filt_a)
    z_a = count_decoded_blocks(bz, filt_a)
    assert lex_a["decoded_blocks"] <= 6  # tight lex zones on the lead key
    assert z_a["decoded_blocks"] < z_a["total_blocks"] // 2

    # filtered rows are exact on the z-order layout
    got = pa.concat_tables(
        decode_dataset(prune_blocks(bz, filt_b), filter=filt_b).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    v = t["b"].to_numpy()
    assert len(got) == int(((v >= 4000) & (v < 5000)).sum())


def test_cluster_mode_is_strict_resume_key(ray_session, tmp_path):
    t = _table(600)
    src = tmp_path / "src.parquet"
    pq.write_table(t, src, row_group_size=300)
    out = tmp_path / "job"
    common = dict(
        block_rows=100,
        hash_column=None,
        max_partition_bytes=1 << 40,
        concurrency=2,
        cluster_by=["a", "b"],
    )
    run_encode_job(str(src), str(out), cluster_mode="zorder", **common)
    with pytest.raises(ValueError, match="cluster_mode"):
        run_encode_job(str(src), str(out), cluster_mode="lex", **common)


def test_cluster_mode_validation(ray_session, tmp_path):
    t = _table(100)
    src = tmp_path / "src.parquet"
    pq.write_table(t, src)
    with pytest.raises(ValueError, match="one of"):
        run_encode_job(
            str(src), str(tmp_path / "x"), cluster_by=["a", "b"], cluster_mode="hilbert"
        )
    with pytest.raises(ValueError, match=">= 2 cluster_by"):
        run_encode_job(
            str(src), str(tmp_path / "y"), cluster_by=["a"], cluster_mode="zorder"
        )
