"""Schema-evolution reads: block tables written across pipeline
versions (columns added/dropped over time) must decode together, with
columns a block predates null-filled — the long-running-ingestion
reality at 100 TB, where a job dir accumulates blocks from months of
schema drift. The reference has no analog (one file, one schema); this
is owed to the dynamic-wide-schema precedent
(/root/reference/src/bin/js2pq/main.rs:54-68): rows lacking a tag get
null in that tag's column."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pytest

from rayenc.decode import BlockDecoder, decode_dataset
from rayenc.encode import BlockEncoder, read_blocks, write_blocks

T1 = pa.table(
    {
        "a": pa.array([1, 2, 3], type=pa.int64()),
        "b": pa.array(["x", "y", "z"], type=pa.string()),
    }
)
T2 = pa.table(
    {
        "a": pa.array([4, 5], type=pa.int64()),
        "c": pa.array([1.5, 2.5], type=pa.float64()),
    }
)


def _two_version_dirs(ray_session, tmp_path) -> tuple[str, str]:
    import ray.data as rd

    d1, d2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    write_blocks(rd.from_arrow(BlockEncoder(hash_column=None).encode_table(T1)), d1)
    write_blocks(rd.from_arrow(BlockEncoder(hash_column=None).encode_table(T2)), d2)
    return d1, d2


def test_union_read_null_fills_with_types(ray_session, tmp_path):
    d1, d2 = _two_version_dirs(ray_session, tmp_path)
    blocks = read_blocks([d1, d2])
    out = pa.concat_tables(
        decode_dataset(
            blocks, fill_missing={"b": pa.string(), "c": pa.float64()}
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("a")
    assert out.column_names == sorted(["a", "b", "c"])
    assert out["a"].to_pylist() == [1, 2, 3, 4, 5]
    assert out["b"].to_pylist() == ["x", "y", "z", None, None]
    assert out["c"].to_pylist() == [None, None, None, 1.5, 2.5]


def test_union_read_accepts_schema_and_projection(ray_session, tmp_path):
    d1, d2 = _two_version_dirs(ray_session, tmp_path)
    schema = pa.schema([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())])
    out = pa.concat_tables(
        decode_dataset(
            read_blocks([d1, d2]), columns=["c", "a"], fill_missing=schema
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("a")
    assert out.column_names == ["c", "a"]  # caller's projection order wins
    assert out["c"].to_pylist() == [None, None, None, 1.5, 2.5]


def test_missing_column_without_fill_raises_named_error(ray_session, tmp_path):
    d1, d2 = _two_version_dirs(ray_session, tmp_path)
    ds = decode_dataset(read_blocks([d1, d2]))
    with pytest.raises(Exception, match="schema"):
        pa.concat_tables(
            ds.iter_batches(batch_size=None, batch_format="pyarrow")
        )


def test_columns_present_everywhere_need_no_fill(ray_session, tmp_path):
    d1, d2 = _two_version_dirs(ray_session, tmp_path)
    out = pa.concat_tables(
        decode_dataset(read_blocks([d1, d2]), columns=["a"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).sort_by("a")
    assert out["a"].to_pylist() == [1, 2, 3, 4, 5]


def test_decoder_fill_on_all_missing_block_uses_n_rows():
    """A block where EVERY selected column predates the schema still
    yields the right row count (taken from the block row's n_rows)."""
    blocks = BlockEncoder(hash_column=None).encode_table(T1)
    dec = BlockDecoder(columns=["zzz"], fill_missing={"zzz": pa.int32()})
    out = dec(blocks)
    assert out["zzz"].to_pylist() == [None, None, None]
    assert out["zzz"].type == pa.int32()


def test_read_blocks_list_rejects_empty_dir(tmp_path):
    os.makedirs(tmp_path / "empty", exist_ok=True)
    with pytest.raises(FileNotFoundError, match="no .parquet"):
        read_blocks([str(tmp_path / "empty")])


def test_read_blocks_accepts_file_list(ray_session, tmp_path):
    d1, d2 = _two_version_dirs(ray_session, tmp_path)
    files = sorted(glob.glob(os.path.join(d1, "*.parquet"))) + sorted(
        glob.glob(os.path.join(d2, "*.parquet"))
    )
    assert read_blocks(files).count() == 2

def test_read_blocks_rejects_empty_list():
    import pytest as _pytest

    from rayenc.encode import read_blocks

    with _pytest.raises(ValueError, match="empty path list"):
        read_blocks([])


def test_read_blocks_rejects_missing_path(tmp_path):
    import pytest as _pytest

    from rayenc.encode import read_blocks

    with _pytest.raises(FileNotFoundError, match="no such path"):
        read_blocks([str(tmp_path / "nope")])
