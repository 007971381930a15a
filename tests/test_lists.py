"""Nested list column tests — the reference's core data model
(List<Int64>/List<Float64>/List<Utf8>, /root/reference/src/schema.rs:13-34),
including its hardest invariants: empty list != null list
(/root/reference/src/vec_pq_reader.rs:673-681), null elements interleaved
with values, and int64/float64 extremes (:563-683)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayenc.blocks import decode_column, encode_column
from rayenc.selector import encode_column_auto

LIST_I64 = pa.array(
    [
        [1, 2, 3],
        [],            # empty != null
        None,          # null != empty
        [2**63 - 1, -(2**63)],
        [None, 5, None],  # null elements
        None,
        [],
        [7] * 100,     # run
    ],
    type=pa.list_(pa.int64()),
)

LIST_F64 = pa.array(
    [[1.5, float("nan")], None, [], [-0.0, 0.0, 1.7976931348623157e308, 5e-324]],
    type=pa.list_(pa.float64()),
)

LIST_STR = pa.array(
    [["a", "b"], None, [], ["", None, "ccc"], ["πρ", "\x00"]],
    type=pa.list_(pa.string()),
)


@pytest.mark.parametrize("codec", ["plain", "foref", "dict", "rle", "bss"])
def test_list_int64(codec):
    assert decode_column(encode_column(LIST_I64, codec)).equals(LIST_I64)


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "bss"])
def test_list_float64(codec):
    out = decode_column(encode_column(LIST_F64, codec))
    # NaN-aware positional comparison
    assert str(out) == str(LIST_F64)


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "fsst"])
def test_list_string(codec):
    assert decode_column(encode_column(LIST_STR, codec)).equals(LIST_STR)


def test_large_list():
    a = pa.array([[1], [2, 3], None], type=pa.large_list(pa.int64()))
    assert decode_column(encode_column(a, "plain")).equals(a)


def test_fixed_size_list_with_nulls():
    a = pa.array(
        [[1.0, 2.0], [3.0, 4.0], None, [5.0, 6.0]],
        type=pa.list_(pa.field("element", pa.float32()), 2),
    )
    out = decode_column(encode_column(a, "plain"))
    assert out.equals(a)
    assert out.type.value_field.name == "element"  # field name preserved


def test_nested_list_of_list():
    a = pa.array(
        [[[1, 2], [3]], None, [[], None, [4]]], type=pa.list_(pa.list_(pa.int64()))
    )
    assert decode_column(encode_column(a, "plain")).equals(a)


def test_auto_selects_on_child_values():
    blob, choice = encode_column_auto(LIST_I64)
    assert decode_column(blob).equals(LIST_I64)
    assert "child-values" in choice.reason


def test_list_boundary_sweep():
    """Every split of the list table must decode identically (the
    reference batch-size sweep, /root/reference/src/vec_pq_reader.rs:864)."""
    col = LIST_I64
    n = len(col)
    for n_blocks in range(1, n + 1):
        bounds = np.linspace(0, n, n_blocks + 1).astype(int)
        pieces = [
            decode_column(encode_column(col.slice(lo, hi - lo), "foref"))
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if hi > lo
        ]
        assert pa.concat_arrays(pieces).equals(col), n_blocks


def test_fixed_size_list_nested_child_null_rows_roundtrip():
    """fixed_size_list with struct/map/list children AND null rows: the
    scatter filler for null rows' slots must work for every child type
    (struct scalars have no zero filler — round-4 review found encode
    succeeded but decode raised, leaving written data unreadable)."""
    import numpy as np
    import pyarrow as pa

    from rayenc.blocks import decode_column, decode_rows, encode_column

    cases = [
        pa.array(
            [[{"a": 1}, {"a": 2}], None],
            type=pa.list_(pa.struct([("a", pa.int64())]), 2),
        ),
        pa.array(
            [[[("k", 1)]], None], type=pa.list_(pa.map_(pa.string(), pa.int64()), 1)
        ),
        pa.array([[[1], [2, 3]], None], type=pa.list_(pa.list_(pa.int64()), 2)),
        pa.array([["x", "y"], None, ["z", "w"]], type=pa.list_(pa.string(), 2)),
    ]
    for arr in cases:
        blob = encode_column(arr, "plain")
        assert decode_column(blob).equals(arr), arr.type
        idx = np.arange(len(arr))[::-1]
        assert decode_rows(blob, idx).equals(arr.take(pa.array(idx))), arr.type
