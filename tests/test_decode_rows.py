"""Random-access decode: decode_rows(blob, indices) == full decode +
take, across every codec path and nested layouts (ROADMAP 5; FSST's
random-access property, VLDB 2020)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayenc.blocks import decode_column, decode_rows, encode_column

IDX_CASES = [
    [0],
    [2, 0, 5],          # out of order
    [1, 1, 3],          # repeats
    list(range(8)),     # everything
    [],                 # none
]


def check(arr: pa.Array, codec: str):
    blob = encode_column(arr, codec)
    full = decode_column(blob)
    for idx in IDX_CASES:
        idx = [i for i in idx if i < len(arr)]
        got = decode_rows(blob, np.array(idx, dtype=np.int64))
        want = full.take(pa.array(idx, type=pa.int64()))
        assert got.equals(want), (codec, idx, got, want)


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "fsst"])
def test_strings(codec):
    vals = ["alpha", "beta", None, "alpha", "gamma gamma", "", "beta", "delta"]
    check(pa.array(vals, type=pa.string()), codec)


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "foref", "bitpack", "bss"])
def test_ints(codec):
    check(pa.array([5, 5, 5, 9, None, 1, 2, 3], type=pa.int64()), codec)


@pytest.mark.parametrize("codec", ["plain", "bss"])
def test_floats(codec):
    check(pa.array([1.5, -2.25, None, 0.0, 3.5, 4.5, 5.5, 6.5], type=pa.float64()), codec)


def test_list_rows():
    arr = pa.array([[1, 2], None, [], [3], [4, 5, 6], [7], None, [8]], type=pa.list_(pa.int64()))
    check(arr, "plain")


def test_fixed_size_list_rows():
    arr = pa.array([[1.0, 2.0], None, [3.0, 4.0], [5.0, 6.0]], type=pa.list_(pa.float32(), 2))
    check(arr, "plain")


def test_struct_rows():
    t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    arr = pa.array([{"a": 1, "b": "x"}, None, {"a": 3, "b": None}, {"a": 4, "b": "z"}], type=t)
    check(arr, "plain")


def test_map_rows():
    t = pa.map_(pa.string(), pa.int64())
    arr = pa.array([[("k", 1)], None, [], [("a", 2), ("b", 3)]], type=t)
    blob = encode_column(arr, "plain")
    full = decode_column(blob)
    got = decode_rows(blob, np.array([3, 0], dtype=np.int64))
    want = full.take(pa.array([3, 0]))
    assert got.to_pylist() == want.to_pylist()


def test_out_of_range_raises():
    blob = encode_column(pa.array([1, 2, 3], type=pa.int64()), "plain")
    with pytest.raises(IndexError):
        decode_rows(blob, np.array([3]))


def test_fsst_decode_rows_is_partial():
    """The fsst partial path must expand far fewer bytes than the full
    decode for a tiny selection (asserted via expansion size)."""
    from rayenc.codecs.fsst import FsstCodec
    from rayenc.blocks import _parse_block

    vals = [f"the quick brown fox {i % 17} jumps over the lazy dog" * 4 for i in range(2000)]
    arr = pa.array(vals)
    blob = encode_column(arr, "fsst")
    header, _, sections = _parse_block(blob)
    codec = FsstCodec()
    seq, counts, symbols, sym_lens = codec._token_stream(
        header["params"], sections, header["n"]
    )
    # selection of 3 rows expands ~3 rows of bytes, not 2000
    sel = np.array([0, 999, 1999])
    got = codec.decode_rows(header["params"], sections, header["n"], pa.string(), sel)
    assert got.to_pylist() == [vals[0], vals[999], vals[1999]]
    assert int(sym_lens[seq[: int(counts[0])]].sum()) == len(vals[0])
