"""Front-coding codec specifics: prefix elision, window cap, selector gate.

The general edge corpus / boundary sweep runs via STRING_CODECS in
test_codecs.py; these tests pin the fc-specific claims — that shared
prefixes are actually elided, that the PREFIX_WINDOW cap stays
lossless, and that the selector only nominates fc when the measured
prefix_ratio says the column is path-like.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayenc.blocks import decode_column, encode_column
from rayenc.codecs.fc import PREFIX_WINDOW, FrontCodec, shared_prefix_lengths
from rayenc.codecs.util import string_array_parts
from rayenc.selector import candidate_codecs, column_stats


def _roundtrip(values, typ=pa.string()):
    arr = pa.array(values, type=typ)
    out = decode_column(encode_column(arr, "fc"))
    assert out.to_pylist() == arr.to_pylist()
    return arr


def test_sorted_paths_roundtrip_and_shrink():
    paths = sorted(
        f"src/module_{i % 13}/sub_{i % 5}/file_{i}.py" for i in range(2000)
    )
    arr = pa.array(paths, type=pa.string())
    blob = encode_column(arr, "fc")
    plain = encode_column(arr, "plain")
    assert decode_column(blob).to_pylist() == paths
    assert len(blob) < len(plain)


def test_shared_prefix_lengths_values():
    arr = pa.array(["abc", "abd", "abd", "", "xyz", "xy"])
    data, lens = string_array_parts(arr)
    prefs = shared_prefix_lengths(data, lens)
    assert prefs.tolist() == [0, 2, 3, 0, 0, 2]


def test_prefix_window_cap_is_lossless():
    base = "d" * (PREFIX_WINDOW + 50)
    vals = [base + "a", base + "b", base + "b" + "c" * 10, "short"]
    arr = _roundtrip(vals)
    # elision is capped at the window, never beyond
    data, lens = string_array_parts(arr)
    prefs = shared_prefix_lengths(data, lens)
    assert prefs.max() <= PREFIX_WINDOW


def test_embedded_zero_bytes_vs_padding():
    # rows shorter than others pad the comparison matrix with 0x00;
    # real NUL bytes in neighbours must not inflate the shared prefix
    vals = [b"ab\x00\x00\x00q", b"ab", b"ab\x00\x00\x00r", b"ab\x00zz"]
    arr = pa.array(vals, type=pa.binary())
    out = decode_column(encode_column(arr, "fc"))
    assert out.to_pylist() == vals
    data, lens = string_array_parts(arr)
    prefs = shared_prefix_lengths(data, lens)
    # row 2 shares only "ab" (len 2) with row 1, not the padded zeros
    assert prefs[2] == 2


def test_duplicate_run_chain_resolution():
    # a run of identical rows: every row after the first is 100% prefix;
    # decode must chase the chain back to the materialized first row
    vals = ["same/long/path/value.txt"] * 50 + ["same/long/path/value2.txt"]
    _roundtrip(vals)


def test_large_string_type():
    vals = ["prefix/common/" + str(i) for i in range(100)]
    _roundtrip(vals, typ=pa.large_string())


def test_selector_gate_on_prefix_ratio():
    paths = pa.array(
        sorted(f"repo/dir_{i % 7}/leaf_{i}.rs" for i in range(4096))
    )
    stats = column_stats(paths)
    assert stats["prefix_ratio"] > 0.15
    assert "fc" in candidate_codecs(paths.type, stats)

    rnd = np.random.default_rng(3)
    text = pa.array(
        ["".join(chr(97 + c) for c in rnd.integers(0, 26, 40)) for _ in range(4096)]
    )
    tstats = column_stats(text)
    assert tstats["prefix_ratio"] < 0.15
    assert "fc" not in candidate_codecs(text.type, tstats)


def test_fc_not_candidate_for_nonstring():
    assert not FrontCodec().supports(pa.int64())
    ints = pa.array(np.arange(1000))
    assert "fc" not in candidate_codecs(ints.type, column_stats(ints))


def test_fc_native_and_fallback_agree(monkeypatch):
    """Native C kernels and the numpy fallback must produce bit-identical
    blobs (unlike fsst, fc has a single canonical tokenization), and each
    side must decode blobs the other wrote."""
    from rayenc.codecs import _cfc

    vals = (
        [None, "", "src/a/b.py", "src/a/c.py", "src/a/c.pyc", "zz" * 300]
        + sorted(f"repo/dir_{i % 7}/f_{i}.rs" for i in range(200))
        + ["same"] * 20
    )
    arr = pa.array(vals, type=pa.string())
    native_blob = encode_column(arr, "fc")
    assert decode_column(native_blob).to_pylist() == vals

    monkeypatch.setattr(_cfc, "get_lib", lambda: None)
    fallback_blob = encode_column(arr, "fc")
    assert fallback_blob == native_blob  # canonical: same prefs, same payload
    assert decode_column(native_blob).to_pylist() == vals  # numpy reads native
    monkeypatch.undo()
    assert decode_column(fallback_blob).to_pylist() == vals  # native reads numpy


def test_native_decode_rejects_corrupt_sections():
    """The C kernel trusts its inputs; the wrapper must fail loudly on
    inconsistent sections instead of reading out of bounds (review
    finding)."""
    from rayenc.codecs import _cfc

    payload = np.frombuffer(b"abcdef", dtype=np.uint8)
    out_off = np.array([0, 3, 6], dtype=np.int64)
    out = np.empty(6, dtype=np.uint8)
    with pytest.raises(ValueError, match="nonzero prefix"):
        _cfc.native_decode(
            payload, np.array([1, 0]), np.array([3, 3]), out_off, out
        )
    with pytest.raises(ValueError, match="suffix lengths"):
        _cfc.native_decode(
            payload, np.array([0, 0]), np.array([3, 9]), out_off, out
        )
    with pytest.raises(ValueError, match="negative"):
        _cfc.native_decode(
            payload, np.array([0, -1]), np.array([3, 3]), out_off, out
        )
    # Prefix longer than the previous decoded row: sections are
    # internally consistent byte-count-wise but the kernel would copy
    # overlapping/uninitialized bytes (ADVICE r4).
    with pytest.raises(ValueError, match="exceeds previous row"):
        _cfc.native_decode(
            np.frombuffer(b"abcd", dtype=np.uint8),
            np.array([0, 5]),
            np.array([2, 2]),
            np.array([0, 2, 9], dtype=np.int64),
            np.empty(9, dtype=np.uint8),
        )
