"""Per-codec round-trip tests on the F2 edge corpus + boundary sweep.

The reincarnation of the reference's golden round-trip tests with the
exhaustive batch-size sweep (/root/reference/src/vec_pq_reader.rs:384-1015,
sweep at :821,864): every codec must reproduce the edge-case corpus
bit-identically, and the same table split into 1..=R partitions must
decode identically regardless of where the boundaries fall.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayenc.blocks import decode_column, encode_column
from rayenc.corpus import edge_case_table

STRING_CODECS = ["plain", "dict", "rle", "fsst", "fc"]
INT_CODECS = ["plain", "dict", "rle", "foref", "bss"]
FLOAT_CODECS = ["plain", "dict", "rle", "bss", "alp"]

EDGE_STRINGS = pa.array(
    [
        None,
        "",
        "a",
        "repeat",
        "repeat",
        "repeat",
        "Z" * 100_000,
        "πρόγραμμα 语言 🧩",
        "nul\x00tab\tbell\x07",
        "   \n\t  ",
        "repeat",
        None,
        "",
    ],
    type=pa.string(),
)

EDGE_INTS = pa.array(
    [2**63 - 1, -(2**63), 0, None, 1, 1, 1, -1, 42, None, 2**62],
    type=pa.int64(),
)

EDGE_FLOATS = pa.array(
    [
        1.5,
        None,
        float("inf"),
        -float("inf"),
        1.7976931348623157e308,
        5e-324,
        -0.0,
        0.0,
        float("nan"),
        2.2204460492503131e-16,
    ],
    type=pa.float64(),
)


def bit_equal(a: pa.Array, b: pa.Array) -> bool:
    """Null-aware, NaN-aware positional equality (bitwise for floats)."""
    if len(a) != len(b) or a.type != b.type:
        return False
    for x, y in zip(a.to_pylist(), b.to_pylist()):
        if x is None or y is None:
            if x is not y:
                return False
        elif isinstance(x, float):
            if np.isnan(x) and np.isnan(y):
                continue
            if x != y or np.signbit(x) != np.signbit(y):
                return False
        elif x != y:
            return False
    return True


@pytest.mark.parametrize("codec", STRING_CODECS)
def test_string_roundtrip(codec):
    out = decode_column(encode_column(EDGE_STRINGS, codec))
    assert bit_equal(out, EDGE_STRINGS)


@pytest.mark.parametrize("codec", INT_CODECS)
def test_int_roundtrip(codec):
    out = decode_column(encode_column(EDGE_INTS, codec))
    assert bit_equal(out, EDGE_INTS)


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "foref", "bitpack", "bss"])
def test_nonneg_int_roundtrip(codec):
    arr = pa.array([0, 1, 255, 7, 7, 7, None, 2**40], type=pa.int64())
    out = decode_column(encode_column(arr, codec))
    assert bit_equal(out, arr)


@pytest.mark.parametrize("codec", FLOAT_CODECS)
def test_float_roundtrip(codec):
    out = decode_column(encode_column(EDGE_FLOATS, codec))
    assert bit_equal(out, EDGE_FLOATS)


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "foref", "bss"])
def test_timestamp_roundtrip(codec):
    arr = pa.array([0, 10**15, None, 123, 123], type=pa.timestamp("us"))
    out = decode_column(encode_column(arr, codec))
    assert out.equals(arr)


@pytest.mark.parametrize("codec", STRING_CODECS)
def test_empty_array(codec):
    arr = pa.array([], type=pa.string())
    out = decode_column(encode_column(arr, codec))
    assert len(out) == 0 and out.type == pa.string()


@pytest.mark.parametrize("codec", STRING_CODECS)
def test_all_null(codec):
    arr = pa.array([None, None, None], type=pa.string())
    out = decode_column(encode_column(arr, codec))
    assert bit_equal(out, arr)


@pytest.mark.parametrize("codec", STRING_CODECS)
def test_partition_boundary_sweep(codec):
    """Split the edge table's content column into every possible number of
    blocks; decode of the concatenation must be identical regardless of
    boundary placement (reference batch-size sweep analog,
    /root/reference/src/vec_pq_reader.rs:821)."""
    table = edge_case_table()
    col = table["content"].combine_chunks()
    n = len(col)
    for n_blocks in range(1, n + 1):
        bounds = np.linspace(0, n, n_blocks + 1).astype(int)
        pieces = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if hi == lo:
                continue
            chunk = col.slice(lo, hi - lo)
            pieces.append(decode_column(encode_column(chunk, codec)))
        merged = pa.concat_arrays(pieces)
        assert bit_equal(merged, col), f"{codec} failed at n_blocks={n_blocks}"


def test_binary_type_roundtrip():
    arr = pa.array([b"\x00\x01", None, b"", b"\xff" * 1000, b"abc"], type=pa.binary())
    for codec in ["plain", "dict", "rle", "fsst"]:
        out = decode_column(encode_column(arr, codec))
        assert bit_equal(out, arr), codec


def test_unknown_codec_rejected():
    with pytest.raises(ValueError, match="unknown codec"):
        encode_column(pa.array(["x"]), "nope")


def test_corrupt_magic_rejected():
    blob = encode_column(pa.array(["x"]), "plain")
    with pytest.raises(ValueError, match="RYB2"):
        decode_column(b"XXXX" + blob[4:])


def test_old_layout_magic_rejected_loudly():
    """An RYB1 blob (element-major bit packing) must fail with a
    re-encode message, not decode to silently wrong values."""
    blob = encode_column(pa.array(["x"]), "plain")
    with pytest.raises(ValueError, match="older rayenc"):
        decode_column(b"RYB1" + blob[4:])


def test_block_header_readable():
    from rayenc.blocks import block_codec

    blob = encode_column(pa.array(["x", "x", "y"]), "dict")
    hdr = block_codec(blob)
    assert hdr["codec"] == "dict" and hdr["n"] == 3


def test_bool_roundtrip():
    arr = pa.array([True, False, None, True, True], type=pa.bool_())
    out = decode_column(encode_column(arr, "plain"))
    assert out.equals(arr)


def test_fixed_size_binary_roundtrip():
    arr = pa.array(
        [b"abcd", None, b"\x00\x01\x02\x03", b"zzzz"], type=pa.binary(4)
    )
    out = decode_column(encode_column(arr, "plain"))
    assert out.equals(arr)


def test_list_of_bool_roundtrip():
    arr = pa.array([[True, None], None, []], type=pa.list_(pa.bool_()))
    assert decode_column(encode_column(arr, "plain")).equals(arr)


def test_fsst_native_and_fallback_agree(monkeypatch):
    """The native C tokenizer and the numpy pass-based fallback may pick
    different tokenizations, but BOTH must round-trip bit-identically."""
    from rayenc.codecs import _cfsst

    arr = pa.array(
        ["the quick brown fox", "the quick brown dog", "", None, "aaaa" * 50, "πρό"] * 40,
        type=pa.string(),
    )
    native_blob = encode_column(arr, "fsst")
    assert decode_column(native_blob).equals(arr)

    monkeypatch.setattr(_cfsst, "get_lib", lambda: None)
    fallback_blob = encode_column(arr, "fsst")
    assert decode_column(fallback_blob).equals(arr)
    # and the native decoder path isn't needed to read fallback blocks
    # (decode falls back too under the same monkeypatch) — also check the
    # native decode reads fallback blocks after the patch is lifted
    monkeypatch.undo()
    assert decode_column(fallback_blob).equals(arr)


def test_fsst_fused_decode_legacy_and_corrupt():
    """Round-5 fused decode path: blocks without the new `nbytes` param
    (legacy job dirs) must still decode via the skeleton path, and a
    corrupt fused blob must fail LOUDLY, never return garbage."""
    import numpy as np
    import pytest

    from rayenc.codecs import _cfsst
    from rayenc.codecs.fsst import FsstCodec

    arr = pa.array(
        ["the quick brown fox jumps", "the quick brown dog sits", None, ""] * 100,
        type=pa.string(),
    )
    c = FsstCodec()
    params, sections = c.encode(arr, 3)
    assert "nbytes" in params
    # codec layer sees nulls as empty strings (validity lives in the
    # blocks layer)
    filled = pa.compute.fill_null(arr, "")
    assert c.decode(params, sections, len(arr), arr.type).equals(filled)
    # legacy block: no nbytes -> skeleton path, same result
    legacy = {k: v for k, v in params.items() if k != "nbytes"}
    assert c.decode(legacy, sections, len(arr), arr.type).equals(filled)
    if _cfsst.get_lib() is None:
        return
    # corrupt: claimed size mismatch
    bad = dict(params, nbytes=params["nbytes"] + 7)
    with pytest.raises(ValueError, match="corrupt"):
        c.decode(bad, sections, len(arr), arr.type)
    # corrupt: token buffer truncated below what ntokens*w requires
    short = dict(sections, tokens=sections["tokens"][: max(len(sections["tokens"]) // 4, 1)])
    with pytest.raises(Exception):
        c.decode(params, short, len(arr), arr.type)
    # corrupt: token id past the symbol table (raw kernel contract)
    counts = np.array([2], dtype=np.int64)
    toks = np.array([256 + 250, 65], dtype=np.uint16)  # symbol 250 of 1
    packed = _cfsst.native_pack(toks, 10)
    with pytest.raises(ValueError, match="symbol table"):
        _cfsst.native_unpack_expand(packed, 10, counts, [b"ab"], 3)
    # corrupt: compensating-negative token counts sum fine but would
    # drive the C kernel into an unbounded OOB read — must raise BEFORE
    # the kernel
    neg = np.array([2**20, 2 - 2**20], dtype=np.int64)
    with pytest.raises(ValueError, match="negative token count"):
        _cfsst.native_unpack_expand(packed, 10, neg, [b"ab"], 3)


def test_temporal_types_roundtrip_all_codecs():
    """date64/time32/time64/duration are is_intlike but used to die in
    int_view (no direct int64 view) or type_from_str (no duration
    parser); date32 zones crashed on the unsupported direct int64 cast.
    Every temporal type must round-trip through every int codec and the
    auto selector, nulls included."""
    import numpy as np

    from rayenc.blocks import decode_column, decode_rows, encode_column
    from rayenc.encode import column_zone
    from rayenc.selector import encode_column_auto

    cases = [
        (pa.date32(), [18000, 18001, None]),
        (pa.date64(), [1555200000000, 1555286400000, None]),
        (pa.time32("s"), [3600, 7200, None]),
        (pa.time32("ms"), [3600000, 7200000, None]),
        (pa.time64("us"), [3600000000, 7200000000, None]),
        (pa.time64("ns"), [3600000000000, 7200000000000, None]),
        (pa.duration("us"), [1000, 2000, None]),
        (pa.duration("s"), [1, 2, None]),
    ]
    for t, vals in cases:
        arr = pa.array(vals, type=t)
        for codec in ("plain", "rle", "dict", "foref"):
            blob = encode_column(arr, codec)
            assert decode_column(blob).equals(arr), (t, codec)
            idx = np.array([1, 0])
            assert decode_rows(blob, idx).equals(arr.take(pa.array(idx))), (t, codec)
        blob, choice = encode_column_auto(arr)
        assert decode_column(blob).equals(arr), (t, choice.codec)
    z = column_zone(pa.array([18000, 18001], type=pa.date32()))
    assert z == {"min": 18000, "max": 18001, "null_count": 0}
