"""Property-based round-trip tests (hypothesis) — beyond the reference's
hand-built goldens (/root/reference/src/vec_pq_reader.rs:563-683): any
generated array, any codec that supports its type, must round-trip
bit-identically through the block container. No Ray involved."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from rayenc.blocks import decode_column, encode_column
from rayenc.codecs import codecs_for_type
from rayenc.selector import encode_column_auto


def _ex(n: int) -> int:
    """Soak knob: RAYENC_FUZZ_MULT=10 multiplies every test's example
    count for long fuzzing sessions (default 1 keeps CI fast)."""
    return n * int(os.environ.get("RAYENC_FUZZ_MULT", "1"))

TEXT = st.one_of(
    st.none(),
    st.text(max_size=200),
    st.text(alphabet="ab", max_size=8),  # runs and tiny domain
)

INTS = st.one_of(
    st.none(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.integers(min_value=0, max_value=255),
)

FLOATS = st.one_of(
    st.none(),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
)


def roundtrip_all(arr: pa.Array):
    for codec in codecs_for_type(arr.type):
        if codec.name == "bitpack" and arr.null_count < len(arr):
            vals = [v for v in arr.to_pylist() if v is not None]
            if vals and min(vals) < 0:
                continue  # bitpack requires non-negative (selector enforces)
        out = decode_column(encode_column(arr, codec.name))
        assert len(out) == len(arr), codec.name
        for got, want in zip(out.to_pylist(), arr.to_pylist()):
            if isinstance(want, float) and isinstance(got, float) and np.isnan(want):
                assert np.isnan(got), codec.name
            else:
                assert got == want, (codec.name, got, want)


@settings(max_examples=_ex(40), deadline=None)
@given(st.lists(TEXT, max_size=60))
def test_string_roundtrip_property(values):
    roundtrip_all(pa.array(values, type=pa.string()))


@settings(max_examples=_ex(40), deadline=None)
@given(st.lists(INTS, max_size=60))
def test_int_roundtrip_property(values):
    roundtrip_all(pa.array(values, type=pa.int64()))


@settings(max_examples=_ex(40), deadline=None)
@given(st.lists(FLOATS, max_size=60))
def test_float_roundtrip_property(values):
    roundtrip_all(pa.array(values, type=pa.float64()))


@settings(max_examples=_ex(30), deadline=None)
@given(st.lists(st.one_of(st.none(), st.lists(INTS, max_size=8)), max_size=30))
def test_list_int_roundtrip_property(values):
    arr = pa.array(values, type=pa.list_(pa.int64()))
    out = decode_column(encode_column(arr, "plain"))
    assert out.equals(arr)
    out2 = decode_column(encode_column(arr, "foref"))
    assert out2.equals(arr)


@settings(max_examples=_ex(30), deadline=None)
@given(st.lists(TEXT, max_size=60))
def test_auto_selection_roundtrip_property(values):
    arr = pa.array(values, type=pa.string())
    blob, _ = encode_column_auto(arr)
    assert decode_column(blob).equals(arr)


STRUCT_T = pa.struct([("a", pa.int64()), ("b", pa.string())])


@settings(max_examples=_ex(30), deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.fixed_dictionaries({"a": INTS, "b": TEXT}),
        ),
        max_size=30,
    )
)
def test_struct_roundtrip_property(values):
    arr = pa.array(values, type=STRUCT_T)
    for codec in ("plain", "auto"):
        out = decode_column(encode_column(arr, codec))
        assert out.equals(arr), codec


@settings(max_examples=_ex(30), deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(st.tuples(st.text(max_size=8), INTS), max_size=5, unique_by=lambda kv: kv[0]),
        ),
        max_size=20,
    )
)
def test_map_roundtrip_property(values):
    t = pa.map_(pa.string(), pa.int64())
    arr = pa.array(values, type=t)
    out = decode_column(encode_column(arr, "plain"))
    assert out.to_pylist() == arr.to_pylist()


@settings(max_examples=_ex(30), deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.decimals(min_value=-(10**9), max_value=10**9, places=2)),
        max_size=40,
    )
)
def test_decimal_roundtrip_property(values):
    arr = pa.array(values, type=pa.decimal128(12, 2))
    for codec in ("plain", "bss", "auto"):
        out = decode_column(encode_column(arr, codec))
        assert out.equals(arr), codec


@settings(max_examples=_ex(30), deadline=None)
@given(
    st.lists(TEXT, min_size=1, max_size=40),
    st.data(),
)
def test_decode_rows_property(values, data):
    from rayenc.blocks import decode_rows

    arr = pa.array(values, type=pa.string())
    idx = data.draw(
        st.lists(st.integers(min_value=0, max_value=len(arr) - 1), max_size=20)
    )
    for codec in codecs_for_type(arr.type):
        blob = encode_column(arr, codec.name)
        got = decode_rows(blob, np.array(idx, dtype=np.int64))
        want = decode_column(blob).take(pa.array(idx, type=pa.int64()))
        assert got.equals(want), codec.name


@settings(max_examples=_ex(40), deadline=None)
@given(
    st.lists(TEXT, min_size=1, max_size=60),
    st.integers(min_value=1, max_value=20),
)
def test_paged_roundtrip_property(values, page_rows):
    """Paged container at arbitrary page splits: full decode and random
    access both reproduce the array exactly (nulls included)."""
    arr = pa.array(values, type=pa.string())
    blob = encode_column(arr, "plain", 3, page_rows=page_rows, page_zones=True)
    assert decode_column(blob).to_pylist() == arr.to_pylist()
    from rayenc.blocks import decode_rows

    idx = np.array([0, len(arr) - 1, len(arr) // 2], dtype=np.int64)
    got = decode_rows(blob, idx)
    assert got.to_pylist() == [arr[int(i)].as_py() for i in idx]


@settings(max_examples=_ex(30), deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=200))
def test_bloom_no_false_negative_property(values):
    from rayenc.bloom import bloom_build, bloom_may_contain

    bf = bloom_build(pa.array(values, type=pa.int64()))
    assert bf is not None
    for v in set(values):
        assert bloom_may_contain(bf, v)


@settings(max_examples=_ex(60), deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=300),
    st.integers(min_value=0, max_value=64),
)
def test_pack_planes_roundtrip_property(values, width):
    """Plane-major bit packing inverts exactly for every width 0..64
    (values masked to the width, as every caller guarantees)."""
    from rayenc.codecs.util import pack_planes, unpack_planes

    v = np.array(values, dtype=np.uint64)
    if width < 64:
        v &= np.uint64((1 << width) - 1)
    buf = pack_planes(v, width)
    assert len(buf) == width * ((len(v) + 7) // 8) if len(v) else len(buf) == 0
    out = unpack_planes(buf, width, len(v))
    assert np.array_equal(out, v)


@settings(max_examples=_ex(40), deadline=None)
@given(
    st.lists(
        st.one_of(
            st.decimals(
                min_value=-10**6, max_value=10**6, places=2, allow_nan=False
            ).map(float),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=0,
        max_size=200,
    )
)
def test_alp_roundtrip_property(values):
    """ALP must be bit-exact on ANY float mix — clean decimals, randoms,
    NaN/inf/-0.0 — via its exception path."""
    arr = pa.array(values, type=pa.float64())
    from rayenc.codecs import get_codec

    c = get_codec("alp")
    params, sections = c.encode(arr)
    dec = c.decode(params, sections, len(arr), pa.float64())
    assert (
        arr.to_numpy(zero_copy_only=True).tobytes()
        == dec.to_numpy(zero_copy_only=True).tobytes()
    )


# ---- whole-table fuzz: random schema through the full block container ----
# (the per-column properties above can't catch cross-column container
# bugs: zone/bloom map interactions, hash-chain coverage, page layouts
# mixing with scalars, provenance typing on empty blocks)

_COLUMN_KINDS = {
    "str": (pa.string(), TEXT),
    "int": (pa.int64(), INTS),
    "float": (pa.float64(), FLOATS),
    "bool": (pa.bool_(), st.one_of(st.none(), st.booleans())),
    "list_int": (pa.list_(pa.int64()), st.one_of(st.none(), st.lists(INTS, max_size=6))),
    "struct": (STRUCT_T, st.one_of(st.none(), st.fixed_dictionaries({"a": INTS, "b": TEXT}))),
    "decimal": (
        pa.decimal128(12, 2),
        st.one_of(st.none(), st.decimals(min_value=-(10**9), max_value=10**9, places=2)),
    ),
}


@st.composite
def _random_table(draw):
    kinds = draw(
        st.lists(st.sampled_from(sorted(_COLUMN_KINDS)), min_size=1, max_size=4)
    )
    n = draw(st.integers(min_value=0, max_value=40))
    cols, names = {}, []
    for i, kind in enumerate(kinds):
        typ, vals = _COLUMN_KINDS[kind]
        name = f"c{i}_{kind}"
        names.append(name)
        cols[name] = pa.array([draw(vals) for _ in range(n)], type=typ)
    return pa.table(cols)


def _tables_agree(got: pa.Table, want: pa.Table):
    assert got.schema.equals(want.schema), (got.schema, want.schema)
    for name in want.column_names:
        for g, w in zip(got[name].to_pylist(), want[name].to_pylist()):
            if isinstance(w, float) and isinstance(g, float) and np.isnan(w):
                assert np.isnan(g), name
            else:
                assert g == w, (name, g, w)


@settings(max_examples=_ex(50), deadline=None)
@given(
    _random_table(),
    st.sampled_from(["none", "block", "page"]),
    st.integers(min_value=2, max_value=9),
)
def test_table_roundtrip_fuzz(table, stats, page_rows):
    """Any generated schema must round-trip bit-identically through
    BlockEncoder -> BlockDecoder at every stats level, with projection
    decode agreeing and provenance columns typed even on empty blocks."""
    from rayenc.decode import BlockDecoder
    from rayenc.encode import BlockEncoder

    enc = BlockEncoder(
        hash_column=None,
        stats=stats,
        page_rows=page_rows if stats == "page" else None,
        retrial_blocks=0,
    )
    blocks = enc.encode_table(table)
    assert blocks.num_rows == 1
    got = BlockDecoder()(blocks)
    _tables_agree(got.select(table.column_names), table)
    # projection decode: first column only
    first = table.column_names[0]
    proj = BlockDecoder(columns=[first])(blocks)
    _tables_agree(proj.select([first]), table.select([first]))
    # provenance columns present and typed
    prov = BlockDecoder(with_provenance=True)(blocks)
    assert prov["_row_in_block"].type == pa.int64()
    assert prov.num_rows == table.num_rows
