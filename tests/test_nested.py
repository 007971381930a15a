"""Round-trip coverage for struct / map / decimal block columns —
the round-1 "what's missing" #1 (reference struct conversion at
/root/reference/src/schema.rs:100-107; decimals/maps are our extension).
"""

from __future__ import annotations

import decimal

import pyarrow as pa
import pytest

from rayenc.blocks import decode_column, encode_column

STRUCT_T = pa.struct([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())])


def roundtrip(arr: pa.Array, codec: str = "plain") -> None:
    out = decode_column(encode_column(arr, codec))
    assert out.equals(arr), f"{codec}: {out} != {arr}"


def test_struct_roundtrip_basic():
    arr = pa.array(
        [
            {"a": 1, "b": "x", "c": 1.5},
            {"a": 2, "b": None, "c": -0.25},
            None,
            {"a": None, "b": "zzz", "c": 0.0},
        ],
        type=STRUCT_T,
    )
    roundtrip(arr, "plain")
    roundtrip(arr, "auto")


def test_struct_all_null_and_empty():
    roundtrip(pa.array([None, None], type=STRUCT_T))
    roundtrip(pa.array([], type=STRUCT_T))


def test_struct_nested_in_list():
    t = pa.list_(STRUCT_T)
    arr = pa.array(
        [[{"a": 1, "b": "q", "c": 2.0}], None, [], [{"a": 7, "b": None, "c": 3.5}] * 3],
        type=t,
    )
    roundtrip(arr, "auto")


def test_struct_with_nested_list_field():
    t = pa.struct([("xs", pa.list_(pa.int64())), ("tag", pa.string())])
    arr = pa.array(
        [{"xs": [1, 2, 3], "tag": "t1"}, {"xs": None, "tag": None}, None],
        type=t,
    )
    roundtrip(arr, "plain")
    roundtrip(arr, "auto")


def test_map_roundtrip():
    t = pa.map_(pa.string(), pa.int64())
    arr = pa.array([[("k1", 1)], [("k2", 2), ("k3", None)], None, []], type=t)
    for codec in ("plain", "auto"):
        out = decode_column(encode_column(arr, codec))
        assert out.type == t
        assert out.to_pylist() == arr.to_pylist()


@pytest.mark.parametrize(
    "typ",
    [pa.decimal128(12, 2), pa.decimal128(38, 10), pa.decimal256(50, 5)],
)
def test_decimal_roundtrip(typ):
    vals = [
        decimal.Decimal("1.01"),
        None,
        decimal.Decimal("-99999.99"),
        decimal.Decimal("0"),
        decimal.Decimal("12345.67"),
    ]
    arr = pa.array([v.quantize(decimal.Decimal(1).scaleb(-typ.scale)) if v is not None else None for v in vals], type=typ)
    roundtrip(arr, "plain")
    roundtrip(arr, "bss")
    roundtrip(arr, "auto")


def test_decimal_bss_compresses_sign_extension():
    import random

    rng = random.Random(7)
    vals = [decimal.Decimal(rng.randint(0, 99999)).scaleb(-2) for _ in range(4096)]
    arr = pa.array(vals, type=pa.decimal128(12, 2))
    plain = encode_column(arr, "plain")
    bss = encode_column(arr, "bss")
    assert len(bss) < len(plain)
    roundtrip(arr, "bss")


def test_struct_through_block_encoder_table():
    """Struct column flows through the BlockEncoder/BlockDecoder stage
    classes (auto selection + lineage) unchanged."""
    from rayenc.decode import BlockDecoder
    from rayenc.encode import BlockEncoder

    t = pa.table(
        {
            "id": pa.array(range(100), type=pa.int64()),
            "meta": pa.array(
                [
                    {"a": i % 3, "b": f"s{i % 5}", "c": float(i)}
                    if i % 7
                    else None
                    for i in range(100)
                ],
                type=STRUCT_T,
            ),
        }
    )
    enc = BlockEncoder(hash_column=None)
    blocks = enc.encode_table(t)
    dec = BlockDecoder()(blocks)
    dec = dec.select(["id", "meta"])
    assert dec.equals(t)
