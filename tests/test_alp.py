"""ALP adaptive decimal-float codec: round-trip + selector behavior.

The codec's contract is the repo-wide one — bit-identical decode — but
ALP's failure modes are specific: false exceptions from 1-ulp decode
error (guarded by the division-form verify), exponent choice on mixed
data, and exception storage for non-decimal tails. No Ray needed."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayenc.blocks import decode_column, encode_column
from rayenc.codecs import get_codec
from rayenc.selector import select_codec


def _roundtrip_bits(v: np.ndarray, typ: pa.DataType) -> dict:
    arr = pa.array(v, type=typ)
    codec = get_codec("alp")
    params, sections = codec.encode(arr)
    dec = codec.decode(params, sections, len(arr), typ)
    assert (
        arr.to_numpy(zero_copy_only=True).tobytes()
        == dec.to_numpy(zero_copy_only=True).tobytes()
    )
    return params


def test_two_decimal_prices_no_exceptions():
    rng = np.random.default_rng(7)
    v = np.round(rng.uniform(1, 100000, 50_000), 2)
    p = _roundtrip_bits(v, pa.float64())
    assert p["e"] == 2 and p["n_exc"] == 0


def test_integral_floats_pick_e0():
    v = np.arange(10_000, dtype=np.float64)
    p = _roundtrip_bits(v, pa.float64())
    assert p["e"] == 0 and p["n_exc"] == 0


def test_random_doubles_all_exceptions_still_bit_identical():
    v = np.random.default_rng(3).normal(size=5_000)
    p = _roundtrip_bits(v, pa.float64())
    assert p["n_exc"] == len(v)


def test_mixed_decimal_and_random_tail():
    rng = np.random.default_rng(5)
    v = np.concatenate(
        [np.round(rng.uniform(0, 100, 8_000), 2), rng.normal(size=500)]
    )
    p = _roundtrip_bits(v, pa.float64())
    assert p["e"] == 2 and 0 < p["n_exc"] <= 501  # the tail (± coincidences)


def test_specials_become_exceptions():
    v = np.array(
        [0.0, -0.0, np.nan, np.inf, -np.inf, 1.25, 1e300, 5e-324, 2.5, 2.5]
    )
    _roundtrip_bits(v, pa.float64())  # -0.0 / nan / inf survive bitwise


def test_float32_decimals():
    rng = np.random.default_rng(9)
    v = np.round(rng.uniform(1, 1000, 20_000), 2).astype(np.float32)
    p = _roundtrip_bits(v, pa.float32())
    assert p["e"] == 2 and p["n_exc"] == 0


def test_empty_and_all_null_through_block():
    arr = pa.array([], type=pa.float64())
    out = decode_column(encode_column(arr, "alp"))
    assert len(out) == 0 and out.type == pa.float64()
    arr = pa.array([None, None], type=pa.float64())
    out = decode_column(encode_column(arr, "alp"))
    assert out.null_count == 2


def test_nulls_through_block_container():
    rng = np.random.default_rng(11)
    vals = [
        None if rng.random() < 0.1 else round(float(x), 2)
        for x in rng.uniform(0, 1000, 5_000)
    ]
    arr = pa.array(vals, type=pa.float64())
    out = decode_column(encode_column(arr, "alp"))
    assert out.equals(arr)


def test_selector_picks_alp_on_prices_and_not_on_randoms():
    rng = np.random.default_rng(13)
    prices = pa.array(np.round(rng.uniform(1, 100000, 20_000), 2))
    assert select_codec(prices).codec == "alp"
    randoms = pa.array(rng.normal(size=20_000))
    assert select_codec(randoms).codec != "alp"


def test_alp_beats_bss_on_decimal_data():
    rng = np.random.default_rng(17)
    v = pa.array(np.round(rng.uniform(1, 100000, 50_000), 2))
    alp_len = len(encode_column(v, "alp"))
    bss_len = len(encode_column(v, "bss"))
    assert alp_len < bss_len * 0.7


def test_paged_alp_roundtrip():
    rng = np.random.default_rng(19)
    v = np.round(rng.uniform(0, 10, 10_000), 3)
    arr = pa.array(v)
    out = decode_column(encode_column(arr, "alp", page_rows=2048, page_zones=True))
    assert out.to_numpy(zero_copy_only=True).tobytes() == v.tobytes()


@pytest.mark.parametrize("typ", [pa.float16()])
def test_half_float_not_claimed(typ):
    assert not get_codec("alp").supports(typ)
