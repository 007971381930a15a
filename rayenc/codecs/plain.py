"""Plain + zstd backstop codec.

The dynamic analog of the reference's blanket ZSTD(3) container
compression (/root/reference/src/bin/js2pq/main.rs:91): when no
lightweight codec wins on measured size, the selector falls back here.
Also the baseline every other codec must beat to be chosen.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Codec, int_array_from, int_view, is_floatlike, is_intlike, is_stringlike
from .util import (
    decode_lengths,
    encode_lengths,
    string_array_parts,
    strings_from_parts,
    zstd_compress,
    zstd_decompress,
)


class PlainCodec(Codec):
    name = "plain"

    def supports(self, t: pa.DataType) -> bool:
        return (
            is_stringlike(t)
            or is_intlike(t)
            or is_floatlike(t)
            or pa.types.is_boolean(t)
            or pa.types.is_fixed_size_binary(t)
        )

    def encode(self, arr: pa.Array, level: int = 3) -> tuple[dict, dict[str, bytes]]:
        t = arr.type
        if pa.types.is_boolean(t):
            bits = np.packbits(
                arr.to_numpy(zero_copy_only=False).astype(np.uint8), bitorder="little"
            )
            return {"kind": "bool"}, {"data": zstd_compress(bits, level)}
        if pa.types.is_fixed_size_binary(t):
            width = t.byte_width
            data = np.frombuffer(arr.buffers()[1], dtype=np.uint8)[
                arr.offset * width : (arr.offset + len(arr)) * width
            ]
            return {"kind": "fsb", "width": width}, {"data": zstd_compress(data, level)}
        if is_stringlike(t):
            data, lengths = string_array_parts(arr)
            lmeta, lbuf = encode_lengths(lengths, level)
            params = {"kind": "str", "nbytes": int(data.size), "lmeta": lmeta}
            return params, {"data": zstd_compress(data, level), "lengths": lbuf}
        if is_intlike(t):
            v = int_view(arr)
        else:
            v = arr.to_numpy(zero_copy_only=True)
        params = {"kind": "fixed", "itemsize": int(v.dtype.itemsize)}
        return params, {"data": zstd_compress(v, level)}

    def decode(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType
    ) -> pa.Array:
        if params["kind"] == "bool":
            packed = zstd_decompress(sections["data"], (n + 7) // 8)
            bits = np.unpackbits(
                np.frombuffer(packed, dtype=np.uint8), count=n, bitorder="little"
            )
            return pa.array(bits.astype(bool), type=pa.bool_())
        if params["kind"] == "fsb":
            width = params["width"]
            raw = zstd_decompress(sections["data"], n * width)
            return pa.Array.from_buffers(typ, n, [None, pa.py_buffer(raw)])
        if params["kind"] == "str":
            data = np.frombuffer(
                zstd_decompress(sections["data"], params["nbytes"]), dtype=np.uint8
            )
            lengths = decode_lengths(params["lmeta"], sections["lengths"], n)
            return strings_from_parts(data, lengths, typ)
        raw = zstd_decompress(sections["data"], n * params["itemsize"])
        if is_intlike(typ):
            width_dtype = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[
                params["itemsize"]
            ]
            return int_array_from(np.frombuffer(raw, dtype=width_dtype), typ)
        fdtype = np.float32 if params["itemsize"] == 4 else np.float64
        return pa.array(np.frombuffer(raw, dtype=fdtype), type=typ)
