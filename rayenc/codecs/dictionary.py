"""Dictionary codec: distinct values + bit-packed indices.

Dynamic analog of the reference enabling Parquet dictionary encoding on
low-cardinality tag columns (/root/reference/src/bin/js2pq/main.rs:99).
Wins when distinct/total is small (repo, lang); the selector verifies by
measured size, never by heuristic alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, int_array_from, int_view, is_floatlike, is_intlike, is_stringlike
from .util import (
    decode_lengths,
    encode_lengths,
    bit_width,
    pack_bits_z,
    string_array_parts,
    strings_from_parts,
    unpack_bits_z,
    zstd_compress,
    zstd_decompress,
)


def encode_dict_values(values: pa.Array, level: int) -> tuple[dict, dict[str, bytes]]:
    """Serialize the (small) dictionary-of-distinct-values array."""
    t = values.type
    if is_stringlike(t):
        data, lengths = string_array_parts(values)
        lmeta, lbuf = encode_lengths(lengths, level)
        return (
            {"vkind": "str", "vbytes": int(data.size), "vlmeta": lmeta},
            {"dict_data": zstd_compress(data, level), "dict_lengths": lbuf},
        )
    v = int_view(values) if is_intlike(t) else values.to_numpy(zero_copy_only=True)
    return (
        {"vkind": "fixed", "vitemsize": int(v.dtype.itemsize)},
        {"dict_data": zstd_compress(v, level)},
    )


def decode_dict_values(
    params: dict, sections: dict[str, bytes], card: int, typ: pa.DataType
) -> pa.Array:
    if params["vkind"] == "str":
        data = np.frombuffer(
            zstd_decompress(sections["dict_data"], params["vbytes"]), dtype=np.uint8
        )
        lengths = decode_lengths(params["vlmeta"], sections["dict_lengths"], card)
        return strings_from_parts(data, lengths, typ)
    raw = zstd_decompress(sections["dict_data"], card * params["vitemsize"])
    if is_intlike(typ):
        dt = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[params["vitemsize"]]
        return int_array_from(np.frombuffer(raw, dtype=dt), typ)
    fdtype = np.float32 if params["vitemsize"] == 4 else np.float64
    return pa.array(np.frombuffer(raw, dtype=fdtype), type=typ)


class DictionaryCodec(Codec):
    name = "dict"

    def supports(self, t: pa.DataType) -> bool:
        return is_stringlike(t) or is_intlike(t) or is_floatlike(t)

    def encode(self, arr: pa.Array, level: int = 3) -> tuple[dict, dict[str, bytes]]:
        d = pc.dictionary_encode(arr)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        indices = d.indices.to_numpy(zero_copy_only=True).astype(np.uint64)
        card = len(d.dictionary)
        w = bit_width(max(card - 1, 0))
        params, sections = encode_dict_values(d.dictionary, level)
        params.update({"card": card, "w": w})
        sections["indices"] = pack_bits_z(indices, w, level)
        return params, sections

    def decode(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType
    ) -> pa.Array:
        card = params["card"]
        values = decode_dict_values(params, sections, card, typ)
        idx = unpack_bits_z(sections["indices"], params["w"], n).astype(np.int64)
        return pc.take(values, pa.array(idx, type=pa.int64()))

    def decode_rows(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType, indices
    ) -> pa.Array:
        """Partial path: unpack the (cheap, int) code stream, take only
        the selected codes, gather from the small value dictionary — the
        full value column is never materialized."""
        card = params["card"]
        values = decode_dict_values(params, sections, card, typ)
        idx = unpack_bits_z(sections["indices"], params["w"], n).astype(np.int64)
        sel = idx[np.asarray(indices, dtype=np.int64)]
        return pc.take(values, pa.array(sel, type=pa.int64()))
