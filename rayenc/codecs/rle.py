"""Run-length codec: (run value, run length) pairs.

Targets sorted/clustered columns — contiguous rows sharing a commit or
path prefix (FIXTURES.md F1). The run detection is numpy change-point
math, the Python-vectorized reincarnation of the reference's RLE-shaped
level decode loop (/root/reference/src/vec_pq_reader.rs:163-241): runs
stream -> builders there, runs -> np.repeat here.

Strings and floats are dictionary-encoded first and runs taken over the
integer codes (a run of equal strings is a run of equal codes); ints
run directly with frame-of-reference-packed run values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import Codec, int_array_from, int_view, is_floatlike, is_intlike, is_stringlike
from .dictionary import decode_dict_values, encode_dict_values
from .util import (
    bit_width,
    decode_lengths,
    encode_lengths,
    pack_bits_z,
    unpack_bits_z,
    zigzag_decode,
    zigzag_encode,
)


def run_bounds(codes: np.ndarray) -> np.ndarray:
    """Start indices of each run in `codes` (first element always starts one)."""
    if len(codes) == 0:
        return np.empty(0, dtype=np.int64)
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    return np.concatenate([[0], change]).astype(np.int64)


class RleCodec(Codec):
    name = "rle"

    def supports(self, t: pa.DataType) -> bool:
        return is_stringlike(t) or is_intlike(t) or is_floatlike(t)

    def encode(self, arr: pa.Array, level: int = 3) -> tuple[dict, dict[str, bytes]]:
        t = arr.type
        if is_intlike(t):
            v = int_view(arr).astype(np.int64)
            starts = run_bounds(v)
            run_values = v[starts]
            mode = "int"
            ref = int(run_values.min()) if len(run_values) else 0
            zz = zigzag_encode(run_values - ref)
            w = bit_width(int(zz.max())) if len(zz) else 0
            params: dict = {"mode": mode, "ref": ref, "w": w}
            sections = {"run_values": pack_bits_z(zz, w, level)}
        else:
            d = pc.dictionary_encode(arr)
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            codes = d.indices.to_numpy(zero_copy_only=True).astype(np.int64)
            starts = run_bounds(codes)
            run_values = codes[starts]
            card = len(d.dictionary)
            w = bit_width(max(card - 1, 0))
            params, sections = encode_dict_values(d.dictionary, level)
            params.update({"mode": "dict", "card": card, "w": w})
            sections["run_values"] = pack_bits_z(run_values.astype(np.uint64), w, level)

        n = len(arr)
        ends = np.concatenate([starts[1:], [n]]) if len(starts) else np.empty(0, np.int64)
        run_lengths = ends - starts
        lmeta, lbuf = encode_lengths(run_lengths, level)
        params.update({"runs": int(len(starts)), "lmeta": lmeta})
        sections["run_lengths"] = lbuf
        return params, sections

    def decode(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType
    ) -> pa.Array:
        runs = params["runs"]
        run_lengths = decode_lengths(params["lmeta"], sections["run_lengths"], runs)
        if params["mode"] == "int":
            zz = unpack_bits_z(sections["run_values"], params["w"], runs)
            run_values = zigzag_decode(zz) + int(params["ref"])
            return int_array_from(np.repeat(run_values, run_lengths), typ)
        card = params["card"]
        values = decode_dict_values(params, sections, card, typ)
        codes = unpack_bits_z(sections["run_values"], params["w"], runs).astype(np.int64)
        idx = np.repeat(codes, run_lengths)
        return pc.take(values, pa.array(idx, type=pa.int64()))
