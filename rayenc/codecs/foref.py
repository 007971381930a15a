"""Frame-of-reference / delta / bit-pack integer codecs.

The lightweight-numeric family the reference gestures at with
BYTE_STREAM_SPLIT on sums_double (/root/reference/src/bin/js2pq/main.rs:107-108):
pick the representation that shrinks the value domain, then bit-pack.

- ``foref``: values - min, bit-packed; auto-switches to delta+zigzag when
  the column is (near-)monotone (sorted keys, offsets, timestamps).
- ``bitpack``: frame fixed at 0 — for naturally small non-negative
  domains (dict indices, small counts, flags).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Codec, int_array_from, int_view, is_intlike
from .util import bit_width, pack_bits_z, unpack_bits_z, zigzag_decode, zigzag_encode


class ForefCodec(Codec):
    name = "foref"

    def supports(self, t: pa.DataType) -> bool:
        return is_intlike(t)

    def encode(self, arr: pa.Array, level: int = 3) -> tuple[dict, dict[str, bytes]]:
        v = int_view(arr).astype(np.int64)
        if len(v) == 0:
            return {"mode": "for", "ref": 0, "w": 0}, {"values": b""}
        ref = int(v.min())
        w_for = bit_width(int(v.max()) - ref)
        # delta candidate: zigzag of diffs (first value stored in params)
        d = np.diff(v)
        zz = zigzag_encode(d) if len(d) else np.empty(0, np.uint64)
        w_delta = bit_width(int(zz.max())) if len(zz) else 0
        if w_delta < w_for:
            params = {"mode": "delta", "first": int(v[0]), "w": w_delta}
            return params, {"values": pack_bits_z(zz, w_delta, level)}
        params = {"mode": "for", "ref": ref, "w": w_for}
        return params, {"values": pack_bits_z((v - ref).astype(np.uint64), w_for, level)}

    def decode(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType
    ) -> pa.Array:
        if params["mode"] == "delta":
            if n == 0:
                return int_array_from(np.empty(0, np.int64), typ)
            zz = unpack_bits_z(sections["values"], params["w"], n - 1)
            diffs = zigzag_decode(zz)
            out = np.empty(n, dtype=np.int64)
            out[0] = params["first"]
            np.cumsum(diffs, out=out[1:])
            out[1:] += params["first"]
            return int_array_from(out, typ)
        vals = unpack_bits_z(sections["values"], params["w"], n).astype(np.int64)
        return int_array_from(vals + int(params["ref"]), typ)


class BitpackCodec(Codec):
    """Pure bit-packing: frame of reference pinned to zero."""

    name = "bitpack"

    def supports(self, t: pa.DataType) -> bool:
        return is_intlike(t)

    def encode(self, arr: pa.Array, level: int = 3) -> tuple[dict, dict[str, bytes]]:
        v = int_view(arr).astype(np.int64)
        if len(v) and int(v.min()) < 0:
            raise ValueError("bitpack requires non-negative values; use foref")
        w = bit_width(int(v.max())) if len(v) else 0
        return {"w": w}, {"values": pack_bits_z(v.astype(np.uint64), w, level)}

    def decode(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType
    ) -> pa.Array:
        vals = unpack_bits_z(sections["values"], params["w"], n).astype(np.int64)
        return int_array_from(vals, typ)
