"""Byte-stream-split codec for floats.

Direct dynamic analog of the reference's BYTE_STREAM_SPLIT choice for
``sums_double`` (/root/reference/src/bin/js2pq/main.rs:107-108): split
each float into its byte planes so the exponent/sign planes (highly
repetitive) compress well under zstd while the mantissa planes stay
incompressible but isolated. Bit-exact: operates on the raw IEEE bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Codec, int_array_from, int_view, is_floatlike, is_intlike
from .util import zstd_compress, zstd_decompress


class ByteStreamSplitCodec(Codec):
    name = "bss"

    def supports(self, t: pa.DataType) -> bool:
        return is_floatlike(t) or is_intlike(t) or pa.types.is_fixed_size_binary(t)

    def encode(self, arr: pa.Array, level: int = 3) -> tuple[dict, dict[str, bytes]]:
        if pa.types.is_fixed_size_binary(arr.type):
            # decimal words arrive as fsb: split their byte planes too —
            # high-order bytes are mostly sign-extension and compress away
            k = arr.type.byte_width
            raw = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
            raw = raw[arr.offset * k : (arr.offset + len(arr)) * k]
            planes = np.ascontiguousarray(raw.reshape(-1, k).T)
            return {"itemsize": k}, {"planes": zstd_compress(planes, level)}
        if is_intlike(arr.type):
            v = int_view(arr)
        else:
            v = arr.to_numpy(zero_copy_only=True)
        k = v.dtype.itemsize
        planes = np.ascontiguousarray(v.view(np.uint8).reshape(-1, k).T)
        return {"itemsize": k}, {"planes": zstd_compress(planes, level)}

    def decode(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType
    ) -> pa.Array:
        k = params["itemsize"]
        raw = zstd_decompress(sections["planes"], n * k)
        planes = np.frombuffer(raw, dtype=np.uint8).reshape(k, n)
        interleaved = np.ascontiguousarray(planes.T).reshape(-1)
        if pa.types.is_fixed_size_binary(typ):
            return pa.Array.from_buffers(
                typ, n, [None, pa.py_buffer(interleaved.tobytes())]
            )
        if is_intlike(typ):
            dt = {1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[k]
            return int_array_from(interleaved.view(dt), typ)
        fdtype = np.float32 if k == 4 else np.float64
        return pa.array(interleaved.view(fdtype), type=typ)
