"""ALP-style adaptive lossless float codec.

Decimal-scaled floats (prices, rates, metrics rounded at the source)
dominate real numeric columns, and byte-stream-split leaves 3-4 mantissa
planes incompressible on them. ALP (Afroozeh & Boncz, "ALP: Adaptive
Lossless floating-Point compression", SIGMOD 2024 — public paper) maps
each value to the integer ``round(v * 10^e)`` when that integer maps
back to the EXACT same IEEE bits, and stores the integers with
frame-of-reference bit-packing; values that don't survive the round
trip (true randoms, NaN/inf, -0.0) are stored raw as positional
exceptions. Codec choice stays with the selector: ALP is just another
measured trial (rayenc/selector.py), so columns where it loses (random
mantissas -> all exceptions) still land on bss/plain by real size.

Determinism contract: the encoder VERIFIES with the exact expression
the decoder uses (``ints * (1/10^e)`` elementwise, then a float32 cast
when the column is float32), so decode is bit-identical by
construction — the round-trip discipline every codec here inherits
(/root/reference/src/vec_pq_reader.rs:793-882).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Codec, is_floatlike
from .util import bit_width, pack_bits_z, unpack_bits_z, zstd_compress, zstd_decompress

# 10^e is exactly representable in float64 up to e=22; decimal payloads
# past 18 digits don't fit the 53-bit mantissa anyway
_MAX_E = 18
_F_POW = np.array([10.0**e for e in range(_MAX_E + 1)], dtype=np.float64)
# |round(v * 10^e)| must stay well inside the float64-exact integer range
_MAX_INT = float(1 << 51)
_SAMPLE = 1024


def _scale_check(v64: np.ndarray, e: int, out_dtype: np.dtype) -> tuple[np.ndarray, np.ndarray]:
    """(int64 candidates, ok mask) for exponent ``e``: ok rows round-trip
    bit-identically through ``round(v * 10^e) / 10^e``. DIVISION, not
    multiplication by 1/10^e: IEEE division is correctly rounded, so
    ``29 / 100.0`` is the double nearest 0.29 (= the source double),
    while ``29 * 0.01`` misses by 1 ulp — measured 13% false exceptions
    on clean 2-decimal data with the multiply form."""
    with np.errstate(over="ignore", invalid="ignore"):
        rounded = np.round(v64 * _F_POW[e])
    ok = np.isfinite(rounded) & (np.abs(rounded) < _MAX_INT)
    ints = np.where(ok, rounded, 0.0).astype(np.int64)
    recon = (ints.astype(np.float64) / _F_POW[e]).astype(out_dtype)
    # bit comparison (== would accept -0.0 vs 0.0 and reject NaN==NaN)
    width = np.uint32 if out_dtype == np.float32 else np.uint64
    ok &= recon.view(width) == v64.astype(out_dtype).view(width)
    return ints, ok


class AlpCodec(Codec):
    name = "alp"

    def supports(self, t: pa.DataType) -> bool:
        return is_floatlike(t) and (
            pa.types.is_float32(t) or pa.types.is_float64(t)
        )

    def encode(self, arr: pa.Array, level: int = 3) -> tuple[dict, dict[str, bytes]]:
        v = arr.to_numpy(zero_copy_only=True)
        out_dtype = v.dtype
        n = len(v)
        if n == 0:
            return (
                {"e": 0, "ref": 0, "w": 0, "n_exc": 0, "pw": 0},
                {"ints": b"", "exc_pos": b"", "exc_vals": b""},
            )
        v64 = v.astype(np.float64)
        # pick e on a head sample by estimated cost (packed bits + raw
        # exceptions), then verify the winner on the full column — the
        # same sample-then-verify shape as the selector's trials
        head = v64[:_SAMPLE]
        best_e, best_cost = 0, float("inf")
        for e in range(_MAX_E + 1):
            ints, ok = _scale_check(head, e, out_dtype)
            n_exc = int((~ok).sum())
            if ok.any():
                good = ints[ok]
                w = bit_width(int(good.max()) - int(good.min()))
            else:
                w = 0
            cost = w * len(head) / 8 + n_exc * (v.dtype.itemsize + 4)
            if cost < best_cost - 1e-9:
                best_e, best_cost = e, cost
            if n_exc == 0:
                break  # larger e only widens the integers
        ints, ok = _scale_check(v64, best_e, out_dtype)
        exc_pos = np.flatnonzero(~ok)
        good = ints[ok]
        if len(good):
            ref = int(good.min())
            w = bit_width(int(good.max()) - ref)
        else:
            ref, w = 0, 0
        # exception slots pack as ref (zero bits of information)
        ints = np.where(ok, ints, ref)
        pw = bit_width(n - 1) if len(exc_pos) else 0
        params = {
            "e": best_e,
            "ref": ref,
            "w": w,
            "n_exc": int(len(exc_pos)),
            "pw": pw,
        }
        sections = {
            "ints": pack_bits_z((ints - ref).astype(np.uint64), w, level),
            "exc_pos": pack_bits_z(exc_pos.astype(np.uint64), pw, level),
            "exc_vals": zstd_compress(v[exc_pos].tobytes(), level),
        }
        return params, sections

    def decode(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType
    ) -> pa.Array:
        out_dtype = np.dtype(np.float32 if pa.types.is_float32(typ) else np.float64)
        if n == 0:
            return pa.array(np.empty(0, dtype=out_dtype), type=typ)
        ints = unpack_bits_z(sections["ints"], params["w"], n).astype(np.int64)
        ints += params["ref"]
        vals = (ints.astype(np.float64) / _F_POW[params["e"]]).astype(out_dtype)
        k = params["n_exc"]
        if k:
            pos = unpack_bits_z(sections["exc_pos"], params["pw"], k).astype(np.int64)
            raw = zstd_decompress(sections["exc_vals"], k * out_dtype.itemsize)
            vals[pos] = np.frombuffer(raw, dtype=out_dtype)
        return pa.array(vals, type=typ)
