"""Mergeable sketches: HyperLogLog distinct-count over a Dataset.

The reference has no approximate operators (SURVEY.md §2.4); at 100 TB
an exact count_distinct is an all-to-all shuffle, while a sketch is one
small partial per batch merged associatively (the guide's
emit-a-sketch-per-batch pattern). Used by the codec selector's scale
path for dict-viability tests; exposed as a standalone op.

Standard HLL: b-bit bucket index + rank of leading zeros in the rest,
numpy-vectorized per batch; partial registers merge by elementwise max.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .hashing import hash_array_64


def _hash64(values: pa.Array | pa.ChunkedArray | list) -> np.ndarray:
    """Vectorized uint64 per value (stages.hashing xxhash kernel — the
    round-1 per-value blake2b Python loop was the HLL hot spot)."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values)
    return hash_array_64(values, seed=7)


def hll_partial(values: pa.Array | list, b: int = 12) -> np.ndarray:
    """Registers (2^b uint8) for one batch of values."""
    m = 1 << b
    regs = np.zeros(m, dtype=np.uint8)
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values)
    vals = values.drop_null()
    if len(vals) == 0:
        return regs
    h = _hash64(vals)
    idx = (h >> np.uint64(64 - b)).astype(np.int64)
    rest = h << np.uint64(b)  # remaining bits, MSB-aligned
    # rank = leading zeros in `rest` + 1 (capped)
    lz = np.full(len(h), 64 - b, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for k in range(64 - b):
        bit = ((rest >> np.uint64(63 - k)) & np.uint64(1)).astype(bool)
        newly = bit & ~found
        lz[newly] = k
        found |= bit
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def approx_distinct(ds: "ray.data.Dataset", col: str, b: int = 12) -> float:
    """Distributed distinct estimate: one 4 KiB register set per batch,
    merged by max on the driver — no shuffle, constant driver memory."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch[col], b)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << b, dtype=np.uint8)
    for p in parts:
        merged = np.maximum(merged, np.frombuffer(p["regs"], dtype=np.uint8))
    return hll_estimate(merged)
