"""Per-row sha256 of a string column — the engine's correctness invariant.

BASELINE.json input_hint: "per-row invariant vs the reference: content
sha256 equality". At encode time each block records the chain hash
sha256(d_0 || d_1 || ... || d_{n-1}) of its rows' content digests; the
verify job decodes and recomputes. This is the generalization of the
reference's anti-DCE touch-reduce checksum
(/root/reference/src/bin/parqbench/main.rs:58-169) into a cryptographic
per-row equality check.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .blocks import prepare_array
from .codecs.util import string_array_parts


def _parts_view(arr: pa.Array | pa.ChunkedArray):
    """(zero-copy memoryview of concatenated bytes, offsets, validity,
    null_count) — no copy of the (multi-MB) content payload; hashlib
    accepts memoryview slices directly."""
    filled, validity, null_count = prepare_array(arr)
    data, lengths = string_array_parts(filled)
    mv = memoryview(np.ascontiguousarray(data))
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return mv, offsets, validity, null_count


def row_digests(arr: pa.Array | pa.ChunkedArray) -> list[bytes]:
    """sha256 digest per row; null rows get the digest of b"\\x00NULL"
    (distinct from the empty string's digest, preserving the null vs
    empty distinction the reference tests demand,
    /root/reference/src/vec_pq_reader.rs:673-681)."""
    mv, offsets, validity, null_count = _parts_view(arr)
    null_digest = hashlib.sha256(b"\x00NULL").digest()
    out: list[bytes] = []
    sha = hashlib.sha256
    if null_count:
        for i in range(len(offsets) - 1):
            if validity[i]:
                out.append(sha(mv[offsets[i] : offsets[i + 1]]).digest())
            else:
                out.append(null_digest)
    else:
        for i in range(len(offsets) - 1):
            out.append(sha(mv[offsets[i] : offsets[i + 1]]).digest())
    return out


def chain_hash(arr: pa.Array | pa.ChunkedArray) -> str:
    """Order-sensitive hash of all row digests in a block — streamed:
    each row digest folds straight into the chain, no per-block digest
    list is materialized (this runs inside the encode hot path)."""
    mv, offsets, validity, null_count = _parts_view(arr)
    h = hashlib.sha256()
    sha = hashlib.sha256
    if null_count:
        null_digest = sha(b"\x00NULL").digest()
        for i in range(len(offsets) - 1):
            h.update(
                sha(mv[offsets[i] : offsets[i + 1]]).digest()
                if validity[i]
                else null_digest
            )
    else:
        for i in range(len(offsets) - 1):
            h.update(sha(mv[offsets[i] : offsets[i + 1]]).digest())
    return h.hexdigest()


def hex_digests(arr: pa.Array | pa.ChunkedArray) -> list[str]:
    return [d.hex() for d in row_digests(arr)]
