"""PII scrubbing and document chunking — the remaining ingestion-side
text ops of a training-data pipeline (brief §LLM-pipeline; siblings in
stages/text.py and stages/substr.py).

Both stages are pure Arrow-kernel map_batches bodies: redaction is
``pc.replace_substring_regex`` (RE2, vectorized C++ — patterns below
are RE2-safe: no backreferences or lookarounds), chunking reuses the
flat-token + offsets machinery of substr.py and rebuilds chunk text
with ``binary_join``. No Python loops over rows; no shuffles — both
are embarrassingly parallel over blocks.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .substr import _tokenize

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

# Order matters: earlier patterns must not leave text a later pattern
# needs (email before bare-domain would, so there is no bare-domain
# rule; long-hex runs before short ones via the {24,} bound).
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # 24+ hex chars: API tokens, session ids, sha fragments
    ("hex_secret", r"\b[0-9a-fA-F]{24,}\b", "<SECRET>"),
    # 13-19 digit runs with optional space/dash separators (card-like)
    ("card", r"\b\d(?:[ \-]?\d){12,18}\b", "<NUMBER>"),
    # international-ish phone: +CC then 7+ digits with separators
    ("phone", r"\+\d{1,3}[ \-]?\(?\d{1,4}\)?(?:[ \-]?\d{2,4}){2,4}", "<PHONE>"),
]


def redact_batch(
    batch: pa.Table,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    count: bool = False,
) -> pa.Table:
    """Replace every PII match in ``text_col`` in place. With
    ``count=True`` also appends one int64 ``pii_<name>`` column per
    pattern (a second regex pass each — opt in when the telemetry is
    worth 2x the regex cost)."""
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    col = batch[text_col]
    counts: dict[str, pa.Array] = {}
    for name, rx, repl in pats:
        if count:
            counts[f"pii_{name}"] = pc.cast(
                pc.count_substring_regex(col, rx), pa.int64()
            )
        col = pc.replace_substring_regex(col, rx, repl)
    out = batch.set_column(
        batch.column_names.index(text_col), text_col, col
    )
    for cname, arr in counts.items():
        out = out.append_column(cname, arr)
    return out


def redact_dataset(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    count: bool = False,
    **map_kw,
) -> "ray.data.Dataset":
    return ds.map_batches(
        redact_batch,
        batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "patterns": patterns, "count": count},
        **map_kw,
    )


def chunk_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 64,
) -> pa.Table:
    """Split each document into <=max_tokens token windows advancing by
    ``max_tokens - overlap``; emits (id_col, chunk_id, n_tokens,
    text_col) rows with whitespace-normalized chunk text (the substr.py
    token-space contract). Null/empty docs emit zero chunks. Fully
    vectorized: per-chunk token offsets are computed batch-wide, chunk
    text is one LargeListArray take + binary_join."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap {overlap} must satisfy 0 <= overlap < max_tokens "
            f"{max_tokens} (negative overlap silently drops tokens)"
        )
    step = max_tokens - overlap
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, counts = _tokenize(batch[text_col])
    starts = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    # chunks per doc: ceil((count - overlap) / step) for count>0, min 1
    n_chunks = np.zeros(len(counts), dtype=np.int64)
    nz = counts > 0
    n_chunks[nz] = np.maximum((counts[nz] - overlap + step - 1) // step, 1)
    total = int(n_chunks.sum())
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("chunk_id", pa.int64()),
            ("n_tokens", pa.int64()),
            (text_col, pa.large_string()),
        ]
    )
    if total == 0:
        return pa.table(
            {
                id_col: np.empty(0, np.int64),
                "chunk_id": np.empty(0, np.int64),
                "n_tokens": np.empty(0, np.int64),
                text_col: pa.array([], type=pa.large_string()),
            },
            schema=out_schema,
        )
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), n_chunks)
    chunk_ends = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=chunk_ends[1:])
    chunk_id = np.arange(total, dtype=np.int64) - chunk_ends[doc_of]
    lo = starts[doc_of] + chunk_id * step
    hi = np.minimum(lo + max_tokens, starts[doc_of + 1])
    offsets = np.empty(total + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(hi - lo, out=offsets[1:])
    take_idx = np.repeat(lo, hi - lo) + (
        np.arange(int(offsets[-1]), dtype=np.int64)
        - np.repeat(offsets[:-1], hi - lo)
    )
    gathered = flat.take(pa.array(take_idx)).cast(pa.large_string())
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), gathered)
    joined = pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
    return pa.table(
        {
            id_col: ids[doc_of],
            "chunk_id": chunk_id,
            "n_tokens": hi - lo,
            text_col: joined,
        },
        schema=out_schema,
    )


def chunk_dataset(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 64,
    **map_kw,
) -> "ray.data.Dataset":
    return ds.map_batches(
        chunk_batch,
        batch_format="pyarrow",
        fn_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "max_tokens": max_tokens,
            "overlap": overlap,
        },
        **map_kw,
    )
