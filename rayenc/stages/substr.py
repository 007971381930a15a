"""Exact duplicated-substring removal — the span-level dedup pass of
large-scale training-data pipelines (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better", re-derived Ray-Data-first;
the suffix-array machinery of the paper is replaced by a k-token
rolling-hash inverted index, which is the shuffle-friendly formulation).

Semantics: any k-token window whose hash occurs more than once across
the corpus (or within one document) is a duplicated span; every
occurrence EXCEPT the owner (lexicographically first by ``(hash,
doc_id, pos)``) is removed from its document. Runs longer than k
tokens produce overlapping flagged windows that merge into one removed
span via a difference-array cover mask. Output text is
whitespace-normalized (tokens joined by single spaces) — the standard
contract for token-space dedup; positions are token indices, so both
passes tokenize with the SAME Arrow kernel (utf8_split_whitespace).

Scale shape (100 TB): the shingle stream is ~one row per corpus token
(hash + id + pos, no text) — that volume is inherent to substring-level
dedup and shuffles ONCE, bucketed by ``hash % n_buckets`` exactly like
dedup_exact; document text shuffles once, bucketed by
``doc_id % n_doc_buckets``. Nothing passes through the driver. Hash
collisions (64-bit polynomial) can merge unrelated spans at ~2^-64 per
pair; acceptable for a dedup pass and documented here.

Reference parity anchor: extends the dedup family contract of
/root/reference's pipeline scope (SURVEY.md §2.5); sibling operators
in stages/dedup.py.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_POLY_BASE = np.uint64(1099511628211)

_SPAN_FIELDS = [("start", pa.int64()), ("end", pa.int64())]
_RESERVED = ("__ss_kind", "__ss_b", "__ss_start", "__ss_end")


def flatten_nonempty(
    lists: pa.ChunkedArray | pa.Array,
    transform=None,
) -> tuple[pa.Array, np.ndarray]:
    """Flatten a list<string> column to (flat elements, per-row counts),
    dropping empty elements (split kernels emit them at string edges:
    "  a " -> ["", "a", ""]). Null rows count 0. ``transform`` runs on
    the flat array BEFORE the empty-drop (e.g. trim). The one
    implementation behind word tokenization here and line splitting in
    text.py (review rule: the filter/bincount idiom must not fork)."""
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    counts = (
        pc.list_value_length(lists)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if transform is not None:
        flat = transform(flat)
    nonempty = pc.not_equal(pc.binary_length(flat), 0)
    ne = np.asarray(nonempty)
    if len(ne) and not ne.all():
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        counts = np.bincount(doc_of[ne], minlength=len(counts)).astype(np.int64)
        flat = flat.filter(nonempty)
    return flat, counts


def _tokenize(texts: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """(flat token array, per-doc token counts). Null docs count 0."""
    return flatten_nonempty(pc.utf8_split_whitespace(texts))


def _token_hashes(flat: pa.Array) -> np.ndarray:
    """uint64 hash per token, vectorized via unique-token hashing
    (the _hash_words_vec discipline, minus the Python list round-trip)."""
    from .hashing import hash_array_64

    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    d = pc.dictionary_encode(flat)
    uh = hash_array_64(d.dictionary, seed=11)
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uh[idx]


def _window_hashes(
    H: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hash, doc_index, token_pos) for every full-k window that stays
    inside one document. One vectorized polynomial roll over the
    concatenated token-hash stream (the _batch_shingles shape)."""
    total = int(counts.sum())
    n_win = total - k + 1
    if n_win <= 0:
        e = np.empty(0, dtype=np.uint64)
        return e, np.empty(0, np.int64), np.empty(0, np.int64)
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    valid = doc_of[:n_win] == doc_of[k - 1 :]
    acc = np.zeros(n_win, dtype=np.uint64)
    with np.errstate(over="ignore"):  # intentional wraparound
        mult = np.uint64(1)
        for j in range(k - 1, -1, -1):
            acc += H[j : j + n_win] * mult
            mult = mult * _POLY_BASE
    docs = doc_of[:n_win][valid]
    pos = np.flatnonzero(valid) - starts[docs]
    return acc[valid], docs, pos


def duplicate_spans(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """All non-owner occurrences of corpus-duplicated k-token windows,
    as ``(id_col, start, end)`` token-index spans (end exclusive).
    Adjacent/overlapping windows are NOT merged here — apply_spans (or
    any consumer) merges; this keeps the operator a pure inverted-index
    scan with one bucketed shuffle."""
    if id_col in ("h", "pos", "_b"):
        raise ValueError(
            f"duplicate_spans reserved internal column name as id_col: {id_col}"
        )

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, counts = _tokenize(batch[text_col])
        h, docs, pos = _window_hashes(_token_hashes(flat), counts, k)
        return pa.table(
            {
                "h": h,
                id_col: ids[docs] if len(docs) else np.empty(0, np.int64),
                "pos": pos,
                "_b": (h % np.uint64(n_buckets)).astype(np.int32),
            },
            schema=pa.schema(
                [
                    ("h", pa.uint64()),
                    (id_col, pa.int64()),
                    ("pos", pa.int64()),
                    ("_b", pa.int32()),
                ]
            ),
        )

    shingled = ds.map_batches(emit, batch_format="pyarrow")
    span_schema = pa.schema([(id_col, pa.int64())] + _SPAN_FIELDS)

    def non_owners(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids, h))
        hs = h[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        drop = order[~first]  # every occurrence after the owner
        return pa.table(
            {id_col: ids[drop], "start": pos[drop], "end": pos[drop] + k},
            schema=span_schema,
        )

    return shingled.groupby("_b").map_groups(non_owners, batch_format="pyarrow")


def apply_spans(
    ds: "ray.data.Dataset",
    spans: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_doc_buckets: int = 32,
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Cut token-index spans out of documents; returns
    ``(id_col, text_col, removed_tokens)`` with whitespace-normalized
    text. Union-bucketed like anti_join_ids: docs and spans tagged with
    ``doc_id % n_doc_buckets`` under one pinned schema, one sort-based
    groupby shuffle, vectorized difference-array cover + Arrow
    binary_join rebuild inside each bucket. Pass ``schema`` when known
    (Dataset.schema() downstream of transforms executes the plan)."""
    if schema is None:
        schema = ds.schema()
    clash = set(_RESERVED) & set(schema.names)
    if clash:
        raise ValueError(f"apply_spans reserved column names in input: {clash}")

    union_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (text_col, pa.large_string()),
            ("__ss_start", pa.int64()),
            ("__ss_end", pa.int64()),
            ("__ss_kind", pa.int8()),
            ("__ss_b", pa.int32()),
        ]
    )

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(b)
        return pa.table(
            {
                id_col: ids,
                text_col: b[text_col].cast(pa.large_string()),
                "__ss_start": pa.nulls(n, pa.int64()),
                "__ss_end": pa.nulls(n, pa.int64()),
                "__ss_kind": np.zeros(n, dtype=np.int8),
                "__ss_b": (ids % n_doc_buckets).astype(np.int32),
            },
            schema=union_schema,
        )

    def tag_spans(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(b)
        return pa.table(
            {
                id_col: ids,
                text_col: pa.nulls(n, pa.large_string()),
                "__ss_start": b["start"].cast(pa.int64()),
                "__ss_end": b["end"].cast(pa.int64()),
                "__ss_kind": np.ones(n, dtype=np.int8),
                "__ss_b": (ids % n_doc_buckets).astype(np.int32),
            },
            schema=union_schema,
        )

    unioned = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        spans.map_batches(tag_spans, batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (text_col, pa.large_string()),
            ("removed_tokens", pa.int64()),
        ]
    )

    def cut(g: pa.Table) -> pa.Table:
        kind = g["__ss_kind"].to_numpy(zero_copy_only=False)
        docs = g.filter(pa.array(kind == 0))
        sp = g.filter(pa.array(kind == 1))
        ids = docs[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        docs = docs.take(pa.array(order))
        ids = ids[order]
        texts = docs[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        null_doc = np.asarray(pc.is_null(texts))
        flat, counts = _tokenize(texts)
        starts = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        total = int(starts[-1])
        covered = np.zeros(total + 1, dtype=np.int64)
        if len(sp) and len(ids):
            sid = sp[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            st = sp["__ss_start"].to_numpy(zero_copy_only=False).astype(np.int64)
            en = sp["__ss_end"].to_numpy(zero_copy_only=False).astype(np.int64)
            di = np.searchsorted(ids, sid)
            # spans for ids not in this bucket's docs (caller error) or
            # clipped past the doc's token count are bounded to the doc
            ok = (di < len(ids)) & (ids[np.minimum(di, len(ids) - 1)] == sid)
            di, st, en = di[ok], st[ok], en[ok]
            lo = starts[di] + np.clip(st, 0, counts[di])
            hi = starts[di] + np.clip(en, 0, counts[di])
            np.add.at(covered, lo, 1)
            np.subtract.at(covered, hi, 1)
        keep_mask = np.cumsum(covered[:-1]) == 0
        kept_flat = flat.filter(pa.array(keep_mask)) if total else flat
        if total:
            doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            kept_counts = np.bincount(
                doc_of[keep_mask], minlength=len(counts)
            ).astype(np.int64)
        else:
            kept_counts = np.zeros(len(counts), dtype=np.int64)
        kept_off = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=kept_off[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(kept_off, type=pa.int64()), kept_flat.cast(pa.large_string())
        )
        joined = pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
        if null_doc.any():
            joined = pc.if_else(pa.array(null_doc), pa.nulls(len(ids), pa.large_string()), joined)
        return pa.table(
            {
                id_col: ids,
                text_col: joined,
                "removed_tokens": counts - kept_counts,
            },
            schema=out_schema,
        )

    return unioned.groupby("__ss_b").map_groups(cut, batch_format="pyarrow")


def dedup_substrings(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_buckets: int = 64,
    n_doc_buckets: int = 32,
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """End-to-end: find corpus-duplicated k-token spans, remove every
    non-owner occurrence, return cleaned documents
    ``(id_col, text_col, removed_tokens)``."""
    spans = duplicate_spans(
        ds, text_col=text_col, id_col=id_col, k=k, n_buckets=n_buckets
    )
    return apply_spans(
        ds,
        spans,
        text_col=text_col,
        id_col=id_col,
        n_doc_buckets=n_doc_buckets,
        schema=schema,
    )
