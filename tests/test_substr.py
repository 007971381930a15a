"""Exact duplicated-substring removal (stages/substr.py).

Constructed corpora with known duplicated spans; a pure-Python
reference implementation cross-checks the full pipeline on a random
corpus (the operator's driver-window slot is taken — the registry is
capped at the driver's 50-query window — so tests carry the oracle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayenc.stages.substr import apply_spans, dedup_substrings, duplicate_spans

DOC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=DOC_SCHEMA))


def _result(ds):
    out = pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df


WORDS = [f"w{i}" for i in range(40)]
SHARED = " ".join(WORDS[:10])  # a 10-token span, duplicated verbatim


def test_duplicated_span_removed_from_non_owner():
    rows = [
        {"doc_id": 1, "text": SHARED + " unique tail one"},
        {"doc_id": 2, "text": "other head text " + SHARED},
        {"doc_id": 3, "text": "totally different words here altogether"},
    ]
    df = _result(dedup_substrings(_ds(rows), k=8, n_buckets=8, n_doc_buckets=4))
    # doc 1 owns the span (min doc_id); doc 2 loses all 10 shared tokens
    assert df.loc[0, "removed_tokens"] == 0
    assert df.loc[0, "text"] == SHARED + " unique tail one"
    assert df.loc[1, "removed_tokens"] == 10
    assert df.loc[1, "text"] == "other head text"
    assert df.loc[2, "removed_tokens"] == 0


def test_long_run_merges_overlapping_windows():
    long_span = " ".join(WORDS[:20])  # 20 tokens -> 13 overlapping windows
    rows = [
        {"doc_id": 1, "text": long_span},
        {"doc_id": 2, "text": "prefix " + long_span + " suffix"},
    ]
    df = _result(dedup_substrings(_ds(rows), k=8, n_buckets=8, n_doc_buckets=4))
    assert df.loc[1, "removed_tokens"] == 20
    assert df.loc[1, "text"] == "prefix suffix"


def test_within_doc_self_repeat():
    rows = [{"doc_id": 7, "text": SHARED + " middle bit " + SHARED}]
    df = _result(dedup_substrings(_ds(rows), k=8, n_buckets=8, n_doc_buckets=4))
    assert df.loc[0, "removed_tokens"] == 10
    assert df.loc[0, "text"] == SHARED + " middle bit"


def test_short_docs_and_nulls_pass_through():
    rows = [
        {"doc_id": 1, "text": "tiny doc"},  # < k tokens: no windows
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "  spaced   out   tokens  "},
    ]
    df = _result(dedup_substrings(_ds(rows), k=8, n_buckets=8, n_doc_buckets=4))
    assert df["removed_tokens"].tolist() == [0, 0, 0, 0]
    assert df.loc[0, "text"] == "tiny doc"
    assert df.loc[1, "text"] is None
    assert df.loc[2, "text"] == ""
    # whitespace-normalized contract
    assert df.loc[3, "text"] == "spaced out tokens"


def test_spans_are_non_owner_occurrences_only():
    rows = [
        {"doc_id": 5, "text": SHARED},
        {"doc_id": 9, "text": SHARED},
        {"doc_id": 2, "text": SHARED},
    ]
    spans = pa.concat_tables(
        duplicate_spans(_ds(rows), k=10, n_buckets=8).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).to_pandas()
    # 3 identical docs, exactly one 10-token window each -> owner is
    # doc 2 (min id); docs 5 and 9 each carry one removal span
    assert sorted(spans["doc_id"].tolist()) == [5, 9]
    assert set(spans["start"]) == {0} and set(spans["end"]) == {10}


def test_reserved_names_raise():
    rows = [{"doc_id": 1, "text": "a b"}]
    tbl = pa.Table.from_pylist(rows, schema=DOC_SCHEMA).append_column(
        "__ss_kind", pa.array([1])
    )
    with pytest.raises(ValueError, match="reserved"):
        apply_spans(
            rd.from_arrow(tbl), _ds([]).limit(0), schema=tbl.schema
        )


def _py_reference(docs: dict[int, str], k: int) -> dict[int, tuple[str, int]]:
    """Independent per-token reimplementation of the contract."""
    toks = {i: t.split() if t else [] for i, t in docs.items()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i in sorted(toks):
        w = toks[i]
        for p in range(len(w) - k + 1):
            occ.setdefault(tuple(w[p : p + k]), []).append((i, p))
    cover = {i: np.zeros(len(toks[i]), dtype=bool) for i in toks}
    for key, places in occ.items():
        if len(places) < 2:
            continue
        for i, p in places[1:]:  # places is (doc,pos)-sorted by construction
            cover[i][p : p + k] = True
    out = {}
    for i, w in toks.items():
        kept = [t for t, c in zip(w, cover[i]) if not c]
        out[i] = (" ".join(kept), int(cover[i].sum()))
    return out


def test_random_corpus_matches_python_reference():
    rng = np.random.default_rng(17)
    vocab = [f"t{i}" for i in range(30)]
    docs = {}
    base = " ".join(rng.choice(vocab, 15))
    for i in range(25):
        body = " ".join(rng.choice(vocab, int(rng.integers(4, 40))))
        if i % 3 == 0:
            body = body + " " + base  # planted duplicate
        docs[i] = body
    rows = [{"doc_id": i, "text": t} for i, t in docs.items()]
    df = _result(dedup_substrings(_ds(rows), k=6, n_buckets=8, n_doc_buckets=4))
    ref = _py_reference(docs, k=6)
    for _, r in df.iterrows():
        exp_text, exp_removed = ref[r["doc_id"]]
        assert r["text"] == exp_text, r["doc_id"]
        assert r["removed_tokens"] == exp_removed, r["doc_id"]


def test_span_only_bucket_does_not_crash():
    """A doc bucket that receives only span rows (stray spans for an
    absent doc_id) must be tolerated, not IndexError (review finding)."""
    docs = _ds([{"doc_id": 0, "text": "a b c"}])
    spans = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([42], type=pa.int64()),
             "start": pa.array([0], type=pa.int64()),
             "end": pa.array([2], type=pa.int64())}
        )
    )
    df = _result(apply_spans(docs, spans, n_doc_buckets=32))
    assert df.loc[0, "text"] == "a b c" and df.loc[0, "removed_tokens"] == 0


def test_duplicate_spans_rejects_reserved_id_col():
    with pytest.raises(ValueError, match="reserved"):
        duplicate_spans(_ds([]), id_col="pos")
