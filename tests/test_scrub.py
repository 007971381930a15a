"""PII redaction + document chunking (stages/scrub.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rayenc.stages.scrub import (
    DEFAULT_PATTERNS,
    chunk_batch,
    chunk_dataset,
    redact_batch,
    redact_dataset,
)


def _tbl(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}
    )


def test_redact_all_default_patterns():
    t = _tbl(
        [
            "mail me at john.doe+spam@example.co.uk now",
            "server 192.168.001.1 is up",
            "key deadbeefdeadbeefdeadbeefdeadbeef end",
            "card 4111 1111 1111 1111 ok",
            "call +44 20 7946 0958 today",
            None,
            "clean text stays clean",
        ]
    )
    out = redact_batch(t)
    texts = out["text"].to_pylist()
    assert texts[0] == "mail me at <EMAIL> now"
    assert texts[1] == "server <IP> is up"
    assert texts[2] == "key <SECRET> end"
    assert texts[3] == "card <NUMBER> ok"
    assert texts[4] == "call <PHONE> today"
    assert texts[5] is None
    assert texts[6] == "clean text stays clean"


def test_redact_counts_opt_in():
    t = _tbl(["a@b.co and c@d.io", "nothing"])
    out = redact_batch(t, count=True)
    assert out["pii_email"].to_pylist() == [2, 0]
    assert set(out.column_names) >= {f"pii_{n}" for n, _, _ in DEFAULT_PATTERNS}
    # without the flag no count columns appear
    assert "pii_email" not in redact_batch(t).column_names


def test_redact_dataset_roundtrip():
    ds = rd.from_arrow(_tbl(["x@y.zz"] * 10))
    out = pa.concat_tables(
        redact_dataset(ds).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert out["text"].to_pylist() == ["<EMAIL>"] * 10


def test_chunk_exact_windows():
    words = [f"w{i}" for i in range(10)]
    t = _tbl([" ".join(words)], ids=[7])
    out = chunk_batch(t, max_tokens=4, overlap=1)
    # step=3, ceil((10-1)/3)=3 windows: [0:4],[3:7],[6:10] — the last
    # window reaches the end, so no redundant trailing chunk is emitted
    assert out["chunk_id"].to_pylist() == [0, 1, 2]
    assert out["n_tokens"].to_pylist() == [4, 4, 4]
    assert out["text"].to_pylist() == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
    ]
    assert out["doc_id"].to_pylist() == [7, 7, 7]


def test_chunk_short_null_empty_docs():
    t = _tbl(["only three words", None, "", "a b c d e f"], ids=[1, 2, 3, 4])
    out = chunk_batch(t, max_tokens=4, overlap=2)
    # doc 1: 3 tokens -> 1 chunk; docs 2,3: none; doc 4: 6 tokens, step 2
    got = {(r["doc_id"], r["chunk_id"]): r["text"] for r in out.to_pylist()}
    assert got[(1, 0)] == "only three words"
    assert not any(d in (2, 3) for d, _ in got)
    assert got[(4, 0)] == "a b c d"
    assert got[(4, 1)] == "c d e f"


def test_chunk_rejects_bad_overlap():
    with pytest.raises(ValueError, match="overlap"):
        chunk_batch(_tbl(["a"]), max_tokens=4, overlap=4)
    # Negative overlap makes step > max_tokens: silent token loss
    # between consecutive windows (ADVICE r4).
    with pytest.raises(ValueError, match="overlap"):
        chunk_batch(_tbl(["a"]), max_tokens=4, overlap=-1)


def test_chunk_dataset_coverage_property():
    rng = np.random.default_rng(5)
    texts = [
        " ".join(f"t{rng.integers(0, 99)}" for _ in range(int(n)))
        for n in rng.integers(1, 300, size=40)
    ]
    ds = rd.from_arrow(_tbl(texts))
    out = pa.concat_tables(
        chunk_dataset(ds, max_tokens=64, overlap=8).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).to_pandas()
    for i, text in enumerate(texts):
        toks = text.split()
        chunks = out[out["doc_id"] == i].sort_values("chunk_id")
        # windows advance by step=56 with 8-token overlap: dropping the
        # first 8 tokens of every chunk after the first rebuilds the doc
        rebuilt: list[str] = []
        for _, row in chunks.iterrows():
            ct = row["text"].split()
            rebuilt.extend(ct if not rebuilt else ct[len(rebuilt) - (row["chunk_id"] * 56) :])
        assert rebuilt == toks
        assert chunks["n_tokens"].max() <= 64
        assert chunks["n_tokens"].sum() >= len(toks)
        first = chunks.iloc[0]["text"].split()
        assert first == toks[: len(first)]
        last = chunks.iloc[-1]["text"].split()
        assert last == toks[-len(last) :]
