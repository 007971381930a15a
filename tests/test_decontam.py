"""Benchmark n-gram decontamination (stages/decontam.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from rayenc.stages.decontam import benchmark_ngram_hashes, flag_contaminated

EVAL_ITEM = "what is the capital of france the answer is paris obviously today"  # 12 tokens


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}
        )
    )


def _run(ds, bench, **kw):
    out = pa.concat_tables(
        flag_contaminated(ds, bench, **kw).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_verbatim_quote_is_flagged():
    docs = _docs(
        [
            "some training text that quotes " + EVAL_ITEM + " word for word",
            "entirely unrelated content about cooking pasta at home tonight "
            "with fresh tomatoes and basil leaves from the garden",
            None,
        ]
    )
    df = _run(docs, [EVAL_ITEM], k=12)
    assert df.loc[0, "contaminated"] and df.loc[0, "contaminated_ngrams"] >= 1
    assert not df.loc[1, "contaminated"]
    assert not df.loc[2, "contaminated"] and df.loc[2, "contaminated_ngrams"] == 0


def test_partial_overlap_below_k_not_flagged():
    # shares only 6 consecutive tokens with the eval item; k=12 windows
    # never match
    docs = _docs(["what is the capital of france you may wonder sometimes"])
    df = _run(docs, [EVAL_ITEM], k=12)
    assert not df.loc[0, "contaminated"]


def test_short_benchmark_items_contribute_nothing():
    assert len(benchmark_ngram_hashes(["too short", None, ""], k=13)) == 0
    df = _run(_docs(["any text at all " * 10]), ["too short"], k=13)
    assert not df.loc[0, "contaminated"]


def test_hit_count_matches_window_count():
    # doc = eval item repeated twice -> its 12-token windows hit repeatedly
    doc = EVAL_ITEM + " " + EVAL_ITEM
    df = _run(_docs([doc]), [EVAL_ITEM], k=12)
    # 24 tokens -> 13 windows; windows fully inside either copy match (2),
    # straddling windows don't
    assert df.loc[0, "contaminated_ngrams"] == 2
    assert df.loc[0, "contaminated"]


def test_benchmark_hashes_sorted_unique():
    h = benchmark_ngram_hashes([EVAL_ITEM, EVAL_ITEM, EVAL_ITEM + " extra"], k=12)
    assert len(h) == 2  # one window for the 12-token item, one more for +1 token
    assert np.all(np.diff(h.astype(np.uint64)) > 0)


def test_near_verbatim_quote_normalized_and_flagged():
    """Capitalization and punctuation drift must not defeat the rule
    (review finding: the published rule normalizes text first)."""
    quoted = "What is the capital of France? The answer is Paris, obviously, today."
    docs = _docs(["my quiz says: " + quoted + " end of quote"])
    df = _run(docs, [EVAL_ITEM], k=12)
    assert df.loc[0, "contaminated"]


def test_non_latin_text_survives_normalization():
    # normalization is utf8_lower + punctuation strip, NOT full Unicode
    # case folding (Greek final sigma: upper('ς')->'Σ'->lower->'σ'), so
    # the realistic drift here is sentence capitalization + punctuation
    item = "τι είναι η πρωτεύουσα της γαλλίας η απάντηση είναι το παρίσι σήμερα"
    quoted = "Τι είναι η πρωτεύουσα της γαλλίας; Η απάντηση είναι το παρίσι, σήμερα."
    docs = _docs(["quote: " + quoted, "άσχετο κείμενο χωρίς καμία επικάλυψη"])
    df = _run(docs, [item], k=12)
    assert df.loc[0, "contaminated"]
    assert not df.loc[1, "contaminated"]
