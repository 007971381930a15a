"""Round-5 self-review regression tests (queries layer).

The codec/backfill findings from the same review live next to their
subjects (test_codecs.py, test_compact.py, test_cnative.py); this file
holds the query-level ones."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_selector_stats_by_lang_sum_over_all_null_is_null(ray_session, tmp_path):
    """SQL parity through the driver fold: a lang whose n_chars values
    are ALL NULL must emit total_chars = NULL (SUM over all-NULL), not
    0 — grouped_agg_lowcard enforces min_count=1 in the partials and
    the per-lang pandas fold must preserve it."""
    from rayenc.pipelines.queries import QUERIES

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(6), type=pa.int64()),
            "text": pa.array(["x"] * 6, type=pa.string()),
            "lang": pa.array(["en", "en", "xx", "xx", "de", "de"]),
            "source": pa.array(["s0", "s1", "s0", "s0", "s1", "s1"]),
            "n_chars": pa.array([5, 7, None, None, 3, None], type=pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    out = QUERIES["selector_stats_by_lang"](str(d))
    rows = {r["lang"]: r for r in out.to_pylist()}
    assert rows["en"]["total_chars"] == 12
    assert rows["de"]["total_chars"] == 3  # partial-NULL sums skip nulls
    assert rows["xx"]["total_chars"] is None  # all-NULL -> NULL, not 0
    assert rows["xx"]["n_docs"] == 2
