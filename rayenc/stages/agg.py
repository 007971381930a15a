"""Pre-aggregated grouped aggregation for LOW-CARDINALITY keys.

The scale pattern from the Ray guide: a bare groupby shuffles every row;
when the group count is small (lang: ~10, returnflag: 3), compute
partials per batch inside map_batches (one row per key per batch) and
combine the tiny partials on the driver — zero shuffle, bounded driver
memory (groups x batches rows). For high-cardinality keys (exact-dedup
hashes) use the real groupby instead (see dedup.dedup_exact).

ops: count, sum, min, max  (all partial-combinable; distinct counts are
done by first partial-aggregating the (key, value) pair space).
"""

from __future__ import annotations

import pandas as pd

import ray.data

_COMBINE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def grouped_agg_lowcard(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
) -> pd.DataFrame:
    """aggs: out_col -> (src_col, op) with op in count|sum|min|max;
    (None, 'count') counts rows. Returns a combined pandas frame sorted
    by keys."""

    def _agg(g, src, op):
        if op == "count":
            return g.size()  # COUNT(*): rows, null aggregands included
        if op == "sum":
            # SQL parity: SUM over an all-NULL group is NULL, not 0
            # (pandas sum() defaults to 0 on empty/all-NaN)
            return g[src].sum(min_count=1)
        return getattr(g[src], op)()

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL GROUP BY emits a NULL-key group; pandas'
        # default silently drops those rows
        g = batch.groupby(keys, sort=False, dropna=False)
        out = {out_col: _agg(g, src, op) for out_col, (src, op) in aggs.items()}
        return pd.DataFrame(out).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if partials.empty:
        return partials
    g = partials.groupby(keys, sort=True, dropna=False)
    combined = {}
    for out_col, (_, op) in aggs.items():
        op2 = _COMBINE[op]
        col = g[out_col]
        combined[out_col] = (
            col.sum(min_count=1) if op2 == "sum" else getattr(col, op2)()
        )
    return pd.DataFrame(combined).reset_index()
