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

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False)
        out = {}
        for out_col, (src, op) in aggs.items():
            if op == "count":
                out[out_col] = g.size()
            else:
                out[out_col] = getattr(g[src], op)()
        return pd.DataFrame(out).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if partials.empty:
        return partials
    g = partials.groupby(keys, sort=True)
    combined = {}
    for out_col, (_, op) in aggs.items():
        combined[out_col] = getattr(g[out_col], _COMBINE[op])()
    return pd.DataFrame(combined).reset_index()
