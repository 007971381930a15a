"""As-of join: each left row picks the nearest right row at-or-before
(backward) or at-or-after (forward) its timestamp, per key.

The operator the reference has no analog for (it has no joins at all —
SURVEY.md §2.5) but a training-data pipeline needs constantly: join an
event stream to the most recent model snapshot / price / config row.

Ray-Data-first shape (same pattern as dedup.anti_join_ids): both sides
are tagged with ``hash(key) % n_buckets`` and a side marker, unioned
under ONE PINNED schema (each side null-padded to the union schema —
schema-less empty blocks are the round-3 flake class), shuffled with a
single sort-based groupby(bucket), and each bucket resolves its matches
with pandas ``merge_asof`` (vectorized C merge over ts-sorted frames,
``by=`` key) inside ``map_groups``. Nothing passes through the driver;
skew is bounded by the key-hash bucketing.

Partitioning assumption: one bucket's rows (both sides) fit one task —
true whenever any single join key's rows do (the same assumption every
keyed groupby in this repo makes); salt hot keys upstream if not.

Determinism: when several right rows share (key, ts), the LAST one in
bucket sort order wins — pre-aggregate the right side to unique
(key, ts) rows (as q_events_asof_join does) for a fully deterministic
result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_SIDE, _BUCKET = "__asof_side", "__asof_b"


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    n_buckets: int = 64,
    direction: str = "backward",
) -> "ray.data.Dataset":
    """Left as-of join. Output = every left row + ``right_values`` from
    its matched right row (null when no right row qualifies).

    ``left_key``/``right_key`` must be integer-typed (hash-bucketed);
    ``left_ts``/``right_ts`` must share a comparable type (timestamp or
    numeric). ``right_values`` must not collide with left column names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    lschema = _arrow_schema(left.schema())
    rschema = _arrow_schema(right.schema())
    lnames = list(lschema.names)
    clash = {_SIDE, _BUCKET} & (set(lnames) | set(right_values))
    if clash:
        raise ValueError(f"asof_join reserved column names in input: {clash}")
    overlap = set(right_values) & set(lnames)
    if overlap:
        raise ValueError(f"right_values collide with left columns: {overlap}")
    for c in (right_key, right_ts, *right_values):
        if c not in rschema.names:
            raise ValueError(f"asof_join: column {c!r} not in right schema")
    for c in (left_key, left_ts):
        if c not in lnames:
            raise ValueError(f"asof_join: column {c!r} not in left schema")

    # pinned union schema: left cols + right value cols + side + bucket
    fields = list(lschema) + [
        pa.field(v, rschema.field(v).type) for v in right_values
    ]
    union_schema = (
        pa.schema(fields)
        .append(pa.field(_SIDE, pa.int8()))
        .append(pa.field(_BUCKET, pa.int32()))
    )

    from .hashing import splitmix64

    def _bucket(ids) -> pa.Array:
        u = ids.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array(
            (splitmix64(u) % np.uint64(n_buckets)).astype(np.int32),
            type=pa.int32(),
        )

    def _pad(t: pa.Table, cols: dict, side: int, key_arr) -> pa.Table:
        n = t.num_rows
        out = {}
        for f in union_schema:
            if f.name == _SIDE:
                out[f.name] = pa.array([side] * n, type=pa.int8())
            elif f.name == _BUCKET:
                out[f.name] = _bucket(key_arr)
            elif f.name in cols:
                col = cols[f.name]
                out[f.name] = (
                    col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                ).cast(f.type)
            else:
                out[f.name] = pa.nulls(n, type=f.type)
        return pa.table(out, schema=union_schema)

    def tag_left(t: pa.Table) -> pa.Table:
        return _pad(t, {c: t[c] for c in t.column_names}, 0, t[left_key])

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {left_key: t[right_key], left_ts: t[right_ts]}
        cols.update({v: t[v] for v in right_values})
        return _pad(t, cols, 1, t[right_key])

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    import pandas as pd

    out_names = lnames + list(right_values)
    # typed empty frame: empty/missing-side outputs must keep real
    # dtypes, or Ray sees schema-less blocks (the round-3 flake class)
    out_schema = pa.schema(
        [union_schema.field(n) for n in out_names]
    )
    empty_pdf = out_schema.empty_table().to_pandas()

    def _pin(df: "pd.DataFrame") -> pa.Table:
        # hand Ray an arrow table with the schema pinned explicitly —
        # pandas outputs with all-null columns degrade to null-typed
        # arrow blocks at the task boundary (the round-3 flake class)
        return pa.Table.from_pandas(
            df.reset_index(drop=True), schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    import pyarrow.compute as pc

    def join_bucket(t: pa.Table) -> pa.Table:
        # split sides in ARROW before any pandas conversion: the union
        # table null-pads each side's missing columns, and converting a
        # nulled int64 column to pandas goes through float64 (precision
        # loss past 2^53 for id columns). Each side's own columns are
        # null-free after the filter, so to_pandas keeps exact dtypes.
        side = t[_SIDE]
        ldf = t.filter(pc.equal(side, 0)).select(lnames).to_pandas()
        rdf = (
            t.filter(pc.equal(side, 1))
            .select([left_key, left_ts, *right_values])
            .to_pandas()
        )
        if not len(ldf):
            return out_schema.empty_table()
        ldf = ldf.sort_values(left_ts, kind="mergesort").reset_index(drop=True)
        if not len(rdf):
            return _pin(ldf.reindex(columns=out_names))
        rdf = rdf.sort_values(left_ts, kind="mergesort").reset_index(drop=True)
        merged = pd.merge_asof(
            ldf,
            rdf,
            on=left_ts,
            by=left_key,
            direction=direction,
            allow_exact_matches=True,
        )
        return _pin(merged[out_names])

    return tagged.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")


def _arrow_schema(schema) -> pa.Schema:
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    if isinstance(schema, pa.Schema):
        return schema
    return pa.schema(
        [(n, pa.from_numpy_dtype(t)) for n, t in zip(schema.names, schema.types)]
    )
