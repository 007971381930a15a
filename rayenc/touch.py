"""Anti-DCE touch folds shared by the CLI bench-read paths and the
histogram ingestion pipeline (library code must not import the CLI
module — round-4 self-review layering fix).

Both folds implement the parqbench counter semantics
(/root/reference/src/bin/parqbench/main.rs:58-214): numeric -> int
value, strings/binary -> length, null -> 1, lists -> fold elements —
and agree bit-for-bit so the row and columnar read paths print the
same counter.
"""

from __future__ import annotations


def _touch_value(v) -> int:
    """Anti-DCE fold, the parqbench counter semantics
    (/root/reference/src/bin/parqbench/main.rs:58-169): numeric -> int
    value, strings/binary -> length, null -> 1, lists -> fold elements."""
    if v is None:
        return 1
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        import math

        # non-finite floats fold to 0, matching the columnar path's
        # isfinite filter (int(inf) raises, and the two counters must
        # agree bit-for-bit)
        return int(v) if math.isfinite(v) else 0
    if isinstance(v, int):
        return int(v)
    if isinstance(v, (str, bytes)):
        return len(v)
    if isinstance(v, list):
        return sum(_touch_value(x) for x in v)
    return 1


def _touch_column(col) -> int:
    """Vectorized fold with IDENTICAL semantics to _touch_value so both
    read paths print the same counter (the reference's two reader types
    agree on it, /root/reference/src/bin/parqbench/main.rs:58-214)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    nulls = col.null_count
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        # row path folds len(str) = CHARACTERS, not bytes
        s = pc.sum(pc.utf8_length(col)).as_py() or 0
        return int(s) + nulls
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        s = pc.sum(pc.binary_length(col)).as_py() or 0
        return int(s) + nulls
    if pa.types.is_floating(t):
        v = col.drop_null().to_numpy(zero_copy_only=False)
        return int(np.trunc(v[np.isfinite(v)]).sum()) + nulls
    if pa.types.is_integer(t) or pa.types.is_timestamp(t) or pa.types.is_date(t):
        v = pc.fill_null(col, 1)
        if pa.types.is_timestamp(t):
            v = v.view(pa.int64())
        return int(pc.sum(v.cast(pa.int64())).as_py() or 0)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        child_sum = _touch_column(pc.list_flatten(col))
        return child_sum + nulls
    return sum(_touch_value(v) for v in col.to_pylist())


