"""As-of join operator (rayenc/stages/asof.py): correctness vs a
pandas merge_asof reference, null handling, directions, and the
empty-side / schema-pinning behavior the round-3 flake class demands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayenc.stages.asof import asof_join


def _ds(ray, tbl: pa.Table):
    import ray.data as rd

    return rd.from_arrow(tbl)


def _collect(ds) -> pd.DataFrame:
    parts = [
        b.to_pandas()
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pd.DataFrame()
    return (
        pd.concat(parts, ignore_index=True)
        .sort_values("lid")
        .reset_index(drop=True)
    )


def _mk_inputs(seed=7, n_left=400, n_right=120, n_keys=17):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "lid": pa.array(np.arange(n_left), type=pa.int64()),
            "k": pa.array(rng.integers(0, n_keys, n_left), type=pa.int64()),
            "ts": pa.array(rng.integers(0, 10_000, n_left), type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(rng.integers(0, n_keys, n_right), type=pa.int64()),
            "ts": pa.array(
                # unique (k, ts) pairs for determinism
                np.arange(n_right) * 83 % 10_000,
                type=pa.int64(),
            ),
            "val": pa.array(rng.normal(size=n_right), type=pa.float64()),
        }
    )
    return left, right


def _reference(left: pa.Table, right: pa.Table, direction: str) -> pd.DataFrame:
    ldf = left.to_pandas().sort_values("ts", kind="mergesort")
    rdf = right.to_pandas().sort_values("ts", kind="mergesort")
    out = pd.merge_asof(ldf, rdf, on="ts", by="k", direction=direction)
    return out.sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_reference(ray_session, direction):
    left_t, right_t = _mk_inputs()
    got = _collect(
        asof_join(
            _ds(ray_session, left_t),
            _ds(ray_session, right_t),
            left_key="k",
            right_key="k",
            left_ts="ts",
            right_ts="ts",
            right_values=["val"],
            n_buckets=8,
            direction=direction,
        )
    )
    want = _reference(left_t, right_t, direction)
    assert len(got) == len(want) == left_t.num_rows
    pd.testing.assert_frame_equal(
        got[["lid", "k", "ts", "val"]], want[["lid", "k", "ts", "val"]]
    )


def test_asof_empty_right_yields_typed_nulls(ray_session):
    left_t, right_t = _mk_inputs(n_left=50, n_right=0)
    out = asof_join(
        _ds(ray_session, left_t),
        _ds(ray_session, right_t),
        left_key="k",
        right_key="k",
        left_ts="ts",
        right_ts="ts",
        right_values=["val"],
        n_buckets=4,
    )
    got = _collect(out)
    assert len(got) == 50
    assert got["val"].isna().all()
    assert got["val"].dtype == np.float64  # typed, not object
    assert got["lid"].dtype == np.int64


def test_asof_exact_match_and_no_earlier_row(ray_session):
    left_t = pa.table(
        {
            "lid": pa.array([0, 1, 2], type=pa.int64()),
            "k": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array([5, 10, 3], type=pa.int64()),
        }
    )
    right_t = pa.table(
        {
            "k": pa.array([1, 1], type=pa.int64()),
            "ts": pa.array([5, 9], type=pa.int64()),
            "val": pa.array([1.5, 2.5], type=pa.float64()),
        }
    )
    got = _collect(
        asof_join(
            _ds(ray_session, left_t),
            _ds(ray_session, right_t),
            left_key="k",
            right_key="k",
            left_ts="ts",
            right_ts="ts",
            right_values=["val"],
            n_buckets=2,
        )
    )
    # ts=5 matches exactly; ts=10 takes ts=9; ts=3 has no earlier row
    assert got["val"].tolist()[:2] == [1.5, 2.5]
    assert np.isnan(got["val"].iloc[2])


def test_asof_large_int64_and_nullable_values_exact(ray_session):
    """Right value columns never round-trip through pandas: int64 ids
    past 2^53 survive bit-exact and nullable values stay null."""
    big = 2**62 + 12345
    left_t = pa.table(
        {
            "lid": pa.array([0, 1, 2], type=pa.int64()),
            "k": pa.array([1, 1, 2], type=pa.int64()),
            "ts": pa.array([10, 20, 10], type=pa.int64()),
        }
    )
    right_t = pa.table(
        {
            "k": pa.array([1, 1, 2], type=pa.int64()),
            "ts": pa.array([5, 15, 5], type=pa.int64()),
            "snap": pa.array([big, big + 1, None], type=pa.int64()),
        }
    )
    ds = asof_join(
        _ds(ray_session, left_t),
        _ds(ray_session, right_t),
        left_key="k",
        right_key="k",
        left_ts="ts",
        right_ts="ts",
        right_values=["snap"],
        n_buckets=4,
    )
    got = pa.concat_tables(
        b
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ).sort_by("lid")
    assert got["snap"].type == pa.int64()
    assert got["snap"].to_pylist() == [big, big + 1, None]  # bit-exact, no 2^53 rounding


def test_asof_null_merge_keys_raise(ray_session):
    left_t = pa.table(
        {
            "lid": pa.array([0, 1], type=pa.int64()),
            "k": pa.array([1, None], type=pa.int64()),
            "ts": pa.array([5, 6], type=pa.int64()),
        }
    )
    right_t = pa.table(
        {
            "k": pa.array([1], type=pa.int64()),
            "ts": pa.array([3], type=pa.int64()),
            "val": pa.array([1.0], type=pa.float64()),
        }
    )
    ds = asof_join(
        _ds(ray_session, left_t),
        _ds(ray_session, right_t),
        left_key="k",
        right_key="k",
        left_ts="ts",
        right_ts="ts",
        right_values=["val"],
        n_buckets=2,
    )
    with pytest.raises(Exception, match="null"):
        _collect(ds)


def test_interval_join_validity_windows(ray_session):
    """Non-overlapping validity windows: each left ts matches the window
    containing it, gap rows and post-expiry rows get nulls, open-ended
    (null end) windows stay alive."""
    from rayenc.stages.asof import interval_join

    left_t = pa.table(
        {
            "lid": pa.array(list(range(6)), type=pa.int64()),
            "k": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
            # windows for k=1: [0,10) v=1.0, [10,20) v=2.0, gap, [30,None) v=3.0
            "ts": pa.array([5, 10, 25, 31, 7, 100], type=pa.int64()),
        }
    )
    right_t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], type=pa.int64()),
            "start": pa.array([0, 10, 30, 50], type=pa.int64()),
            "end": pa.array([10, 20, None, 60], type=pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 9.0], type=pa.float64()),
        }
    )
    ds = interval_join(
        _ds(ray_session, left_t),
        _ds(ray_session, right_t),
        left_key="k",
        right_key="k",
        left_ts="ts",
        right_start="start",
        right_end="end",
        right_values=["v"],
        n_buckets=4,
    )
    got = _collect(ds)
    assert len(got) == 6
    vals = got["v"].tolist()
    assert vals[0] == 1.0  # ts=5 inside [0,10)
    assert vals[1] == 2.0  # ts=10: first window closed, second open
    assert np.isnan(vals[2])  # ts=25: in the gap
    assert vals[3] == 3.0  # ts=31: open-ended window
    assert np.isnan(vals[4])  # k=2 ts=7: before any window
    assert np.isnan(vals[5])  # k=2 ts=100: window [50,60) expired


def test_asof_reserved_and_colliding_names_raise(ray_session):
    left_t, right_t = _mk_inputs(n_left=5, n_right=5)
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            _ds(ray_session, left_t),
            _ds(ray_session, right_t),
            left_key="k",
            right_key="k",
            left_ts="ts",
            right_ts="ts",
            right_values=["k"],
        )
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            _ds(ray_session, left_t),
            _ds(ray_session, right_t),
            left_key="k",
            right_key="k",
            left_ts="ts",
            right_ts="ts",
            right_values=["val"],
            direction="nearest",
        )
    with pytest.raises(ValueError, match="not in right schema"):
        asof_join(
            _ds(ray_session, left_t),
            _ds(ray_session, right_t),
            left_key="k",
            right_key="k",
            left_ts="ts",
            right_ts="ts",
            right_values=["missing"],
        )
