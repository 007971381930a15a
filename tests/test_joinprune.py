"""Bloom-sideband membership join: exactness regardless of filter
quality, no false negatives, pre-shuffle pruning effectiveness, and the
anti_join_ids delegation staying green."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from rayenc.bloom import array_probe_hashes, _probe_positions
from rayenc.stages.joinprune import (
    bloom_member_mask,
    bloom_size_bits,
    build_key_bloom,
    equi_join,
    membership_join,
)


def _ref_semi(data: pa.Table, keys: pa.Array, col: str) -> list:
    kept = data.filter(pc.is_in(data[col], value_set=keys.drop_null()))
    return sorted(kept[col].drop_null().to_pylist())


def test_bloom_mask_no_false_negatives(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.choice(100_000, size=500, replace=False).astype(np.int64)
    kd = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(4)
    packed_bytes = build_key_bloom(kd, "k", expected_keys=500)
    assert packed_bytes is not None
    packed = np.frombuffer(packed_bytes, dtype=np.uint8)
    # every true key passes
    mask = bloom_member_mask(pa.array(keys), packed)
    assert mask.all()
    # non-keys mostly fail (fp rate ~1% at 10 bits/key)
    non = np.setdiff1d(np.arange(100_000, 200_000, dtype=np.int64), keys)[:5000]
    fp = bloom_member_mask(pa.array(non), packed).mean()
    assert fp < 0.05, fp
    # nulls never pass
    assert not bloom_member_mask(pa.array([None], type=pa.int64()), packed).any()


def test_bloom_build_string_keys_and_unsupported(ray_session):
    kd = rd.from_arrow(pa.table({"k": pa.array(["a", "b", None, "c"])}))
    packed = build_key_bloom(kd, "k", expected_keys=3)
    assert packed is not None
    arr = np.frombuffer(packed, dtype=np.uint8)
    assert bloom_member_mask(pa.array(["a", "c"]), arr).all()
    assert not bloom_member_mask(pa.array(["zzz-not-a-key"]), arr).all()
    # unsupported key type (list) -> None -> callers skip pruning
    ld = rd.from_arrow(pa.table({"k": pa.array([[1], [2]], type=pa.list_(pa.int64()))}))
    assert build_key_bloom(ld, "k", expected_keys=2) is None


def test_semi_join_exact_with_forced_false_positives(ray_session):
    """A deliberately undersized filter (expected_keys=1 for 200 keys)
    floods the sideband with false positives — the exact bucketed pass
    must still produce the SQL-identical result."""
    rng = np.random.default_rng(11)
    ids = pa.table(
        {
            "id": pa.array(np.arange(2000, dtype=np.int64)),
            "v": pa.array(rng.standard_normal(2000)),
        }
    )
    keys = pa.array(rng.choice(4000, size=200, replace=False).astype(np.int64))
    ds = rd.from_arrow(ids).repartition(5)
    kd = rd.from_arrow(pa.table({"key": keys})).repartition(3)
    for expected in (1, 200):  # undersized (fp-flooded) and right-sized
        out = membership_join(
            ds, kd, id_col="id", key_col="key", mode="semi",
            schema=ids.schema, bloom_expected_keys=expected,
        ).to_pandas()
        assert sorted(out["id"]) == _ref_semi(ids, keys, "id")
    # no bloom at all: same answer
    out = membership_join(
        ds, kd, id_col="id", key_col="key", mode="semi", schema=ids.schema
    ).to_pandas()
    assert sorted(out["id"]) == _ref_semi(ids, keys, "id")


def test_semi_join_nulls_and_empty_shapes(ray_session):
    data = pa.table(
        {
            "id": pa.array([1, 2, None, 4, 5], type=pa.int64()),
            "t": pa.array(list("abcde")),
        }
    )
    ds = rd.from_arrow(data).repartition(3)
    # keys with a null: null matches nothing
    kd = rd.from_arrow(pa.table({"key": pa.array([2, None, 5], type=pa.int64())}))
    out = membership_join(
        ds, kd, id_col="id", key_col="key", mode="semi",
        schema=data.schema, bloom_expected_keys=3,
    ).to_pandas()
    assert sorted(out["id"]) == [2, 5]
    # empty key side: empty result, schema intact (or columnless frame)
    empty = rd.from_arrow(pa.table({"key": pa.array([], type=pa.int64())}))
    out = membership_join(
        ds, empty, id_col="id", key_col="key", mode="semi",
        schema=data.schema, bloom_expected_keys=1,
    ).to_pandas()
    assert len(out) == 0
    assert list(out.columns) in (["id", "t"], [])
    # reserved-name guard
    bad = rd.from_arrow(pa.table({"id": pa.array([1]), "__mj_b": pa.array([0])}))
    with pytest.raises(ValueError, match="reserved"):
        membership_join(bad, kd, id_col="id", key_col="key")


def test_semi_join_string_keys(ray_session):
    data = pa.table(
        {
            "name": pa.array(["alpha", "beta", "gamma", "delta", None]),
            "x": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(data).repartition(2)
    kd = rd.from_arrow(pa.table({"k": pa.array(["beta", "delta", "nope"])}))
    out = membership_join(
        ds, kd, id_col="name", key_col="k", mode="semi",
        schema=data.schema, bloom_expected_keys=3,
    ).to_pandas()
    assert sorted(out["name"]) == ["beta", "delta"]


def test_bloom_prunes_before_shuffle(ray_session):
    """The point of the sideband: with sparse keys, the mask removes the
    bulk of the fact rows before they would shuffle."""
    keys = np.arange(0, 10_000, 100, dtype=np.int64)  # 1% of ids
    kd = rd.from_arrow(pa.table({"k": pa.array(keys)}))
    packed_bytes = build_key_bloom(kd, "k", expected_keys=len(keys))
    packed = np.frombuffer(packed_bytes, dtype=np.uint8)
    facts = pa.array(np.arange(10_000, dtype=np.int64))
    mask = bloom_member_mask(facts, packed)
    assert mask.sum() < 10_000 * 0.05  # >=95% of rows never shuffle
    assert mask[keys].all()  # and zero false negatives


def test_anti_mode_matches_wrapper(ray_session):
    """membership_join(mode=anti) and the historical anti_join_ids
    wrapper agree (one shared implementation)."""
    from rayenc.stages.dedup import anti_join_ids

    data = pa.table(
        {
            "doc_id": pa.array(np.arange(50, dtype=np.int64)),
            "text": pa.array([f"d{i}" for i in range(50)]),
        }
    )
    drop = pa.table({"node": pa.array([3, 9, 33], type=pa.int64())})
    ds = rd.from_arrow(data).repartition(4)
    dd = rd.from_arrow(drop)
    a = sorted(anti_join_ids(ds, dd, schema=data.schema).to_pandas()["doc_id"])
    b = sorted(
        membership_join(
            ds, dd, id_col="doc_id", key_col="node", mode="anti", schema=data.schema
        ).to_pandas()["doc_id"]
    )
    expect = [i for i in range(50) if i not in (3, 9, 33)]
    assert a == expect and b == expect


def test_equi_join_matches_pandas_reference(ray_session):
    """Bucketed sort-shuffle inner join == pandas merge, including 1:N
    duplication, unmatched rows on both sides, null keys (match
    nothing), and empty blocks."""
    rng = np.random.default_rng(23)
    lk = rng.integers(0, 60, size=100)
    left = pa.table(
        {
            "ok": pa.array(np.where(np.arange(100) == 7, None, lk), type=pa.int64()),
            "pri": pa.array(rng.choice(["hi", "lo"], size=100)),
        }
    )
    rk = rng.integers(30, 90, size=300)  # partial overlap, many dup keys
    right = pa.table(
        {
            "lk": pa.array(rk, type=pa.int64()),
            "price": pa.array(rng.uniform(1, 9, size=300).round(2)),
        }
    )
    lds = rd.from_arrow(left).repartition(4).map_batches(
        lambda b: b.filter(pc.or_(pc.is_valid(b["ok"]), pc.is_null(b["ok"]))),
        batch_format="pyarrow",  # no-op transform: exercises empty-block tolerance
    )
    got = (
        equi_join(
            lds,
            rd.from_arrow(right).repartition(3),
            left_on="ok",
            right_on="lk",
            left_schema=left.schema,
            right_schema=right.schema,
        )
        .to_pandas()
        .sort_values(["ok", "pri", "lk", "price"])
        .reset_index(drop=True)
    )
    ref = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="ok", right_on="lk", how="inner")
        .sort_values(["ok", "pri", "lk", "price"])
        .reset_index(drop=True)
        # pandas widens the nullable int key to float64; inner join drops
        # the nulls so the exact-int comparison is safe
        .astype({"ok": "int64"})
    )
    assert list(got.columns) == ["ok", "pri", "lk", "price"]
    assert got.equals(ref[list(got.columns)])
    assert len(ref) > 100  # 1:N duplication actually exercised

    # disjoint-name + reserved-name guards
    with pytest.raises(ValueError, match="disjoint"):
        equi_join(
            rd.from_arrow(left), rd.from_arrow(left), left_on="ok", right_on="ok",
            left_schema=left.schema, right_schema=left.schema,
        )


def test_equi_join_left_outer_matches_pandas(ray_session):
    """Left join: unmatched left rows (incl. the null-key row — SQL:
    null matches nothing) survive with null right columns; matched rows
    duplicate 1:N exactly as pandas merge(how='left')."""
    rng = np.random.default_rng(31)
    lk = rng.integers(0, 40, size=80)
    left = pa.table(
        {
            "ok": pa.array(np.where(np.arange(80) == 3, None, lk), type=pa.int64()),
            "pri": pa.array(rng.choice(["hi", "lo"], size=80)),
        }
    )
    right = pa.table(
        {
            "lk": pa.array(rng.integers(20, 60, size=150), type=pa.int64()),
            "price": pa.array(rng.uniform(1, 9, size=150).round(2)),
        }
    )
    got = (
        equi_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            left_on="ok",
            right_on="lk",
            left_schema=left.schema,
            right_schema=right.schema,
            how="left",
        )
        .to_pandas()
        .sort_values(["ok", "pri", "lk", "price"])
        .reset_index(drop=True)
    )
    ref = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="ok", right_on="lk", how="left")
        .sort_values(["ok", "pri", "lk", "price"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    # unmatched rows: null right columns, incl. the null-key left row
    unmatched = got[got["lk"].isna()]
    assert len(unmatched) == int(ref["lk"].isna().sum()) >= 1
    assert unmatched["price"].isna().all()
    # matched subset equals pandas (compare as float to absorb the
    # nullable-int-to-float widening pandas applies on its side)
    gm = got.dropna(subset=["lk"]).reset_index(drop=True)
    rm = ref.dropna(subset=["lk"]).reset_index(drop=True)
    assert np.allclose(gm["ok"].astype(float), rm["ok"].astype(float))
    assert np.allclose(gm["lk"].astype(float), rm["lk"].astype(float))
    assert np.allclose(gm["price"], rm["price"])
    assert list(gm["pri"]) == list(rm["pri"])

    with pytest.raises(ValueError, match="inner|left|right|full"):
        equi_join(
            rd.from_arrow(left), rd.from_arrow(right), left_on="ok", right_on="lk",
            left_schema=left.schema, right_schema=right.schema, how="cross",
        )


def test_build_probe_hashes_agree_across_int_widths(ray_session):
    """int32 keys and int64 probes (or vice versa) must hash identically
    — both normalize to the int64 bit pattern."""
    a32 = pa.array([1, -5, 2**31 - 1], type=pa.int32())
    a64 = pa.array([1, -5, 2**31 - 1], type=pa.int64())
    h32 = array_probe_hashes(a32)
    h64 = array_probe_hashes(a64)
    assert (h32[0] == h64[0]).all() and (h32[1] == h64[1]).all()
    # and uint64 beyond int64's range still hashes (bit-pattern wrap)
    u = pa.array([2**63 + 7], type=pa.uint64())
    hu = array_probe_hashes(u)
    assert hu is not None and hu[2].all()


def test_equi_join_right_outer_matches_pandas(ray_session):
    """Right join mirrors left: unmatched RIGHT rows (incl. a null-key
    right row) survive with null left columns."""
    rng = np.random.default_rng(47)
    left = pa.table(
        {
            "ok": pa.array(rng.integers(0, 30, size=60), type=pa.int64()),
            "pri": pa.array(rng.choice(["hi", "lo"], size=60)),
        }
    )
    rk = rng.integers(15, 45, size=90)
    right = pa.table(
        {
            "lk": pa.array(np.where(np.arange(90) == 5, None, rk), type=pa.int64()),
            "price": pa.array(rng.uniform(1, 9, size=90).round(2)),
        }
    )
    got = (
        equi_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            left_on="ok",
            right_on="lk",
            left_schema=left.schema,
            right_schema=right.schema,
            how="right",
        )
        .to_pandas()
        .sort_values(["lk", "price", "ok", "pri"])
        .reset_index(drop=True)
    )
    ref = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="ok", right_on="lk", how="right")
        .sort_values(["lk", "price", "ok", "pri"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    unmatched = got[got["ok"].isna()]
    assert len(unmatched) == int(ref["ok"].isna().sum()) >= 1
    assert unmatched["pri"].isna().all()
    gm = got.dropna(subset=["ok"]).reset_index(drop=True)
    rm = ref.dropna(subset=["ok"]).reset_index(drop=True)
    assert np.allclose(gm["ok"].astype(float), rm["ok"].astype(float))
    assert np.allclose(gm["price"], rm["price"])


def test_equi_join_full_outer_matches_pandas(ray_session):
    """Full outer: every row from both sides appears exactly once per
    match (or once unmatched); null keys on EITHER side emit unmatched."""
    rng = np.random.default_rng(53)
    lk = rng.integers(0, 25, size=50)
    left = pa.table(
        {
            "ok": pa.array(np.where(np.arange(50) == 2, None, lk), type=pa.int64()),
            "pri": pa.array(rng.choice(["a", "b"], size=50)),
        }
    )
    rk = rng.integers(15, 40, size=70)
    right = pa.table(
        {
            "lk": pa.array(np.where(np.arange(70) == 7, None, rk), type=pa.int64()),
            "price": pa.array(rng.uniform(1, 9, size=70).round(2)),
        }
    )
    got = (
        equi_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            left_on="ok",
            right_on="lk",
            left_schema=left.schema,
            right_schema=right.schema,
            how="full",
        )
        .to_pandas()
        .sort_values(["ok", "pri", "lk", "price"])
        .reset_index(drop=True)
    )
    # pandas merge matches NaN keys to each other; SQL (and equi_join)
    # emits each null-key row unmatched — build the reference SQL-style:
    # outer-merge the non-null keys, then append null-key rows unmatched
    lp, rp = left.to_pandas(), right.to_pandas()
    import pandas as pd

    ref = pd.concat(
        [
            lp[lp["ok"].notna()].merge(
                rp[rp["lk"].notna()], left_on="ok", right_on="lk", how="outer"
            ),
            lp[lp["ok"].isna()],
            rp[rp["lk"].isna()],
        ],
        ignore_index=True,
    ).sort_values(["ok", "pri", "lk", "price"]).reset_index(drop=True)
    assert len(got) == len(ref)
    # both directions of unmatched present, incl. both null-key rows
    assert int(got["lk"].isna().sum()) == int(ref["lk"].isna().sum()) >= 1
    assert int(got["ok"].isna().sum()) == int(ref["ok"].isna().sum()) >= 1
    gm = got.dropna(subset=["ok", "lk"]).reset_index(drop=True)
    rm = ref.dropna(subset=["ok", "lk"]).reset_index(drop=True)
    assert np.allclose(gm["ok"].astype(float), rm["ok"].astype(float))
    assert np.allclose(gm["lk"].astype(float), rm["lk"].astype(float))
    assert np.allclose(gm["price"], rm["price"])
    assert list(gm["pri"]) == list(rm["pri"])


def test_equi_join_rejects_unknown_how():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner|left|right|full"):
        equi_join(None, None, "a", "b", pa.schema([("a", pa.int64())]),
                  pa.schema([("b", pa.int64())]), how="cross")
