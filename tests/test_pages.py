"""Sub-block page index: paged container round-trips, random access
touching page bytes only, page-zone pruned filtered decode, and the
selector's decode-cost guard (round-3 items; the reference's page-stats
granularity axis, /root/reference/src/bin/js2pq/main.rs:18-26,85-89)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayenc.blocks import (
    decode_column,
    decode_rows,
    encode_column,
    page_prune_indices,
    page_stats,
)


def _content_column(n=20000, avg=300) -> pa.Array:
    rng = np.random.default_rng(3)
    words = ["def", "return", "import", "class", "self", "value", "index"]
    vals = [
        " ".join(rng.choice(words, size=avg // 6).tolist()) + f" #{i}"
        for i in range(n)
    ]
    return pa.array(vals, type=pa.string())


@pytest.mark.parametrize(
    "arr,codec",
    [
        (_content_column(4000, 80), "fsst@9"),
        (pa.array([None if i % 7 == 0 else i * 3 for i in range(5000)], type=pa.int64()), "foref"),
        (pa.array([f"r{i%5}" for i in range(5000)], type=pa.string()), "dict"),
        (
            pa.array(
                [[i, i + 1] if i % 3 else None for i in range(3000)],
                type=pa.list_(pa.int64()),
            ),
            "foref",
        ),
    ],
)
def test_paged_roundtrip(arr, codec):
    blob = encode_column(arr, codec, 3, page_rows=512, page_zones=True)
    assert decode_column(blob).equals(arr)
    idx = np.array([len(arr) - 1, 0, len(arr) // 2, 0])
    got = decode_rows(blob, idx)
    want = [arr[int(i)].as_py() for i in idx]
    assert got.to_pylist() == want


def test_page_boundary_sweep():
    """Same column at every page split decodes identically (the
    reference's batch-size sweep, /root/reference/src/vec_pq_reader.rs:821,
    reincarnated at page granularity)."""
    arr = pa.array([f"v{i%17}" * (i % 5) for i in range(100)], type=pa.string())
    for page_rows in range(1, 101, 7):
        blob = encode_column(arr, "plain", 3, page_rows=page_rows)
        assert decode_column(blob).equals(arr), page_rows


def test_decode_rows_touches_page_bytes_not_block_bytes():
    """VERDICT r2 #4 done-criterion: on a multi-MB content block,
    random access decodes far fewer bytes than the whole block."""
    arr = _content_column(20000, 300)  # ~6 MB of content
    blob = encode_column(arr, "fsst@9", 3, page_rows=2048)
    assert len(blob) > 200_000
    idx = np.array([17, 19555])
    got = decode_rows(blob, idx)
    assert got.to_pylist() == [arr[17].as_py(), arr[19555].as_py()]
    ps = page_stats(blob, idx)
    assert ps["n_pages"] == 10
    assert ps["touched_bytes"] <= ps["total_bytes"] * 0.25, ps


def test_page_prune_indices_sound_and_selective():
    ints = pa.array(list(range(10000)), type=pa.int64())
    blob = encode_column(ints, "foref", 3, page_rows=1000, page_zones=True)
    keep = page_prune_indices(blob, [("v", ">=", 9000)])
    assert keep is not None
    assert set(range(9000, 10000)) <= set(keep.tolist())  # no false prune
    assert len(keep) <= 1000  # exactly the last page
    # no page zones -> no pruning signal
    blob2 = encode_column(ints, "foref", 3, page_rows=1000, page_zones=False)
    assert page_prune_indices(blob2, [("v", ">=", 9000)]) is None
    # unpaged -> None
    blob3 = encode_column(ints, "foref", 3)
    assert page_prune_indices(blob3, [("v", ">=", 9000)]) is None


def test_filtered_decode_with_page_zones(ray_session):
    """End-to-end: stats='page' encode, filtered decode equals the exact
    filter, and provenance row numbers stay correct under page skips."""
    import ray.data as rd

    from rayenc.decode import decode_dataset
    from rayenc.encode import encode_dataset

    n = 20000
    t = pa.table(
        {
            "k": pa.array(np.arange(n), type=pa.int64()),
            "txt": pa.array([f"doc {i} body" for i in range(n)], type=pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    blocks = encode_dataset(
        ds, block_rows=5000, stats="page", page_rows=1000, hash_column=None,
        concurrency=2,
    ).materialize()
    out = pa.concat_tables(
        decode_dataset(blocks, filter=[("k", ">=", 18500)], concurrency=2)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("k")
    want = t.filter(pa.array(np.arange(n) >= 18500))
    assert out.select(["k", "txt"]).equals(want)
    # provenance path: _row_in_block must reflect the TRUE positions
    out2 = pa.concat_tables(
        decode_dataset(
            blocks, filter=[("k", ">=", 18500)], with_provenance=True, concurrency=2
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    k = out2["k"].to_numpy(zero_copy_only=False)
    rib = out2["_row_in_block"].to_numpy(zero_copy_only=False)
    assert np.array_equal(k % 5000, rib)  # block_rows=5000 aligned input


def test_selector_records_decode_speed_and_guard():
    from rayenc.selector import select_codec

    arr = _content_column(3000, 120)
    assert not select_codec(arr).dec_mbps  # w=0: no decode passes paid
    c0 = select_codec(arr, decode_weight=0.1)
    assert c0.dec_mbps, "decode speed must be recorded in lineage"
    assert set(c0.dec_mbps) >= set(c0.trials)
    # an absurd decode weight forces the fastest-decoding candidate
    c1 = select_codec(arr, decode_weight=1000.0)
    fastest = max(c1.dec_mbps.items(), key=lambda kv: kv[1])[0]
    assert c1.dec_mbps[c1.codec] >= 0.5 * c1.dec_mbps[fastest]


def test_validate_predicates(ray_session):
    import ray.data as rd

    from rayenc.decode import decode_dataset
    from rayenc.encode import encode_dataset

    t = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=10, hash_column=None, concurrency=1
    ).materialize()
    with pytest.raises(ValueError, match="unknown predicate op"):
        decode_dataset(blocks, filter=[("k", "~like~", 1)]).count()
    # '!=' graduated from unknown to supported (round-4 filter surface)
    assert decode_dataset(blocks, filter=[("k", "!=", 1)]).count() == 2
    with pytest.raises(ValueError, match="not in block table"):
        decode_dataset(blocks, filter=[("nope", ">=", 1)]).count()


def test_fully_page_pruned_block_with_provenance(ray_session):
    """Regression (round-3 review): a block whose block-level zones pass
    but whose pages ALL prune yields n=0; provenance columns must stay
    string-typed so concat with non-empty blocks in the same decode
    batch does not raise ArrowInvalid."""
    import ray.data as rd

    from rayenc.decode import decode_dataset
    from rayenc.encode import encode_dataset

    # block 1 has a value GAP (0..999 and 2000..2999): its zones span
    # [0, 2999] so block pruning keeps it, but no page contains 1500
    k1 = list(range(0, 1000)) + list(range(2000, 3000))
    k2 = list(range(1200, 1800))  # block 2 contains 1500
    t = pa.table({"k": pa.array(k1 + k2, type=pa.int64())})
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=2000, stats="page", page_rows=500,
        hash_column=None, concurrency=1,
    ).materialize()
    assert blocks.count() == 2
    out = pa.concat_tables(
        decode_dataset(
            blocks, filter=[("k", "==", 1500)], with_provenance=True, concurrency=1
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert out["k"].to_pylist() == [1500]
    assert out["_block_id"].type == pa.string()
