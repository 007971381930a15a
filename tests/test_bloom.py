"""Per-block Bloom filters: equality pruning that zone maps cannot do
(interleaved high-cardinality values make every block's [min,max] cover
the probe)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayenc.bloom import bloom_build, bloom_may_contain


def test_no_false_negatives_and_some_pruning():
    vals = [f"key_{i * 7919}" for i in range(5000)]
    bf = bloom_build(pa.array(vals, type=pa.string()))
    assert bf is not None
    for v in vals[::97]:
        assert bloom_may_contain(bf, v)  # present values NEVER prune
    absent = [f"absent_{i}" for i in range(500)]
    fp = sum(bloom_may_contain(bf, v) for v in absent) / len(absent)
    assert fp < 0.05, fp  # ~1% design false-positive rate


def test_int_and_timestamp_canonicalization():
    ints = pa.array([10, 20, 30, None], type=pa.int32())
    bf = bloom_build(ints)
    assert bloom_may_contain(bf, 20) and not bloom_may_contain(bf, 21)
    ts = pa.array([1_700_000_000_000_000, 1_700_000_060_000_000], type=pa.timestamp("us"))
    bft = bloom_build(ts)
    # predicates probe timestamps as epoch ints (the zone-map convention)
    assert bloom_may_contain(bft, 1_700_000_000_000_000)
    assert not bloom_may_contain(bft, 1_234_567)


def test_unsupported_types_never_prune():
    assert bloom_build(pa.array([1.5, 2.5], type=pa.float64())) is None
    assert bloom_build(pa.array([], type=pa.string())) is None
    assert bloom_build(pa.array([None, None], type=pa.string())) is None
    bf = bloom_build(pa.array(["a", "b"]))
    assert bloom_may_contain(bf, 3.14)  # unprobeable value: keep
    assert bloom_may_contain("zz-not-hex", "a")  # invalid filter: keep


def test_bloom_prunes_blocks_zone_maps_cannot(ray_session):
    """Point lookup on a hash-shuffled id column: every block's zone
    range covers the probe, so ONLY the Bloom filter prunes."""
    import ray.data as rd

    from rayenc.decode import count_decoded_blocks, decode_dataset
    from rayenc.encode import encode_dataset

    rng = np.random.default_rng(5)
    ids = rng.permutation(8000).astype(np.int64)  # interleaved ids
    t = pa.table(
        {
            "k": pa.array(ids),
            "v": pa.array([f"row {i}" for i in ids], type=pa.string()),
        }
    )
    blocks = encode_dataset(
        rd.from_arrow(t), block_rows=500, hash_column=None, concurrency=2
    ).materialize()
    pred = [("k", "==", 4321)]
    counts = count_decoded_blocks(blocks, pred)
    assert counts["total_blocks"] >= 16
    assert counts["decoded_blocks"] < counts["total_blocks"] // 2, counts
    out = pa.concat_tables(
        decode_dataset(blocks, filter=pred, concurrency=2).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    assert out["k"].to_pylist() == [4321]
    assert out["v"].to_pylist() == ["row 4321"]

    # bloom off: zone maps alone cannot prune interleaved ids
    blocks_nb = encode_dataset(
        rd.from_arrow(t), block_rows=500, hash_column=None, concurrency=2,
        bloom=False,
    ).materialize()
    c2 = count_decoded_blocks(blocks_nb, pred)
    assert c2["decoded_blocks"] == c2["total_blocks"]


def test_per_page_blooms_prune_inside_blocks():
    """Pages of a hash-shuffled column have overlapping zone ranges; the
    per-page Bloom filter still narrows an equality probe to the page(s)
    actually holding the value (ROADMAP r3 #5)."""
    import numpy as np

    from rayenc.blocks import encode_column, page_prune_indices, decode_rows

    rng = np.random.default_rng(11)
    ids = rng.permutation(8000).astype(np.int64)
    arr = pa.array(ids)
    blob = encode_column(arr, "foref", 3, page_rows=1000, page_zones=True)
    target = int(ids[4321])
    keep = page_prune_indices(blob, [("k", "==", target)])
    assert keep is not None
    # zones alone cannot prune shuffled pages; blooms narrow to ~1 page
    assert len(keep) <= 2000, len(keep)
    pos = int(np.flatnonzero(ids == target)[0])
    assert pos in set(keep.tolist())  # never prunes the true page
    got = decode_rows(blob, np.array([pos]))
    assert got.to_pylist() == [target]


def test_paged_bloom_opt_out(ray_session):
    """bloom=False suppresses per-page blooms too (round-3 review: the
    paged path ignored the opt-out)."""
    import json

    import ray.data as rd

    from rayenc.blocks import _parse_block
    from rayenc.encode import encode_dataset

    t = pa.table({"k": pa.array(list(range(4000)), type=pa.int64())})
    for bloom, expect in [(True, True), (False, False)]:
        blocks = encode_dataset(
            rd.from_arrow(t), block_rows=4000, stats="page", page_rows=500,
            hash_column=None, concurrency=1, bloom=bloom,
        ).materialize()
        row = blocks.take(1)[0]
        header, _, _ = _parse_block(memoryview(row["col_k"]))
        assert ("blooms" in header["params"]) == expect, (bloom, header["params"].keys())
        zm = json.loads(row["zonemap"])
        assert ("__bloom__" in zm) == expect
