"""n-gram Bloom filters: substring ("contains") predicate pruning —
the skip index for grep-style probes on a source-code table (value
blooms answer col == v; they are useless for needle-in-content search).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest

from rayenc.bloom import ngram_bloom_build, ngram_bloom_may_contain


def test_no_false_negatives_on_substrings():
    texts = [f"def fn_{i}(x):\n    return x + {i}\n" for i in range(500)]
    nf = ngram_bloom_build(pa.array(texts, type=pa.string()))
    assert nf is not None and nf["n"] == 3
    # every actual substring of every value must be a maybe
    for t in texts[::37]:
        for k in range(0, len(t) - 6, 11):
            assert ngram_bloom_may_contain(nf, t[k : k + 6])
    # needles built from absent trigrams prune
    absent = [f"zq{i}xw" for i in range(200)]
    fp = sum(ngram_bloom_may_contain(nf, s) for s in absent) / len(absent)
    assert fp < 0.1, fp


def test_boundary_spanning_ngrams_excluded():
    # "ab"+"cd" must NOT create the cross-value trigram "bcd"/"abc"… but
    # any needle short of n never prunes, so probe with 3-byte needles
    nf = ngram_bloom_build(pa.array(["abx", "ycd"], type=pa.string()))
    assert ngram_bloom_may_contain(nf, "abx")
    assert not ngram_bloom_may_contain(nf, "bxy")  # spans the boundary
    assert not ngram_bloom_may_contain(nf, "xyc")


def test_short_needles_and_edge_inputs_never_prune():
    nf = ngram_bloom_build(pa.array(["hello world"], type=pa.string()))
    assert ngram_bloom_may_contain(nf, "zz")  # shorter than n: no probe
    assert ngram_bloom_may_contain(nf, "")  # empty needle matches all
    assert ngram_bloom_may_contain({"n": 3}, "zzz")  # malformed entry
    assert ngram_bloom_may_contain({"n": 3, "f": "not-hex"}, "zzz")
    assert ngram_bloom_may_contain(None, "zzz")
    # unsupported/empty columns build no filter
    assert ngram_bloom_build(pa.array([1, 2], type=pa.int64())) is None
    assert ngram_bloom_build(pa.array([], type=pa.string())) is None
    assert ngram_bloom_build(pa.array([None], type=pa.string())) is None
    assert ngram_bloom_build(pa.array(["ab"], type=pa.string())) is None  # < n bytes


def test_unicode_needles_match_at_byte_level():
    texts = ["naïve café regex", "plain ascii text"]
    nf = ngram_bloom_build(pa.array(texts, type=pa.string()))
    assert ngram_bloom_may_contain(nf, "café")
    assert ngram_bloom_may_contain(nf, "naïve")
    assert not ngram_bloom_may_contain(nf, "müller")


def test_saturation_clamps_but_stays_sound():
    # huge distinct-trigram count: the filter clamps to the bit cap
    # (higher FPR) rather than skipping — present substrings still maybe
    rng = np.random.default_rng(7)
    blobs = ["".join(chr(32 + c) for c in rng.integers(0, 90, 4000)) for _ in range(200)]
    nf = ngram_bloom_build(pa.array(blobs, type=pa.string()))
    assert nf is not None
    assert len(nf["f"]) / 2 <= (1 << 21) // 8
    for b in blobs[::41]:
        assert ngram_bloom_may_contain(nf, b[100:110])


def test_sliced_and_chunked_arrays():
    base = pa.array(["aaa", "needle here", "bbb", "ccc"], type=pa.string())
    nf = ngram_bloom_build(base.slice(1, 2))
    assert ngram_bloom_may_contain(nf, "needle")
    assert not ngram_bloom_may_contain(nf, "aaa")
    ch = pa.chunked_array([["xyz123"], ["456uvw"]])
    nfc = ngram_bloom_build(ch)
    assert ngram_bloom_may_contain(nfc, "xyz")
    assert ngram_bloom_may_contain(nfc, "uvw")
    assert not ngram_bloom_may_contain(nfc, "3456")  # spans chunk values


@pytest.fixture()
def marked_blocks(ray_session):
    """12-block table where one marker string lives in exactly one block."""
    import ray.data as rd

    from rayenc.encode import encode_dataset

    rows = []
    for b in range(12):
        for i in range(200):
            txt = f"block {b} row {i} filler text " + "x" * 50
            if b == 7 and i == 13:
                txt += " UNIQUE_NGRAM_MARKER_73 "
            rows.append({"doc_id": b * 200 + i, "body": txt})
    src = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(src).repartition(12)
    blocks = encode_dataset(
        ds, block_rows=200, concurrency=2, ngram=True, hash_column=None
    ).materialize()
    return src, blocks


def test_contains_decode_prunes_and_matches_exact(marked_blocks):
    from rayenc.decode import count_decoded_blocks, decode_dataset

    src, blocks = marked_blocks
    filt = [("body", "contains", "UNIQUE_NGRAM_MARKER_73")]
    counts = count_decoded_blocks(blocks, filt)
    assert counts["total_blocks"] >= 12
    assert counts["decoded_blocks"] < counts["total_blocks"]  # real pruning
    got = pa.concat_tables(
        decode_dataset(blocks, filter=filt).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    assert got.num_rows == 1
    assert got["doc_id"][0].as_py() == 7 * 200 + 13
    # a sub-n needle cannot prune but must still filter exactly
    got2 = pa.concat_tables(
        decode_dataset(blocks, filter=[("body", "contains", "73")]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    want2 = src.filter(
        pa.compute.match_substring(src["body"], pattern="73")
    ).num_rows
    assert got2.num_rows == want2


def test_contains_validation_and_non_string_column(marked_blocks):
    from rayenc.decode import decode_dataset, validate_predicates

    _, blocks = marked_blocks
    with pytest.raises(ValueError, match="contains"):
        validate_predicates(blocks, [("body", "contains", "")])
    with pytest.raises(ValueError, match="contains"):
        validate_predicates(blocks, [("body", "contains", 7)])
    # a contains on a non-string column dies with the NAMED error, not a
    # pc.match_substring kernel error (surfaces wrapped in RayTaskError)
    with pytest.raises(Exception, match="string column"):
        pa.concat_tables(
            decode_dataset(
                blocks, filter=[("doc_id", "contains", "73")]
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )


def test_check_zones_audits_ngram_filters(marked_blocks, ray_session):
    """A corrupt persisted n-gram filter must be caught by the zone
    audit (it silently drops rows on contains decodes — invisible to
    the content hash)."""
    import ray.data as rd

    from rayenc.verify import verify_blocks

    _, blocks = marked_blocks
    assert (
        verify_blocks(blocks, hash_column=None, check_zones=True)["zone_mismatches"] == 0
    )

    def corrupt(batch: pa.Table) -> pa.Table:
        zms = []
        for z in batch["zonemap"].to_pylist():
            zm = json.loads(z or "{}")
            ng = zm.get("__ngram__")
            if ng and "body" in ng:
                f = ng["body"]["f"]
                ng["body"]["f"] = ("0" if f[0] != "0" else "f") + f[1:]
            zms.append(json.dumps(zm))
        i = batch.schema.get_field_index("zonemap")
        return batch.set_column(i, "zonemap", pa.array(zms, type=pa.string()))

    bad = blocks.map_batches(corrupt, batch_format="pyarrow")
    assert verify_blocks(bad, hash_column=None, check_zones=True)["zone_mismatches"] > 0


def test_encode_job_carries_ngram_and_resume(tmp_path, ray_session, corpus_parquet):
    from rayenc.jobs import run_encode_job
    from rayenc.manifest import Manifest

    out = str(tmp_path / "job")
    s1 = run_encode_job(
        corpus_parquet, out, block_rows=1000, concurrency=2, ngram=True
    )
    assert s1["partitions_encoded"] > 0
    rec = Manifest(out).job_record()
    assert rec["params"]["ngram"] is True and rec["params"]["ngram_n"] == 3
    # non-strict knob: a resume without it still skips committed work
    s2 = run_encode_job(corpus_parquet, out, block_rows=1000, concurrency=2)
    assert s2["partitions_encoded"] == 0


def test_reserved_ngram_column_name_raises():
    from rayenc.encode import BlockEncoder

    enc = BlockEncoder(hash_column=None)
    with pytest.raises(ValueError, match="__ngram__"):
        enc.encode_table(pa.table({"__ngram__": pa.array(["x"])}))
    with pytest.raises(ValueError, match="ngram_n"):
        BlockEncoder(ngram=True, ngram_n=1)
