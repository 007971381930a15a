"""enrich_job: ALTER TABLE ADD COLUMN over a committed job dir — a
derived column (lang_id / quality / token counts / fingerprint) is
computed from decoded content once and stored as a first-class encoded,
zone-mapped column, without re-encoding any existing byte. Later scans
filter on it with block pruning instead of re-running the heuristic."""

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from rayenc import (
    decode_dataset,
    enrich_job,
    run_encode_job,
    verify_blocks,
)
from rayenc.manifest import Manifest


def _table(n=1200, id_start=0):
    ids = np.arange(id_start, id_start + n, dtype=np.int64)
    texts = [
        "the cat sat on the mat and it was that kind of day " * (1 + i % 3)
        if i % 2 == 0
        else "der hund ist nicht mit der katze und das ist ein haus " * (1 + i % 3)
        for i in ids
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "body": pa.array(texts),
        }
    )


def _job(tmp_path, n=1200, files=2, **kw):
    srcs = []
    for f in range(files):
        p = tmp_path / f"src{f:02d}.parquet"
        pq.write_table(_table(n, id_start=f * n), p, row_group_size=max(100, n // 4))
        srcs.append(str(p))
    out = tmp_path / "job"
    kw.setdefault("block_rows", 100)
    kw.setdefault("hash_column", "body")
    kw.setdefault("concurrency", 2)
    kw.setdefault("max_partition_bytes", 40_000)
    run_encode_job(srcs, str(out), **kw)
    return srcs, out


def _decode_all(out) -> pa.Table:
    return pa.concat_tables(
        decode_dataset(rd.read_parquet(f"{out}/blocks")).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).sort_by("doc_id")


def test_enrich_lang_id_values_and_byte_identity(ray_session, tmp_path):
    srcs, out = _job(tmp_path)
    # capture original per-block bytes of an untouched column
    some = sorted((out / "blocks").glob("*.parquet"))[0]
    before = pq.read_table(some)
    s = enrich_job(str(out), "lang_pred", "lang_id", input_column="body")
    assert s["partitions_enriched"] == s["partitions_total"] >= 2
    got = _decode_all(out)
    # alternating en/de corpus: the heuristic must label both
    langs = got["lang_pred"].to_pylist()
    assert langs[0] == "en" and langs[1] == "de"
    assert set(langs) == {"en", "de"}
    # existing encoded bytes are byte-identical; the new col_* appended
    after = pq.read_table(some)
    for c in before.column_names:
        if c in ("lineage", "zonemap", "encoded_bytes"):
            continue
        assert after[c].equals(before[c]), c
    assert "col_lang_pred" in after.column_names
    # content chain untouched: verify green without re-deriving
    assert verify_blocks(
        rd.read_parquet(f"{out}/blocks"), hash_column="body"
    )["ok"]
    # the new column got real zone metadata (prunable)
    z = json.loads(after["zonemap"][0].as_py())
    assert "lang_pred" in z
    # manifest lineage + per-column codec summary recorded
    m = Manifest(str(out))
    e = next(iter(m.entries()))
    assert e["enrichments"][0] == {
        "column": "lang_pred", "enricher": "lang_id", "input": "body"
    }
    assert e["columns"]["lang_pred"]["enc_bytes"] > 0


def test_enrich_rerun_skips_and_mismatch_refuses(ray_session, tmp_path):
    srcs, out = _job(tmp_path)
    s1 = enrich_job(str(out), "nt", "n_tokens", input_column="body")
    assert s1["partitions_enriched"] == s1["partitions_total"]
    s2 = enrich_job(str(out), "nt", "n_tokens", input_column="body")
    assert s2["partitions_enriched"] == 0
    assert s2["partitions_skipped"] == s1["partitions_total"]
    with pytest.raises(ValueError, match="rerun with the same pair"):
        enrich_job(str(out), "nt", "n_chars", input_column="body")
    # values are the real token counts
    got = _decode_all(out)
    src = pa.concat_tables(pq.read_table(s) for s in srcs).sort_by("doc_id")
    want = [len(t.split()) for t in src["body"].to_pylist()]
    assert got["nt"].to_pylist() == want


def test_enrich_numeric_zones_prune_scans(ray_session, tmp_path):
    srcs, out = _job(tmp_path)
    enrich_job(str(out), "nc", "n_chars", input_column="body")
    # filtered decode on the DERIVED column uses its zone maps
    from rayenc.decode import count_decoded_blocks, decode_dataset as dd

    blocks = rd.read_parquet(f"{out}/blocks")
    hi = 1 + max(
        len(t)
        for s in srcs
        for t in pq.read_table(s)["body"].to_pylist()
    )
    n_all = count_decoded_blocks(blocks, [("nc", ">=", 0)])["decoded_blocks"]
    n_none = count_decoded_blocks(blocks, [("nc", ">=", hi)])["decoded_blocks"]
    assert n_none == 0 < n_all
    dec = dd(blocks, filter=[("nc", ">=", hi)])
    assert dec.count() == 0


def test_enrich_many_one_pass_and_incremental_widening(ray_session, tmp_path):
    """Several derived columns land in ONE decode pass; a later wider
    call appends only the missing columns (per-column resume)."""
    from rayenc import enrich_many

    srcs, out = _job(tmp_path)
    s = enrich_many(
        str(out), {"lang_pred": "lang_id", "nt": "n_tokens"}, input_column="body"
    )
    assert s["partitions_enriched"] == s["partitions_total"]
    got = _decode_all(out)
    src = pa.concat_tables(pq.read_table(p) for p in srcs).sort_by("doc_id")
    assert got["nt"].to_pylist() == [len(t.split()) for t in src["body"].to_pylist()]
    assert set(got["lang_pred"].to_pylist()) == {"en", "de"}
    # widen: one committed column + one new — only the new one appends
    s2 = enrich_many(
        str(out),
        {"nt": "n_tokens", "nc": "n_chars"},
        input_column="body",
    )
    assert s2["partitions_enriched"] == s2["partitions_total"]
    got2 = _decode_all(out)
    assert got2["nc"].to_pylist() == [len(t) for t in src["body"].to_pylist()]
    assert got2["nt"].to_pylist() == got["nt"].to_pylist()
    blocks_file = next((out / "blocks").glob("*.parquet"))
    names = pq.read_schema(str(blocks_file)).names
    for c in ("col_lang_pred", "col_nt", "col_nc"):
        assert names.count(c) == 1
    # per-column lineage recorded once each
    m = Manifest(str(out))
    e = next(iter(m.entries()))
    assert sorted(x["column"] for x in e["enrichments"]) == [
        "lang_pred", "nc", "nt"
    ]
    assert verify_blocks(
        rd.read_parquet(f"{out}/blocks"), hash_column="body"
    )["ok"]


def test_enrich_repetition_gates(ray_session, tmp_path):
    """Gopher repetition fractions land as prunable encoded columns and
    match the stage's direct output."""
    from rayenc import enrich_many
    from rayenc.stages.text import repetition_scores

    srcs = []
    texts = [
        "same line\nsame line\nsame line\nunique one",
        "all words differ here completely now",
    ] * 50
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(100), pa.int64()),
            "body": pa.array(texts),
        }
    )
    p = tmp_path / "src.parquet"
    pq.write_table(t, p, row_group_size=25)
    out = tmp_path / "job"
    run_encode_job(str(p), str(out), block_rows=25, hash_column="body",
                   concurrency=2)
    s = enrich_many(
        str(out),
        {"dlf": "dup_line_frac", "t2g": "top2gram_char_frac"},
        input_column="body",
    )
    assert s["partitions_enriched"] == s["partitions_total"]
    got = _decode_all(out)
    want = repetition_scores(
        pa.table({"doc_id": t["doc_id"], "text": t["body"]})
    )
    assert got["dlf"].to_pylist() == want["dup_line_frac"].to_pylist()
    assert got["t2g"].to_pylist() == want["top2gram_char_frac"].to_pylist()
    # the repeated-line docs gate above Gopher's 0.30 threshold
    assert got["dlf"].to_pylist()[0] > 0.3 and got["dlf"].to_pylist()[1] == 0.0


def test_enrich_validation(ray_session, tmp_path):
    srcs, out = _job(tmp_path, n=300, files=1)
    with pytest.raises(ValueError, match="unknown enricher"):
        enrich_job(str(out), "x", "nope", input_column="body")
    with pytest.raises(ValueError, match="invalid enrichment column"):
        enrich_job(str(out), "__bad__", "n_chars", input_column="body")
    with pytest.raises(ValueError, match="collides with block metadata"):
        enrich_job(str(out), "zonemap", "n_chars", input_column="body")
    with pytest.raises(ValueError, match="already exists"):
        enrich_job(str(out), "body", "n_chars", input_column="body")
    with pytest.raises(ValueError, match="not in partition"):
        enrich_job(str(out), "x", "n_chars", input_column="nope")
    with pytest.raises(ValueError, match="no job record"):
        enrich_job(str(tmp_path / "nowhere"), "x", "n_chars")


def test_enrich_crash_window_is_idempotent(ray_session, tmp_path):
    """Simulate the published-but-uncommitted window: the blocks file
    already carries col_X while the manifest entry does not — the rerun
    must detect it and not append the column twice."""
    srcs, out = _job(tmp_path, files=1)
    enrich_job(str(out), "fp", "fingerprint", input_column="body")
    m = Manifest(str(out))
    e = next(iter(m.entries()))
    # roll the manifest entry back to the pre-enrich state
    rolled = dict(e)
    rolled.pop("enrichments")
    cols = dict(rolled["columns"])
    cols.pop("fp")
    rolled["columns"] = cols
    m.commit(rolled)
    s = enrich_job(str(out), "fp", "fingerprint", input_column="body")
    assert s["partitions_enriched"] == 0 and s["partitions_skipped"] == 1
    blocks_file = next((out / "blocks").glob("*.parquet"))
    names = pq.read_schema(str(blocks_file)).names
    assert names.count("col_fp") == 1
    # the rerun FINISHED the manifest commit from the published file
    e2 = next(iter(Manifest(str(out)).entries()))
    assert e2["enrichments"][-1]["column"] == "fp"
    assert e2["columns"]["fp"]["enc_bytes"] > 0
    # a further rerun is a clean no-op (skipped at the driver this time)
    s3 = enrich_job(str(out), "fp", "fingerprint", input_column="body")
    assert s3["partitions_skipped"] == 1 and s3["partitions_enriched"] == 0
