#!/usr/bin/env bash
# End-to-end CLI demo: everything a user of the reference runs today,
# on the Ray engine. Scratch under /tmp; safe to re-run (resume kicks in).
set -euo pipefail
cd "$(dirname "$0")/.."
D=/tmp/rayenc_demo
rm -rf "$D"; mkdir -p "$D"

echo "== 1. deterministic corpus =="
python -m rayenc gen "$D/corpus.parquet" --rows 5000

echo "== 2. optional locality layout (salted repo shuffle) =="
python -m rayenc layout "$D/corpus.parquet" "$D/layout" --target-rows 1000

echo "== 3. resumable encode job =="
python -m rayenc encode "$D/layout" "$D/job" --block-rows 1000

echo "== 4. rerun is a no-op (manifest) =="
python -m rayenc encode "$D/layout" "$D/job" --block-rows 1000

echo "== 5. manifest summary (codec lineage) =="
python -m rayenc manifest "$D/job"

echo "== 6. sha256 verification (+ paranoid pruning-metadata audit) =="
python -m rayenc verify "$D/job" --check-zones

echo "== 7. ordered decode back to parquet =="
python -m rayenc decode "$D/job" "$D/decoded" --ordered

echo "== 7a2. resumable decode-export (atomic per-partition publish; rerun skips) =="
python -m rayenc export "$D/job" "$D/export"
python -m rayenc export "$D/job" "$D/export"   # no-op rerun: everything skipped

echo "== 7a3. hive-partitioned export (one lang=value/ dir per key; marker-token resume) =="
python -m rayenc export "$D/job" "$D/export_hive" --partition-by lang
python -m rayenc export "$D/job" "$D/export_hive" --partition-by lang  # no-op rerun
ls -d "$D"/export_hive/lang=*/ | head -3

echo "== 7a4. maintenance DML: snapshot -> enrich -> update(scrub) -> delete -> vacuum =="
rm -rf "$D/job_dml" && cp -r "$D/job" "$D/job_dml"  # own copy: later steps use the pristine dir
python -m rayenc snapshot "$D/job_dml" --note "before DML"
python -m rayenc enrich "$D/job_dml" n_tok n_tokens --also nc=n_chars   # derived cols, one decode pass
python -m rayenc update "$D/job_dml" --filter "lang:==:python" --scrub "content:import =use " # in-place redaction
python -m rayenc delete "$D/job_dml" --filter "lang:==:ruby"            # copy-on-write delete
python -m rayenc verify "$D/job_dml"                                    # chains still green after DML
python -m rayenc vacuum "$D/job_dml" --max-age 0                        # sweep staging leftovers

echo "== 7b. zone-map filtered decode (predicate pushdown) =="
python -m rayenc decode "$D/job" "$D/decoded_filtered" --filter "lang:==:python" --filter "path:prefix:src/module00" --columns repo,path,lang

echo "== 7b2. metadata-pushdown aggregates (zones answer; boundary-only decode) =="
python -m rayenc agg "$D/job" count --filter "path:prefix:src/module00"
python -m rayenc agg "$D/job" min-max --col path
python -m rayenc agg "$D/job" topk --col path --k 3 --extra commit --tie commit

echo "== 7c. random access: take specific global rows =="
python -m rayenc take-rows "$D/job" 0,4999,2500 --columns repo,path

echo "== 7d. paged job (page zone maps + sub-block pruned filtered decode) =="
python -m rayenc encode "$D/layout" "$D/pjob" --block-rows 1000 --stats page --page-rows 250
python -m rayenc verify "$D/pjob"
python -m rayenc decode "$D/pjob" "$D/pdecoded_filtered" --filter "lang:==:python" --columns repo,path,lang

echo "== 7e. compaction: re-block under-sized commits =="
python -m rayenc compact "$D/job" "$D/compacted" --block-rows 2500

echo "== 7e2. IN-PLACE compaction (atomic partition swaps, manifest re-commit) =="
python -m rayenc encode "$D/layout" "$D/cjob" --block-rows 100   # deliberately under-sized blocks
python -m rayenc compact "$D/cjob" --in-place --block-rows 1000
python -m rayenc verify "$D/cjob" --check-zones
python -m rayenc encode "$D/layout" "$D/cjob" --block-rows 100   # resume: still a no-op

echo "== 7e3. HLL sketches: metadata-only distinct estimate =="
python -m rayenc encode "$D/layout" "$D/hjob" --block-rows 1000 --hll
python - <<'PY'
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from rayenc.decode import agg_approx_distinct
from rayenc.encode import read_blocks
blocks = read_blocks("/tmp/rayenc_demo/hjob/blocks")
est = agg_approx_distinct(blocks, "repo")
print({"approx_distinct_repo": round(est, 1)})
ray.shutdown()
PY

echo "== 7f. schema evolution: decode a union of mixed-version block tables =="
python - <<'PY'
import pyarrow as pa, ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
from rayenc.decode import decode_dataset
from rayenc.encode import BlockEncoder, read_blocks, write_blocks
D = "/tmp/rayenc_demo"
v1 = pa.table({"a": pa.array([1, 2], type=pa.int64()), "b": pa.array(["x", "y"])})
v2 = pa.table({"a": pa.array([3], type=pa.int64()), "c": pa.array([9.5], type=pa.float64())})
write_blocks(rd.from_arrow(BlockEncoder(hash_column=None).encode_table(v1)), f"{D}/sev1")
write_blocks(rd.from_arrow(BlockEncoder(hash_column=None).encode_table(v2)), f"{D}/sev2")
out = pa.concat_tables(
    decode_dataset(
        read_blocks([f"{D}/sev1", f"{D}/sev2"]),
        fill_missing={"b": pa.string(), "c": pa.float64()},
    ).iter_batches(batch_size=None, batch_format="pyarrow")
).sort_by("a")
assert out["b"].to_pylist() == ["x", "y", None] and out["c"].to_pylist() == [None, None, 9.5]
print({"schema_evolution_rows": out.num_rows, "columns": out.column_names})
ray.shutdown()
PY

echo "== 8. read benchmark (row-by-row vs columnar, touch counter) =="
python -m rayenc bench-read "$D/corpus.parquet" --iterations 1

echo "== 9. histogram ingestion (js2pq parity) =="
python - <<'PY'
from rayenc.histograms import gen_histograms, write_histogram_json
for i in range(2):
    write_histogram_json(f"/tmp/rayenc_demo/m{i}.json.gz", gen_histograms(n_series=10, seed=i, metric=f"metric_{i}"))
PY
python -m rayenc js2pq "$D"/m0.json.gz "$D"/m1.json.gz "$D/histograms.parquet"

echo "== 9b. reference FlatBuffers opaque layout (wire interop) =="
python -m rayenc js2pq "$D"/m0.json.gz "$D/histograms_fbs.parquet" --layout flatbuffers
python - <<'PY'
from rayenc.histograms import read_flatbuffers_parquet
t = read_flatbuffers_parquet("/tmp/rayenc_demo/histograms_fbs.parquet")
assert t.num_rows == 10 and "ts" in t.column_names
print({"fbs_interop_rows": t.num_rows})
PY
echo "DEMO OK"
