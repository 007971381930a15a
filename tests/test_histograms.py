"""js2pq-parity tests: gzip-JSON histogram ingestion, tag-schema
inference (+hexify), row->columnar pivot with null-element fidelity,
per-column-policy parquet, and flow into our own block encoder."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayenc.histograms import (
    as_hex,
    gen_histograms,
    infer_tag_schema,
    parse_metric,
    pivot_metric,
    read_histograms,
    touch_metric_table,
    write_histogram_json,
    write_policy_parquet,
)


@pytest.fixture(scope="module")
def metric_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("hist")
    paths = []
    for i, gz in enumerate([False, True, False]):
        m = gen_histograms(n_series=20, seed=42 + i, metric=f"metric_{i}")
        p = d / (f"m{i}.json.gz" if gz else f"m{i}.json")
        write_histogram_json(str(p), m)
        paths.append(str(p))
    return paths


def test_gzip_sniffing(metric_files):
    for p in metric_files:
        m = parse_metric(open(p, "rb").read(), p)
        assert len(m["series"]) == 20


def test_hexify():
    assert as_hex("env") == "656e76"  # byte-wise 2-hex-char expansion
    assert as_hex("k8s.pod.name") == "6b38732e706f642e6e616d65"


def test_pivot_preserves_null_elements():
    m = gen_histograms(n_series=10, seed=1)
    keys = sorted({k for s in m["series"] for k in s["tags"]})
    t = pivot_metric(m, keys)
    assert t.num_rows == 10
    # sumsDouble null elements survive (the reference FlatBuffers path
    # drops them, /root/reference/src/flatbuffers.rs:14-30)
    src_nulls = sum(v is None for s in m["series"] for v in s["sumsDouble"])
    got_nulls = t["sums_double"].combine_chunks().values.null_count
    assert src_nulls == got_nulls > 0
    # absent tags are null, present ones match
    row0 = {k: t[k][0].as_py() for k in keys}
    s0 = dict(zip(m["series"][0]["tags"], m["series"][0]["tagValues"]))
    for k in keys:
        assert row0[k] == s0.get(k)


def test_ray_ingestion_pipeline(ray_session, metric_files):
    ds = read_histograms(metric_files)
    t = pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow"),
        promote_options="default",
    )
    assert t.num_rows == 60
    assert {"metric", "ts", "sums_double", "sums_long", "count"} <= set(
        t.column_names
    )
    assert len(set(t["metric"].to_pylist())) == 3


def test_hexified_schema(ray_session, metric_files):
    import ray.data as rd

    files = rd.read_binary_files(metric_files, include_paths=True)
    plain = infer_tag_schema(files)
    hexed = infer_tag_schema(files, hexify=True)
    assert [as_hex(k) for k in plain] == hexed


def test_policy_parquet_roundtrip(tmp_path):
    m = gen_histograms(n_series=15, seed=7)
    keys = sorted({k for s in m["series"] for k in s["tags"]})
    t = pivot_metric(m, keys)
    out = str(tmp_path / "hist.parquet")
    write_policy_parquet(t, out)
    back = pq.read_table(out)
    assert back.equals(t)
    assert touch_metric_table(back) == touch_metric_table(t)


def test_histogram_table_through_block_engine(tmp_path):
    """The reference's native data model flows through OUR encoder:
    every column (incl. List<f64> with null elements) round-trips
    bit-identically through the block container."""
    from rayenc.blocks import decode_column
    from rayenc.selector import encode_column_auto

    m = gen_histograms(n_series=25, seed=9)
    keys = sorted({k for s in m["series"] for k in s["tags"]})
    t = pivot_metric(m, keys)
    for col in t.column_names:
        blob, choice = encode_column_auto(t[col])
        out = decode_column(blob)
        assert out.equals(t[col].combine_chunks()), col
