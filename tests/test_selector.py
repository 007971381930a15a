"""Selector truth-table tests (FIXTURES.md F3).

The dynamic replacement for the reference's static encoding policy
(/root/reference/src/bin/js2pq/main.rs:96-114) must pick sane codecs on
columns constructed with a known-best family — and must never pick a
codec that LOSES to the zstd backstop on measured size (size is the
authoritative criterion; a "lightweight" pick that inflates the output
would be a regression, so fallback to plain is always acceptable).
"""

from __future__ import annotations

import pyarrow as pa

from rayenc.blocks import decode_column
from rayenc.corpus import selector_fixture_columns
from rayenc.selector import encode_column_auto, select_codec

FIXTURES = selector_fixture_columns()


def test_const_col_lightweight():
    c = select_codec(FIXTURES["const_col"])
    # degenerate column: dict/rle/plain all near-zero; must not pick fsst
    assert c.codec in ("rle", "dict", "plain")
    assert c.reason


def test_lowcard_col_dict():
    assert select_codec(FIXTURES["lowcard_col"]).codec == "dict"


def test_sorted_runs_col_runs_codec():
    c = select_codec(FIXTURES["sorted_runs_col"])
    assert c.codec in ("rle", "dict", "plain")


def test_monotone_col_foref():
    c = select_codec(FIXTURES["monotone_col"])
    assert c.codec == "foref"
    assert c.trials["foref"] < c.trials["plain"]


def test_smallint_text_beats_plain():
    c = select_codec(FIXTURES["smallint_text_col"])
    assert c.codec in ("dict", "fsst")
    assert min(c.trials.values()) < c.trials["plain"]


def test_random_hex_backstop():
    """Incompressible column: selector must NOT claim a lightweight win."""
    c = select_codec(FIXTURES["random_hex_col"])
    assert c.codec == "plain"


def test_choice_never_loses_to_plain():
    """Global invariant: whatever is chosen, the actual encoded size is
    within tolerance of the plain backstop (never a silent inflation)."""
    from rayenc.blocks import encode_column

    for name, arr in FIXTURES.items():
        blob, choice = encode_column_auto(arr)
        plain = encode_column(arr, "plain")
        # +256B absolute slack: the fixed json header dominates degenerate
        # near-zero-size columns but vanishes at real block sizes
        assert len(blob) <= len(plain) * 1.05 + 256, (
            name,
            choice.codec,
            len(blob),
            len(plain),
        )
        out = decode_column(blob)
        assert out.equals(arr if isinstance(arr, pa.Array) else arr.combine_chunks()), name


def test_lineage_recorded():
    _, choice = encode_column_auto(FIXTURES["lowcard_col"])
    lin = choice.lineage()
    assert lin["codec"] == "dict"
    assert "distinct_ratio" in lin["reason"] or lin["reason"]
    assert lin["trials"]
    assert lin["stats"]["n_sample"] > 0
