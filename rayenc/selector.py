"""Codec auto-selector: sample -> stats -> candidates -> measured choice.

The dynamic replacement for the reference's static per-column encoding
policy (/root/reference/src/bin/js2pq/main.rs:96-114, SURVEY.md §2.6):
where the reference hard-codes "dictionary for tag columns,
BYTE_STREAM_SPLIT for sums_double, stats off for binary", we compute
per-column-per-block statistics (cardinality ratio, run ratio,
sortedness, avg length), shortlist candidate codecs by those stats, then
TRIAL-ENCODE a contiguous sample with each candidate and pick the
smallest measured size — never heuristics alone (a heuristic that loses
on real bytes is a lie in the manifest). The choice plus the why is
recorded as lineage in the block header and the partition manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .blocks import encode_column, prepare_array
from .codecs.base import int_view, is_floatlike, is_intlike, is_stringlike

SAMPLE_ROWS = 4096
SAMPLE_BYTES = 2 << 20       # cap trial sample at 2 MiB of string payload
FSST_SAMPLE_BYTES = 128 << 10  # fsst trials are costlier; train on less
FSST_MAX_AVG_LEN = 1024      # fsst targets short/medium strings
RUNOFF_PAYLOAD_BYTES = 12 << 20  # past ~1.5 zstd windows, sample trials lie


@dataclass
class Choice:
    codec: str
    stats: dict
    trials: dict[str, int] = field(default_factory=dict)
    reason: str = ""

    def lineage(self) -> dict:
        return {
            "codec": self.codec,
            "stats": self.stats,
            "trials": self.trials,
            "reason": self.reason,
        }


def _sample(arr: pa.Array, max_rows: int, max_bytes: int) -> pa.Array:
    """Contiguous head slice (contiguity preserves run structure)."""
    s = arr.slice(0, min(len(arr), max_rows))
    if is_stringlike(arr.type) and s.nbytes > max_bytes and len(s) > 16:
        # shrink row count until the byte cap holds (huge content blobs)
        avg = max(s.nbytes // max(len(s), 1), 1)
        s = arr.slice(0, max(16, max_bytes // avg))
    return s


def column_stats(sample: pa.Array) -> dict:
    n = len(sample)
    stats: dict = {"n_sample": n, "null_count": int(sample.null_count)}
    if n == 0:
        return stats
    stats["distinct"] = int(pc.count_distinct(sample).as_py())
    stats["distinct_ratio"] = stats["distinct"] / n
    t = sample.type
    filled, _, _ = prepare_array(sample)
    if is_stringlike(t):
        stats["avg_len"] = float(sample.nbytes / max(n, 1))
        codes_arr = pc.dictionary_encode(filled)
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        codes = codes_arr.indices.to_numpy(zero_copy_only=True)
    elif is_intlike(t):
        codes = int_view(filled)
        stats["min"] = int(codes.min())
        stats["max"] = int(codes.max())
        stats["sorted"] = bool(np.all(np.diff(codes.astype(np.int64)) >= 0))
    else:
        try:
            fv = filled.to_numpy(zero_copy_only=False)
            codes = fv.view(f"u{fv.dtype.itemsize}")
        except Exception:  # bool / fixed_size_binary etc: skip run stats
            stats["runs"] = n
            stats["run_ratio"] = 1.0
            return stats
    runs = 1 + int(np.count_nonzero(codes[1:] != codes[:-1])) if n > 1 else n
    stats["runs"] = runs
    stats["run_ratio"] = runs / n
    return stats


def candidate_codecs(t: pa.DataType, stats: dict) -> list[str]:
    n = stats.get("n_sample", 0)
    if n == 0:
        return ["plain"]
    cands = ["plain"]
    dr = stats.get("distinct_ratio", 1.0)
    rr = stats.get("run_ratio", 1.0)
    if is_stringlike(t):
        if dr < 0.6:
            cands.append("dict")
        if rr < 0.6:
            cands.append("rle")
        if dr >= 0.05 and stats.get("avg_len", 1e9) <= FSST_MAX_AVG_LEN:
            cands.append("fsst")
            cands.append("fsst@9")
        if dr >= 0.05 and stats.get("avg_len", 0.0) >= 64:
            # bulk text: a deeper zstd level is a live candidate (the
            # reference pins level 3; we trial the trade on real bytes)
            cands.append("plain@9")
    elif is_intlike(t):
        cands.append("foref")
        if stats.get("min", -1) >= 0:
            cands.append("bitpack")
        if rr < 0.6:
            cands.append("rle")
        if dr < 0.2:
            cands.append("dict")
        cands.append("bss")
    elif is_floatlike(t):
        cands.append("bss")
        if dr < 0.2:
            cands.append("dict")
        if rr < 0.6:
            cands.append("rle")
    elif pa.types.is_decimal(t):
        cands.append("bss")  # byte planes: sign-extension bytes vanish
    # bool / fixed_size_binary fall through with ["plain"] only
    return cands


def select_codec(
    arr: pa.Array | pa.ChunkedArray,
    sample_rows: int = SAMPLE_ROWS,
    level: int = 3,
) -> Choice:
    """Pick the codec for one column chunk by measured trial size."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    sample = _sample(arr, sample_rows, SAMPLE_BYTES)
    stats = column_stats(sample)
    cands = candidate_codecs(arr.type, stats)
    trials: dict[str, int] = {}
    ratios: dict[str, float] = {}  # payload bytes per source byte (comparable across samples)
    for name in cands:
        trial_sample = sample
        if name.startswith("fsst") and sample.nbytes > FSST_SAMPLE_BYTES:
            trial_sample = _sample(arr, sample_rows, FSST_SAMPLE_BYTES)
        try:
            blob = encode_column(trial_sample, name, level)
        except Exception:  # a candidate that cannot encode loses by default
            continue
        # compare payloads net of the fixed json header: at real block sizes
        # (100k+ rows) the header vanishes, so letting it bias a 4k-row
        # sample would systematically punish multi-section codecs
        hlen = int.from_bytes(blob[4:8], "little")
        payload = len(blob) - 8 - hlen
        trials[name] = len(blob)
        ratios[name] = payload / max(trial_sample.nbytes, 1)
    if not trials:
        return Choice("plain", stats, {}, "no candidate succeeded; zstd backstop")
    # a deeper zstd level costs 2-4x encode CPU: demand a >=3% size win
    # over the same codec at the default level before paying it
    for base in ("fsst", "plain"):
        hi = f"{base}@9"
        if hi in ratios and base in ratios and ratios[hi] > ratios[base] * 0.97:
            del ratios[hi]
    # fsst trades 10-100x encode CPU for size: demand a >=3% size win over
    # the best alternative before paying it (variants judged as a family)
    fsst_keys = [k for k in ratios if k.startswith("fsst")]
    if fsst_keys and len(ratios) > len(fsst_keys):
        best_fsst = min(ratios[k] for k in fsst_keys)
        best_other = min(v for k, v in ratios.items() if not k.startswith("fsst"))
        if best_fsst > best_other * 0.97:
            for k in fsst_keys:
                del ratios[k]
    best_name, best_ratio = min(ratios.items(), key=lambda kv: kv[1])
    # tie-break: a lightweight codec within 2% of the zstd backstop wins —
    # equal size but cheaper decode + random access at scale
    if best_name == "plain":
        for name, r in sorted(ratios.items(), key=lambda kv: kv[1]):
            if name != "plain" and r <= best_ratio * 1.02 + 1e-9:
                best_name = name
                break
    reason = (
        f"min trial payload among {sorted(trials)} "
        f"(distinct_ratio={stats.get('distinct_ratio', 1):.3f}, "
        f"run_ratio={stats.get('run_ratio', 1):.3f})"
    )
    return Choice(best_name, stats, trials, reason)


def encode_column_auto(
    arr: pa.Array | pa.ChunkedArray, level: int = 3, sample_rows: int = SAMPLE_ROWS
) -> tuple[bytes, Choice]:
    """Select a codec on a sample, then encode the full column with it.

    List columns select the codec on the FLATTENED child values (the
    list shell is always lengths+validity, see blocks._encode_list).
    Falls back to plain if the selected codec fails on the full data
    (e.g. bitpack chosen on a non-negative sample but the tail has a
    negative value)."""
    t = arr.type if not isinstance(arr, pa.ChunkedArray) else arr.type
    if pa.types.is_struct(t) or pa.types.is_map(t):
        # composites: select per FIELD once and return the choices as a
        # "struct:{json}" spec string — the block encoder's per-column
        # cache then re-encodes later blocks with zero trials (a cached
        # literal "auto" would re-run per-field sampling every block)
        import json as _json

        arr_c = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_map(t):
            lt = pa.list_(
                pa.field(
                    "entries",
                    pa.struct(
                        [
                            pa.field("key", t.key_type, nullable=False),
                            pa.field("value", t.item_type),
                        ]
                    ),
                )
            )
            entries = pc.list_flatten(arr_c.cast(lt))
        else:
            entries = arr_c
        et = entries.type
        spec: dict[str, str] = {}
        for i in range(et.num_fields):
            child = entries.field(i)
            ct = child.type
            if (
                pa.types.is_struct(ct)
                or pa.types.is_map(ct)
                or pa.types.is_list(ct)
                or pa.types.is_large_list(ct)
                or pa.types.is_fixed_size_list(ct)
            ):
                spec[et.field(i).name] = "auto"
            else:
                spec[et.field(i).name] = select_codec(child, sample_rows, level).codec
        codec_str = "struct:" + _json.dumps(spec, separators=(",", ":"))
        blob = encode_column(arr, codec_str, level)
        return blob, Choice(
            codec_str,
            {"n_sample": len(arr)},
            {},
            "composite: per-field selection (cacheable spec)",
        )
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        child = pc.list_flatten(
            arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        )
        ct = child.type
        if (
            pa.types.is_struct(ct)
            or pa.types.is_map(ct)
            or pa.types.is_list(ct)
            or pa.types.is_large_list(ct)
            or pa.types.is_fixed_size_list(ct)
        ):
            choice = Choice(
                "auto", {"n_sample": len(child)}, {}, "nested child: per-field auto"
            )
        else:
            choice = select_codec(child, sample_rows, level)
            choice.reason = f"child-values selection: {choice.reason}"
    else:
        choice = select_codec(arr, sample_rows, level)
    if (
        is_stringlike(t)
        and arr.nbytes >= RUNOFF_PAYLOAD_BYTES
        and choice.codec in ("plain", "plain@9", "fsst", "fsst@9")
    ):
        # sample trials INVERT beyond the zstd window (~8 MiB): fsst's
        # ~4x-denser token stream stretches the window to ~4x the source
        # text, so on multi-window blocks fsst@9 beats plain@9 even when
        # every window-sized sample says otherwise (measured: full-column
        # fsst@9 0.110 vs plain@9 0.141 on samples that all favor plain).
        # Resolve by a measured FULL-payload runoff between the two
        # family finalists; the block-level codec cache amortizes the
        # loser's encode across retrial_blocks blocks.
        rival = "fsst@9" if choice.codec.startswith("plain") else "plain@9"
        try:
            blob_a = encode_column(arr, choice.codec, level)
        except Exception:
            # same guarantee as the non-runoff tail: a sample-chosen codec
            # that fails on the full payload degrades to the zstd backstop
            choice = Choice(
                "plain",
                choice.stats,
                choice.trials,
                f"{choice.codec} failed on full data; zstd backstop",
            )
            blob_a = encode_column(arr, "plain", level)
        try:
            blob_b = encode_column(arr, rival, level)
        except Exception:
            blob_b = None
        if blob_b is not None and len(blob_b) < len(blob_a):
            trials = dict(choice.trials)
            trials[f"runoff:{rival}"] = len(blob_b)
            trials[f"runoff:{choice.codec}"] = len(blob_a)
            return blob_b, Choice(
                rival,
                choice.stats,
                trials,
                f"full-payload runoff beat {choice.codec} ({len(blob_b)} < {len(blob_a)})",
            )
        choice.trials[f"runoff:{choice.codec}"] = len(blob_a)
        return blob_a, choice
    try:
        blob = encode_column(arr, choice.codec, level)
    except Exception:
        choice = Choice(
            "plain", choice.stats, choice.trials, f"{choice.codec} failed on full data; zstd backstop"
        )
        blob = encode_column(arr, "plain", level)
    return blob, choice
