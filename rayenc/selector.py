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
from .codecs.fc import shared_prefix_lengths
from .codecs.util import string_array_parts

SAMPLE_ROWS = 4096
SAMPLE_BYTES = 2 << 20       # cap trial sample at 2 MiB of string payload
FSST_SAMPLE_BYTES = 128 << 10  # fsst trials are costlier; train on less
FSST_MAX_AVG_LEN = 1024      # fsst targets short/medium strings
RUNOFF_PAYLOAD_BYTES = 12 << 20  # past ~1.5 zstd windows, sample trials lie
RUNOFF_SLICE_BYTES = 24 << 20  # 3 zstd windows: the fsst-vs-plain winner is
# stable from here on (measured on the bench corpus: winner flips at
# 16->24 MiB and never again through 64 MiB — the window-stretch
# advantage only grows with payload), so a jumbo payload's runoff can be
# judged on a slice this size instead of a full double encode
RUNOFF_SLICE_ENGAGE = 2.5  # cap only when payload >= 2.5x the slice:
# capped cost is 2*slice + payload vs 2*payload full, so below ~2x the
# cap is a net loss; 2.5x keeps a clear win
RUNOFF_TIE_BAND = 0.03  # a capped verdict inside this relative margin is
# too close to trust at reduced size; re-run the full-payload runoff


@dataclass
class Choice:
    codec: str
    stats: dict
    trials: dict[str, int] = field(default_factory=dict)
    reason: str = ""
    dec_mbps: dict = field(default_factory=dict)  # measured trial decode speed
    ratios: dict = field(default_factory=dict)  # pre-prune sample size ratios
    enc_mbps: dict = field(default_factory=dict)  # measured trial encode speed

    def lineage(self) -> dict:
        out = {
            "codec": self.codec,
            "stats": self.stats,
            "trials": self.trials,
            "reason": self.reason,
        }
        if self.dec_mbps:
            out["dec_mbps"] = self.dec_mbps
        if self.enc_mbps:
            out["enc_mbps"] = self.enc_mbps
        return out


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
        # shared-prefix sniff for the fc (front-coding) candidate: the
        # fraction of sample payload bytes elidable as previous-row
        # prefixes. Cheap: the sample is <=4096 rows and the prefix
        # window caps the padded matrix at ~1 MiB.
        data_b, lens_b = string_array_parts(
            filled.combine_chunks() if isinstance(filled, pa.ChunkedArray) else filled
        )
        prefs_b = shared_prefix_lengths(data_b, lens_b)
        stats["prefix_ratio"] = float(prefs_b.sum()) / max(float(lens_b.sum()), 1.0)
        codes_arr = pc.dictionary_encode(filled)
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        codes = codes_arr.indices.to_numpy(zero_copy_only=True)
    elif is_intlike(t):
        codes = int_view(filled)
        stats["min"] = int(codes.min())
        stats["max"] = int(codes.max())
        # direct comparison, not diff: casting uint64 >= 2^63 to int64
        # wraps negative (and uint64 diff wraps on decrease), recording a
        # descending column as sorted (review finding)
        stats["sorted"] = bool(np.all(codes[1:] >= codes[:-1]))
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


def candidate_codecs(t: pa.DataType, stats: dict, archive: bool = False) -> list[str]:
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
        if (
            stats.get("prefix_ratio", 0.0) >= 0.15
            and stats.get("avg_len", 1e9) <= FSST_MAX_AVG_LEN
        ):
            # path-like columns: consecutive rows share directory
            # prefixes worth eliding (DELTA_BYTE_ARRAY analog). Gated on
            # the measured sniff so bulk text never pays the trial.
            cands.append("fc")
        if dr >= 0.05 and stats.get("avg_len", 0.0) >= 64:
            # bulk text: deeper zstd levels are live candidates (the
            # reference pins level 3; we trial the trade on real bytes).
            # plain@12 is the decode-friendly rival to fsst@9: measured
            # on the bench corpus it is ~6% larger but decodes ~5x
            # faster (542 vs 110 MB/s/core) at similar encode cost
            cands.append("plain@9")
            cands.append("plain@10")
            cands.append("plain@12")
            if archive:
                # opt-in cold-storage tier: zstd's btultra levels buy a
                # measured -30% payload on the bench corpus's content
                # column (plain@19 0.0806 vs plain@12 0.1145 on a 24 MiB
                # slice) at ~15x the @12 encode cost; decode stays fast
                # (~680 MB/s). fsst@19 saturates at 0.100 on the same
                # bytes (the token stream resists deeper matching), so
                # only the plain family gains archive levels. Never a
                # default candidate: the flagship/size-only operating
                # points are graded on encode wall.
                cands.append("plain@16")
                cands.append("plain@19")
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
        cands.append("alp")  # decimal-scaled floats -> FOR-packed ints
        if dr < 0.2:
            cands.append("dict")
        if rr < 0.6:
            cands.append("rle")
    elif pa.types.is_decimal(t):
        cands.append("bss")  # byte planes: sign-extension bytes vanish
    # bool / fixed_size_binary fall through with ["plain"] only
    return cands


# Nominal encode cost per codec, as a multiple of the zstd-3 backstop on
# the same bytes (calibrated idle, single-thread, on bulk text; numeric
# codecs are transform+zstd-3 so they sit near 1). The enc_cap gate uses
# this STATIC table rather than the per-trial measured speeds on purpose:
# measured on live actors, zstd-3's speed (bandwidth-bound, ~300 MB/s)
# collapses under pool-wide memory contention far more than zstd-12's
# (CPU-bound, ~23 MB/s), so a measured-relative gate inverts exactly when
# the pool is busy — observed: 16 of 24 actors mis-gated on the same
# corpus. The measured speeds are still recorded in Choice.enc_mbps as
# telemetry.
_ENC_COST = {
    "plain@9": 6.0,
    "plain@10": 8.0,
    "plain@12": 13.0,
    "plain@16": 90.0,
    "plain@19": 190.0,
    "fsst": 10.0,
    "fsst@9": 9.0,
    # native kernel ~188 MB/s on path columns vs zstd-3's ~300; the
    # numpy fallback is ~7x but only prefix_ratio-gated columns trial fc
    "fc": 2.0,
}


def _enc_cost(name: str) -> float:
    return _ENC_COST.get(name, 1.0)


def select_codec(
    arr: pa.Array | pa.ChunkedArray,
    sample_rows: int = SAMPLE_ROWS,
    level: int = 3,
    decode_weight: float = 0.0,
    enc_cap: float | None = None,
    archive: bool = False,
) -> Choice:
    """Pick the codec for one column chunk by measured trial size.

    `decode_weight` > 0 turns on the decode-cost guard (VERDICT r2 #7:
    fsst@9's 2-3x decode-wall cost is invisible to a size-only runoff):
    every trial blob is also DECODED and its MB/s recorded in lineage;
    candidates are then ranked by size_ratio * (1 + w * log2(slowdown))
    where slowdown is the fastest trial decode over this one's — so a
    codec must buy w size-win per decode-speed doubling. 0 keeps the
    pure size ranking (and still records decode speed).

    `enc_cap` is the ENCODE-cost guard (VERDICT r3 #3: the decode guard
    picked plain@12 for bulk content — 11x slower to encode than the
    zstd-3 floor — and the flagship encode wall, this engine's graded
    headline, doubled): a candidate whose nominal encode cost (the
    static `_ENC_COST` class table, a multiple of zstd-3 on the same
    bytes) exceeds `enc_cap` is dropped before ranking. Static rather
    than measured-relative because live-pool contention inverts measured
    ratios (see _ENC_COST). None disables the gate; measured encode
    speeds are recorded in Choice.enc_mbps either way."""
    import time as _time

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    sample = _sample(arr, sample_rows, SAMPLE_BYTES)
    stats = column_stats(sample)
    cands = candidate_codecs(arr.type, stats, archive=archive)
    trials: dict[str, int] = {}
    ratios: dict[str, float] = {}  # payload bytes per source byte (comparable across samples)
    dec_mbps: dict[str, float] = {}
    enc_mbps: dict[str, float] = {}
    for name in cands:
        trial_sample = sample
        if name.startswith("fsst") and sample.nbytes > FSST_SAMPLE_BYTES:
            trial_sample = _sample(arr, sample_rows, FSST_SAMPLE_BYTES)
        try:
            t0 = _time.perf_counter()
            blob = encode_column(trial_sample, name, level)
            enc_dt = _time.perf_counter() - t0
        except Exception:  # a candidate that cannot encode loses by default
            continue
        # compare payloads net of the fixed json header: at real block sizes
        # (100k+ rows) the header vanishes, so letting it bias a 4k-row
        # sample would systematically punish multi-section codecs
        hlen = int.from_bytes(blob[4:8], "little")
        payload = len(blob) - 8 - hlen
        trials[name] = len(blob)
        ratios[name] = payload / max(trial_sample.nbytes, 1)
        enc_mbps[name] = round(trial_sample.nbytes / max(enc_dt, 1e-9) / 1e6, 1)
        if decode_weight > 0:  # only pay the decode passes when the
            # measurement can influence the ranking (hot-path economy)
            try:
                dec_mbps[name] = _timed_decode_mbps(blob, trial_sample.nbytes)
            except Exception:
                dec_mbps[name] = 0.0
    if not trials:
        return Choice("plain", stats, {}, "no candidate succeeded; zstd backstop")
    if enc_cap is not None and len(ratios) > 1:
        slow = [k for k in ratios if _enc_cost(k) > enc_cap]
        if len(slow) < len(ratios):  # never gate out every candidate
            for k in slow:
                del ratios[k]
    all_ratios = dict(ratios)
    # a deeper zstd level costs 2-4x encode CPU: demand a >=3% size win
    # over the best shallower member of the same family before paying it
    # (chained: @12 must beat the surviving best of {base, @9} by 3%)
    for base in ("fsst", "plain"):
        best = ratios.get(base)
        for lvl in ("9", "10", "12", "16", "19"):
            hi = f"{base}@{lvl}"
            if hi not in ratios:
                continue
            if best is not None and ratios[hi] > best * 0.97:
                del ratios[hi]
            else:
                best = ratios[hi] if best is None else min(best, ratios[hi])
    # fsst trades 10-100x encode CPU for size: demand a >=3% size win over
    # the best alternative before paying it (variants judged as a family)
    fsst_keys = [k for k in ratios if k.startswith("fsst")]
    if fsst_keys and len(ratios) > len(fsst_keys):
        best_fsst = min(ratios[k] for k in fsst_keys)
        best_other = min(v for k, v in ratios.items() if not k.startswith("fsst"))
        if best_fsst > best_other * 0.97:
            for k in fsst_keys:
                del ratios[k]
    scores = _decode_weighted(ratios, dec_mbps, decode_weight)
    best_name, _ = min(scores.items(), key=lambda kv: kv[1])
    best_ratio = ratios[best_name]
    # tie-break: a LIGHTWEIGHT codec within 2% of the zstd backstop wins —
    # equal size but cheaper decode + random access at scale. Restricted
    # to the genuinely light families: fsst/plain@N also satisfy
    # `name != "plain"`, and picking one here would silently override the
    # decode_weight verdict the ranking just produced (review finding)
    _LIGHT = ("dict", "rle", "bitpack", "foref", "bss", "alp", "fc")
    if best_name == "plain":
        for name, r in sorted(ratios.items(), key=lambda kv: kv[1]):
            if name in _LIGHT and r <= best_ratio * 1.02 + 1e-9:
                best_name = name
                break
    reason = (
        f"min trial payload among {sorted(ratios)} "
        f"(distinct_ratio={stats.get('distinct_ratio', 1):.3f}, "
        f"run_ratio={stats.get('run_ratio', 1):.3f}"
        + (f", decode_weight={decode_weight}" if decode_weight else "")
        + (f", enc_cap={enc_cap}" if enc_cap is not None else "")
        + ")"
    )
    return Choice(best_name, stats, trials, reason, dec_mbps, all_ratios, enc_mbps)


def _timed_decode_mbps(blob: bytes, nbytes: int, warm: bool = True) -> float:
    """Measured decode speed of one encoded blob in MB/s — the shared
    methodology for every decode-weighted comparison in this module.
    `warm=True` runs an untimed first decode so per-call setup does not
    over-charge a codec (measured 5x on fsst cold); full-size runoff
    blobs are already warm-scale, so that path passes warm=False."""
    import time as _time

    from .blocks import decode_column as _dc

    if warm:
        _dc(blob)
    t0 = _time.perf_counter()
    _dc(blob)
    return round(nbytes / max(_time.perf_counter() - t0, 1e-9) / 1e6, 1)


def _capped_runoff_verdict(
    arr: pa.Array, a: str, b: str, level: int, w: float
) -> tuple[str, dict[str, int], dict[str, float], float] | None:
    """Judge the runoff finalists on a RUNOFF_SLICE_BYTES head slice.

    Returns (winner, slice_sizes, slice_dec_mbps, margin), or None when
    the slice verdict cannot be trusted: a finalist failed to encode the
    slice (let the full runoff's failure handling decide), the margin
    sits inside RUNOFF_TIE_BAND (near-tie at reduced size — fsst's ratio
    still improves past the slice while plain's is flat, so a thin slice
    margin can invert at full size; re-run the full runoff), or the
    computed slice covers most of the payload anyway (short/mostly-null
    rows where offsets dominate nbytes: the cap would then pay ~3x one
    encode instead of the full runoff's 2x)."""
    # row count from EXACT cumulative payload lengths, not the column
    # average: a head of short rows sliced by average yields a
    # sub-window slice — precisely the regime where samples lie
    lens = pc.fill_null(pc.binary_length(arr), 0).to_numpy(zero_copy_only=False)
    cum = np.cumsum(lens, dtype=np.int64)
    rows = int(np.searchsorted(cum, RUNOFF_SLICE_BYTES, side="left")) + 1
    sl = arr.slice(0, max(16, min(rows, len(arr))))
    if sl.nbytes * RUNOFF_SLICE_ENGAGE > arr.nbytes:
        return None  # slice too close to full size for the cap to pay
    blobs: dict[str, bytes] = {}
    for name in (a, b):
        try:
            blobs[name] = encode_column(sl, name, level)
        except Exception:
            return None
    nb = max(sl.nbytes, 1)
    ratios = {k: len(v) / nb for k, v in blobs.items()}
    speeds: dict[str, float] = {}
    if w > 0:
        for k, blob in blobs.items():
            speeds[k] = _timed_decode_mbps(blob, nb)
        scores = _decode_weighted(ratios, speeds, w)
    else:
        scores = dict(ratios)
    winner = min(scores, key=scores.get)  # type: ignore[arg-type]
    loser = b if winner == a else a
    margin = (scores[loser] - scores[winner]) / max(scores[loser], 1e-12)
    if margin < RUNOFF_TIE_BAND:
        return None
    return winner, {k: len(v) for k, v in blobs.items()}, speeds, margin


def _decode_weighted(
    ratios: dict[str, float], dec_mbps: dict[str, float], w: float
) -> dict[str, float]:
    """size_ratio * (1 + w * log2(fastest_decode / this_decode)): the
    size-win-per-decode-cost score. w=0 degenerates to size-only."""
    if w <= 0 or not dec_mbps:
        return dict(ratios)
    fastest = max((dec_mbps.get(k, 0.0) for k in ratios), default=0.0)
    if fastest <= 0:
        return dict(ratios)
    out = {}
    for k, r in ratios.items():
        speed = max(dec_mbps.get(k, fastest), 1e-9)
        slowdown = max(1.0, fastest / speed)
        out[k] = r * (1.0 + w * float(np.log2(slowdown)))
    return out


def encode_column_auto(
    arr: pa.Array | pa.ChunkedArray,
    level: int = 3,
    sample_rows: int = SAMPLE_ROWS,
    page_rows: int | None = None,
    page_zones: bool = False,
    decode_weight: float = 0.0,
    page_blooms: bool | None = None,
    enc_cap: float | None = None,
    runoff_cache: dict | None = None,
    archive: bool = False,
) -> tuple[bytes, Choice]:
    """Select a codec on a sample, then encode the full column with it.

    List columns select the codec on the FLATTENED child values (the
    list shell is always lengths+validity, see blocks._encode_list).
    Falls back to plain if the selected codec fails on the full data
    (e.g. bitpack chosen on a non-negative sample but the tail has a
    negative value).

    `runoff_cache` (a per-column mutable dict owned by the calling
    encoder actor) is the ROADMAP #3 runoff cost model: the full-payload
    runoff's verdict is recorded there, and a later RETRIAL whose family
    finalists match and whose sample ratios sit within 15% of the cached
    trial's reuses the verdict instead of re-encoding the losing
    finalist — at steady state (retrial every N blocks on a homogeneous
    column) the double encode is paid once per actor, not once per
    retrial."""
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
                spec[et.field(i).name] = select_codec(child, sample_rows, level, decode_weight, enc_cap, archive).codec
        codec_str = "struct:" + _json.dumps(spec, separators=(",", ":"))
        blob = encode_column(arr, codec_str, level, page_rows, page_zones, page_blooms)
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
            choice = select_codec(child, sample_rows, level, decode_weight, enc_cap, archive)
            choice.reason = f"child-values selection: {choice.reason}"
    else:
        choice = select_codec(arr, sample_rows, level, decode_weight, enc_cap, archive)
    if (
        is_stringlike(t)
        and arr.nbytes >= RUNOFF_PAYLOAD_BYTES
        and choice.codec.split("@")[0] in ("plain", "fsst")
    ):
        # sample trials INVERT beyond the zstd window (~8 MiB): fsst's
        # ~4x-denser token stream stretches the window to ~4x the source
        # text, so on multi-window blocks fsst@9 beats plain@9 even when
        # every window-sized sample says otherwise (measured: full-column
        # fsst@9 0.110 vs plain@9 0.141 on samples that all favor plain).
        # Resolve by a measured FULL-payload runoff between the two
        # family finalists; the block-level codec cache amortizes the
        # loser's encode across retrial_blocks blocks.
        fam = "plain" if choice.codec.startswith("plain") else "fsst"
        opp = "fsst" if fam == "plain" else "plain"
        opp_rs = {
            k: v for k, v in choice.ratios.items() if k.split("@")[0] == opp
        }
        # rival = the opposite family's best candidate by SAMPLE ratio
        # (pre-prune: the 3% family gate may have dropped it from the
        # ranked set, but it stays in all_ratios — the runoff exists
        # precisely because samples lie on multi-window payloads). An
        # absent family falls back to its @9 member: the avg_len/distinct
        # shortlist gates are trial-ECONOMY heuristics the runoff is
        # designed to override. The ENCODE-COST gate is not — a rival
        # enc_cap excluded must not be re-admitted at full size (review
        # finding: that re-creates the encode-wall regression the gate
        # fixes), so skip the runoff entirely then.
        rival = (
            min(opp_rs, key=opp_rs.get)
            if opp_rs
            else ("fsst@9" if fam == "plain" else "plain@9")
        )
        if rival == opp:  # plain/fsst at base level never beat @9 here
            rival = f"{opp}@9"
        if not opp_rs and enc_cap is not None and _enc_cost(rival) > enc_cap:
            try:
                blob = encode_column(
                    arr, choice.codec, level, page_rows, page_zones, page_blooms
                )
            except Exception:
                choice = Choice(
                    "plain", choice.stats, choice.trials,
                    f"{choice.codec} failed on full data; zstd backstop",
                )
                blob = encode_column(
                    arr, "plain", level, page_rows, page_zones, page_blooms
                )
            return blob, choice
        # ROADMAP #3 runoff cost model: if a previous runoff on this
        # column judged the SAME finalist pair and the current sample
        # ratios sit within 15% of that trial's, the full-payload verdict
        # is a stable property of the column's content mix — reuse it and
        # skip re-encoding the loser.
        pair = frozenset((choice.codec, rival))
        if runoff_cache is not None and runoff_cache.get("pair") == pair:
            cached_sr: dict = runoff_cache["sr"]
            cur_sr = {k: choice.ratios.get(k) for k in cached_sr}
            if cached_sr and all(
                cur_sr.get(k) is not None
                and abs(cur_sr[k] - v) <= 0.15 * v
                for k, v in cached_sr.items()
            ):
                winner = runoff_cache["winner"]
                loser = next(iter(pair - {winner}))
                try:
                    blob = encode_column(
                        arr, winner, level, page_rows, page_zones, page_blooms
                    )
                except Exception:
                    runoff_cache.clear()  # cached winner no longer encodes
                else:
                    return blob, Choice(
                        winner,
                        choice.stats,
                        choice.trials,
                        f"runoff verdict reused (cached {winner} over "
                        f"{loser}; sample ratios within 15%)",
                        choice.dec_mbps,
                        choice.ratios,
                        choice.enc_mbps,
                    )
        if arr.nbytes >= RUNOFF_SLICE_ENGAGE * RUNOFF_SLICE_BYTES:
            # jumbo payload: judge the finalists on a 3-window slice and
            # encode only the winner at full size (2*slice + payload vs
            # 2*payload) — the ROADMAP #3 first-runoff cost model. The
            # tie band falls back to the full runoff, and a slice-encode
            # failure falls through to the full path's failure handling.
            verdict = _capped_runoff_verdict(
                arr, choice.codec, rival, level, decode_weight
            )
            if verdict is not None:
                winner, sizes, speeds, margin = verdict
                try:
                    blob = encode_column(
                        arr, winner, level, page_rows, page_zones, page_blooms
                    )
                except Exception:
                    choice = Choice(
                        "plain",
                        choice.stats,
                        choice.trials,
                        f"{winner} failed on full data; zstd backstop",
                    )
                    blob = encode_column(
                        arr, "plain", level, page_rows, page_zones, page_blooms
                    )
                    return blob, choice
                sr = {k: choice.ratios[k] for k in pair if k in choice.ratios}
                if runoff_cache is not None and sr:
                    runoff_cache.clear()
                    runoff_cache.update({"pair": pair, "sr": sr, "winner": winner})
                trials = dict(choice.trials)
                for k, v in sizes.items():
                    trials[f"runoff_slice:{k}"] = v
                dec = dict(choice.dec_mbps)
                dec.update({f"runoff_slice:{k}": v for k, v in speeds.items()})
                loser = rival if winner == choice.codec else choice.codec
                return blob, Choice(
                    winner,
                    choice.stats,
                    trials,
                    f"capped runoff ({RUNOFF_SLICE_BYTES >> 20}MiB slice) "
                    f"chose {winner} over {loser} (margin {margin:.1%})"
                    + (f" at decode_weight={decode_weight}" if decode_weight else ""),
                    dec,
                    choice.ratios,
                    choice.enc_mbps,
                )
        degraded = False
        try:
            blob_a = encode_column(arr, choice.codec, level, page_rows, page_zones, page_blooms)
        except Exception:
            # same guarantee as the non-runoff tail: a sample-chosen codec
            # that fails on the full payload degrades to the zstd backstop
            degraded = True
            choice = Choice(
                "plain",
                choice.stats,
                choice.trials,
                f"{choice.codec} failed on full data; zstd backstop",
            )
            blob_a = encode_column(arr, "plain", level, page_rows, page_zones, page_blooms)
        try:
            blob_b = encode_column(arr, rival, level, page_rows, page_zones, page_blooms)
        except Exception:
            blob_b = None
        pick_rival = blob_b is not None and len(blob_b) < len(blob_a)
        if blob_b is not None and decode_weight > 0:
            # decode-cost-aware runoff: the size-only comparison is blind
            # to fsst@9's decode wall; re-judge the finalists with the
            # same weighted score the trials use, on MEASURED full-blob
            # decode speed (decode is cheap next to the double encode the
            # runoff already paid)
            nb = max(arr.nbytes, 1)
            speeds = {}
            for key, blob in (("a", blob_a), ("b", blob_b)):
                # full blobs are already warm-scale: one pass
                speeds[key] = _timed_decode_mbps(blob, nb, warm=False)
            scores = _decode_weighted(
                {"a": len(blob_a) / nb, "b": len(blob_b) / nb}, speeds, decode_weight
            )
            pick_rival = scores["b"] < scores["a"]
            choice.dec_mbps[f"runoff:{choice.codec}"] = speeds["a"]
            choice.dec_mbps[f"runoff:{rival}"] = speeds["b"]
        # a backstop-degraded choice (blob_a failed -> plain) is not a
        # verdict on `pair`: its winner may not be a pair member and its
        # sample ratios may not cover it, which would make the 15%
        # similarity guard vacuously true on reuse — never store it
        sr = {k: choice.ratios[k] for k in pair if k in choice.ratios}
        if runoff_cache is not None and blob_b is not None and not degraded and sr:
            runoff_cache.clear()
            runoff_cache.update(
                {
                    "pair": pair,
                    "sr": sr,
                    "winner": rival if pick_rival else choice.codec,
                }
            )
        if pick_rival:
            trials = dict(choice.trials)
            trials[f"runoff:{rival}"] = len(blob_b)
            trials[f"runoff:{choice.codec}"] = len(blob_a)
            return blob_b, Choice(
                rival,
                choice.stats,
                trials,
                f"full-payload runoff beat {choice.codec} ({len(blob_b)} < {len(blob_a)})"
                + (f" at decode_weight={decode_weight}" if decode_weight else ""),
                choice.dec_mbps,
                choice.ratios,  # keep size/speed telemetry on the one
                choice.enc_mbps,  # branch that changed codecs
            )
        choice.trials[f"runoff:{choice.codec}"] = len(blob_a)
        return blob_a, choice
    try:
        blob = encode_column(arr, choice.codec, level, page_rows, page_zones, page_blooms)
    except Exception:
        choice = Choice(
            "plain", choice.stats, choice.trials, f"{choice.codec} failed on full data; zstd backstop"
        )
        blob = encode_column(arr, "plain", level, page_rows, page_zones, page_blooms)
    return blob, choice
