"""Per-codec encode/decode micro-benchmark (no Ray): MB/s and ratio per
codec on representative columns from the F1 corpus. Feeds the BASELINE
notes; run: python tools/codec_bench.py"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def bench_codec(arr, codec: str, min_s: float = 0.3) -> dict:
    from rayenc.blocks import decode_column, encode_column

    src = arr.nbytes
    # encode
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < min_s:
        blob = encode_column(arr, codec)
        n += 1
    enc_s = (time.perf_counter() - t0) / n
    # decode
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < min_s:
        out = decode_column(blob)
        n += 1
    dec_s = (time.perf_counter() - t0) / n
    assert out.equals(arr if not hasattr(arr, "combine_chunks") else arr.combine_chunks())
    return {
        "codec": codec,
        "src_mb": round(src / 1e6, 2),
        "enc_mb": round(len(blob) / 1e6, 3),
        "ratio": round(len(blob) / src, 4),
        "enc_mbps": round(src / enc_s / 1e6, 1),
        "dec_mbps": round(src / dec_s / 1e6, 1),
    }


def main() -> None:
    from rayenc.corpus import gen_corpus

    t = gen_corpus(20000)
    cols = {
        "content(plain,fsst)": (t["content"].combine_chunks().slice(0, 4000), ["plain", "fsst"]),
        "path(plain,dict,rle,fsst,fc)": (t["path"].combine_chunks(), ["plain", "dict", "rle", "fsst", "fc"]),
        "commit(rle,dict,plain)": (t["commit"].combine_chunks(), ["rle", "dict", "plain"]),
        "lang(dict,rle,plain)": (t["lang"].combine_chunks(), ["dict", "rle", "plain"]),
    }
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(42)
    ints = pa.array(np.cumsum(rng.integers(0, 50, size=200_000)).astype(np.int64))
    cols["monotone_int(foref,bitpack,bss,plain)"] = (ints, ["foref", "bitpack", "bss", "plain"])
    floats = pa.array(rng.lognormal(3, 1, size=200_000))
    cols["float(bss,alp,plain)"] = (floats, ["bss", "alp", "plain"])
    prices = pa.array(np.round(rng.uniform(1, 100_000, size=200_000), 2))
    cols["decimal_float(alp,bss,plain)"] = (prices, ["alp", "bss", "plain"])

    results = []
    for label, (arr, codecs) in cols.items():
        for codec in codecs:
            r = bench_codec(arr, codec)
            r["column"] = label.split("(")[0]
            results.append(r)
            print(json.dumps(r))
    # summary table
    print("\n| column | codec | ratio | enc MB/s | dec MB/s |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['column']} | {r['codec']} | {r['ratio']} | {r['enc_mbps']} | {r['dec_mbps']} |"
        )


if __name__ == "__main__":
    main()
