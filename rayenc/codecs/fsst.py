"""FSST-style symbol-table string compression (simplified, vectorized).

After "FSST: Fast Random Access String Compression" (VLDB 2020, see
PAPERS.md): replace frequent byte sequences with 1-token codes from a
small per-block symbol table, so decompression is a table lookup and the
table ships in the block header (per-block tables keep encode actors
stateless/restart-safe, SURVEY.md §2.3 T1).

This implementation builds the table by iterative greedy pair merging
(BPE-shaped) entirely in numpy — symbols are formed bottom-up from byte
pairs, so "apply the merge list in order" is both the trainer and the
encoder. String boundaries are protected by a sentinel code that never
participates in merges (the analog of the reference keeping record
boundaries intact across read_records calls,
/root/reference/src/vec_pq_reader.rs:157-241). A Python per-byte loop
would be fatal here (SURVEY.md §7.3); every pass below is whole-array
numpy. The selector only picks fsst when its measured size beats the
zstd backstop, so the extra encode cost is opt-in per column per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Codec, is_stringlike
from .util import (
    bit_width,
    decode_lengths,
    encode_lengths,
    pack_bits_z,
    strings_from_parts,
    string_array_parts,
    unpack_bits_z,
    zstd_compress,
    zstd_decompress,
)

_SENT = np.int32(-1)
_PAIR_BASE = np.int64(1 << 16)


class FsstCodec(Codec):
    name = "fsst"

    def __init__(self, max_merges: int = 240, min_count_frac: float = 1 / 1024):
        self.max_merges = max_merges
        self.min_count_frac = min_count_frac

    def supports(self, t: pa.DataType) -> bool:
        return is_stringlike(t)

    TRAIN_BYTES = 64 << 10
    COMPACT_EVERY = 16

    @staticmethod
    def _dedup_overlaps(idxs: np.ndarray, lc: int, rc: int) -> np.ndarray:
        """Keep alternate matches within overlapping runs like 'aaaa'."""
        if lc != rc or len(idxs) == 0:
            return idxs
        new_run = np.empty(len(idxs), dtype=bool)
        new_run[0] = True
        np.greater(np.diff(idxs), 1, out=new_run[1:])
        run_id = np.cumsum(new_run) - 1
        run_start = idxs[new_run][run_id]
        return idxs[((idxs - run_start) % 2) == 0]

    def _train(self, codes: np.ndarray, min_count: int) -> list[tuple[int, int]]:
        """Greedy pair-merge training (the costly np.unique loop) on a
        bounded sample; returns the merge sequence."""
        codes = codes.copy()
        merges: list[tuple[int, int]] = []
        while len(merges) < self.max_merges:
            left, right = codes[:-1], codes[1:]
            valid = (left != _SENT) & (right != _SENT)
            vpos = np.flatnonzero(valid)
            if len(vpos) == 0:
                break
            vkeys = left[vpos].astype(np.int64) * _PAIR_BASE + right[vpos]
            uniq, counts = np.unique(vkeys, return_counts=True)
            top = int(counts.argmax())
            if counts[top] < min_count:
                break
            best = int(uniq[top])
            lc, rc = best >> 16, best & 0xFFFF
            idxs = self._dedup_overlaps(vpos[vkeys == best], lc, rc)
            codes[idxs] = 256 + len(merges)
            merges.append((lc, rc))
            codes = np.delete(codes, idxs + 1)
        return merges

    def _apply(self, codes: np.ndarray, merges: list[tuple[int, int]]) -> np.ndarray:
        """Apply the trained merge TABLE to the full stream in a few
        whole-array passes (not one pass per merge): every adjacent pair
        that exists in the table is collapsed simultaneously via a
        searchsorted lookup, overlaps resolved by run parity, then the
        stream compacts once per pass. Order-independence is safe because
        decode expands codes recursively — any sequence of table-pair
        collapses is decodable; multi-level symbols form over successive
        passes (children first). ~log(symbol length) passes instead of
        len(merges) passes."""
        # int32 keys: codes < 2^16 so (lc<<16)+rc < 2^31 — half the memory
        # traffic of int64 on every pass (this machine is bandwidth-bound)
        tk = np.array(
            [(lc << 16) + rc for (lc, rc) in merges], dtype=np.int32
        )
        tv = np.arange(256, 256 + len(merges), dtype=np.int32)
        order = np.argsort(tk)
        tk, tv = tk[order], tv[order]
        tk_ext = np.append(tk, np.int32(2**31 - 1))  # guard: no clamp needed
        while len(codes) > 1:
            keys = codes[:-1] << np.int32(16)
            keys += codes[1:]
            pos = np.searchsorted(tk, keys)
            hit = tk_ext[pos] == keys  # sentinel-adjacent keys are negative: never hit
            hidx = np.flatnonzero(hit)
            if len(hidx) == 0:
                break
            # greedy non-overlap: within each run of consecutive hit
            # positions keep alternates (a kept merge at p consumes p+1,
            # invalidating a hit at p+1)
            new_run = np.empty(len(hidx), dtype=bool)
            new_run[0] = True
            np.greater(np.diff(hidx), 1, out=new_run[1:])
            run_id = np.cumsum(new_run) - 1
            run_start = hidx[new_run][run_id]
            kept = hidx[((hidx - run_start) % 2) == 0]
            codes[kept] = tv[pos[kept]]
            keep_mask = np.ones(len(codes), dtype=bool)
            keep_mask[kept + 1] = False
            codes = codes[keep_mask]
        return codes

    def encode(self, arr: pa.Array, level: int = 3) -> tuple[dict, dict[str, bytes]]:
        data, lengths = string_array_parts(arr)
        n = len(lengths)
        total = int(data.size)
        # interleave a sentinel after every string (incl. the last)
        codes = np.full(total + n, _SENT, dtype=np.int32)
        if total:
            idx = np.arange(total, dtype=np.int64) + np.repeat(
                np.arange(n, dtype=np.int64), lengths
            )
            codes[idx] = data
        # train on a bounded prefix (whole stream when small), apply to all
        train = codes[: min(len(codes), self.TRAIN_BYTES)]
        min_count = max(8, int(min(total, self.TRAIN_BYTES) * self.min_count_frac))
        merges = self._train(train, min_count)
        if merges:
            codes = self._apply(codes, merges)

        sent_pos = np.flatnonzero(codes == _SENT)
        token_counts = np.diff(np.concatenate([[-1], sent_pos])) - 1
        seq = codes[codes != _SENT].astype(np.uint64)
        w = bit_width(255 + len(merges))
        tmeta, tbuf = encode_lengths(token_counts.astype(np.int64), level)
        table = np.asarray(merges, dtype=np.uint16).tobytes() if merges else b""
        params = {
            "merges": len(merges),
            "w": w,
            "ntokens": int(len(seq)),
            "tmeta": tmeta,
        }
        sections = {
            "tokens": pack_bits_z(seq, w, level),
            "token_counts": tbuf,
            "table": zstd_compress(table, level),
        }
        return params, sections

    def _symbols(self, params: dict, sections: dict[str, bytes]) -> tuple[np.ndarray, np.ndarray]:
        """Rebuild the symbol byte table: (concat bytes, offsets[n_sym+1])."""
        m = params["merges"]
        raw = zstd_decompress(sections["table"], m * 4)
        pairs = np.frombuffer(raw, dtype=np.uint16).reshape(m, 2) if m else np.empty((0, 2), np.uint16)
        symbols: list[bytes] = [bytes([i]) for i in range(256)]
        for lc, rc in pairs:
            symbols.append(symbols[lc] + symbols[rc])
        sym_data = np.frombuffer(b"".join(symbols), dtype=np.uint8)
        sym_lens = np.fromiter((len(s) for s in symbols), dtype=np.int64, count=len(symbols))
        sym_off = np.zeros(len(symbols) + 1, dtype=np.int64)
        np.cumsum(sym_lens, out=sym_off[1:])
        return sym_data, sym_off

    def decode(
        self, params: dict, sections: dict[str, bytes], n: int, typ: pa.DataType
    ) -> pa.Array:
        ntok = params["ntokens"]
        seq = unpack_bits_z(sections["tokens"], params["w"], ntok).astype(np.int64)
        token_counts = decode_lengths(params["tmeta"], sections["token_counts"], n)
        sym_data, sym_off = self._symbols(params, sections)
        sym_lens = np.diff(sym_off)
        out_lens = sym_lens[seq]
        cs = np.zeros(ntok + 1, dtype=np.int64)
        np.cumsum(out_lens, out=cs[1:])
        total_out = int(cs[-1])
        base = np.repeat(cs[:-1], out_lens)
        within = np.arange(total_out, dtype=np.int64) - base
        src = np.repeat(sym_off[:-1][seq], out_lens) + within
        data = sym_data[src]
        tok_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(token_counts, out=tok_off[1:])
        str_lens = cs[tok_off[1:]] - cs[tok_off[:-1]]
        return strings_from_parts(data, str_lens, typ)
