"""Deduplication stages: exact, MinHash-LSH, SimHash, embedding-cosine.

Shuffle discipline (the north rule's partitioning/skew mandate):
- exact dedup = vectorized hash in map_batches, then ONE groupby on the
  hash (hash keys are uniform — no skew salting needed), keep min id;
- MinHash-LSH = shingle+signature per batch (numpy), explode to
  (band, band_hash) rows, ONE groupby over bucket keys, candidate pairs
  verified by signature-estimated Jaccard inside the group — texts never
  shuffle, only 8-byte keys + compact signatures do;
- SimHash = 64-bit signature per doc, banded into 4x16-bit chunks
  (pigeonhole: hamming<=3 pairs share >=1 chunk), groupby chunk buckets;
- embedding near-dup = EXACT chunked block-pair cross product (one
  object-store entry per chunk, tasks fetch pairwise — never a
  full-matrix broadcast) for oracle-checkable thresholds, plus the
  multi-table sign-LSH banded variant (no all-pairs) as the 100-TB
  path;
- transitive closure = distributed min-label propagation (one bucketed
  groupby per round) — the driver never holds the pair set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _hash_words_vec(words: list[str]) -> np.ndarray:
    """uint64 hash per word, fully vectorized: dictionary-encode the
    batch's token stream (Arrow C kernel), hash only the UNIQUE tokens
    through the batched xxhash kernel, then gather by index. Replaces
    the round-2 per-word blake2b dict-cache loop (VERDICT r2 #8) — no
    per-token Python, no unbounded per-actor cache."""
    if not words:
        return np.empty(0, dtype=np.uint64)
    from .hashing import hash_array_64

    d = pc.dictionary_encode(pa.array(words, type=pa.string()))
    uh = hash_array_64(d.dictionary, seed=11)
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uh[idx]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a vectorized 128-bit content key as two uint64 columns
    (_h1, _h2) — the exact-dedup grouping key. Batched xxhash via
    stages.hashing (~2.6x the round-1 per-row sha256 loop); 2x64 bits
    because 64 alone birthday-collides at 10^12 rows. Run-internal only:
    the durable fingerprint stays the sha256 chain (rayenc.rowhash)."""
    from .hashing import hash_array_128

    h1, h2 = hash_array_128(batch[text_col])
    batch = batch.append_column("_h1", pa.array(h1, type=pa.uint64()))
    return batch.append_column("_h2", pa.array(h2, type=pa.uint64()))


def dedup_exact(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Keep the min-id row per exact text value.

    One shuffle — but grouped by `hash % n_buckets`, NOT by the raw hash:
    Ray's map_groups makes one Python call per group, so per-hash groups
    (mostly singletons) would serialize; per-bucket groups are few and the
    within-bucket dedup is one vectorized first-per-key scan. Hash keys
    are uniform, so buckets are balanced by construction (no salt
    needed); scale n_buckets with the cluster. The group body stays in
    ARROW end to end (round-4 self-review: the old pandas
    drop_duplicates round-trip silently widened nullable int columns to
    float64 and lost >2^53 precision)."""

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        b = add_content_hash(b, text_col)
        h1 = b["_h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        buckets = (h1 % np.uint64(n_buckets)).astype(np.int32)
        return b.append_column("_b", pa.array(buckets, type=pa.int32()))

    hashed = ds.map_batches(hash_and_bucket, batch_format="pyarrow")

    def drop_dups(g: pa.Table) -> pa.Table:
        h1 = g["_h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h2 = g["_h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h2, h1))
        s1, s2 = h1[order], h2[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
        keep = np.sort(order[first])  # min-id row per key, original order
        return g.take(pa.array(keep)).drop_columns(["_h1", "_h2", "_b"])

    return hashed.groupby("_b").map_groups(drop_dups, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature over word shingles.

    Permutation parameters are generated once per actor from a fixed
    seed (deterministic across actors and runs)."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_perm: int = 64,
        shingle_words: int = 3,
        seed: int = 42,
    ):
        import re

        rng = np.random.default_rng(seed)
        # odd multipliers: x -> a*x+b (mod 2^64) is then a bijection, so
        # per-permutation mins are a valid MinHash family WITHOUT the
        # Mersenne modulo (measured 22x cheaper on the hot perm pass)
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = shingle_words
        self.text_col = text_col
        self.id_col = id_col
        self.token_re = re.compile(r"\S+")

    def _hash_words(self, words: list[str]) -> np.ndarray:
        return _hash_words_vec(words)

    def shingle_hashes(self, text: str | None) -> np.ndarray:
        """Stable 64-bit hashes of word k-shingles: batched word hashes
        combined with a vectorized polynomial roll (no per-shingle string
        joins or digests). uint64 wraparound is intentional (errstate
        silences the scalar-op overflow warnings, ADVICE r2)."""
        if not text:
            return np.empty(0, dtype=np.uint64)
        words = self.token_re.findall(text.lower())
        if not words:
            return np.empty(0, dtype=np.uint64)
        h = self._hash_words(words)
        k = min(self.k, len(h))
        base = np.uint64(1099511628211)
        n_sh = len(h) - k + 1
        acc = np.zeros(n_sh, dtype=np.uint64)
        with np.errstate(over="ignore"):
            mult = np.uint64(1)
            for j in range(k - 1, -1, -1):  # k passes, each whole-array
                acc += h[j : j + n_sh] * mult
                mult = mult * base
        return np.unique(acc)

    def signature(self, text: str | None) -> np.ndarray:
        h = self.shingle_hashes(text)
        if len(h) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*h + b) mod 2^64, min per permutation — vectorized
        vals = self.a[:, None] * h[None, :] + self.b[:, None]
        return vals.min(axis=1)

    def _batch_shingles(
        self, texts: list
    ) -> tuple[np.ndarray, np.ndarray]:
        """Shingle hashes for a WHOLE batch: one concatenated word-hash
        stream + windowed polynomial roll across it, doc boundaries
        respected by masking windows that span docs. Returns
        (all_shingles, per-doc shingle counts). Bit-identical to the
        per-doc shingle_hashes (minus its np.unique, which min() ignores)."""
        k = self.k
        words_per_doc = [
            self.token_re.findall(t.lower()) if t else [] for t in texts
        ]
        counts = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.uint64), np.zeros(len(texts), np.int64)
        all_words: list[str] = []
        for w in words_per_doc:
            all_words.extend(w)
        H = self._hash_words(all_words)
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        base = np.uint64(1099511628211)
        # full-k windows whose start and end live in the same doc
        n_win = total - k + 1
        sh_counts = np.maximum(counts - k + 1, 0)
        sh_counts[counts == 0] = 0
        out_chunks: list[np.ndarray] = []
        out_counts = sh_counts.copy()
        if n_win > 0:
            valid = doc_of[:n_win] == doc_of[k - 1 :]
            acc = np.zeros(n_win, dtype=np.uint64)
            with np.errstate(over="ignore"):  # intentional wraparound
                mult = np.uint64(1)
                for j in range(k - 1, -1, -1):
                    acc += H[j : j + n_win] * mult
                    mult = mult * base
            out_chunks.append(acc[valid])
        # short docs (0 < len < k): one shingle over all their words, with
        # the per-doc effective k' = len (matches shingle_hashes exactly;
        # the value itself is computed once, in the assembly loop below)
        short = np.flatnonzero((counts > 0) & (counts < k))
        out_counts[short] = 1
        # assemble in doc order: full-k shingles are already doc-ordered;
        # short-doc singles must interleave at their doc positions
        if len(short) == 0:
            sh = out_chunks[0] if out_chunks else np.empty(0, np.uint64)
            return sh, out_counts
        pieces: list[np.ndarray] = []
        fullk = out_chunks[0] if out_chunks else np.empty(0, np.uint64)
        fk_starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(sh_counts, out=fk_starts[1:])
        short_set = set(short.tolist())
        for d in range(len(texts)):
            if d in short_set:
                hh = H[starts[d] : starts[d + 1]]
                with np.errstate(over="ignore"):  # intentional wraparound
                    acc = np.uint64(0)
                    mult = np.uint64(1)
                    for j in range(len(hh) - 1, -1, -1):
                        acc += hh[j] * mult
                        mult = mult * base
                pieces.append(np.array([acc], dtype=np.uint64))
            elif sh_counts[d]:
                pieces.append(fullk[fk_starts[d] : fk_starts[d + 1]])
        sh = np.concatenate(pieces) if pieces else np.empty(0, np.uint64)
        return sh, out_counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        sh, sh_counts = self._batch_shingles(texts)
        if len(sh):
            # per-doc shingle dedup before the permutation pass (the
            # per-doc path's np.unique): repeated shingles can't change a
            # min, and template-heavy docs collapse by orders of magnitude
            doc_of_sh = np.repeat(np.arange(n, dtype=np.int64), sh_counts)
            order = np.lexsort((sh, doc_of_sh))
            ss, dd = sh[order], doc_of_sh[order]
            keep = np.empty(len(ss), dtype=bool)
            keep[0] = True
            keep[1:] = (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])
            sh = ss[keep]
            sh_counts = np.bincount(dd[keep], minlength=n).astype(np.int64)
        mat = np.full((n, self.n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        nz = np.flatnonzero(sh_counts)
        if len(nz):
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(sh_counts, out=starts[1:])
            seg_starts = starts[nz]
            # permutations in chunks of 8: bounds the (8 x total_shingles)
            # temporary while keeping whole-array ops
            for p0 in range(0, self.n_perm, 8):
                a = self.a[p0 : p0 + 8][:, None]
                b = self.b[p0 : p0 + 8][:, None]
                vals = a * sh[None, :] + b  # mod 2^64 (odd-multiplier bijection)
                mins = np.minimum.reduceat(vals, seg_starts, axis=1)
                # reduceat segment i spans seg_starts[i]..seg_starts[i+1]-1
                # only when starts are strictly increasing — true for nz docs
                mat[nz, p0 : p0 + 8] = mins.T
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), type=pa.uint64()), self.n_perm
                ),
            }
        )


def _band_hash(mat: np.ndarray, b: int, rows_per_band: int) -> np.ndarray:
    """Vectorized band-segment hash: a splitmix chain over the band's
    signature columns (equal segments -> equal hash; false collisions
    are filtered by the downstream full-signature verify; the round-1
    per-row blake2b loop was the band-stage hot spot). This is the ONE
    definition shared by the emission side (_band_rows) and the
    exactly-once earlier-band check (pairs_in_hash_bucket) — if the two
    chains drifted, pairs whose first collision is mis-attributed would
    be suppressed in every later band and emitted NOWHERE."""
    from .hashing import splitmix64

    seg = mat[:, b * rows_per_band : (b + 1) * rows_per_band]
    bh = np.full(len(mat), np.uint64(b) + np.uint64(0x9E37), dtype=np.uint64)
    for c in range(seg.shape[1]):
        bh = splitmix64(bh ^ seg[:, c])
    return bh


def _band_rows(
    batch: pa.Table, n_bands: int, id_col: str = "doc_id"
) -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id, minhash) rows."""
    ids = batch[id_col]
    mh = batch["minhash"]
    n = len(ids)
    if n == 0:
        return pa.table(
            {
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.uint64()),
                id_col: pa.array([], type=ids.type),
                "minhash": mh,
            }
        )
    arr = mh.combine_chunks() if isinstance(mh, pa.ChunkedArray) else mh
    n_perm = arr.type.list_size
    mat = np.asarray(arr.values.to_numpy(zero_copy_only=False)).reshape(n, n_perm)
    rows_per_band = n_perm // n_bands
    out_band, out_hash, out_idx = [], [], []
    for b in range(n_bands):
        out_band.append(np.full(n, b, dtype=np.int32))
        out_hash.append(_band_hash(mat, b, rows_per_band))
        out_idx.append(np.arange(n))
    idx = np.concatenate(out_idx)
    return pa.table(
        {
            "band_id": pa.array(np.concatenate(out_band), type=pa.int32()),
            "band_hash": pa.array(np.concatenate(out_hash), type=pa.uint64()),
            id_col: pc.take(ids, pa.array(idx, type=pa.int64())),
            "minhash": pc.take(arr, pa.array(idx, type=pa.int64())),
        }
    )


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    n_bands: int = 16,
    threshold: float = 0.7,
    concurrency=(1, 4),
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """(doc_a, doc_b, est_jaccard) pairs whose signature-estimated
    Jaccard >= threshold. texts never shuffle; signatures do. Scale
    ``n_buckets`` (default: cluster CPUs) with the corpus: each
    bucket's band rows are processed by one task."""
    import pandas as pd

    if n_perm % n_bands != 0 or n_perm // n_bands < 1:
        raise ValueError(
            f"n_perm ({n_perm}) must be a positive multiple of n_bands ({n_bands})"
        )

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "n_perm": n_perm,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    bands = sigs.map_batches(
        lambda b: _band_rows(b, n_bands, id_col), batch_format="pyarrow"
    )

    if n_buckets is None:
        n_buckets = max(2, min(64, int(ray.cluster_resources().get("CPU", 8)) - 2))

    def add_bucket(b: pa.Table) -> pa.Table:
        from .hashing import bucket_column

        return b.append_column("_b", bucket_column(b["band_hash"], n_buckets))

    bands = bands.map_batches(add_bucket, batch_format="pyarrow")

    rows_per_band = n_perm // n_bands

    def _band_hashes(mats: np.ndarray, upto: int) -> np.ndarray:
        """(n, upto) band-hash matrix — _band_hash recomputed from the
        signatures so a group can tell whether a pair ALREADY collided
        in an earlier band (the SAME helper the emission side uses)."""
        out = np.empty((len(mats), upto), dtype=np.uint64)
        for bb in range(upto):
            out[:, bb] = _band_hash(mats, bb, rows_per_band)
        return out

    def pairs_in_hash_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One call per hash-bucket (not per LSH band key): keep only rows
        whose (band_id, band_hash) actually collides, then loop over those
        few collision groups with vectorized signature comparison.

        EXACTLY-ONCE emission without a dedup shuffle: a pair is emitted
        only from the FIRST band in which it collides (earlier-band
        collision checked by recomputing those bands' hashes from the
        signatures at hand) — the downstream distinct round this replaces
        was a whole extra groupby shuffle per pipeline run."""
        dup = g.duplicated(["band_id", "band_hash"], keep=False)
        g = g[dup]
        out_a: list = []
        out_b: list = []
        out_j: list = []
        if len(g):
            for (band, _), sub in g.groupby(["band_id", "band_hash"], sort=False):
                sub = sub.sort_values(id_col)
                ids = sub[id_col].to_numpy()
                mats = np.vstack(sub["minhash"].to_numpy())
                bh_earlier = _band_hashes(mats, int(band)) if band else None
                for i in range(len(ids) - 1):
                    eq = (mats[i + 1 :] == mats[i]).mean(axis=1)
                    hit = np.flatnonzero(eq >= threshold)
                    if bh_earlier is not None and len(hit):
                        seen = (
                            bh_earlier[i + 1 :][hit] == bh_earlier[i]
                        ).any(axis=1)
                        hit = hit[~seen]
                    for j in hit:
                        out_a.append(ids[i])
                        out_b.append(ids[i + 1 + j])
                        out_j.append(float(eq[j]))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "est_jaccard": pd.Series(out_j, dtype="float64"),
            }
        )

    return bands.groupby("_b").map_groups(pairs_in_hash_bucket, batch_format="pandas")


def connected_components_labels(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_buckets: int = 64,
    max_rounds: int = 50,
) -> "ray.data.Dataset":
    """Distributed connected components by iterative MIN-LABEL
    propagation: every node starts labeled with its own id; each round
    is ONE bucketed groupby shuffle in which labels flow across edges
    and each node keeps the min seen; convergence when the global label
    sum stops decreasing (monotone). Rounds ~ component diameter —
    near-dup clusters are shallow, so a handful. The driver only ever
    sees per-round scalar sums, never the edge set (ROADMAP 6)."""

    def both_dirs(b: pa.Table) -> pa.Table:
        src = pa.concat_arrays(
            [b[a_col].combine_chunks() if isinstance(b[a_col], pa.ChunkedArray) else b[a_col],
             b[b_col].combine_chunks() if isinstance(b[b_col], pa.ChunkedArray) else b[b_col]]
        )
        dst = pa.concat_arrays(
            [b[b_col].combine_chunks() if isinstance(b[b_col], pa.ChunkedArray) else b[b_col],
             b[a_col].combine_chunks() if isinstance(b[a_col], pa.ChunkedArray) else b[a_col]]
        )
        return pa.table({"src": src, "dst": dst})

    und = pairs.select_columns([a_col, b_col]).map_batches(
        both_dirs, batch_format="pyarrow"
    ).materialize()

    import pandas as pd

    # one combined table, groupby-bucketed by node each round (no joins):
    #   state rows:   kind=0, (node, label)   [dst unused]
    #   edge rows:    kind=1, (node=src, dst) [label unused]
    #   message rows: kind=2, (node, label)   [dst unused]
    # an explicit kind column, NOT a -1 sentinel — doc ids are arbitrary
    # int64 values (round-2 review: a real id of -1 must not corrupt the
    # propagation). bucket co-locates a node's state with the edges
    # leaving it, so each round is ONE bucketed shuffle. Messages are
    # FRONTIER-ONLY (ROADMAP r3): a node resends its label along its
    # edges only in the round its label IMPROVED — late rounds touch the
    # few still-converging components, not every edge (init seeds the
    # first wave with one message per directed edge).
    def init_rows(b: pa.Table) -> pa.Table:
        u = pc.unique(b["src"])
        src = b["src"].combine_chunks() if isinstance(b["src"], pa.ChunkedArray) else b["src"]
        dst = b["dst"].combine_chunks() if isinstance(b["dst"], pa.ChunkedArray) else b["dst"]
        zeros_u = pa.array(np.zeros(len(u), np.int64))
        zeros_e = pa.array(np.zeros(len(src), np.int64))
        node = pa.concat_arrays([u, src, dst])
        dcol = pa.concat_arrays([zeros_u, dst, zeros_e])
        lcol = pa.concat_arrays([u, zeros_e, src])
        kind = pa.concat_arrays(
            [
                pa.array(np.zeros(len(u), np.int8)),
                pa.array(np.ones(len(src), np.int8)),
                pa.array(np.full(len(src), 2, np.int8)),
            ]
        )
        return pa.table({"node": node, "dst": dcol, "label": lcol, "kind": kind})

    def add_bucket(b: pa.Table) -> pa.Table:
        from .hashing import bucket_column

        return b.append_column("_b", bucket_column(b["node"], n_buckets))

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["kind"] == 0]
        ed = g[g["kind"] == 1]
        msg = g[g["kind"] == 2]
        prev = st.groupby("node", sort=False)["label"].min()
        cur = prev
        if len(msg):
            m = msg.groupby("node", sort=False)["label"].min()
            aligned = m.reindex(prev.index, fill_value=np.iinfo(np.int64).max)
            cur = np.minimum(prev, aligned)
        out_state = pd.DataFrame(
            {
                "node": cur.index.to_numpy(),
                "dst": np.int64(0),
                "label": cur.to_numpy(),
                "kind": np.int8(0),
            }
        )
        changed = cur[cur < prev]
        ed_send = ed[ed["node"].isin(changed.index)]
        msgs = pd.DataFrame(
            {
                "node": ed_send["dst"].to_numpy(),
                "dst": np.int64(0),
                "label": changed.reindex(ed_send["node"]).to_numpy(),
                "kind": np.int8(2),
            }
        )
        edges_out = ed.drop(columns=["_b"])
        return pd.concat(
            [out_state, msgs, edges_out], ignore_index=True
        ).astype({"node": "int64", "dst": "int64", "label": "int64", "kind": "int8"})

    rows = und.map_batches(init_rows, batch_format="pyarrow")
    prev_sum = None
    rounds_done = 0
    # +1 when rounds run at all: convergence is only OBSERVABLE via one
    # extra unchanged-sum round, so a component whose propagation
    # completes exactly on round max_rounds needs the confirming pass
    # too — without it the labels would be final and correct but the
    # loop would spuriously raise (max_rounds=0 keeps its degenerate
    # no-propagation path below)
    for _ in range(max_rounds + 1 if max_rounds else 0):
        rows = (
            rows.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(propagate, batch_format="pandas")
            .materialize()
        )
        rounds_done += 1
        state = rows.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 0)).select(["label"]),
            batch_format="pyarrow",
        )
        s = state.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    else:
        converged = rounds_done == 0
    if not converged:
        # silent truncation would leave extra survivors (nodes still
        # holding their own id get treated as component reps downstream)
        raise RuntimeError(
            f"connected_components_labels did not converge in {max_rounds} "
            "rounds (component diameter exceeds the budget); raise max_rounds"
        )
    state_rows = rows.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0)).select(["node", "label"]),
        batch_format="pyarrow",
    )
    if rounds_done:
        # propagate emits exactly one state row per node, and all of a
        # node's rows hash to one bucket — states are already globally
        # unique, so no final dedup shuffle (messages live under their
        # own kind now; the old kind-0 message duplicates are gone)
        return state_rows
    # degenerate max_rounds=0: init states may duplicate across input
    # batches — keep the bucketed min-dedup for that path only
    def final_min(g: pd.DataFrame) -> pd.DataFrame:
        cur = g.groupby("node", sort=False)["label"].min()
        return pd.DataFrame(
            {"node": cur.index.to_numpy(), "label": cur.to_numpy()}
        ).astype({"node": "int64", "label": "int64"})

    return (
        state_rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final_min, batch_format="pandas")
    )


def anti_join_ids(
    ds: "ray.data.Dataset",
    drop_ids: "ray.data.Dataset",
    id_col: str = "doc_id",
    drop_col: str = "node",
    num_partitions: int | None = None,
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Shuffle-native anti-join: keep `ds` rows whose ``id_col`` does NOT
    appear in ``drop_ids[drop_col]``. Implemented with the repo's own
    bucketed-groupby pattern — both sides tagged with ``hash(id) % N``,
    unioned under one PINNED schema (drop rows null-padded to the data
    schema), one sort-based groupby shuffle, ``pc.is_in`` inside each
    bucket — and NOTHING passes through the driver (the round-2 verdict's
    fix for the take_all + broadcast loser set, unbounded at web-scale
    dup rates). Ray 2.49's hash-shuffle ``Dataset.join`` was dropped here
    (round-3 verdict #1): its Acero finalize dies intermittently when a
    schema-less empty block lands in a partition, and schema-degraded
    empty blocks are a normal output of the upstream CC label filter.
    Every output table here carries an explicit schema, and the sort
    shuffle tolerates empty blocks regardless. ``ds`` may not itself use
    the two reserved internal names.

    Pass ``schema`` when you know it: ``Dataset.schema()`` on a dataset
    downstream of transforms EXECUTES the plan just to learn the schema,
    so an unknowing caller pays the input scan twice (the asof_join
    lesson, stages/asof.py).

    The bucketed core now lives in ``stages.joinprune.membership_join``
    (one implementation behind the semi AND anti variants); this wrapper
    keeps the historical signature and the ``__aj_*`` reserved-name
    contract."""
    if schema is None:
        schema = ds.schema()
    names = list(schema.names)
    clash = {"__aj_kind", "__aj_b"} & set(names)
    if clash:
        raise ValueError(f"anti_join_ids reserved column names in input: {clash}")
    from .joinprune import membership_join

    return membership_join(
        ds,
        drop_ids,
        id_col=id_col,
        key_col=drop_col,
        mode="anti",
        num_partitions=num_partitions,
        schema=schema,
    )


def dedup_minhash(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    schema: "pa.Schema | None" = None,
    **kw,
) -> "ray.data.Dataset":
    """Near-dup removal with TRANSITIVE closure: candidate pairs form a
    graph; each connected component keeps its min-id representative
    (A~B, B~C drops both B and C even if A~C never surfaced). Closure
    runs as distributed min-label propagation (connected_components_labels
    — the driver never holds the pair set); the LOSER ids stay a Dataset
    (materialized object-store blocks) and are removed by a bucketed hash
    anti-join — no driver take_all, no broadcast of id sets (VERDICT r2
    #1: the loser set is unbounded at realistic web dup fractions)."""
    pairs = minhash_candidate_pairs(ds, text_col, id_col, **kw)
    labels = connected_components_labels(pairs)
    losers = labels.map_batches(
        lambda b: b.filter(pc.not_equal(b["node"], b["label"])).select(["node"]),
        batch_format="pyarrow",
    ).materialize()
    if losers.count() == 0:
        return ds
    # pass `schema` for inputs downstream of transforms: without it the
    # anti-join's ds.schema() probe executes the upstream plan once more
    return anti_join_ids(ds, losers, id_col=id_col, drop_col="node", schema=schema)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per doc over word-BIGRAM features — unigram
    features are too coarse for template-heavy corpora (every doc drawn
    from one vocabulary hashes within a few bits of every other). The
    whole batch is vectorized: one concatenated word-hash stream,
    bigram features by splitmix-combining adjacent hashes (doc
    boundaries masked), per-doc unique features via one lexsort, bit
    votes via np.add.reduceat — no per-doc Python."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import re

        self.text_col = text_col
        self.id_col = id_col
        self.token_re = re.compile(r"\S+")

    def _hash_words(self, words: list[str]) -> np.ndarray:
        return _hash_words_vec(words)

    def batch_simhash(self, texts: list) -> np.ndarray:
        from .hashing import splitmix64

        n = len(texts)
        sigs = np.zeros(n, dtype=np.uint64)
        words_per_doc = [self.token_re.findall(t.lower()) if t else [] for t in texts]
        counts = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return sigs
        all_words: list[str] = []
        for w in words_per_doc:
            all_words.extend(w)
        H = self._hash_words(all_words)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        # bigram features within docs; single-word docs fall back to the
        # unigram hash (the round-1 per-doc behavior)
        if total > 1:
            valid = doc_of[:-1] == doc_of[1:]
            feats = splitmix64(H[:-1] ^ (H[1:] * np.uint64(0x100000001B3)))[valid]
            fdoc = doc_of[:-1][valid]
        else:
            feats = np.empty(0, np.uint64)
            fdoc = np.empty(0, np.int64)
        singles = np.flatnonzero(counts == 1)
        if len(singles):
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            feats = np.concatenate([feats, H[starts[singles]]])
            fdoc = np.concatenate([fdoc, singles])
        if len(feats) == 0:
            return sigs
        # per-doc unique features (one lexsort over the batch)
        order = np.lexsort((feats, fdoc))
        ff, dd = feats[order], fdoc[order]
        keep = np.empty(len(ff), dtype=bool)
        keep[0] = True
        keep[1:] = (ff[1:] != ff[:-1]) | (dd[1:] != dd[:-1])
        ff, dd = ff[keep], dd[keep]
        # bit votes per doc: unpackbits on the little-endian byte view is
        # one C kernel for the (n_feat, 64) expansion (the shift-and-mask
        # broadcast + astype was the simhash wall at bench scale), and
        # reduceat(dtype=int64) sums without materializing an int copy
        bits = np.unpackbits(
            ff.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        seg_starts = np.zeros(n, dtype=np.int64)
        fcounts = np.bincount(dd, minlength=n).astype(np.int64)
        np.cumsum(fcounts[:-1], out=seg_starts[1:])
        nz = np.flatnonzero(fcounts)
        if len(nz):
            # reduceat(dtype=int64) over the uint8 bit matrix: fastest
            # warm-cache segment sum measured (0.15s vs 0.33 for
            # astype+reduceat and 0.9 for cumsum at 486k features; this
            # VM's cold-page variance can invert one-shot timings)
            sums = np.add.reduceat(bits, seg_starts[nz], axis=0, dtype=np.int64)
            votes = sums * 2 - fcounts[nz][:, None]
            packed = (
                (votes > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
            sigs[nz] = packed
        return sigs

    def simhash(self, text: str | None) -> np.uint64:
        return np.uint64(self.batch_simhash([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.batch_simhash(batch[self.text_col].to_pylist())
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(sigs, type=pa.uint64()),
            }
        )


def simhash_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency=(1, 4),
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """(doc_a, doc_b, hamming) pairs with distance <= max_hamming.

    Pigeonhole banding: split 64 bits into max_hamming+1 chunks; any
    pair within the distance agrees on >=1 chunk -> groupby chunk value,
    verify inside. Chunk widths derive from max_hamming (round-4
    self-review: the old fixed 4x16 layout silently missed pairs for
    max_hamming >= 4). max_hamming is capped at 15 — beyond that the
    chunks get so narrow that banding admits most of the corpus as
    candidates. Scale ``n_buckets`` (default: cluster CPUs) with the
    corpus: each bucket's band rows land in one task."""
    import pandas as pd

    if not (0 <= max_hamming <= 15):
        raise ValueError(
            f"max_hamming must be in [0, 15], got {max_hamming} "
            "(4-bit chunks already admit ~1/16 of the corpus per group)"
        )
    n_chunks = max_hamming + 1
    base_w, rem = divmod(64, n_chunks)
    widths = [base_w + (1 if c < rem else 0) for c in range(n_chunks)]
    offs = [int(o) for o in np.cumsum([0] + widths[:-1])]
    masks = [np.uint64((1 << w) - 1) for w in widths]

    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def explode(batch: pa.Table) -> pa.Table:
        s = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col]
        n = len(s)
        chunks, keys, idx = [], [], []
        for c in range(n_chunks):
            chunks.append(np.full(n, c, dtype=np.int32))
            keys.append((s >> np.uint64(offs[c])) & masks[c])
            idx.append(np.arange(n))
        take = pa.array(np.concatenate(idx), type=pa.int64())
        return pa.table(
            {
                "chunk_id": pa.array(np.concatenate(chunks), type=pa.int32()),
                "chunk_key": pa.array(np.concatenate(keys), type=pa.uint64()),
                id_col: pc.take(ids, take),
                "simhash": pc.take(batch["simhash"], take),
            }
        )

    bands = sigs.map_batches(explode, batch_format="pyarrow")

    if n_buckets is None:
        n_buckets = max(2, min(64, int(ray.cluster_resources().get("CPU", 8)) - 2))

    def add_bucket(b: pa.Table) -> pa.Table:
        from .hashing import bucket_column

        return b.append_column("_b", bucket_column(b["chunk_key"], n_buckets))

    bands = bands.map_batches(add_bucket, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        """One call per key-bucket; inner loop only over real collisions.

        Pair-explosion control (round-1 hazard: templated corpora pushed
        near-quadratic pair sets through the banding): docs with an
        IDENTICAL simhash form a cluster emitted as STAR pairs
        (min-id -> member, hamming 0) instead of all-pairs, and the
        cross-signature comparison runs over the UNIQUE signatures'
        min-id representatives only. The emitted set is a spanning
        subset whose connected components equal the full pair graph's —
        exactly what dedup consumes.

        EXACTLY-ONCE emission without a dedup shuffle: identical-sig
        clusters agree on every chunk, so star pairs emit only from
        chunk 0; cross pairs emit only from the FIRST chunk the two
        signatures share (earlier chunk values recomputed from the
        sigs) — removing the whole downstream distinct groupby."""
        dup = g.duplicated(["chunk_id", "chunk_key"], keep=False)
        g = g[dup]
        out_a: list = []
        out_b: list = []
        out_h: list = []
        if len(g):
            for (chunk, _), sub in g.groupby(["chunk_id", "chunk_key"], sort=False):
                sub = sub.sort_values(id_col)
                ids = sub[id_col].to_numpy()
                s = sub["simhash"].to_numpy().astype(np.uint64)
                # identical-signature clusters -> star pairs (chunk 0 only:
                # identical sigs collide in every chunk)
                uniq, first_idx, inv = np.unique(
                    s, return_index=True, return_inverse=True
                )
                reps = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(reps, inv, ids)
                if chunk == 0:
                    star_mask = reps[inv] != ids
                    out_a.append(reps[inv][star_mask])
                    out_b.append(ids[star_mask])
                    out_h.append(np.zeros(int(star_mask.sum()), dtype=np.int64))
                # earlier chunk values of each unique sig, for first-emit
                earlier = (
                    np.stack(
                        [
                            (uniq >> np.uint64(offs[c])) & masks[c]
                            for c in range(int(chunk))
                        ],
                        axis=1,
                    )
                    if chunk
                    else None
                )
                # cross-cluster: all-pairs over unique signatures only
                for i in range(len(uniq) - 1):
                    x = uniq[i + 1 :] ^ uniq[i]
                    d = np.unpackbits(
                        x.view(np.uint8).reshape(len(x), 8), axis=1
                    ).sum(axis=1)
                    hit = np.flatnonzero(d <= max_hamming)
                    if earlier is not None and len(hit):
                        seen = (earlier[i + 1 :][hit] == earlier[i]).any(axis=1)
                        hit = hit[~seen]
                    if len(hit):
                        ra = reps[i]
                        rb = reps[i + 1 + hit]
                        lo = np.minimum(ra, rb)
                        hi = np.maximum(ra, rb)
                        out_a.append(lo)
                        out_b.append(hi)
                        out_h.append(d[hit].astype(np.int64))
        cat = (
            lambda xs: np.concatenate(xs)
            if xs
            else np.empty(0, dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "doc_a": pd.Series(cat(out_a), dtype="int64"),
                "doc_b": pd.Series(cat(out_b), dtype="int64"),
                "hamming": pd.Series(cat(out_h), dtype="int64"),
            }
        )

    return bands.groupby("_b").map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact) for candidate pairs
# ---------------------------------------------------------------------------


def exact_jaccard_pairs(
    ds: "ray.data.Dataset",
    pairs: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
) -> list[dict]:
    """Exact word-shingle Jaccard for an explicit (small) candidate pair
    list: involved texts are filtered out of the Dataset (distributed),
    collected (small by construction), verified with numpy set ops."""
    involved = {a for a, _ in pairs} | {b for _, b in pairs}
    inv_ref = ray.put(pa.array(sorted(involved), type=pa.int64()))

    def pick(batch: pa.Table) -> pa.Table:
        keep = ray.get(inv_ref)
        mask = pc.is_in(batch[id_col], value_set=keep)
        return batch.select([id_col, text_col]).filter(mask)

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    hasher = MinHasher(text_col=text_col, id_col=id_col, shingle_words=shingle_words)
    shingles = {r[id_col]: hasher.shingle_hashes(r[text_col]) for r in rows}
    out = []
    for a, b in pairs:
        sa, sb = shingles.get(a), shingles.get(b)
        if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
            j = 1.0 if sa is not None and sb is not None else 0.0
        else:
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 1.0
        out.append({"doc_a": a, "doc_b": b, "jaccard": j})
    return out


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _pairs_from_scores(
    ids_a: np.ndarray,
    ids_b: np.ndarray,
    scores: np.ndarray,
    threshold: float,
    mat_a: np.ndarray | None = None,
    mat_b: np.ndarray | None = None,
):
    """Vectorized (i, j) extraction with cos >= threshold and id_a < id_b
    (self-pairs excluded by the id inequality).

    With `mat_a`/`mat_b` given, `scores` is treated as a float32 GEMM
    whose error grows with dim (BLAS accumulation order also varies with
    matrix shape): candidates are gated at threshold - dim-scaled slack,
    then RE-SCORED in fixed-order float64 for the actual threshold
    decision and the emitted cos — the same determinism discipline as
    ann._emit_topk and the LSH verify stage. Without matrices the raw
    scores are trusted (callers that already computed float64)."""
    if mat_a is not None and mat_b is not None:
        slack = max(1e-4, mat_a.shape[1] * 2e-7)
        ii, jj = np.nonzero(scores >= threshold - slack)
    else:
        ii, jj = np.nonzero(scores >= threshold)
    if len(ii) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.float64),
        )
    a = ids_a[ii]
    b = ids_b[jj]
    keep = a < b
    ii, jj, a, b = ii[keep], jj[keep], a[keep], b[keep]
    if mat_a is not None and mat_b is not None:
        cos = (
            mat_a[ii].astype(np.float64) * mat_b[jj].astype(np.float64)
        ).sum(axis=1)
        final = cos >= threshold
        return (
            a[final].astype(np.int64),
            b[final].astype(np.int64),
            cos[final],
        )
    return (
        a.astype(np.int64),
        b.astype(np.int64),
        scores[ii, jj].astype(np.float64),
    )


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_rows: int = 4096,
) -> "ray.data.Dataset":
    """EXACT (id_a, id_b, cos) pairs with cosine >= threshold, as a
    distributed block-pair cross product — never a full-matrix broadcast.

    The corpus is normalized into object-store chunk blocks by a
    distributed map_batches pass; a control-plane Dataset of chunk-pair
    descriptors (K*(K+1)/2 rows of two ints) then fans the K x K upper
    triangle out over the cluster, each task fetching exactly two chunks
    (zero-copy from the store, node-cached across tasks) and doing tiled
    numpy matmuls. All-pairs compute is inherently O(n^2): this is the
    oracle-checkable exact path for any threshold; for web-scale corpora
    at high thresholds use embedding_near_dup_pairs_lsh.

    The normalized chunks are produced INSIDE map_batches tasks and
    materialized as object-store blocks; the driver holds only the K
    block refs (round-2 verdict #2 — the previous version streamed the
    whole corpus through the driver via iter_batches + per-chunk
    ray.put, a single-stream ingest wall on a multi-node cluster). The
    matmul inside each task is tiled so the score matrix stays bounded
    regardless of block size."""
    from .ann import _batch_matrix, _normalize

    def norm_chunk(batch: pa.Table) -> pa.Table:
        bids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_batch_matrix(batch, vec_col)).astype(np.float32)
        dim = mat.shape[1]
        return pa.table(
            {
                id_col: pa.array(bids, type=pa.int64()),
                "_nvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), type=pa.float32()), dim
                ),
            }
        )

    norm = ds.select_columns([id_col, vec_col]).map_batches(
        norm_chunk, batch_format="pyarrow", batch_size=chunk_rows
    )
    refs = norm.materialize().to_arrow_refs()  # K refs; data stays in the store
    k = len(refs)
    desc = ray.data.from_items(
        [{"i": i, "j": j} for i in range(k) for j in range(i, k)]
    )
    refs_ref = ray.put(refs)  # list of small ObjectRefs, not the data

    def _table_mat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = t["_nvec"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = col.type.list_size
        mat = np.asarray(
            col.values.to_numpy(zero_copy_only=False), dtype=np.float32
        ).reshape(len(ids), dim)
        return ids, mat

    tile = 8192  # score-matrix tile: 8192^2 f32 = 256 MiB worst case

    def cross(batch: pa.Table) -> pa.Table:
        refs = ray.get(refs_ref)
        acc_a: list = []
        acc_b: list = []
        acc_c: list = []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_a, mat_a = _table_mat(ray.get(refs[i]))
            ids_b, mat_b = _table_mat(ray.get(refs[j]))
            for r0 in range(0, len(ids_a), tile):
                # diagonal chunk-pairs (i == j) take only the tile upper
                # triangle: the mirrored (c0, r0) tile would recompute the
                # same GEMM transposed — a 2x waste of the dominant cost
                # when the corpus fits one chunk
                c_start = r0 if i == j else 0
                for c0 in range(c_start, len(ids_b), tile):
                    sa = slice(r0, r0 + tile)
                    sb = slice(c0, c0 + tile)
                    scores = mat_a[sa] @ mat_b[sb].T
                    a, b, c = _pairs_from_scores(
                        ids_a[sa], ids_b[sb], scores, threshold,
                        mat_a[sa], mat_b[sb],
                    )
                    if i != j or c0 > r0:
                        # the (j, i) direction: the b side may hold the
                        # smaller id (a same-chunk DIAGONAL tile needs no
                        # transpose: a < b covers its full square)
                        a2, b2, c2 = _pairs_from_scores(
                            ids_b[sb], ids_a[sa], scores.T, threshold,
                            mat_b[sb], mat_a[sa],
                        )
                        a = np.concatenate([a, a2])
                        b = np.concatenate([b, b2])
                        c = np.concatenate([c, c2])
                    acc_a.append(a)
                    acc_b.append(b)
                    acc_c.append(c)
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(acc_a) if acc_a else [], type=pa.int64()),
                "id_b": pa.array(np.concatenate(acc_b) if acc_b else [], type=pa.int64()),
                "cos": pa.array(np.concatenate(acc_c) if acc_c else [], type=pa.float64()),
            }
        )

    return desc.map_batches(cross, batch_format="pyarrow", batch_size=4)


def embedding_near_dup_pairs_lsh(
    ds: "ray.data.Dataset",
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tables: int = 12,
    planes_per_table: int = 8,
    seed: int = 42,
    n_buckets: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """APPROXIMATE near-dup pairs via multi-table sign-LSH banding — the
    100-TB path: no all-pairs, no broadcast; vectors shuffle once as
    (table, bucket) rows and cosine runs only inside hash-bucket
    collisions (the MinHash banding shape applied to hyperplane signs,
    ann.lsh_plan machinery).

    Recall: a pair at angle theta collides in one table with
    p = (1 - theta/pi) ** planes_per_table and overall with
    1 - (1-p)**n_tables — defaults give >0.999 for cos >= 0.95; raise
    n_tables (or lower planes_per_table) for lower thresholds. Verified
    cosines are exact for every emitted pair (no false positives)."""
    from .ann import lsh_plan

    def explode(batch: pa.Table) -> pa.Table:
        from .ann import _batch_matrix, _normalize

        bids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(bids)
        mat = _normalize(_batch_matrix(batch, vec_col))
        dim = mat.shape[1]
        planes = lsh_plan(dim, n_tables * planes_per_table, seed)
        signs = (mat @ planes.T) > 0  # (n, n_tables*planes_per_table)
        weights = 1 << np.arange(planes_per_table, dtype=np.int64)
        keys_mat = np.stack(
            [
                signs[:, t * planes_per_table : (t + 1) * planes_per_table]
                .astype(np.int64) @ weights
                for t in range(n_tables)
            ],
            axis=1,
        )  # (n, n_tables) — carried with each row: the verify stage's
        # first-table-emission check needs the EXACT keys (recomputing
        # signs there is not bit-stable: BLAS reduction order varies
        # with matrix shape, and a near-zero dot could flip)
        out_t, out_k, out_i = [], [], []
        for t in range(n_tables):
            out_t.append(np.full(n, t, dtype=np.int32))
            out_k.append(keys_mat[:, t])
            out_i.append(np.arange(n))
        idx = pa.array(np.concatenate(out_i), type=pa.int64())
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), type=pa.float32()), dim
        )
        keys_flat = pa.FixedSizeListArray.from_arrays(
            pa.array(keys_mat.reshape(-1), type=pa.int64()), n_tables
        )
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(out_t), type=pa.int32()),
                "bucket_key": pa.array(np.concatenate(out_k), type=pa.int64()),
                id_col: pc.take(pa.array(bids, type=pa.int64()), idx),
                "_vec": pc.take(flat, idx),
                "_keys": pc.take(keys_flat, idx),
            }
        )

    rows = ds.map_batches(explode, batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b["bucket_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = b["table_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "_b",
            pa.array(
                ((k * np.uint64(31) + t) % np.uint64(n_buckets)).astype(np.int32),
                type=pa.int32(),
            ),
        )

    rows = rows.map_batches(add_bucket, batch_format="pyarrow")

    import pandas as pd

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        """EXACTLY-ONCE emission without a dedup shuffle: a pair is
        emitted only from the FIRST table in which it collides — each
        row carries its exact per-table keys (_keys, computed once at
        explode), so the downstream distinct groupby round is gone."""
        dup = g.duplicated(["table_id", "bucket_key"], keep=False)
        g = g[dup]
        out_a: list = []
        out_b: list = []
        out_c: list = []
        if len(g):
            for (t, _), sub in g.groupby(["table_id", "bucket_key"], sort=False):
                ids = sub[id_col].to_numpy().astype(np.int64)
                mat = np.vstack(sub["_vec"].to_numpy()).astype(np.float32)
                # GEMM generates candidates with slack; the THRESHOLD
                # decision uses a per-pair float64 fixed-order dot —
                # np.sum's pairwise reduction depends only on dim, so
                # every group computes the IDENTICAL score for a pair
                # (a shape-dependent GEMM score could pass in table t
                # but fail in the earlier table t' this group defers
                # to, dropping a boundary pair entirely)
                # slack must dominate worst-case float32 GEMM error, which
                # grows ~dim*eps (eps_f32~1.2e-7): a fixed 1e-4 is too tight
                # at dim>=~1024 — a boundary pair that fails the gate in its
                # FIRST colliding table is then suppressed by the seen-check
                # in every later table and emitted nowhere
                scores = mat @ mat.T
                slack = max(1e-4, mat.shape[1] * 2e-7)
                ii, jj = np.nonzero(scores >= threshold - slack)
                if len(ii) == 0:
                    continue
                keep = ids[ii] < ids[jj]
                ii, jj = ii[keep], jj[keep]
                if len(ii):
                    prod = mat[ii].astype(np.float64) * mat[jj].astype(np.float64)
                    cos = prod.sum(axis=1)
                    final = cos >= threshold
                    ii, jj, cos = ii[final], jj[final], cos[final]
                else:
                    cos = np.empty(0, np.float64)
                if t and len(ii):
                    keys_all = np.vstack(sub["_keys"].to_numpy())[:, : int(t)]
                    seen = (keys_all[ii] == keys_all[jj]).any(axis=1)
                    ii, jj, cos = ii[~seen], jj[~seen], cos[~seen]
                out_a.append(ids[ii].astype(np.int64))
                out_b.append(ids[jj].astype(np.int64))
                out_c.append(cos.astype(np.float64))
        return pd.DataFrame(
            {
                "id_a": pd.Series(
                    np.concatenate(out_a) if out_a else [], dtype="int64"
                ),
                "id_b": pd.Series(
                    np.concatenate(out_b) if out_b else [], dtype="int64"
                ),
                "cos": pd.Series(
                    np.concatenate(out_c) if out_c else [], dtype="float64"
                ),
            }
        )

    return rows.groupby("_b").map_groups(verify, batch_format="pandas")
