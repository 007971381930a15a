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
- embedding near-dup = brute cosine against a broadcast (ray.put)
  normalized matrix — no shuffle at all; LSH-bucketed variant in ann.py
  is the scale path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(
    batch: pa.Table, text_col: str = "text", out_col: str = "_h"
) -> pa.Table:
    digests = [
        hashlib.sha256(
            t.encode() if t is not None else b"\x00NULL"
        ).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(digests, type=pa.string()))


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
    within-bucket dedup is one vectorized drop_duplicates. sha256 keys are
    uniform, so buckets are balanced by construction (no salt needed);
    scale n_buckets with the cluster."""
    import pandas as pd

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        b = add_content_hash(b, text_col)
        buckets = [int(h[:8], 16) % n_buckets for h in b["_h"].to_pylist()]
        return b.append_column("_b", pa.array(buckets, type=pa.int32()))

    hashed = ds.map_batches(hash_and_bucket, batch_format="pyarrow")

    def drop_dups(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(id_col)
            .drop_duplicates("_h", keep="first")
            .drop(columns=["_h", "_b"])
        )

    return hashed.groupby("_b").map_groups(drop_dups, batch_format="pandas")


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
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = shingle_words
        self.text_col = text_col
        self.id_col = id_col
        self.token_re = re.compile(r"\S+")
        # word -> stable 64-bit hash, cached across the actor's lifetime
        # (vocabulary is tiny relative to token count)
        self._word_hash: dict[str, int] = {}

    def _hash_words(self, words: list[str]) -> np.ndarray:
        cache = self._word_hash
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
                )
                cache[w] = h
            out[i] = h
        return out

    def shingle_hashes(self, text: str | None) -> np.ndarray:
        """Stable 64-bit hashes of word k-shingles: per-word cached hashes
        combined with a vectorized polynomial roll (no per-shingle string
        joins or digests)."""
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
        mult = np.uint64(1)
        for j in range(k - 1, -1, -1):  # k passes, each whole-array
            acc += h[j : j + n_sh] * mult
            mult = mult * base
        return np.unique(acc)

    def signature(self, text: str | None) -> np.ndarray:
        h = self.shingle_hashes(text)
        if len(h) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*h + b) mod p, min per permutation — vectorized (n_perm x n_shingles)
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch[self.text_col].to_pylist()]
        mat = np.vstack(sigs) if sigs else np.empty((0, self.n_perm), np.uint64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), type=pa.uint64()), self.n_perm
                ),
            }
        )


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
        seg = np.ascontiguousarray(mat[:, b * rows_per_band : (b + 1) * rows_per_band])
        # hash each band segment to one uint64 (bytes-stable)
        bh = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(seg[i].tobytes(), digest_size=8).digest(), "little"
                )
                for i in range(n)
            ),
            dtype=np.uint64,
            count=n,
        )
        out_band.append(np.full(n, b, dtype=np.int32))
        out_hash.append(bh)
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
) -> "ray.data.Dataset":
    """(doc_a, doc_b, est_jaccard) pairs whose signature-estimated
    Jaccard >= threshold. texts never shuffle; signatures do."""
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

    n_buckets = 64

    def add_bucket(b: pa.Table) -> pa.Table:
        bh = b["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "_b", pa.array((bh % np.uint64(n_buckets)).astype(np.int32), type=pa.int32())
        )

    bands = bands.map_batches(add_bucket, batch_format="pyarrow")

    def pairs_in_hash_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One call per hash-bucket (not per LSH band key): keep only rows
        whose (band_id, band_hash) actually collides, then loop over those
        few collision groups with vectorized signature comparison."""
        dup = g.duplicated(["band_id", "band_hash"], keep=False)
        g = g[dup]
        out_a: list = []
        out_b: list = []
        out_j: list = []
        if len(g):
            for _, sub in g.groupby(["band_id", "band_hash"], sort=False):
                sub = sub.sort_values(id_col)
                ids = sub[id_col].to_numpy()
                mats = np.vstack(sub["minhash"].to_numpy())
                for i in range(len(ids) - 1):
                    eq = (mats[i + 1 :] == mats[i]).mean(axis=1)
                    hit = np.flatnonzero(eq >= threshold)
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

    pairs = bands.groupby("_b").map_groups(pairs_in_hash_bucket, batch_format="pandas")

    # same pair surfaces from several bands: vectorized distinct per id-bucket
    def add_pair_bucket(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_pb", pa.array((da % n_buckets).astype(np.int32), type=pa.int32())
        )

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["_pb"])

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(distinct_pairs, batch_format="pandas")
    )


def dedup_minhash(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> "ray.data.Dataset":
    """Near-dup removal with TRANSITIVE closure: candidate pairs form a
    graph; each connected component keeps its min-id representative
    (A~B, B~C drops both B and C even if A~C never surfaced). The pair
    set is collected (near-dup graphs are tiny relative to the corpus;
    at 10^12 scale switch to iterative min-label propagation via groupby
    rounds — see ROADMAP.md) and the loser set is broadcast."""
    pairs = minhash_candidate_pairs(ds, text_col, id_col, **kw)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo  # min-id becomes the root

    for r in pairs.select_columns(["doc_a", "doc_b"]).take_all():
        union(r["doc_a"], r["doc_b"])
    losers = {x for x in parent if find(x) != x}
    losers_ref = ray.put(losers)

    def drop(batch: pa.Table) -> pa.Table:
        drop_set = ray.get(losers_ref)
        if not drop_set:
            return batch
        mask = pa.array(
            [i not in drop_set for i in batch[id_col].to_pylist()], type=pa.bool_()
        )
        return batch.filter(mask)

    return ds.map_batches(drop, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per doc from word-unigram hashes (numpy bit-votes)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import re

        self.text_col = text_col
        self.id_col = id_col
        self.token_re = re.compile(r"\S+")
        self._word_hash: dict[str, int] = {}

    def simhash(self, text: str | None) -> np.uint64:
        """64-bit SimHash over word BIGRAMS — unigram features are too
        coarse for template-heavy corpora (every doc drawn from one
        vocabulary hashes within a few bits of every other, making the
        pair set quadratic; measured 3M pairs over 5k synthetic docs)."""
        if not text:
            return np.uint64(0)
        words = self.token_re.findall(text.lower())
        if not words:
            return np.uint64(0)
        cache = self._word_hash
        uniq = set(zip(words, words[1:])) if len(words) > 1 else set(words)
        hs = np.empty(len(uniq), dtype=np.uint64)
        for i, w in enumerate(uniq):
            key = w if isinstance(w, str) else "\x1f".join(w)
            h = cache.get(key)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(key.encode(), digest_size=8).digest(), "little"
                )
                cache[key] = h
            hs[i] = h
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        votes = bits.sum(axis=0) * 2 - len(hs)  # +1/-1 votes per bit
        out = np.uint64(0)
        for k in np.flatnonzero(votes > 0):
            out |= np.uint64(1) << np.uint64(k)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.array(
            [self.simhash(t) for t in batch[self.text_col].to_pylist()],
            dtype=np.uint64,
        )
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
) -> "ray.data.Dataset":
    """(doc_a, doc_b, hamming) pairs with distance <= max_hamming.

    Pigeonhole banding: split 64 bits into 4 chunks; any pair within
    hamming<=3 agrees on >=1 chunk -> groupby chunk value, verify inside."""
    import pandas as pd

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
        for c in range(4):
            chunks.append(np.full(n, c, dtype=np.int32))
            keys.append((s >> np.uint64(16 * c)) & np.uint64(0xFFFF))
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

    n_buckets = 64

    def add_bucket(b: pa.Table) -> pa.Table:
        ck = b["chunk_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "_b", pa.array((ck % np.uint64(n_buckets)).astype(np.int32), type=pa.int32())
        )

    bands = bands.map_batches(add_bucket, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        """One call per key-bucket; inner loop only over real collisions."""
        dup = g.duplicated(["chunk_id", "chunk_key"], keep=False)
        g = g[dup]
        out_a: list = []
        out_b: list = []
        out_h: list = []
        if len(g):
            for _, sub in g.groupby(["chunk_id", "chunk_key"], sort=False):
                sub = sub.sort_values(id_col)
                ids = sub[id_col].to_numpy()
                s = sub["simhash"].to_numpy().astype(np.uint64)
                for i in range(len(ids) - 1):
                    x = s[i + 1 :] ^ s[i]
                    d = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
                    hit = np.flatnonzero(d <= max_hamming)
                    for j in hit:
                        out_a.append(ids[i])
                        out_b.append(ids[i + 1 + j])
                        out_h.append(int(d[j]))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "hamming": pd.Series(out_h, dtype="int64"),
            }
        )

    pairs = bands.groupby("_b").map_groups(verify, batch_format="pandas")

    def add_pair_bucket(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_pb", pa.array((da % n_buckets).astype(np.int32), type=pa.int32())
        )

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # keep the min hamming seen for the pair
        return (
            g.sort_values("hamming")
            .drop_duplicates(["doc_a", "doc_b"])
            .drop(columns=["_pb"])
        )

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(distinct_pairs, batch_format="pandas")
    )


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
    inv_ref = ray.put(involved)

    def pick(batch: pa.Table) -> pa.Table:
        keep = ray.get(inv_ref)
        mask = pa.array(
            [i in keep for i in batch[id_col].to_pylist()], type=pa.bool_()
        )
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


def embedding_matrix(ds: "ray.data.Dataset", vec_col: str = "embedding", id_col: str = "vec_id"):
    """Collect (ids, L2-normalized matrix) — ONLY for broadcast-sized
    tables (the small side of the comparison)."""
    t = pa.concat_tables(ds.select_columns([id_col, vec_col]).iter_batches(batch_size=None, batch_format="pyarrow")).combine_chunks()
    ids = t[id_col].to_numpy(zero_copy_only=False)
    col = t[vec_col].combine_chunks() if isinstance(t[vec_col], pa.ChunkedArray) else t[vec_col]
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        dim = len(col[0])
        mat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float32).reshape(len(ids), dim)
    else:
        dim = col.type.list_size
        mat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float32).reshape(len(ids), dim)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """(id_a, id_b, cos) for cosine >= threshold: batch x broadcast-matrix
    matmul inside map_batches; no shuffle. The broadcast side must fit in
    memory (it is ray.put once, read per actor, never re-shipped)."""
    ids, mat = embedding_matrix(ds, vec_col, id_col)
    ref = ray.put((ids, mat))

    class NearDup:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch[id_col].to_numpy(zero_copy_only=False)
            col = batch[vec_col]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            dim = self.mat.shape[1]
            bm = np.asarray(
                col.values.to_numpy(zero_copy_only=False), dtype=np.float32
            ).reshape(len(bids), dim)
            norms = np.linalg.norm(bm, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            bm = bm / norms
            scores = bm @ self.mat.T
            out_a, out_b, out_c = [], [], []
            for i in range(len(bids)):
                hit = np.flatnonzero(scores[i] >= threshold)
                for j in hit:
                    if self.ids[j] > bids[i]:  # a < b, no self-pairs
                        out_a.append(bids[i])
                        out_b.append(self.ids[j])
                        out_c.append(float(scores[i, j]))
            return pa.table(
                {
                    "id_a": pa.array(out_a, type=pa.int64()),
                    "id_b": pa.array(out_b, type=pa.int64()),
                    "cos": pa.array(out_c, type=pa.float64()),
                }
            )

    return ds.map_batches(NearDup, batch_format="pyarrow", concurrency=(1, 4))
