"""Deduplication for large-scale training-data pipelines.

Pipelines follow the canonical Ray Data shapes (see /opt/skills/guides/
ray_guide.md "Aggregation at scale"):

- exact:   content-hash in map_batches → groupby(hash) → first per content
           (pipelines/queries.py::dedup_exact)
- MinHash+LSH: shingle→minhash per batch (vectorized numpy) → explode to
           (band, band_hash, doc_id) rows → groupby(band, band_hash) →
           candidate pairs → verify true Jaccard → clusters via min-label
           propagation → keep min doc_id per cluster
- SimHash: 64-bit signature per doc → band on 16-bit chunks → candidates →
           verify Hamming distance
- embedding near-dup: normalized vectors → sign-projection LSH bucket →
           within-bucket cosine ≥ τ pairs

Everything is deterministic (fixed hash seeds) so results are reproducible
across runs and cluster sizes. At 100 TB the only all-to-all exchanges are
the groupbys on (band, band_hash) — bounded by bands × docs rows of a few
dozen bytes, not by document payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MERSENNE = np.uint64((1 << 61) - 1)
_rng = np.random.default_rng(0xA9E)
N_PERM = 128
_A = _rng.integers(1, 1 << 32, size=N_PERM, dtype=np.uint64) * 2 + 1
_B = _rng.integers(0, 1 << 32, size=N_PERM, dtype=np.uint64)


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed k-word shingles (uint64)."""
    words = text.split()
    if len(words) < k:
        joined = [" ".join(words)] if words else []
    else:
        joined = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not joined:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.array(joined, dtype=object))


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    sh = _shingles(text, k)
    if len(sh) == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # h_i(x) = (a_i * x + b_i) mod 2^64 — vectorized over (perm, shingle)
    prod = sh[None, :] * _A[:, None] + _B[:, None]
    return prod.min(axis=1)


N_SHARDS = 256   # LSH buckets are sharded to bounded groupby cardinality:
                 # groupby(shard) with a vectorized pandas groupby inside the
                 # group fn, instead of one Ray group per (band, hash) bucket
                 # (tens of thousands of tiny groups pay per-group overhead)
_BAND_W = _rng.integers(1, 1 << 62, size=N_PERM, dtype=np.uint64) * 2 + 1


class MinHashBands:
    """map_batches body: doc → (shard, band, band_hash, doc_id) rows (b bands
    of r rows, b*r = N_PERM); band hash = weighted sum of the band's minhash
    values (mod 2^64), vectorized across the whole batch."""

    def __init__(self, bands: int = 16, shingle_k: int = 5):
        assert N_PERM % bands == 0
        self.bands = bands
        self.r = N_PERM // bands
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").to_numpy()
        sigs = np.stack([minhash_signature(t, self.k) for t in texts])  # (n, 128)
        n = len(texts)
        weighted = sigs * _BAND_W[None, :]            # uint64 wrap = mod 2^64
        out = []
        doc_ids = batch["doc_id"].to_numpy()
        for b in range(self.bands):
            bh = weighted[:, b * self.r:(b + 1) * self.r].sum(axis=1,
                                                              dtype=np.uint64)
            bh = bh + np.uint64(b)                    # band id mixed in
            out.append(pd.DataFrame({
                "doc_id": doc_ids,
                "band": np.full(n, b, dtype=np.int32),
                "band_hash": bh.view(np.int64),
                "shard": (bh % np.uint64(N_SHARDS)).astype(np.int32)}))
        return pd.concat(out, ignore_index=True)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    a, b = set(_shingles(text_a, k)), set(_shingles(text_b, k))
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def minhash_dedup(docs_ds, threshold: float = 0.8, bands: int = 16,
                  shingle_k: int = 5) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline → DataFrame (doc_id, dup_of) for
    every document that is a near-duplicate of a lower-id keeper.

    Candidate verification re-reads the two texts (broadcast of the doc→text
    map is fine while the candidate set is small; at 100 TB scale this becomes
    a keyed join of candidate pairs against the corpus — documented
    partitioning assumption: pairs ≪ corpus)."""
    import ray.data as rd  # noqa: F401  (docs_ds is a Dataset)

    bands_ds = docs_ds.map_batches(MinHashBands(bands, shingle_k),
                                   batch_format="pandas")

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(grp["doc_id"].unique())
            if len(ids) < 2:
                continue
            i, j = np.triu_indices(len(ids), k=1)
            out_a.append(ids[i])
            out_b.append(ids[j])
        if not out_a:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    pairs = bands_ds.groupby("shard").map_groups(shard_pairs,
                                                 batch_format="pandas")
    pairs_df = pairs.to_pandas().drop_duplicates()
    if pairs_df.empty:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "dup_of": pd.array([], dtype="int64")})

    texts = dict(zip(*[docs_ds.select_columns(["doc_id", "text"])
                       .to_pandas()[c] for c in ("doc_id", "text")]))
    keep = []
    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        if jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k) >= threshold:
            keep.append((int(a), int(b)))
    if not keep:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "dup_of": pd.array([], dtype="int64")})
    # union-find on the (small) verified pair set → min-id cluster labels
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in keep:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame([(d, r) for d, r in rows if d != r],
                        columns=["doc_id", "dup_of"]).astype("int64")


# --- SimHash ---

def simhash64(text: str) -> int:
    words = text.split()
    if not words:
        return 0
    hs = pd.util.hash_array(np.array(words, dtype=object))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    votes = bits.sum(axis=0) * 2 - len(hs)
    return int(((votes > 0).astype(np.uint64) <<
                np.arange(64, dtype=np.uint64)).sum())


class SimHashStage:
    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = [simhash64(t) for t in batch["text"].fillna("")]
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": pd.array(sh, dtype="uint64")})


def simhash_dedup(docs_ds, max_hamming: int = 3,
                  max_bucket: int = 512) -> pd.DataFrame:
    """SimHash near-dup: 4×16-bit band LSH (a pair within Hamming ≤ 3 of 64
    bits shares at least one of 4 bands) → verify exact Hamming distance.

    Buckets larger than ``max_bucket`` are degenerate (a 16-bit chunk shared
    by thousands of docs carries no signal and would cost O(m²)); they are
    skipped — the standard LSH hot-bucket guard. Raise ``max_bucket`` for
    corpora where huge clusters are expected."""
    sigs = docs_ds.map_batches(SimHashStage(), batch_format="pandas")

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        n = len(h)
        out = []
        for band in range(4):
            chunk = ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF))
            out.append(pd.DataFrame({
                "doc_id": batch["doc_id"].to_numpy(),
                "band": np.full(n, band, dtype=np.int32),
                "chunk": chunk.astype(np.int64),
                "simhash": h.view(np.int64),
                "shard": ((chunk * np.uint64(4) + np.uint64(band))
                          % np.uint64(N_SHARDS)).astype(np.int32)}))
        return pd.concat(out, ignore_index=True)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby(["band", "chunk"], sort=False):
            grp = grp.drop_duplicates("doc_id").sort_values("doc_id")
            if len(grp) < 2 or len(grp) > max_bucket:
                continue
            ids = grp["doc_id"].to_numpy()
            hs = grp["simhash"].to_numpy().astype(np.uint64)
            i, j = np.triu_indices(len(ids), k=1)
            xor = hs[i] ^ hs[j]
            # one-shot popcount: bytes view → unpackbits → row sums
            ham = np.unpackbits(xor.view(np.uint8).reshape(len(xor), 8),
                                axis=1).sum(axis=1).astype(np.int64)
            ok = ham <= max_hamming
            if ok.any():
                out.append(pd.DataFrame({"a": ids[i][ok], "b": ids[j][ok],
                                         "hamming": ham[ok]}))
        if not out:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64"),
                                 "hamming": pd.array([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    pairs = (sigs.map_batches(explode, batch_format="pandas")
             .groupby("shard")
             .map_groups(shard_pairs, batch_format="pandas"))
    df = pairs.to_pandas()
    if df.empty:     # an all-filtered Dataset loses its schema through pandas
        return pd.DataFrame({"a": pd.array([], dtype="int64"),
                             "b": pd.array([], dtype="int64"),
                             "hamming": pd.array([], dtype="int64")})
    df = df.drop_duplicates(["a", "b"])
    return df.sort_values(["a", "b"]).reset_index(drop=True)


# --- embedding near-dup ---

def embedding_dedup(emb_ds, threshold: float = 0.95, n_planes: int = 8,
                    seed: int = 7) -> pd.DataFrame:
    """Near-dup by cosine ≥ τ: sign-projection LSH bucket (n_planes random
    hyperplanes, seeded) → exact within-bucket cosine. Pairs whose vectors
    disagree on every plane band are missed — the standard LSH recall
    trade-off, mitigated by using 2 independent bands."""
    import ray.data as rd  # noqa: F401

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        dim = V.shape[1]
        rows = []
        for band in range(2):
            rng = np.random.default_rng([seed, band])
            planes = rng.standard_normal((dim, n_planes))
            sig = (V @ planes > 0).astype(np.uint32)
            code = (sig << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
            rows.append(pd.DataFrame({
                "vec_id": batch["vec_id"], "band": band, "bucket": code,
                "shard": ((code * 2 + band) % N_SHARDS).astype(np.int32),
                "embedding": list(V)}))
        return pd.concat(rows, ignore_index=True)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby(["band", "bucket"], sort=False):
            grp = grp.drop_duplicates("vec_id").sort_values("vec_id")
            if len(grp) < 2:
                continue
            V = np.stack(grp["embedding"].to_numpy())
            ids = grp["vec_id"].to_numpy()
            sims = V @ V.T
            i, j = np.triu_indices(len(ids), k=1)
            ok = sims[i, j] >= threshold
            if ok.any():
                out.append(pd.DataFrame({
                    "a": ids[i][ok], "b": ids[j][ok],
                    "cosine": np.round(sims[i, j][ok], 6)}))
        if not out:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64"),
                                 "cosine": pd.array([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    pairs = (emb_ds.map_batches(bucketize, batch_format="pandas")
             .groupby("shard")
             .map_groups(shard_pairs, batch_format="pandas"))
    df = pairs.to_pandas()
    if df.empty:     # an all-filtered Dataset loses its schema through pandas
        return pd.DataFrame({"a": pd.array([], dtype="int64"),
                             "b": pd.array([], dtype="int64"),
                             "cosine": pd.array([], dtype="float64")})
    df = df.drop_duplicates(["a", "b"])
    return df.sort_values(["a", "b"]).reset_index(drop=True)
