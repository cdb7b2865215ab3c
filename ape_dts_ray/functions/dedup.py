"""Deduplication for large-scale training-data pipelines.

Pipelines follow the canonical Ray Data aggregation-at-scale shapes
(pre-aggregate inside map_batches, shuffle only bounded descriptor rows,
shard LSH buckets so groupby cardinality stays fixed):

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


def minhash_signatures_batch(texts, k: int = 5,
                             perm_chunk: int = 16) -> np.ndarray:
    """(n_docs, N_PERM) signatures with ONE ``pd.util.hash_array`` call for
    the whole batch's shingles and segmented mins per permutation —
    ``hash_array`` pays fixed setup per call, so per-doc calls dominated the
    old loop. Permutations run in chunks to bound the (chunk × shingles)
    product matrix."""
    shingle_lists = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = t.split()
        if len(words) < k:
            sh = [" ".join(words)] if words else []
        else:
            sh = [" ".join(words[j:j + k]) for j in range(len(words) - k + 1)]
        shingle_lists.append(sh)
        counts[i] = len(sh)
    n = len(texts)
    sigs = np.zeros((n, N_PERM), dtype=np.uint64)
    total = int(counts.sum())
    if total == 0:
        return sigs
    flat = np.empty(total, dtype=object)
    pos = 0
    for sh in shingle_lists:
        flat[pos:pos + len(sh)] = sh
        pos += len(sh)
    h = pd.util.hash_array(flat)                      # the one hashing pass
    nz = counts > 0
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[nz]
    # ONE reused product buffer: per-chunk `h*A+B` temporaries munmap large
    # allocations straight back to the OS, and re-faulting those pages every
    # chunk intermittently stalled for SECONDS under THP/reclaim pressure
    # (measured 0.17s vs 6.4s for identical input); in-place ufuncs into a
    # contiguous buffer are also ~2x faster for the reduceat itself
    buf = np.empty((min(perm_chunk, N_PERM), total), dtype=np.uint64)
    for c0 in range(0, N_PERM, perm_chunk):
        m = min(perm_chunk, N_PERM - c0)
        np.multiply(h[None, :], _A[c0:c0 + m, None], out=buf[:m])
        np.add(buf[:m], _B[c0:c0 + m, None], out=buf[:m])  # mod 2^64 wrap
        sigs[nz, c0:c0 + m] = \
            np.minimum.reduceat(buf[:m], starts, axis=1).T
    return sigs


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
        sigs = minhash_signatures_batch(texts, self.k)          # (n, 128)
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


def _shingle_frame(d: pd.DataFrame, k: int):
    """Per-doc UNIQUE shingle hashes as one exploded frame + per-doc set
    sizes — the precomputation that lets the broadcast verify compute every
    pair's intersection with one merge instead of re-shingling both texts
    per pair. Empty-shingle docs have no rows (sizes reindex to 0; the
    both-empty pair is Jaccard 1.0 by jaccard()'s convention)."""
    ids, hs = [], []
    for doc_id, text in zip(d["doc_id"].to_numpy(np.int64), d["text"]):
        # NA-safe: pandas "string" dtype yields pd.NA (no truthiness)
        u = np.unique(_shingles(text if isinstance(text, str) else "", k))
        if len(u):
            ids.append(np.full(len(u), doc_id, dtype=np.int64))
            hs.append(u)
    if ids:
        sf = pd.DataFrame({"doc_id": np.concatenate(ids),
                           "sh": np.concatenate(hs)})
    else:
        sf = pd.DataFrame({"doc_id": np.array([], np.int64),
                           "sh": np.array([], np.uint64)})
    sizes = sf.groupby("doc_id").size()
    return sf, sizes


_EMPTY_PAIRS = {"a": pd.array([], dtype="int64"),
                "b": pd.array([], dtype="int64")}

# minhash hot-bucket guard: buckets past this size switch from all-pairs to
# STAR expansion (each member paired to the bucket minimum) — ~80 GB of triu
# indices at m=100k otherwise; star keeps the connected component intact
MAX_LSH_BUCKET = 4096


def _jaccard_filter(sf: pd.DataFrame, sizes: pd.Series,
                    pairs_df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """THE chunked exploded-merge Jaccard kernel, shared by the broadcast
    fast path and the streaming-join fallback (one implementation so the
    empty-doc and threshold conventions can never drift): (a, b) rows of
    ``pairs_df`` whose true shingle Jaccard ≥ threshold; two empty docs
    count as identical (J = 1). Chunked so the exploded merge stays bounded
    regardless of the pair count."""
    keep = []
    step = 8192
    for lo in range(0, len(pairs_df), step):
        m = pairs_df.iloc[lo:lo + step][["a", "b"]].reset_index(drop=True)
        m = m.assign(pair=np.arange(len(m), dtype=np.int64))
        left = m.merge(sf.rename(columns={"doc_id": "a"}), on="a")
        inter = left.merge(sf.rename(columns={"doc_id": "b"}), on=["b", "sh"])
        icnt = (inter.groupby("pair").size()
                .reindex(np.arange(len(m)), fill_value=0).to_numpy())
        sa = sizes.reindex(m["a"]).fillna(0).to_numpy()
        sb = sizes.reindex(m["b"]).fillna(0).to_numpy()
        union = np.maximum(sa + sb - icnt, 1)
        jac = np.where((sa == 0) & (sb == 0), 1.0, icnt / union)
        keep.append(m.loc[jac >= threshold, ["a", "b"]])
    out = pd.concat(keep) if keep else pd.DataFrame(_EMPTY_PAIRS)
    return pd.DataFrame(_EMPTY_PAIRS) if out.empty else out.astype("int64")


# per-WORKER-process cache of the broadcast candidate corpus's shingles:
# the verify stage fans one broadcast doc set out to up to 32 pair-chunk
# tasks, and re-shingling it in every task multiplied the shingling CPU by
# the task count; keyed by the object ref so a new corpus evicts the old
_VERIFY_SHINGLE_CACHE: dict = {}


def _cached_shingles(dref, shingle_k: int):
    import ray

    key = (dref.binary() if hasattr(dref, "binary") else id(dref), shingle_k)
    hit = _VERIFY_SHINGLE_CACHE.get(key)
    if hit is None:
        hit = _shingle_frame(ray.get(dref), shingle_k)
        _VERIFY_SHINGLE_CACHE.clear()      # one corpus at a time per worker
        _VERIFY_SHINGLE_CACHE[key] = hit
    return hit


def minhash_candidate_pairs(docs_ds, bands: int = 32, shingle_k: int = 5,
                            dedup: bool = True):
    """LSH candidate pairs as a Dataset (a, b), a < b.

    Bounded shuffles: (band, band_hash) buckets sharded to ≤ N_SHARDS groups
    (pair generation), then — when ``dedup`` — pair-hash shards (cross-band
    dedup). Only (doc_id, band, hash) descriptor rows move — never document
    payload. Callers that land the pair list somewhere cheap to dedup (e.g.
    the broadcast semi-join path) pass dedup=False and skip that shuffle."""
    bands_ds = docs_ds.map_batches(MinHashBands(bands, shingle_k),
                                   batch_format="pandas")

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized bucket → pairs: sort once, find bucket bounds,
        # then emit pairs per bucket-SIZE class (one triu broadcast per
        # distinct size) — no per-bucket pandas iteration (a shard holds
        # thousands of mostly-size-1 buckets; iterating them dominated the
        # whole minhash pipeline)
        g = (g.drop_duplicates(["band", "band_hash", "doc_id"])
             .sort_values(["band", "band_hash", "doc_id"]))
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy().astype(np.int64)
        n = len(ids)
        if n == 0:
            return pd.DataFrame(_EMPTY_PAIRS)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        out_a, out_b = [], []
        for m in np.unique(sizes):      # hot-bucket guard: a degenerate
            if m < 2:                   # bucket (all empty docs share the
                continue                # all-zero signature in EVERY band)
            sel = starts[sizes == m]    # would allocate O(m²) triu indices
            M = ids[sel[:, None] + np.arange(m)[None, :]]   # (buckets, m)
            if m > MAX_LSH_BUCKET:
                # STAR expansion instead of all-pairs: every member pairs
                # with the bucket minimum — O(m) pairs, and the union-find
                # dedup recovers the identical connected component for
                # true-duplicate buckets (the only way m docs share a
                # 64-bit band hash at scale); unlike simhash's skip, no
                # real duplicate is silently dropped
                mins = M[:, :1]
                out_a.append(np.broadcast_to(mins, (len(sel), m - 1)).ravel())
                out_b.append(M[:, 1:].ravel())
                continue
            i, j = np.triu_indices(m, k=1)
            out_a.append(M[:, i].ravel())                   # a < b: sorted
            out_b.append(M[:, j].ravel())                   # within bucket
        if not out_a:
            return pd.DataFrame(_EMPTY_PAIRS)
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    pairs = bands_ds.groupby("shard").map_groups(shard_pairs,
                                                 batch_format="pandas")
    if not dedup:
        return pairs

    def add_pair_shard(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy().astype(np.int64)
        b = batch["b"].to_numpy().astype(np.int64)
        h = pd.util.hash_array(a * np.int64(1_000_003) + b)
        batch = batch.copy()
        batch["_pk"] = (h % np.uint64(N_SHARDS)).astype(np.int64)
        return batch

    def dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    return (pairs.map_batches(add_pair_shard, batch_format="pandas")
            .groupby("_pk").map_groups(dedup_shard, batch_format="pandas"))


def join_pair_texts(pairs_ds, docs_ds, num_partitions: int = 64):
    """Attach both texts to every (a, b) pair with TWO keyed shuffle joins
    (hash-partition pairs and docs by doc id, vectorized pandas merge inside
    each partition) — the distributed replacement for a driver-side
    doc_id→text map. Nothing ever materializes on the driver; the corpus
    text flows through two partition-pure shuffles."""
    P = num_partitions

    def _key(ids: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(ids.astype(np.int64))
                % np.uint64(P)).astype(np.int64)

    def tag_pairs_a(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_jk": _key(batch["a"].to_numpy()), "_kind": "p",
            "a": batch["a"].astype("int64"), "b": batch["b"].astype("int64"),
            "txt": pd.array([None] * len(batch), dtype="string")})

    def tag_docs(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        return pd.DataFrame({
            "_jk": _key(ids), "_kind": "d",
            "a": batch["doc_id"].astype("int64"),
            "b": np.full(len(batch), -1, dtype=np.int64),
            "txt": batch["text"].astype("string")})

    def merge_a(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["_kind"] == "d"][["a", "txt"]].rename(columns={"txt": "text_a"})
        p = g[g["_kind"] == "p"][["a", "b"]]
        return p.merge(d, on="a", how="inner")

    stage_a = (docs_ds.map_batches(tag_docs, batch_format="pandas")
               .union(pairs_ds.map_batches(tag_pairs_a, batch_format="pandas"))
               .groupby("_jk").map_groups(merge_a, batch_format="pandas"))

    def tag_pairs_b(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_jk": _key(batch["b"].to_numpy()), "_kind": "p",
            "a": batch["a"].astype("int64"), "b": batch["b"].astype("int64"),
            "text_a": batch["text_a"].astype("string"),
            "txt": pd.array([None] * len(batch), dtype="string")})

    def tag_docs_b(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        return pd.DataFrame({
            "_jk": _key(ids), "_kind": "d",
            "a": np.full(len(batch), -1, dtype=np.int64),
            "b": batch["doc_id"].astype("int64"),
            "text_a": pd.array([None] * len(batch), dtype="string"),
            "txt": batch["text"].astype("string")})

    def merge_b(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["_kind"] == "d"][["b", "txt"]].rename(columns={"txt": "text_b"})
        p = g[g["_kind"] == "p"][["a", "b", "text_a"]]
        return p.merge(d, on="b", how="inner")

    return (docs_ds.map_batches(tag_docs_b, batch_format="pandas")
            .union(stage_a.map_batches(tag_pairs_b, batch_format="pandas"))
            .groupby("_jk").map_groups(merge_b, batch_format="pandas"))


def verify_pairs_jaccard(joined_ds, threshold: float, shingle_k: int = 5):
    """(a, b, text_a, text_b) → (a, b) where true Jaccard ≥ threshold.
    Vectorized: each batch's DISTINCT docs are shingled once
    (_shingle_frame) and every pair's intersection size comes from one
    exploded merge — the same kernel as the broadcast fast path, so the
    streaming-join fallback (candidates beyond the broadcast cap) carries
    no per-pair Python either. Frames are chunked so the exploded merge
    stays bounded regardless of a join group's size."""

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(_EMPTY_PAIRS)
        docs = pd.DataFrame({
            "doc_id": np.concatenate([batch["a"].to_numpy(np.int64),
                                      batch["b"].to_numpy(np.int64)]),
            "text": pd.concat([batch["text_a"], batch["text_b"]],
                              ignore_index=True),
        }).drop_duplicates("doc_id")
        sf, sizes = _shingle_frame(docs, shingle_k)
        return _jaccard_filter(sf, sizes, batch, threshold)

    return joined_ds.map_batches(verify, batch_format="pandas")


MAX_BROADCAST_PAIRS = 5_000_000
MAX_BROADCAST_TEXT_BYTES = 256 << 20    # candidate-docs broadcast-join cap


def minhash_dedup_pairs(docs_ds, threshold: float = 0.8, bands: int = 32,
                        shingle_k: int = 5, num_partitions: int = 32,
                        broadcast_candidates: bool = True) -> pd.DataFrame:
    """MinHash-LSH near-dup PAIRS, end-to-end distributed: banding → sharded
    candidate generation → keyed text joins → in-partition Jaccard verify.
    Equals the exact set {(a, b): J(a, b) ≥ τ} whenever banding recall ≈ 1
    (bands=32/r=4 at τ=0.6 misses a τ-boundary pair with p < 2e-2 and a
    j ≥ 0.85 pair with p < 1e-7 — pick bands for the target τ).

    ``broadcast_candidates=True`` (default) semi-joins first: the candidate
    ID array (ints only — never text) is broadcast via ``ray.put`` and docs
    are filtered to candidates BEFORE the keyed joins, so the two join
    shuffles move only candidate texts instead of the whole corpus. Falls
    back to the full streaming join when candidates exceed
    MAX_BROADCAST_PAIRS (then the corpus flows through the shuffles, still
    never through the driver)."""
    import ray
    import ray.data as rd

    pairs = minhash_candidate_pairs(docs_ds, bands, shingle_k,
                                    dedup=not broadcast_candidates)
    docs = docs_ds.select_columns(["doc_id", "text"])

    pairs_ds = pairs
    if broadcast_candidates:
        try:   # limit= guards the driver BEFORE materializing a pathological
            pdf = pairs.to_pandas(limit=MAX_BROADCAST_PAIRS)  # candidate blowup
        except ValueError:
            pdf = None                 # too many candidates → streaming joins
            # re-plan WITH the pair-dedup shuffle: the no-dedup variant
            # exists for the broadcast path's in-memory dedup; streaming
            # the cross-band duplicates through the keyed joins would do up
            # to bands× duplicate shuffle+verify work in exactly the
            # largest-scale path
            pairs_ds = minhash_candidate_pairs(docs_ds, bands, shingle_k,
                                               dedup=True)
        if pdf is not None:
            pdf = pdf.drop_duplicates(["a", "b"])  # cross-band dedup, in mem
        if pdf is not None and pdf.empty:
            return pd.DataFrame(_EMPTY_PAIRS)
        if pdf is not None:
            ids = np.unique(np.concatenate(
                [pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)]))
            ref = ray.put(ids)

            def keep_candidates(t: pd.DataFrame) -> pd.DataFrame:
                w = ray.get(ref)
                d = t["doc_id"].to_numpy().astype(np.int64)
                idx = np.minimum(np.searchsorted(w, d), len(w) - 1)
                return t[w[idx] == d]

            # materialize the FILTERED docs (candidate texts only — bounded
            # by 2×MAX_BROADCAST_PAIRS ids, not the corpus): both keyed join
            # legs then read it from the object store instead of re-running
            # the corpus read+filter once per leg
            docs = docs.map_batches(keep_candidates,
                                    batch_format="pandas").materialize()
            if docs.size_bytes() <= MAX_BROADCAST_TEXT_BYTES:
                # candidate texts fit the broadcast-join budget: ray.put the
                # small side ONCE and verify in a single shuffle-free map
                # stage over pair chunks — two keyed-join groupbys avoided.
                # Over budget → fall through to the streaming joins.
                cdf = docs.to_pandas()
                dref = ray.put(cdf)
                chunks = max(1, min(32, len(pdf) // 64 + 1))
                parts = np.array_split(pdf, chunks)

                def attach_verify(batch: pd.DataFrame) -> pd.DataFrame:
                    # shingles computed once per WORKER for the broadcast
                    # corpus (_cached_shingles — re-shingling per pair-chunk
                    # task multiplied the CPU by the task count), then the
                    # shared exploded-merge kernel; no per-pair Python
                    sf, sizes = _cached_shingles(dref, shingle_k)
                    return _jaccard_filter(sf, sizes, batch, threshold)

                verified = rd.from_pandas(parts).map_batches(
                    attach_verify, batch_format="pandas")
                df = verified.to_pandas()
                if df.empty:
                    return pd.DataFrame(_EMPTY_PAIRS)
                return (df.drop_duplicates(["a", "b"])
                        .sort_values(["a", "b"]).reset_index(drop=True))
            pairs_ds = rd.from_pandas(pdf)

    verified = verify_pairs_jaccard(
        join_pair_texts(pairs_ds, docs, num_partitions), threshold, shingle_k)
    df = verified.to_pandas()          # verified near-dup pairs: small output
    if df.empty:
        return pd.DataFrame(_EMPTY_PAIRS)
    return (df.drop_duplicates(["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


def minhash_dedup(docs_ds, threshold: float = 0.8, bands: int = 32,
                  shingle_k: int = 5) -> pd.DataFrame:
    """(doc_id, dup_of) for every document that is a near-duplicate of a
    lower-id keeper: verified pairs (distributed, see minhash_dedup_pairs)
    → min-label union-find over the pair set. Partitioning assumption
    (documented): VERIFIED duplicate pairs ≪ corpus, so clustering the pair
    list on the driver is bounded; the corpus itself never leaves the
    cluster."""
    keep = minhash_dedup_pairs(docs_ds, threshold, bands, shingle_k)
    if keep.empty:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "dup_of": pd.array([], dtype="int64")})
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(keep["a"], keep["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame([(d, r) for d, r in rows if d != r],
                        columns=["doc_id", "dup_of"]).astype("int64")


# --- SimHash ---
#
# The word hash is md5-derived (first 8 bytes, big-endian) — chosen over
# pd.util.hash_array so the signature is reproducible in ANY engine with an
# md5() primitive; the DuckDB oracle recomputes the identical signature
# (__ray_entry__.oracle_sql "dedup_simhash", kept in lockstep with this).

def _md5_hash64(uniq_words, cache: dict | None = None) -> np.ndarray:
    import hashlib

    out = np.empty(len(uniq_words), dtype=np.uint64)
    for i, w in enumerate(uniq_words):
        v = cache.get(w) if cache is not None else None
        if v is None:
            v = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            if cache is not None:
                cache[w] = v
        out[i] = v
    return out


def _simhash_from_hashes(hs: np.ndarray) -> int:
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    # int64: a uint64 `sum*2 - n` underflows when ones are the minority,
    # flipping every minority bit to 1 (caught by the SQL oracle)
    votes = bits.sum(axis=0).astype(np.int64) * 2 - len(hs)
    return int(((votes > 0).astype(np.uint64) <<
                np.arange(64, dtype=np.uint64)).sum())


def simhash64(text: str) -> int:
    words = text.split()
    if not words:
        return 0
    arr = np.array(words, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    return _simhash_from_hashes(_md5_hash64(uniq)[inv])


class SimHashStage:
    """Stateful map_batches body (actor pool): the word→hash64 vocabulary
    cache persists across batches, so each distinct word is md5-hashed once
    per actor, not once per occurrence."""

    def __init__(self):
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").to_numpy()
        sh = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = t.split()
            if not words:
                continue
            arr = np.array(words, dtype=object)
            uniq, inv = np.unique(arr, return_inverse=True)
            sh[i] = _simhash_from_hashes(_md5_hash64(uniq, self.cache)[inv])
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": pd.array(sh, dtype="uint64")})


def simhash_dedup(docs_ds, max_hamming: int = 3,
                  max_bucket: int = 512) -> pd.DataFrame:
    """SimHash near-dup: 4×16-bit band LSH (a pair within Hamming ≤ 3 of 64
    bits shares at least one of 4 bands) → verify exact Hamming distance.

    Buckets larger than ``max_bucket`` are degenerate (a 16-bit chunk shared
    by thousands of docs carries no signal and would cost O(m²)); they are
    skipped — the standard LSH hot-bucket guard. Raise ``max_bucket`` for
    corpora where huge clusters are expected (with it disabled the 4-band
    scheme is EXACT for Hamming ≤ 3: pigeonhole guarantees a shared band)."""
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

def cosine_pairs(emb_path: str, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding", block_rows: int = 1024):
    """EXACT all-pairs cosine ≥ τ as a Dataset of (a, b) id pairs, a < b.

    Scale shape: the id space is cut into contiguous blocks (row-group-prunable
    range filters); one task per block PAIR reads its two blocks straight from
    storage and emits qualifying pairs from a float64 matmul. The driver holds
    only O(B²) descriptors; no corpus materialization anywhere. Read
    amplification is B per block — the inherent cost of exact all-pairs; use
    ``embedding_dedup`` (sign-LSH buckets) when approximate recall is
    acceptable at scale."""
    import pyarrow.parquet as pq
    import ray.data as rd

    f = pq.ParquetFile(emb_path)
    ci = f.schema_arrow.get_field_index(id_col)
    mn, mx = None, None
    for rg in range(f.metadata.num_row_groups):   # footer stats only
        st = f.metadata.row_group(rg).column(ci).statistics
        if st is not None and st.min is not None:
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
    if mn is None:
        return rd.from_items([]).map_batches(
            lambda t: pd.DataFrame({"a": pd.array([], dtype="int64"),
                                    "b": pd.array([], dtype="int64")}),
            batch_format="pandas")
    n_blocks = (mx - mn) // block_rows + 1
    if n_blocks > 4096:
        # the block grid is O(n_blocks²) DESCRIPTORS on the driver — a
        # sparse/snowflake id domain (ids 0..2⁶³ with block_rows=1024)
        # would build billions of mostly-empty descriptors and OOM before
        # any task runs. Dense-ish ids are the documented contract.
        raise ValueError(
            f"cosine_pairs: id range [{mn}, {mx}] spans {n_blocks} blocks "
            f"of {block_rows} — the pairwise block grid needs a dense id "
            "domain; re-number ids (or raise block_rows)")
    bounds = list(range(mn, mx + 1, block_rows))
    blocks = [(lo, min(lo + block_rows - 1, mx)) for lo in bounds]
    descs = [{"alo": blocks[i][0], "ahi": blocks[i][1],
              "blo": blocks[j][0], "bhi": blocks[j][1], "diag": i == j}
             for i in range(len(blocks)) for j in range(i, len(blocks))]

    def _read_block(lo: int, hi: int):
        t = pq.read_table(emb_path, columns=[id_col, vec_col],
                          filters=[(id_col, ">=", lo), (id_col, "<=", hi)])
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            # a gap in the id domain: np.stack on zero arrays raises —
            # return an empty block (pair_block skips it)
            return ids, np.zeros((0, 1), np.float64)
        V = np.stack(t.column(vec_col).to_numpy(zero_copy_only=False)
                     ).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return ids, V

    def pair_block(batch: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for r in batch.itertuples():              # one descriptor per task
            ida, Va = _read_block(int(r.alo), int(r.ahi))
            if r.diag:
                idb, Vb = ida, Va
            else:
                idb, Vb = _read_block(int(r.blo), int(r.bhi))
            if len(ida) == 0 or len(idb) == 0:
                continue
            sims = Va @ Vb.T
            if r.diag:
                i, j = np.triu_indices(len(ida), k=1)
                ok = sims[i, j] >= threshold
                out_a.append(ida[i][ok])
                out_b.append(idb[j][ok])
            else:
                i, j = np.nonzero(sims >= threshold)
                out_a.append(ida[i])
                out_b.append(idb[j])
        if not out_a:
            return pd.DataFrame({"a": pd.array([], dtype="int64"),
                                 "b": pd.array([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a).astype(np.int64),
                             "b": np.concatenate(out_b).astype(np.int64)})

    return rd.from_items(descs).map_batches(pair_block, batch_format="pandas",
                                            batch_size=1)

def embedding_dedup(emb_ds, threshold: float = 0.95, n_planes: int = 8,
                    seed: int = 7) -> pd.DataFrame:
    """Near-dup by cosine ≥ τ: sign-projection LSH bucket (n_planes random
    hyperplanes, seeded) → exact within-bucket cosine. Pairs whose vectors
    disagree on every plane band are missed — the standard LSH recall
    trade-off, mitigated by using 2 independent bands."""
    import ray.data as rd  # noqa: F401

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:      # np.stack raises on zero arrays (empty
            return pd.DataFrame({  # upstream block)
                "vec_id": pd.array([], dtype="int64"),
                "band": pd.array([], dtype="int64"),
                "bucket": pd.array([], dtype="uint32"),
                "shard": pd.array([], dtype="int32"),
                "embedding": pd.array([], dtype=object)})
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
        CH = 2048        # row-block the similarity matrix: a degenerate
        for _, grp in g.groupby(["band", "bucket"], sort=False):
            # bucket (near-identical embeddings) would otherwise allocate
            # m×m float64 at once — OOM at m≈100k; chunking bounds the
            # working set at CH×m while emitting identical pairs
            grp = grp.drop_duplicates("vec_id").sort_values("vec_id")
            m = len(grp)
            if m < 2:
                continue
            V = np.stack(grp["embedding"].to_numpy())
            ids = grp["vec_id"].to_numpy()
            cj = np.arange(m)[None, :]
            for c0 in range(0, m, CH):
                c1 = min(c0 + CH, m)
                sims = V[c0:c1] @ V.T                     # (chunk, m)
                mask = (cj > np.arange(c0, c1)[:, None]) & (sims >= threshold)
                ii, jj = np.nonzero(mask)
                if len(ii):
                    out.append(pd.DataFrame({
                        "a": ids[ii + c0], "b": ids[jj],
                        "cosine": np.round(sims[ii, jj], 6)}))
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
