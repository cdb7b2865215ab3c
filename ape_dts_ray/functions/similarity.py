"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put`` on the driver, ``ray.get`` in each task), every batch computes a
numpy matmul against it and emits per-batch partial top-k rows; a final tiny
``groupby(query_id)`` reduces partials to the global top-k. The shuffle moves
only (n_queries × k) candidate rows per batch — never the corpus.

Scale path: IVF — vectors are assigned to the nearest of C seeded random
centroids at index time (one pass, deterministic); a query probes only its
``n_probe`` nearest centroid buckets. Bucket assignment is a pure function of
(vector, seed), so the index is reproducible and shardable by centroid id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(V: np.ndarray) -> np.ndarray:
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)


class BruteForceTopK:
    """map_batches body: partial top-k of each broadcast query against the
    batch's vectors. Queries ship via object store once per actor/task."""

    def __init__(self, queries_ref, k: int):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qids = np.array(sorted(q.keys()))
        self.Q = _normalize(np.stack([q[i] for i in self.qids]).astype(np.float64))
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:      # np.stack raises on zero arrays
            return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                                 "vec_id": pd.array([], dtype="int64"),
                                 "cosine": pd.array([], dtype="float64")})
        V = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        ids = batch["vec_id"].to_numpy()
        sims = self.Q @ V.T                       # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out = []
        for qi in range(len(self.qids)):
            # ties broken by vec_id ascending for determinism
            order = np.lexsort((ids, -sims[qi]))[:k]
            out.append(pd.DataFrame({
                "query_id": self.qids[qi],
                "vec_id": ids[order],
                "cosine": sims[qi][order]}))
        return pd.concat(out, ignore_index=True)


def brute_force_topk(emb_ds, queries: dict[int, np.ndarray], k: int = 10,
                     concurrency=None) -> pd.DataFrame:
    """Global cosine top-k for every query: partial top-k per batch →
    groupby(query_id) final reduce. Returns (query_id, vec_id, rank, cosine)."""
    import ray

    ref = ray.put(queries)
    if concurrency is None:
        # task pool by default: the stage's only state is the (tiny) query
        # matrix, so shipping a prebuilt instance per task beats paying actor
        # startups; pass an explicit concurrency for an autoscaling actor
        # pool when the query set is large enough to amortize
        partials = emb_ds.map_batches(BruteForceTopK(ref, k),
                                      batch_format="pandas")
    else:
        partials = emb_ds.map_batches(
            BruteForceTopK, fn_constructor_args=(ref, k),
            batch_format="pandas", concurrency=concurrency)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = np.round(g["cosine"], 6)
        return g[["query_id", "vec_id", "rank", "cosine"]]

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


# --- IVF (inverted-file) variant: the 100 TB scale path ---

def train_centroids(emb_ds, n_centroids: int, sample_size: int = 65_536,
                    iters: int = 10, seed: int = 11) -> np.ndarray:
    """Sample-trained spherical k-means centroids: a bounded sample streams to
    the driver (``limit`` — stops the read early, never the full corpus),
    Lloyd iterations run in numpy. Deterministic (seeded init, fixed sample).
    At 100 TB the sample is a fixed-size fraction; training cost is O(sample ×
    iters), independent of corpus size."""
    df = emb_ds.limit(sample_size).to_pandas()
    if df.empty:
        raise ValueError("train_centroids: empty embedding dataset")
    V = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(V))
    C = V[rng.choice(len(V), size=k, replace=False)]
    for _ in range(iters):
        assign = (V @ C.T).argmax(axis=1)
        for c in range(k):
            members = V[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


class IVFAssign:
    """Index-time bucket assignment: vec → (nearest centroid, id-hash shard).
    The shuffle key ``_gkey = centroid * n_shards + shard`` keeps bucket-search
    parallelism at C × S tasks (not capped at n_centroids) and bounds each
    group to ~corpus/(C·S) rows — a pure function of (vector, centroids),
    reproducible and shardable."""

    def __init__(self, centroids: np.ndarray, n_shards: int, spill: int = 1):
        self.C = centroids
        self.S = n_shards
        self.spill = spill   # index-time multi-assignment: store each vector
                             # in its `spill` nearest buckets — boundary
                             # vectors stay findable (recall ↑) at spill×
                             # index size, the standard IVF spill trade-off

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:      # np.stack raises on zero arrays
            out = batch[["vec_id", "embedding"]].copy()
            out["_gkey"] = pd.array([], dtype="int64")
            return out
        V = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = V @ self.C.T
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        shard = (pd.util.hash_array(ids) % np.uint64(self.S)).astype(np.int64)
        near = np.argsort(-sims, axis=1)[:, :self.spill].astype(np.int64)
        outs = []
        for s in range(near.shape[1]):
            out = batch[["vec_id", "embedding"]].copy()
            out["_gkey"] = near[:, s] * self.S + shard
            outs.append(out)
        return pd.concat(outs, ignore_index=True)


def ivf_topk(emb_ds, queries: dict[int, np.ndarray], k: int = 10,
             n_centroids: int = 64, n_probe: int = 16, n_shards: int = 4,
             spill: int = 1, seed: int = 11,
             centroids: np.ndarray | None = None) -> pd.DataFrame:
    """Approximate top-k: probe only the ``n_probe`` nearest (sample-trained)
    centroid buckets per query. Recall < 1 by construction — measure it with
    ``recall_at_k`` against ``brute_force_topk``; deterministic given the
    seed. Scans ~n_probe/n_centroids of the corpus per query."""
    import ray

    qids = sorted(queries.keys())
    C = centroids if centroids is not None else train_centroids(
        emb_ds, n_centroids, seed=seed)
    n_centroids = len(C)
    Q = _normalize(np.stack([queries[i] for i in qids]).astype(np.float64))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]   # (nq, n_probe)
    # query list per centroid (small — broadcast in closure)
    bucket_queries: dict[int, list[int]] = {}
    for qi, row in enumerate(probes):
        for c in row:
            bucket_queries.setdefault(int(c), []).append(qi)

    # IVFAssign init is one small matrix capture — plain task pool
    assigned = emb_ds.map_batches(IVFAssign(C, n_shards, spill),
                                  batch_format="pandas")

    S = n_shards
    NSH = 64   # bounded Ray-group cardinality: one Ray group holds many
               # (centroid, shard) buckets, split by a vectorized pandas
               # groupby inside — per-Ray-group overhead would dominate with
               # C×S tiny groups (the N_SHARDS pattern from dedup.py)

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        empty = pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                              "vec_id": pd.array([], dtype="int64"),
                              "cosine": pd.array([], dtype="float64")})
        for gkey, grp in g.groupby("_gkey", sort=False):
            c = int(gkey) // S
            qis = bucket_queries.get(c, [])
            if not qis:
                continue
            V = _normalize(np.stack(grp["embedding"].to_numpy()
                                    ).astype(np.float64))
            ids = grp["vec_id"].to_numpy()
            sims = Q[qis] @ V.T
            kk = min(k, len(ids))
            for row, qi in enumerate(qis):
                order = np.lexsort((ids, -sims[row]))[:kk]
                out.append(pd.DataFrame({"query_id": qids[qi],
                                         "vec_id": ids[order],
                                         "cosine": sims[row][order]}))
        return pd.concat(out, ignore_index=True) if out else empty

    def add_ray_shard(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_rs"] = (batch["_gkey"] % NSH).astype(np.int64)
        return batch

    partials = (assigned.map_batches(add_ray_shard, batch_format="pandas")
                .groupby("_rs").map_groups(shard_topk, batch_format="pandas"))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True])
        g = g.drop_duplicates("vec_id").head(k)    # spilled vectors can reach
        g = g.reset_index(drop=True)               # a query via several buckets
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = np.round(g["cosine"], 6)
        return g[["query_id", "vec_id", "rank", "cosine"]]

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


def recall_at_k(approx: pd.DataFrame, exact: pd.DataFrame) -> pd.DataFrame:
    """Per-query recall@k of an approximate top-k result against the exact
    one: |approx ∩ exact| / |exact| over vec_id sets."""
    rows = []
    for qid, ex in exact.groupby("query_id"):
        ap = set(approx.loc[approx["query_id"] == qid, "vec_id"])
        rows.append({"query_id": int(qid),
                     "recall": len(ap & set(ex["vec_id"])) / max(1, len(ex))})
    return pd.DataFrame(rows)
