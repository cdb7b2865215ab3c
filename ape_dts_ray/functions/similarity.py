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
                     concurrency: int | None = None) -> pd.DataFrame:
    """Global cosine top-k for every query: partial top-k per batch →
    groupby(query_id) final reduce. Returns (query_id, vec_id, rank, cosine)."""
    import ray

    if concurrency is None:
        # leave slots for the downstream shuffle: an actor pool that reserves
        # every CPU starves the groupby stage and the pipeline deadlocks
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
    ref = ray.put(queries)
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

def make_centroids(dim: int, n_centroids: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((n_centroids, dim)))


class IVFAssign:
    """Index-time bucket assignment: vec → nearest centroid id (pure function
    of (vector, seed) — reproducible, shardable)."""

    def __init__(self, centroids: np.ndarray):
        self.C = centroids

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        cid = (V @ self.C.T).argmax(axis=1).astype(np.int32)
        out = batch[["vec_id", "embedding"]].copy()
        out["centroid"] = cid
        return out


def ivf_topk(emb_ds, queries: dict[int, np.ndarray], k: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             seed: int = 11) -> pd.DataFrame:
    """Approximate top-k: probe only the n_probe nearest centroid buckets per
    query. Recall < 1 by construction; deterministic given the seed."""
    import ray

    qids = sorted(queries.keys())
    dim = len(next(iter(queries.values())))
    C = make_centroids(dim, n_centroids, seed)
    Q = _normalize(np.stack([queries[i] for i in qids]).astype(np.float64))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]   # (nq, n_probe)
    # query set per bucket (small — broadcast in closure)
    bucket_queries: dict[int, list[int]] = {}
    for qi, row in enumerate(probes):
        for c in row:
            bucket_queries.setdefault(int(c), []).append(qi)

    import ray as _ray
    pool = max(1, int(_ray.cluster_resources().get("CPU", 4)) - 2)
    assigned = emb_ds.map_batches(IVFAssign, fn_constructor_args=(C,),
                                  batch_format="pandas", concurrency=pool)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        c = int(g["centroid"].iloc[0])
        qis = bucket_queries.get(c, [])
        if not qis:
            return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                                 "vec_id": pd.array([], dtype="int64"),
                                 "cosine": pd.array([], dtype="float64")})
        V = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        ids = g["vec_id"].to_numpy()
        sims = Q[qis] @ V.T
        out = []
        for row, qi in enumerate(qis):
            order = np.lexsort((ids, -sims[row]))[:k]
            out.append(pd.DataFrame({"query_id": qids[qi], "vec_id": ids[order],
                                     "cosine": sims[row][order]}))
        return pd.concat(out, ignore_index=True)

    partials = assigned.groupby("centroid").map_groups(
        bucket_topk, batch_format="pandas")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = np.round(g["cosine"], 6)
        return g[["query_id", "vec_id", "rank", "cosine"]]

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
