"""Hot-key (skew) detection for the salt-split partitioner.

The reference has no skew handling — a hot table/key simply serializes on one
sinker connection (SURVEY §4). Here, conversations carrying more than
``threshold`` of the observed events are salted across partitions by
``(conv_id, turn_idx)`` (partition.py). The hot set must be a STABLE pure
function input — it is persisted in the lake's ``_table.json`` at create time
and may only change at compaction boundaries — so detection runs on a sample
of the stream BEFORE the lake is created (or between compactions).

Detection is the pre-aggregation pattern: per-batch partial counts inside
``map_batches`` (one row per conv per batch), then a small ``groupby`` over
the partials — the full stream never shuffles.
"""

from __future__ import annotations

import pyarrow as pa


def detect_hot_keys(events_ds, threshold: float = 0.05,
                    conv_col: str = "conv_id",
                    sample_limit: int | None = 2_000_000) -> tuple[str, ...]:
    """conv_ids receiving > threshold of all events (sampled prefix)."""
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    if sample_limit is not None:
        events_ds = events_ds.limit(sample_limit)

    def partial_counts(t: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(t.select([conv_col]))
        out = df.group_by(conv_col).len(name="n")
        return out.to_arrow().cast(pa.schema([
            (conv_col, pa.string()), ("n", pa.int64())]))

    if threshold <= 0:
        raise ValueError("threshold must be > 0 (the top-⌊1/threshold⌋ "
                         "candidate bound needs a positive fraction)")
    partials = events_ds.map_batches(partial_counts, batch_format="pyarrow")
    counts = partials.groupby(conv_col).aggregate(
        Sum("n", alias_name="n")).materialize()   # consumed twice below —
    total = counts.sum("n")                       # never re-run the sample
    if not total:                                 # empty stream (None) or 0
        return ()
    # Σ counts == total, so at most ⌊1/threshold⌋ keys can exceed
    # threshold·total — land only the top-K candidate rows on the driver,
    # never one row per conversation (a high-cardinality sample prefix
    # would otherwise ship millions of rows here)
    k = int(1.0 / threshold) + 1
    top = counts.sort("n", descending=True).limit(k).to_pandas()
    hot = top[top["n"] > threshold * total][conv_col]
    return tuple(sorted(hot))
