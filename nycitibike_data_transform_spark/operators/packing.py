"""Sequence packing — map documents onto fixed-length token bins.

Pre-training consumes the corpus as a single token stream chopped into
``seq_len``-token training rows; packing answers "which training rows
does each document land in" (docs in deterministic id order, a doc may
straddle a bin boundary). The core computation is a GLOBAL prefix sum
of token counts — the textbook Spark anti-pattern if written as one
`Window.orderBy(...)` (every row through a single reducer).

This implementation is the scalable two-phase prefix sum:

1. bucket docs by a monotone function of the id (order-preserving, so
   (bucket, id) order == global id order);
2. running sum WITHIN each bucket — parallel across buckets, one
   shuffle;
3. per-bucket totals (|buckets| rows — metadata-sized) get their own
   running sum on a single partition and broadcast back as each
   bucket's base offset.

Total: one shuffle of (id, n_tokens) pairs plus a broadcast of
|buckets| offsets — the full corpus never serializes through one
reducer. The DuckDB oracle uses the naive global window, proving the
two-phase decomposition exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bucket_width: int = 1_000,
) -> DataFrame:
    """Assign each doc its token interval and training-bin span.

    Input: one row per doc with a precomputed token count (empty docs
    are dropped — they occupy no tokens). Output per doc:
    ``(id_col, n_tokens, start_offset, first_bin, last_bin)`` where
    offsets index the concatenated id-ordered token stream and bins
    are ``seq_len``-token training rows. A doc straddles bins when
    ``first_bin < last_bin``.

    ``bucket_width`` controls phase-1 parallelism: ids are bucketed by
    ``floor(id / bucket_width)`` (monotone ⇒ order-preserving). Size it
    so a bucket's rows fit one reducer comfortably; the per-bucket
    totals table has |id range| / bucket_width rows and must stay
    metadata-sized (it takes a single-partition window)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    d = docs.select(
        F.col(id_col), F.col(tokens_col).cast("long").alias("__tok")
    ).filter(F.col("__tok") > 0)
    bucket = (F.col(id_col) / F.lit(bucket_width)).cast("long").alias("__bucket")
    d = d.select(id_col, "__tok", bucket)

    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = d.withColumn("__run_in", F.sum("__tok").over(w_in))

    # per-bucket totals: tiny by construction; the single-partition
    # running sum here is over |buckets| rows, not the corpus
    w_b = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = (
        d.groupBy("__bucket")
        .agg(F.sum("__tok").alias("__btot"))
        .withColumn("__base", F.coalesce(F.sum("__btot").over(w_b), F.lit(0)))
        .select("__bucket", "__base")
    )

    start = F.col("__base") + F.col("__run_in") - F.col("__tok")
    end_incl = F.col("__base") + F.col("__run_in") - 1
    return (
        within.join(F.broadcast(bases), "__bucket")
        .select(
            F.col(id_col),
            F.col("__tok").alias("n_tokens"),
            start.alias("start_offset"),
            F.floor(start / seq_len).cast("long").alias("first_bin"),
            F.floor(end_incl / seq_len).cast("long").alias("last_bin"),
        )
    )
