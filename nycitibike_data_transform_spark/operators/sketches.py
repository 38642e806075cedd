"""Mergeable frequency sketch — Misra–Gries heavy hitters.

Completes the sketch family next to HLL approx-distinct and
approx_percentile quantiles (SURVEY §2 A5): bounded-state frequent
items. At 100 TB an exact token top-k holds map-side hash state
proportional to the PER-PARTITION DISTINCT count — unbounded for
natural text — and shuffles every distinct item. Misra–Gries (1982)
caps per-partition state at ``sketch_size`` counters, and the
summaries are mergeable (Agarwal et al., "Mergeable Summaries",
PODS '12) with the classic guarantee: after merging, every item with
true global frequency > n/(sketch_size+1) survives, and each
surviving estimate undercounts by at most n/(sketch_size+1).

``heavy_hitters`` is a TWO-PASS exact frequent-items operator built
on that guarantee:

- pass 1 (sketch): one ``mapInPandas`` sweep, zero shuffle, at most
  ``sketch_size`` candidate rows per partition out — the candidate
  set PROVABLY contains every item with count > n/k (k ≤ sketch_size,
  so n/k ≥ n/(sketch_size+1)). The bounded candidate relation is
  eagerly checkpointed (partitions × sketch_size rows — metadata, the
  same bounded-collect class as the IVF quantizer);
- pass 2 (exact): re-count ONLY candidate-matching rows — a broadcast
  semi-join keeps the candidates as DATA, never a giant ``isin``
  literal (the constants-as-data lesson from the Bloom work) — then
  keep items with ``count · k > n`` against the 1-row total broadcast.

The output is therefore EXACT — precisely the items with frequency
above n/k and their true counts — with shuffle bounded by the
candidate superset instead of the full distinct domain. Python is
justified the same way the zlib/PNG/WKB sites are: Spark has no
bounded-state frequency-sketch aggregate; the per-batch work is
vectorized (pandas ``value_counts``) with one decrement step per
Arrow batch.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _mg_add(counters: dict, batch_counts: "pd.Series", limit: int) -> int:
    """Fold one batch's value counts into the MG counter dict, then
    apply the mergeable-summaries trim: subtract the (limit+1)-th
    largest count from everything and drop the non-positive. Returns
    the amount subtracted (error bookkeeping for tests)."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) <= limit:
        return 0
    m = heapq.nlargest(limit + 1, counters.values())[limit]
    for item in [i for i, c in counters.items() if c <= m]:
        del counters[item]
    for item in counters:
        counters[item] -= m
    return m


def mg_sketch_partitions(df: DataFrame, col: str, sketch_size: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ ``sketch_size`` rows of
    (item, mg_est) per partition, plus one (NULL item, part_rows) row
    carrying the partition's non-null row count so the caller gets the
    global total from the same single sweep. NULL input values are
    not counted (SQL ``count(col)`` semantics)."""
    item_type = df.schema[col].dataType
    schema = StructType(
        [
            StructField(col, item_type, True),
            StructField("mg_est", LongType(), True),
            StructField("part_rows", LongType(), True),
        ]
    )

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        rows = 0
        for pdf in batches:
            vals = pdf[col]
            rows += len(vals)
            if len(vals):
                _mg_add(counters, vals.value_counts(), sketch_size)
        # null-safe dtypes, NEVER list+[None] (ADVICE r8 medium): mixing
        # None into a plain list makes pandas infer float64, silently
        # rounding int64 items above 2^53 (e.g. 64-bit hashed keys)
        # before the Arrow conversion back to LongType — the candidate
        # semi-join would then miss true heavy hitters. object dtype
        # keeps every item value exact for any input type; the count
        # columns use pandas' nullable Int64.
        yield pd.DataFrame(
            {
                col: pd.Series(list(counters.keys()) + [None], dtype=object),
                "mg_est": pd.array(
                    list(counters.values()) + [None], dtype="Int64"
                ),
                "part_rows": pd.array(
                    [None] * len(counters) + [rows], dtype="Int64"
                ),
            }
        )

    # NULLs are filtered Spark-side, BEFORE the Arrow hand-off (not
    # pandas dropna inside the sketch): an int64 column containing any
    # null converts to pandas float64, rounding items above 2^53 on
    # entry — the input-side half of the ADVICE r8 exactness bug. The
    # filter is narrow (partitions preserved), and part_rows counted
    # after it matches SQL count(col) semantics exactly.
    return df.select(col).filter(F.col(col).isNotNull()).mapInPandas(sketch, schema)


def mg_estimates(df: DataFrame, col: str, sketch_size: int) -> DataFrame:
    """Single-pass frequency ESTIMATES (when even the second exact
    scan of :func:`heavy_hitters` is too expensive): the merged
    Misra–Gries summary as (col, est, max_undercount). Guarantees, per
    the mergeable-summaries bound: estimates never overcount;
    ``true − est ≤ max_undercount`` (= n // (sketch_size+1)) for every
    emitted item; any item NOT emitted has true count ≤ max_undercount.
    The merged relation holds ≤ partitions × sketch_size rows (the
    per-partition trims already happened; a final global trim would
    only discard information)."""
    if sketch_size < 1:
        raise ValueError(f"sketch_size must be >= 1, got {sketch_size}")
    summaries = mg_sketch_partitions(df, col, sketch_size).localCheckpoint(eager=True)
    total = summaries.agg(F.sum("part_rows").alias("n_total"))
    return (
        summaries.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.sum("mg_est").alias("est"))
        .join(F.broadcast(total))
        .withColumn(
            "max_undercount",
            (F.col("n_total") / F.lit(sketch_size + 1)).cast("long"),
        )
        .drop("n_total")
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    sketch_size: int | None = None,
) -> DataFrame:
    """EXACT frequent items: every value of ``col`` whose count
    exceeds n/k (n = non-null rows), with its true count — computed
    through the bounded-state sketch path described in the module
    docstring, never a full-domain shuffle. Columns: (col, n).

    ``sketch_size`` (default k) trades candidate-superset size against
    guarantee slack; it must be ≥ k or items between n/(sketch_size+1)
    and n/k could be missed.

    Candidate-broadcast ceiling (stated like the Bloom bitset's): the
    candidate relation holds at most ``input_partitions × sketch_size``
    rows — e.g. 10⁵ partitions × a 10³ sketch is 10⁸ candidate rows,
    GBs broadcast to every executor. Keep ``sketch_size`` near ``k``
    (the guarantee needs no more), and coalesce absurdly-fine inputs
    before sketching; the checkpoint + broadcast are metadata-class
    only while that product stays in the low millions."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sketch_size = k if sketch_size is None else sketch_size
    if sketch_size < k:
        raise ValueError(
            f"sketch_size ({sketch_size}) must be >= k ({k}): the "
            f"survival guarantee only covers counts > n/(sketch_size+1)"
        )
    # bounded relation (partitions × sketch_size rows): checkpoint so
    # the sketch sweep runs once, not once per consumer below
    summaries = mg_sketch_partitions(df, col, sketch_size).localCheckpoint(eager=True)
    candidates = summaries.filter(F.col(col).isNotNull()).select(col).distinct()
    total = summaries.agg(F.sum("part_rows").alias("n_total"))
    return (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .join(F.broadcast(candidates), col, "semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(total))
        .filter(F.col("n") * F.lit(k) > F.col("n_total"))
        .drop("n_total")
    )


# ---------------------------------------------------- count–min sketch

CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_table(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count–min sketch (Cormode & Muthukrishnan 2005) of an item
    stream as a ``depth × width`` counter relation ``(d, bucket, n)``.

    The third sketch family next to MG heavy hitters / HLL / quantiles:
    point-frequency ESTIMATES with one-sided error (never undercounts;
    overcount ≤ εn with prob 1-δ for width=e/ε, depth=ln(1/δ)). Unlike
    Misra–Gries it answers queries for ANY item, not just survivors.

    Pure Column pipeline: each occurrence expands array-side to its
    ``depth`` (row, bucket) cells — hash is the engine-portable
    md5-substring (``conv(md5(d:item)[:8],16,10) % width``, the same
    surrogate ``selection.hashed_ngram_features`` proved identical
    across Spark/DuckDB/hashlib) — then one map-side-combinable
    aggregate whose output is structurally ≤ depth·width rows at ANY
    corpus size. The ×depth stream amplification collapses in the
    combiner; no UDF, no unbounded state.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda d: F.struct(
            d.alias("d"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(d.cast("string"), F.lit(":"), F.col(col))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("bucket"),
        ),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_point_estimates(
    df: DataFrame,
    col: str,
    probes: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """CMS point queries with the exact count alongside — certifies the
    one-sided guarantee (estimate ≥ exact, overshoot = collision mass)
    per probe item, including items absent from the stream (exact 0,
    estimate = pure collision noise — MG cannot answer those at all).

    The sketch is ≤ depth·width rows → broadcast to the probe side; the
    probe relation is ``len(probes)`` literal rows; exact counts filter
    the stream to the probe set BEFORE the count shuffle. Everything is
    integer arithmetic on a portable hash — hash-exact cross-engine.
    """
    if not probes or len(set(probes)) != len(probes):
        raise ValueError("probes must be a non-empty list of distinct items")
    spark = df.sparkSession
    sketch = cms_table(df, col, depth, width)
    probe_df = spark.createDataFrame([(p,) for p in probes], f"{col} string")
    probe_cells = probe_df.select(
        col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda d: F.struct(
                    d.alias("d"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(d.cast("string"), F.lit(":"), F.col(col))
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % width
                    ).alias("bucket"),
                ),
            )
        ).alias("cell"),
    ).select(col, F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
    est = (
        probe_cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_estimate"))
    )
    exact = (
        df.filter(F.col(col).isin(probes))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, col, "left")
        .select(
            col,
            "cms_estimate",
            F.coalesce(F.col("exact_count"), F.lit(0)).alias("exact_count"),
            (F.col("cms_estimate") - F.coalesce(F.col("exact_count"), F.lit(0))).alias(
                "overshoot"
            ),
        )
    )
