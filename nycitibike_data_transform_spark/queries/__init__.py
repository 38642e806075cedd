"""Driver-facing query registry.

Each submodule exposes ``QUERIES: dict[str, QuerySpec]`` where a
QuerySpec pairs a PySpark callable ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL for the DuckDB oracle (or None for
genuinely non-SQL-expressible operators — the driver then records a
rows-only check).

Determinism contract (everything here is hash-compared against DuckDB):

- No raw ``sum``/``avg`` over doubles — money aggregates go through
  exact DECIMAL accumulation and cast to double once at the end
  (double summation order differs across engines/partitions).
- Irrational math (trig, sqrt) is rounded to 6 decimals — JVM vs libm
  can differ in the last ulp; 1e-16 vs a 1e-6 boundary is negligible.
- Column names are aliased identically on both sides (the driver sorts
  columns by name before hashing).
- Timestamps rely on the UTC session timezone (set in ``load``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.catalog import TESTDATA_TABLES


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def load(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    """Load the named testdata tables (UTC session tz for oracle
    parity — the driver may hand us a session with other defaults).

    Temporal columns are normalized by ``catalog.load_table``: the
    driver's parquet has shipped both TIMESTAMP(NANOS) (read as nanos
    longs under the legacy conf, truncated to µs) and plain
    timestamp[us] with no timezone (read as TIMESTAMP_NTZ, cast to
    session-UTC TIMESTAMP) — either way the wall-clock values match
    DuckDB's naive reading on the oracle side."""
    from nycitibike_data_transform_spark.catalog import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    names = tables or TESTDATA_TABLES
    return {t: load_table(spark, sf_dir, t) for t in names}


# The driver's correctness gate checks the FIRST 50 entries of
# ``queries()`` (CORRECTNESS_r01 had exactly 50 rows; 14 llmdata
# queries fell past the window and got no driver evidence despite
# passing locally). This list pins an explicit priority order:
#
# - everything the driver has NOT yet green-lit (r1-unchecked llmdata
#   queries, the two r1 reds now fixed, new r2 queries) goes first;
# - one representative per operator family fills the rest of the
#   window;
# - the tail (>50) holds low-risk near-duplicates of operators already
#   hash-green in CORRECTNESS_r01 (e.g. set_except duplicates
#   set_intersect's set-op machinery, rollup/cube duplicate
#   grouping_sets) — they stay runnable and locally verified via
#   tools/check_oracle.py, they just cede their driver slot.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- r4 rotation (VERDICT r2 item #5): every query lacking an
    # r2-green driver row gets a window slot this round; r2-green
    # queries cede slots (they stay runnable + locally verified). ---
    # fixed r2 red (oracle typing, fixed r3) + new r3 query
    "repetition_ratio",
    "dedup_clusters",
    # new r4 queries (decontamination / stratified sampling / mixing)
    "quality_filter",
    "pack_sequences",
    "snapshot_diff",
    "decontaminate",
    "stratified_sample",
    "source_mix_report",
    "dedup_keep_best",
    "dedup_incremental",
    "resample_balanced",
    # reshaped in r3 so evidence is non-vacuous (r2 item #4) — need
    # fresh driver rows with spark_rows > 0
    "set_except",
    "anti_join",
    # rows-only by design (no SQL oracle: engine hash bits / sampling)
    "minhash_pairs",
    "simhash",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "approx_distinct",
    "hash_sample",
    # r1-green only — never re-evidenced since the r2 window rotation
    "pivot_qty_by_status",
    "filter_project",
    "payment_decode",
    "price_histogram",
    "volume_shipping",
    "returned_items",
    "rollup_qty",
    "cube_orders",
    "window_running_qty",
    "top_orders",
    "collect_sorted",
    "unpivot_money",
    "word_frequencies",
    "dispersion",
    "event_type_daily",
    "events_hourly",
    # operator-family representatives (r2-green; re-pin the core)
    "location_dim",
    "stage_rides",
    "haversine",
    "set_intersect",
    "semi_join",
    "pricing_summary",
    "shipping_priority",
    "forecast_revenue",
    "revenue_by_nation",
    "distinct_parts_per_flag",
    "grouping_sets",
    "window_topk_orders",
    "window_variants",
    "quantiles",
    "argmax_orders",
    "asof_purchase_click",
    "null_semantics",
    "fuzzy_name_pairs",
    "range_join_tiers",
    "correlated_subquery",
    "string_functions",
    "events_sessionize",
    "dedup_exact",
    "bpe_token_count",
    # ---- past the 50-entry window: all hash-green in CORRECTNESS_r02
    # (llmdata + aux surfaces proven last round; machinery also pinned
    # by in-window family representatives and tools/check_oracle.py) ----
    "text_stats",
    "language_id",
    "doc_fingerprint",
    "ngram_jaccard",
    "dedup_near",
    "cosine_topk",
    "embedding_near_dup",
    "crossmodal_dup_check",
    "embedding_norms",
    "multimodal_meta",
    "events_json",
    "aux_econ_by_nta",
    "inspections_by_nta",
    "image_pipeline",
    "scrub_pii",
    "chunk_documents",
    "tfidf_top_terms",
    "date_functions",
    "signup_purchase_funnel",
)


def all_queries() -> dict[str, QuerySpec]:
    from nycitibike_data_transform_spark.queries import (
        advanced,
        aux_nyc,
        core,
        events,
        llmdata,
        marts,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (core, marts, advanced, events, llmdata, aux_nyc):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    missing = merged.keys() - set(_DRIVER_PRIORITY)
    stale = set(_DRIVER_PRIORITY) - merged.keys()
    if missing or stale:
        raise ValueError(
            f"_DRIVER_PRIORITY out of sync: missing={sorted(missing)} stale={sorted(stale)}"
        )
    return {name: merged[name] for name in _DRIVER_PRIORITY}
