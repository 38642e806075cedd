"""Registry queries certifying the dbt_utils macro surface
(``functions/dbt_compat.py``) against DuckDB oracles — closing the
reference's ``packages.yml:2`` (dbt-labs/dbt_utils 1.1.1) parity row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.dbt_compat import (
    SURROGATE_KEY_NULL,
    date_spine,
    deduplicate,
    generate_surrogate_key,
    get_column_values,
    pivot_columns,
    safe_divide,
)
from nycitibike_data_transform_spark.queries import QuerySpec, load


def _q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``generate_surrogate_key`` + ``safe_divide`` parity on the
    documents table: the key is md5 over (doc_id, source, lang) with
    dbt_utils' NULL sentinel (lang IS null for some rows — the case
    the sentinel exists for), and chars_per_token divides with NULL on
    zero. md5 hex strings hash-match across engines byte-for-byte."""
    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    return docs.select(
        "doc_id",
        generate_surrogate_key("doc_id", "source", "lang").alias("sk"),
        F.round(
            safe_divide(
                F.length("text").cast("double"),
                F.size(F.split(F.col("text"), " ")).cast("double"),
            ),
            6,
        ).alias("chars_per_token"),
    )


_SURROGATE_KEYS_SQL = f"""
SELECT doc_id,
       md5(concat_ws('-',
           coalesce(CAST(doc_id AS VARCHAR), '{SURROGATE_KEY_NULL}'),
           coalesce(CAST(source AS VARCHAR), '{SURROGATE_KEY_NULL}'),
           coalesce(CAST(lang AS VARCHAR), '{SURROGATE_KEY_NULL}'))) AS sk,
       round(CASE WHEN len(string_split(text, ' ')) = 0 THEN NULL
                  ELSE CAST(length(text) AS DOUBLE)
                       / len(string_split(text, ' ')) END, 6)
           AS chars_per_token
FROM documents
"""


def _q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``date_spine`` parity: a fixed one-year day spine (end
    exclusive — the documented dbt_utils boundary) left-joined with
    per-day order counts. The spine is a 1-row sequence explode that
    broadcasts into the densification join; missing days zero-fill."""
    t = load(spark, sf_dir, "orders")
    spine = date_spine(spark, "day", "1995-01-01", "1996-01-01")
    daily = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("date_day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return spine.join(daily, "date_day", "left").select(
        "date_day", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
    )


_DATE_SPINE_SQL = """
WITH spine AS (
  SELECT CAST(d AS DATE) AS date_day
  FROM generate_series(DATE '1995-01-01', DATE '1996-01-01' - INTERVAL 1 DAY,
                       INTERVAL 1 DAY) AS t(d)
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS date_day, count(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
  GROUP BY 1
)
SELECT spine.date_day, coalesce(daily.n_orders, 0) AS n_orders
FROM spine LEFT JOIN daily USING (date_day)
"""


def _q_date_spine_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``date_spine`` calendar-step parity (ADVICE r7 medium): an
    end-of-month start (Jan-31) against a mid-month end pins BOTH dbt
    behaviors the naive sequence form gets wrong — per-addition
    day-of-month clamping (Jan-31 → Feb-28 → Mar-31) and the
    boundary-crossing period count (May-31 is inside [start, end) and
    must appear). Joined with per-month order counts so the spine
    densifies a real aggregate, not just enumerates dates."""
    t = load(spark, sf_dir, "orders")
    spine = date_spine(spark, "month", "1995-01-31", "1995-06-15")
    monthly = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-07-01")
        )
        .groupBy(F.trunc(F.col("o_orderdate"), "month").alias("__m"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        spine.join(
            monthly, F.trunc(F.col("date_month"), "month") == F.col("__m"), "left"
        )
        .select("date_month", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
    )


_DATE_SPINE_MONTH_SQL = """
WITH spine AS (
  SELECT CAST(TIMESTAMP '1995-01-31' + (i * INTERVAL 1 MONTH) AS DATE) AS date_month
  FROM range(0, greatest(datediff('month', DATE '1995-01-31',
                                  DATE '1995-06-15'), 0)) t(i)
),
monthly AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m, count(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
  GROUP BY 1
)
SELECT spine.date_month, coalesce(monthly.n_orders, 0) AS n_orders
FROM spine LEFT JOIN monthly ON date_trunc('month', spine.date_month) = monthly.m
"""


def _q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``deduplicate`` parity: latest event per user (ts desc,
    event_id desc tie-break — explicit so both engines pick the same
    row). One shuffle on user_id."""
    t = load(spark, sf_dir, "events")
    ev = t["events"]
    return deduplicate(
        ev,
        ["user_id"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    ).select("user_id", "event_id", "ts", "event_type")


_DEDUP_LATEST_SQL = """
SELECT user_id, event_id, ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def _q_pivot_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dbt_utils.get_column_values`` + ``dbt_utils.pivot`` chained
    the way dbt chains them: the pivot-value list is INTROSPECTED from
    the data at plan build (one bounded groupBy collect over the
    3-value status enum), then compiled into static
    ``sum(CASE WHEN status = v THEN … END)`` aggregate columns — no
    pivot-value inference job at execution, map-side combinable.
    Counts plus cent-unit sums (exact integers both engines)."""
    t = load(spark, sf_dir, "orders")
    orders = t["orders"]
    statuses = get_column_values(orders, "o_orderstatus", order_by="value")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.withColumn("__cents", cents)
        .groupBy("o_orderpriority")
        .agg(
            *pivot_columns("o_orderstatus", statuses, prefix="n_"),
            *pivot_columns(
                "o_orderstatus",
                statuses,
                then_value=F.col("__cents"),
                else_value=0,
                prefix="cents_",
            ),
        )
    )


_PIVOT_MACRO_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P,
       CAST(sum(CASE WHEN o_orderstatus = 'F'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS cents_F,
       CAST(sum(CASE WHEN o_orderstatus = 'O'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS cents_O,
       CAST(sum(CASE WHEN o_orderstatus = 'P'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS cents_P
FROM orders
GROUP BY 1
"""


def _q_generic_tests_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt_utils-only generic data tests as oracle-certified
    verdict rows (VERDICT r7 item #8: the tests were pytest-pinned
    but had no driver-oracle evidence): ``sequential_values`` over
    the distinct 1995-H1 URGENT-order day ordinals (each violation is
    a calendar day with no urgent order following one that had one)
    and ``mutually_exclusive_ranges`` over per-customer 30-day order
    windows (each violation is an order placed inside the previous
    order's window). Counts, not row dumps — the violation SETS are
    engine-deterministic but large; counts keep the verdict compact
    while still failing on any detection drift.

    Scale shape: the range check windows per customer (one shuffle on
    o_custkey); the sequential check's unpartitioned window runs over
    the ≤181-row day-ordinal relation (bounded by the date span)."""
    from nycitibike_data_transform_spark.quality import (
        mutually_exclusive_ranges_violations,
        sequential_values_violations,
    )

    t = load(spark, sf_dir, "orders")
    orders = t["orders"]
    day_ords = (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-07-01")
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("day_ord")
        )
        .distinct()
    )
    gaps = sequential_values_violations(day_ords, "day_ord", interval=1)
    ranges = orders.select(
        "o_custkey",
        F.col("o_orderdate").alias("lo"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("hi"),
    )
    overlaps = mutually_exclusive_ranges_violations(
        ranges, "lo", "hi", partition_by="o_custkey"
    )
    return gaps.agg(
        F.lit("urgent_day_gaps").alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_violations"),
    ).unionByName(
        overlaps.agg(
            F.lit("order_window_overlaps").alias("check_name"),
            F.count(F.lit(1)).cast("long").alias("n_violations"),
        )
    )


_GENERIC_TESTS_SQL = """
WITH ords AS (
  SELECT DISTINCT datediff('day', DATE '1995-01-01',
                           CAST(o_orderdate AS DATE)) AS day_ord
  FROM orders
  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
    AND o_orderpriority = '1-URGENT'
),
lagged AS (SELECT day_ord, lag(day_ord) OVER (ORDER BY day_ord) AS prev FROM ords),
r AS (
  SELECT o_custkey, o_orderdate AS lo, o_orderdate + INTERVAL 30 DAY AS hi,
         lag(o_orderdate + INTERVAL 30 DAY)
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderdate + INTERVAL 30 DAY) AS prev
  FROM orders
)
SELECT 'urgent_day_gaps' AS check_name,
       CAST((SELECT count(*) FROM lagged
             WHERE prev IS NOT NULL AND day_ord <> prev + 1) AS BIGINT)
           AS n_violations
UNION ALL
SELECT 'order_window_overlaps',
       CAST((SELECT count(*) FROM r
             WHERE lo >= hi OR (prev IS NOT NULL AND lo < prev)) AS BIGINT)
"""


QUERIES: dict[str, QuerySpec] = {
    "surrogate_keys": QuerySpec(_q_surrogate_keys, _SURROGATE_KEYS_SQL),
    "date_spine": QuerySpec(_q_date_spine, _DATE_SPINE_SQL),
    "date_spine_month": QuerySpec(_q_date_spine_month, _DATE_SPINE_MONTH_SQL),
    "dedup_latest": QuerySpec(_q_dedup_latest, _DEDUP_LATEST_SQL),
    "generic_tests_audit": QuerySpec(_q_generic_tests_audit, _GENERIC_TESTS_SQL),
    "pivot_macro": QuerySpec(_q_pivot_macro, _PIVOT_MACRO_SQL),
}
