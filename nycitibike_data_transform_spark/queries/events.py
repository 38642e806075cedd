"""Event-stream queries over the ``events`` table (batch semantics).

The reference has no streaming path (its freshness model is a 4-hour
full re-run, SURVEY.md §2.7); the driver's ``events`` table is served
batch-style here, with the same logic mirrored as a Structured
Streaming job in ``nycitibike_data_transform_spark.streaming`` (tested
separately; streaming output is not oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.money import fast_money_sum
from nycitibike_data_transform_spark.queries import QuerySpec, load

# ------------------------------------------------------ tumbling window agg

def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch equivalent of the
    streaming windowed agg; date_trunc keeps the bucket engine-portable)."""
    t = load(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fast_money_sum("value").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

# ------------------------------------------------------------ sessionization

_GAP_MINUTES = 30


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + gap flag +
    running count assigns session ids — one shuffle on user_id, then
    narrow window math. The streaming analogue is session_window(ts)."""
    t = load(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.when(F.lag("ts").over(order).isNull(), F.lit(1))
        .when(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(order))
            > _GAP_MINUTES * 60 * 1_000_000,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    with_session = t["events"].withColumn(
        "session_id",
        F.sum(gap).over(order.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            fast_money_sum("value").alias("session_value"),
        )
    )


_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_MINUTES * 60 * 1_000_000} THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY 1, 2
"""

# ------------------------------------------------------- event funnel decode

def _q_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type counts + share-of-day (window over aggregate)."""
    t = load(spark, sf_dir, "events")
    daily = (
        t["events"]
        .groupBy(
            # cast to date: DuckDB's date_trunc('day') yields DATE
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("day")
    return daily.select(
        "day",
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias("share"),
    )


_EVENT_TYPE_DAILY_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, n,
       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY day) AS DOUBLE) AS share
FROM daily
"""


# --------------------------------------------------------- JSON extraction

def _q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction + typed
    aggregation (the schema-on-read side door every event pipeline
    needs; stays JVM-side via get_json_object)."""
    t = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
        )
    )


_EVENTS_JSON_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
       count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50 THEN 1 END)
           AS n_high
FROM events
GROUP BY 1
"""


# ------------------------------------------------------------- funnel

_FUNNEL_WINDOW_HOURS = 72


def _q_signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: users whose first signup is followed by a
    purchase within 72h. One aggregation per side + an equi-join on
    user — no range-join explosion."""
    t = load(spark, sf_dir, "events")
    ev = t["events"]
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    joined = signups.join(purchases, "user_id", "left")
    converted = (
        F.col("purchase_ts").isNotNull()
        & (F.col("purchase_ts") >= F.col("first_signup"))
        & (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("first_signup"))
            <= _FUNNEL_WINDOW_HOURS * 3600 * 1_000_000
        )
    )
    return (
        joined.groupBy("user_id", "first_signup")
        .agg(F.max(F.when(converted, 1).otherwise(0)).alias("converted"))
    )


_FUNNEL_SQL = f"""
WITH signups AS (
  SELECT user_id, min(ts) AS first_signup
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
purchases AS (
  SELECT user_id, ts AS purchase_ts FROM events WHERE event_type = 'purchase'
)
SELECT s.user_id, s.first_signup,
       max(CASE WHEN p.purchase_ts IS NOT NULL
                 AND p.purchase_ts >= s.first_signup
                 AND epoch_us(p.purchase_ts) - epoch_us(s.first_signup)
                     <= {_FUNNEL_WINDOW_HOURS * 3600 * 1_000_000}
            THEN 1 ELSE 0 END) AS converted
FROM signups s LEFT JOIN purchases p ON s.user_id = p.user_id
GROUP BY 1, 2
"""

# --------------------------------------------------- window variants

def _q_window_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / first_value / ntile over per-user event sequences (the
    analytic-window surface beyond row_number/running sums)."""
    t = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "user_id",
        "event_id",
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(Window.partitionBy("user_id").orderBy("event_type", "event_id")).alias(
            "type_rank"
        ),
    )


_WINDOW_VARIANTS_SQL = """
SELECT user_id, event_id,
       lead(event_type, 1) OVER w AS next_type,
       first_value(event_type) OVER w AS first_type,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type, event_id) AS INTEGER)
           AS type_rank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------- skew-aware fact join

def _q_skew_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-aware fact⋈dim join (VERDICT r4 item 5: wire
    ``operators.skew`` into the registry): events join the customer
    dim on user_id through ``hot_keys`` + ``skew_split_join`` — keys
    at/above the hot threshold take a broadcast two-path route, the
    cold remainder takes the normal join, and the union must be
    row-identical to the plain join (that is exactly what the DuckDB
    oracle states). Per-user aggregates stay order-free-exact
    (counts + max), so the hash check is engine-stable."""
    from nycitibike_data_transform_spark.operators.skew import (
        hot_keys,
        skew_split_join,
    )

    t = load(spark, sf_dir, "events", "customer")
    ev = t["events"].select("event_id", "user_id", "event_type", "value")
    dim = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    hot = hot_keys(ev, "user_id", min_rows=80)
    joined = skew_split_join(ev, dim, "user_id", hot, how="inner")
    return joined.groupBy("user_id", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.max("value").alias("max_value"),
    )


_SKEW_JOIN_SQL = """
SELECT e.user_id, c.c_mktsegment,
       count(*) AS n_events,
       count(DISTINCT e.event_type) AS n_types,
       max(e.value) AS max_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "skew_join_events": QuerySpec(_q_skew_join_events, _SKEW_JOIN_SQL),
    "signup_purchase_funnel": QuerySpec(_q_signup_purchase_funnel, _FUNNEL_SQL),
    "window_variants": QuerySpec(_q_window_variants, _WINDOW_VARIANTS_SQL),
    "events_hourly": QuerySpec(_q_events_hourly, _EVENTS_HOURLY_SQL),
    "events_sessionize": QuerySpec(_q_sessionize, _SESSIONIZE_SQL),
    "event_type_daily": QuerySpec(_q_event_type_daily, _EVENT_TYPE_DAILY_SQL),
    "events_json": QuerySpec(_q_events_json, _EVENTS_JSON_SQL),
}
