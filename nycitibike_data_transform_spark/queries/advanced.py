"""Advanced relational coverage — operators beyond the reference's own
surface that a complete engine needs (SURVEY.md §2.4 J4, §2.5 A2-A5
extensions): as-of join, range join, grouping sets, correlated
subqueries, exact quantiles, deterministic stddev, arg-min/max,
collect+sort, unpivot, date/string scalar surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.joins import as_of_join, range_join
from nycitibike_data_transform_spark.operators.util import fan_out
from nycitibike_data_transform_spark.queries import QuerySpec, load

# ------------------------------------------------------------- as-of join

def _q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the value of that user's most recent
    click at-or-before the purchase (union+window formulation — one
    shuffle on user_id; operators/joins.py)."""
    t = load(spark, sf_dir, "events")
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("last_click_value")
    )
    return as_of_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["last_click_value"],
    )


_ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
       c.value AS last_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

# ------------------------------------------------------------ range join

_TIERS = [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1.0e9)]


def _q_range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (non-equi) join of orders into price tiers; the tier
    side broadcasts (BroadcastNestedLoopJoin over 3 rows)."""
    t = load(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    return range_join(
        t["orders"], tiers, F.col("o_totalprice"), F.col("lo"), F.col("hi")
    ).select("o_orderkey", "o_totalprice", "tier")


_RANGE_JOIN_SQL = f"""
WITH tiers(tier, lo, hi) AS (
  VALUES {", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)}
)
SELECT o_orderkey, o_totalprice, tier
FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
"""

# --------------------------------------------------------- grouping sets

_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS sum_qty,
       count(*) AS n,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 GROUPING SETS via the SQL API (same Catalyst plan as the
    DataFrame expand; the SQL text is engine-portable here)."""
    t = load(spark, sf_dir, "lineitem")
    t["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# -------------------------------------------------- correlated subquery

_CORRELATED_SQL = """
SELECT c_custkey, c_name,
       COALESCE((SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey), 0)
           AS n_orders,
       (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_order_price
FROM customer c
"""


def _q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (Catalyst decorrelates to outer
    joins + aggregates — SURVEY.md §4 'subquery decorrelation')."""
    t = load(spark, sf_dir, "customer", "orders")
    t["customer"].createOrReplaceTempView("customer")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(_CORRELATED_SQL)


# ------------------------------------------------------- exact quantiles

def _q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 exact percentiles (linear interpolation), per group. Rounded:
    both engines interpolate in double with potentially different
    expression forms."""
    t = load(spark, sf_dir, "lineitem")
    # one percentile(ARRAY) buffer instead of three scalar percentile
    # aggregates (OPTIMIZATION_r15, guide §2.6): the exact percentile
    # aggregate holds every group value in its buffer, so three scalar
    # calls built (and merged) three copies of that per-group value
    # map. Same function, same interpolation — results byte-identical
    # (asserted in the A/B); interleaved min at sf0.1: 1.68 s → 0.80 s.
    ps = F.expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(ps.alias("__ps"))
        .select(
            "l_returnflag",
            F.round(F.col("__ps")[0], 6).alias("p50"),
            F.round(F.col("__ps")[1], 6).alias("p90"),
            F.round(F.col("__ps")[2], 6).alias("p99"),
        )
    )


_QUANTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem
GROUP BY 1
"""

# ------------------------------------------------- deterministic stddev

def _q_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev with deterministic cross-engine values: exact
    DECIMAL sums of x and x², then the closed-form sample variance in
    double (built-in stddev accumulates doubles in partition order —
    not reproducible across engines)."""
    t = load(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = t["lineitem"].groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return agg.select(
        "l_returnflag",
        "n",
        F.round(var, 4).alias("var_price"),
        F.round(F.sqrt(var), 6).alias("stddev_price"),
    )


_DISPERSION_SQL = """
WITH agg AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS s1,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS s2
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round((s2 - s1 * s1 / n) / (n - 1), 4) AS var_price,
       round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS stddev_price
FROM agg
"""

# ------------------------------------------------------------ arg max

def _q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by per customer (tie-broken with a composite ordering
    key so both engines agree deterministically)."""
    t = load(spark, sf_dir, "orders")
    tiebreak = F.col("o_totalprice") + F.col("o_orderkey") / F.lit(1e9)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", tiebreak).alias("best_order"),
            F.min_by("o_orderkey", tiebreak).alias("worst_order"),
            F.max("o_totalprice").alias("best_price"),
        )
    )


_ARGMAX_SQL = """
SELECT o_custkey,
       arg_max(o_orderkey, o_totalprice + o_orderkey / 1e9) AS best_order,
       arg_min(o_orderkey, o_totalprice + o_orderkey / 1e9) AS worst_order,
       max(o_totalprice) AS best_price
FROM orders
GROUP BY 1
"""

# ----------------------------------------------------- collect + sort

def _q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order sorted line-number list (array agg), emitted as a
    joined string (portable comparison form)."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("l_linenumber")))).alias(
                "line_numbers"
            ),
            F.concat_ws(",", F.sort_array(F.collect_set(F.col("l_returnflag")))).alias(
                "flags"
            ),
        )
    )


_COLLECT_SORTED_SQL = """
SELECT l_orderkey,
       array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
       array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
FROM lineitem
GROUP BY 1
"""

# ------------------------------------------------------------- unpivot

def _q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of lineitem money columns via stack()."""
    t = load(spark, sf_dir, "lineitem")
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'extendedprice', l_extendedprice, 'discount', l_discount,"
            " 'tax', l_tax) AS (metric, value)"
        ),
    )


_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'extendedprice' AS metric, l_extendedprice AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
"""

# ------------------------------------------------------ date functions

def _q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders")
    return t["orders"].select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month_start"),
        F.last_day(F.col("o_orderdate")).alias("order_month_end"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_1999"
        ),
    )


_DATE_FUNCTIONS_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
       last_day(CAST(o_orderdate AS DATE)) AS order_month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER)
           AS days_to_1999
FROM orders
"""

# ---------------------------------------------------- string functions

def _q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "customer")
    return t["customer"].select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("name_upper"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.length(F.col("c_name")).cast("int").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_name")).alias("seg_name"),
        F.instr(F.col("c_name"), "0").cast("int").alias("zero_pos"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
    )


_STRING_FUNCTIONS_SQL = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       substring(c_name, 1, 8) AS name_prefix,
       CAST(length(c_name) AS INTEGER) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       concat_ws('|', c_mktsegment, c_name) AS seg_name,
       CAST(strpos(c_name, '0') AS INTEGER) AS zero_pos,
       reverse(c_mktsegment) AS seg_rev
FROM customer
"""


# --------------------------------------------------- array explode / agg

def _q_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → aggregate (the array/lateral surface): word
    frequencies over part type descriptions."""
    t = load(spark, sf_dir, "part")
    return (
        t["part"]
        .select(F.explode(F.split(F.col("p_type"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_WORD_FREQUENCIES_SQL = """
SELECT w AS word, count(*) AS n
FROM part, unnest(string_split(p_type, ' ')) AS t(w)
WHERE length(w) > 0
GROUP BY 1
"""


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent items through the Misra–Gries sketch path
    (operators/sketches.py): tokens from three part attributes (type
    words, name words, brand — 47 distinct values on the fixtures)
    against a 32-counter sketch, threshold n/27. The six 6-way type
    first-words sit at a ~4.2% share, above the 3.7% threshold; name
    words (~3.2%) and brands (~1%) sit below — a non-trivial split,
    and 47 distinct > 32 counters means the sketch genuinely
    decrements. The oracle is the NAIVE exact SQL, so the gate itself
    proves the bounded-state candidate pass lossless for everything
    above the threshold (same oracle-proves-the-prefilter pattern as
    fuzzy_name_pairs and decontaminate_bloom)."""
    from nycitibike_data_transform_spark.operators.sketches import heavy_hitters

    t = load(spark, sf_dir, "part")
    p = t["part"]
    toks = (
        p.select(F.explode(F.split("p_type", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .unionByName(
            p.select(F.explode(F.split("p_name", " ")).alias("token")).filter(
                F.length("token") > 0
            )
        )
        .unionByName(p.select(F.col("p_brand").alias("token")))
    )
    return heavy_hitters(toks, "token", k=27, sketch_size=32)


_HEAVY_HITTERS_SQL = """
WITH toks AS (
  SELECT t.w AS token
  FROM part, unnest(string_split(p_type, ' ')) AS t(w)
  WHERE length(t.w) > 0
  UNION ALL
  SELECT t2.w
  FROM part, unnest(string_split(p_name, ' ')) AS t2(w)
  WHERE length(t2.w) > 0
  UNION ALL SELECT p_brand FROM part
),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
tot AS (SELECT count(*) AS total FROM toks)
SELECT token, n FROM c, tot WHERE n * 27 > total
"""


def _q_mg_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certify :func:`mg_estimates`' proven bounds as a driver-oracle
    verdict (VERDICT r8 item #5). The raw single-pass estimates are
    PARTITION-DEPENDENT (which below-threshold items survive the trims
    varies with data placement), so they can't hash-match an oracle
    directly; what IS deterministic — by the Misra–Gries mergeable-
    summaries theorem, for every partitioning — is that violations
    are impossible. This query joins the sketch estimates to the naive
    exact counts and emits one row of violation counters, each
    provably zero:

    - ``n_overcounts``: emitted items with est > true count;
    - ``n_bound_violations``: items (emitted or not, est coalesced to
      0) undercounted by more than n // (sketch_size+1);
    - ``n_missed_heavy``: items with true count > n/(sketch_size+1)
      absent from the sketch output;
    - ``n_mu_mismatch``: emitted rows whose max_undercount column
      disagrees with n // (sketch_size+1).

    The oracle is closed-form SQL over the same token stream — exact
    n_total, the undercount ceiling, and constant zeros — so a red row
    here means the sketch broke its theorem, not a flaky estimate.
    Token stream and sketch_size (32) match ``heavy_hitters``; 47
    distinct tokens > 32 counters means the trims genuinely fire."""
    from nycitibike_data_transform_spark.operators.sketches import mg_estimates

    t = load(spark, sf_dir, "part")
    p = t["part"]
    toks = (
        p.select(F.explode(F.split("p_type", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .unionByName(
            p.select(F.explode(F.split("p_name", " ")).alias("token")).filter(
                F.length("token") > 0
            )
        )
        .unionByName(p.select(F.col("p_brand").alias("token")))
    )
    ks1 = 33  # sketch_size + 1
    est = mg_estimates(toks, "token", sketch_size=ks1 - 1)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_n"))
    tot = exact.agg(F.sum("true_n").cast("long").alias("n_total"))
    j = exact.join(est, "token", "left").join(F.broadcast(tot))
    mu = F.floor(F.col("n_total") / F.lit(ks1)).cast("long")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return j.groupBy("n_total").agg(
        flag(F.col("est") > F.col("true_n")).alias("n_overcounts"),
        flag(
            (F.col("true_n") - F.coalesce(F.col("est"), F.lit(0))) > mu
        ).alias("n_bound_violations"),
        flag(
            F.col("est").isNull() & (F.col("true_n") * F.lit(ks1) > F.col("n_total"))
        ).alias("n_missed_heavy"),
        flag(
            F.col("est").isNotNull() & (F.col("max_undercount") != mu)
        ).alias("n_mu_mismatch"),
        F.max(mu).alias("max_undercount"),
    ).select(
        "n_total",
        "max_undercount",
        "n_overcounts",
        "n_bound_violations",
        "n_missed_heavy",
        "n_mu_mismatch",
    )


_MG_ESTIMATES_SQL = """
WITH toks AS (
  SELECT t.w AS token
  FROM part, unnest(string_split(p_type, ' ')) AS t(w)
  WHERE length(t.w) > 0
  UNION ALL
  SELECT t2.w
  FROM part, unnest(string_split(p_name, ' ')) AS t2(w)
  WHERE length(t2.w) > 0
  UNION ALL SELECT p_brand FROM part
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) // 33 AS BIGINT) AS max_undercount,
       CAST(0 AS BIGINT) AS n_overcounts,
       CAST(0 AS BIGINT) AS n_bound_violations,
       CAST(0 AS BIGINT) AS n_missed_heavy,
       CAST(0 AS BIGINT) AS n_mu_mismatch
FROM toks
"""


# ------------------------------------------------------- fuzzy join

_FUZZY_KEYS = 60  # bounded pair space for the exact all-pairs tier
_FUZZY_MAX_DIST = 2


def _q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string self-join: part-name pairs within Levenshtein
    distance 2, via the lossless PassJoin segment prefilter
    (operators/fuzzy.py) — explode → (layout_len, seg_idx, segment)
    equi-join → exact Levenshtein verify on the candidates only. The
    oracle keeps the naive all-pairs formulation, so the gate itself
    proves the prefilter lossless (VERDICT r5 "what's wrong" #4: the
    previous shape was a length-banded BroadcastNestedLoop — quadratic
    within bands)."""
    from nycitibike_data_transform_spark.operators.fuzzy import edit_distance_pairs

    t = load(spark, sf_dir, "part")
    p = t["part"].filter(F.col("p_partkey") < _FUZZY_KEYS).select("p_partkey", "p_name")
    return edit_distance_pairs(p, "p_name", "p_partkey", max_dist=_FUZZY_MAX_DIST)


_FUZZY_SQL = f"""
WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < {_FUZZY_KEYS})
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_distance
FROM p a JOIN p b ON a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
"""

# ------------------------------------------------------ NULL semantics

def _q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / null-safe equality — the three-valued-logic
    surface (NULLs manufactured via nullif since testdata is clean)."""
    t = load(spark, sf_dir, "customer")
    masked = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return t["customer"].select(
        "c_custkey",
        F.coalesce(masked, F.lit("<masked>")).alias("segment_or_masked"),
        masked.isNull().alias("is_building"),
        masked.eqNullSafe(F.lit("MACHINERY")).alias("is_machinery_nullsafe"),
        F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)).alias(
            "acctbal_or_neg1"
        ),
    )


_NULL_SEMANTICS_SQL = """
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '<masked>') AS segment_or_masked,
       nullif(c_mktsegment, 'BUILDING') IS NULL AS is_building,
       nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY'
           AS is_machinery_nullsafe,
       coalesce(nullif(c_acctbal, 0.0), -1.0) AS acctbal_or_neg1
FROM customer
"""


# ------------------------------------------------------- table profiling

_PROFILE_COLS = (
    # (column, min/max rendering) — money renders via DECIMAL so both
    # engines print identical strings; ints/strings/timestamps cast
    # straight (both engines print 'YYYY-MM-DD HH:MM:SS' for the UTC
    # session timestamps)
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "money"),
    ("o_orderdate", "string"),
    ("o_orderpriority", "string"),
)


def _q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of ``orders`` in ONE pass: per
    column — row count, nulls, exact distinct count, min, max. The
    dbt-docs / Deequ statistics surface every warehouse needs before
    trusting a feed; the engine computes all columns in a single
    aggregation (one scan) and unpivots to long format.

    Scale note: N exact countDistincts in one aggregate expand the
    input N-fold (Spark's Expand) — the right default at profile
    cadence; at 100 TB swap ``countDistinct`` for
    ``approx_count_distinct`` (the approx tier already verdict-tested
    by ``approx_distinct``)."""
    t = load(spark, sf_dir, "orders")

    def _render(c: str, kind: str) -> tuple[Column, Column]:
        if kind == "money":
            col = F.col(c).cast("decimal(18,2)")
        else:
            col = F.col(c)
        return (
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        )

    # per-column exact NDVs as SEPARATE single-distinct aggregates,
    # folded back as 1-row broadcast scalars (OPTIMIZATION_r16,
    # VERDICT r15 item 6 / guide §2.3): one combined aggregate with
    # N countDistincts plans as an Expand that replicates every row
    # N-fold through a 7-key SortAggregate; a lone countDistinct plans
    # as a plain two-phase distinct (partial group on the value — no
    # Expand, no replication), and each branch's scan prunes to ONE
    # parquet column. The non-distinct stats stay a single
    # plain-aggregate pass. Interleaved A/B at sf0.1: min-of-5
    # 2.647 → 0.991 s (plan: Expand gone, 1 scan → 7 column-pruned
    # scans, the r15 fan_out no longer needed — the blowup it widened
    # is gone). Replaces the r15 fan+Expand shape (5.38 → 3.71 s).
    df = t["orders"]
    base_aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c, kind in _PROFILE_COLS:
        mn, mx = _render(c, kind)
        base_aggs += [F.count(c).alias(f"__nn_{c}"), mn, mx]
    stats = df.agg(*base_aggs)
    for c, _ in _PROFILE_COLS:
        stats = stats.join(
            F.broadcast(df.agg(F.countDistinct(c).alias(f"__nd_{c}")))
        )
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    return stats.select(F.explode(per_col).alias("p")).select("p.*")


def _profile_sql() -> str:
    pieces = []
    for c, kind in _PROFILE_COLS:
        expr = f"CAST({c} AS DECIMAL(18,2))" if kind == "money" else c
        pieces.append(
            f"""SELECT '{c}' AS column_name,
       count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({expr}) AS VARCHAR) AS min_value,
       CAST(max({expr}) AS VARCHAR) AS max_value
FROM orders"""
        )
    return "\nUNION ALL\n".join(pieces)


_TABLE_PROFILE_SQL = _profile_sql()


def column_profile(df: DataFrame, cols: list[str], ndv: str = "approx") -> DataFrame:
    """Selectable-NDV column profile (VERDICT r5 item #8 / r6 item
    #4): per column — row count, null count, and distinct count via
    the chosen tier. ``ndv="approx"`` is the 100 TB routine profile:
    HLL++ ``approx_count_distinct`` in ONE pass with constant-size
    sketch buffers and NO Expand (pinned in tests/test_plans.py).
    rsd=0.02, not a tighter 0.01: HLL cost scales ~(1/rsd)² registers
    and the measured wall time at 0.01 was 30× worse (4 s vs 0.13 s
    per 6-column aggregate at sf0.001) for accuracy the 5% profile
    verdict doesn't need. ``ndv="exact"`` runs one plain two-phase
    distinct aggregate per column (column-pruned scans, no Expand —
    OPTIMIZATION_r16) folded back as 1-row broadcast scalars — still
    the audit-cadence tier (N extra passes). ``ndv="both"`` computes
    the two side by side plus an ``approx_ndv_ok`` 5%-relative-error
    verdict column (the ``approx_distinct`` certification pattern).

    ``both`` runs the tiers as two SEPARATE 1-row aggregates joined as
    scalars (two scans), never one combined aggregate: Spark plans
    multi-countDistinct by partial-grouping the Expand output on each
    distinct VALUE, so a combined plan would replicate every HLL
    sketch buffer (~kilobytes each) across every distinct-value group
    — measured 83 s vs 5 s at sf0.1 on orders."""
    if ndv not in ("approx", "exact", "both"):
        raise ValueError(f"unknown ndv tier: {ndv!r}")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if ndv == "approx":
            aggs.append(F.approx_count_distinct(c, 0.02).alias(f"__ad_{c}"))
    stats = df.agg(*aggs)
    if ndv in ("exact", "both"):
        # per-column exact NDVs as separate single-distinct aggregates
        # joined back as 1-row broadcast scalars (OPTIMIZATION_r16,
        # guide §2.3) — the combined multi-countDistinct aggregate
        # plans as an Expand replicating every row once per profiled
        # column; a lone countDistinct is a plain two-phase distinct
        # with a column-pruned scan. Same restructure measured on
        # table_profile: 2.647 → 0.991 s min-of-5 interleaved at sf0.1.
        for c in cols:
            stats = stats.join(
                F.broadcast(df.agg(F.countDistinct(c).alias(f"__nd_{c}")))
            )
    if ndv == "both":
        approx_stats = df.agg(
            *[F.approx_count_distinct(c, 0.02).alias(f"__ad_{c}") for c in cols]
        )
        # 1-row × 1-row scalar join (the reviewed broadcast-cross shape)
        stats = stats.join(F.broadcast(approx_stats))

    def _fields(c: str) -> list[Column]:
        out = [
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
        ]
        if ndv == "approx":
            out.append(F.col(f"__ad_{c}").alias("n_distinct"))
        else:
            out.append(F.col(f"__nd_{c}").alias("n_distinct"))
        if ndv == "both":
            # exact NDV 0 (empty relation) guards the rel-error
            # division: the tiers agree trivially iff HLL also says 0
            out.append(
                F.when(
                    F.col(f"__nd_{c}") == 0, F.col(f"__ad_{c}") == 0
                )
                .otherwise(
                    F.abs(F.col(f"__ad_{c}") - F.col(f"__nd_{c}"))
                    / F.col(f"__nd_{c}")
                    <= F.lit(0.05)
                )
                .alias("approx_ndv_ok")
            )
        return out

    per_col = F.array(*[F.struct(*_fields(c)) for c in cols])
    return stats.select(F.explode(per_col).alias("p")).select("p.*")


def _q_table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification entry for the approx profile tier: runs
    ``column_profile(ndv="both")`` — HLL estimates are algorithm-
    specific values DuckDB's different sketch can never hash-match,
    so the oracle-comparable output is the exact NDV (plus row/null
    counts) and a boolean the HLL estimate must satisfy: within 5%
    relative error at rsd=0.02 (measured ≤ 1.6% on every profiled
    column at all SFs). A production profile at scale runs
    ``ndv="approx"`` alone — one pass, no Expand."""
    t = load(spark, sf_dir, "orders")
    return column_profile(t["orders"], [c for c, _ in _PROFILE_COLS], ndv="both")


def _profile_approx_sql() -> str:
    pieces = []
    for c, _ in _PROFILE_COLS:
        pieces.append(
            f"""SELECT '{c}' AS column_name,
       count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       true AS approx_ndv_ok
FROM orders"""
        )
    return "\nUNION ALL\n".join(pieces)


_TABLE_PROFILE_APPROX_SQL = _profile_approx_sql()


# ------------------------------------------- higher-order collections

def _q_collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function surface in one query: per document,
    build the token array once and exercise transform / filter /
    exists / slice / sort / distinct / zip_with-index — all JVM-side
    lambda expressions (SURVEY.md §2.8's 'macros stay Column
    functions' rule extended to collections; zero UDFs). Every output
    is integer/string-exact, so the DuckDB list-function oracle
    hash-matches without rounding."""
    from nycitibike_data_transform_spark.functions.text import token_array

    docs = load(spark, sf_dir, "documents")["documents"]
    toks = token_array("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        # filter: tokens longer than 4 chars
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),
        # exists: any token starting with 'z'
        F.exists(toks, lambda t: t.startswith("z")).cast("int").alias("has_z"),
        # transform + aggregate: total characters across tokens
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_chars_tok"),
        # slice + concat: first 3 tokens re-joined
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("head3"),
        # sort: lexicographically first and last token — try_element_at
        # (NULL on empty arrays, matching the oracle's list indexing)
        # instead of element_at, which RAISES under Spark 4's default
        # ANSI mode (review finding: NULL/blank docs crashed here)
        F.try_element_at(F.array_sort(toks), F.lit(1)).alias("first_tok"),
        F.try_element_at(F.array_sort(toks), F.lit(-1)).alias("last_tok"),
        # zip_with index: position-weighted char sum (order-sensitive
        # proof that both engines index identically). Guard the empty
        # array: F.sequence(1, 0) counts DOWN to [1, 0] rather than
        # producing [], which would zip two phantom positions
        F.when(F.size(toks) == 0, F.lit(0).cast("long"))
        .otherwise(
            F.aggregate(
                F.zip_with(
                    toks,
                    F.sequence(F.lit(1), F.size(toks)),
                    lambda t, i: F.length(t).cast("long") * i.cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
        .alias("pos_weighted_chars"),
    )


_COLLECTION_FUNCTIONS_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN length(coalesce(nt, '')) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS w
  FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        FROM documents)
)
SELECT doc_id,
       CAST(len(w) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(w)) AS INTEGER) AS n_unique,
       CAST(len(list_filter(w, t -> length(t) > 4)) AS INTEGER) AS n_long,
       CAST(len(list_filter(w, t -> t LIKE 'z%')) > 0 AS INTEGER) AS has_z,
       CAST(coalesce(list_sum(list_transform(w, t -> length(t))), 0) AS BIGINT)
           AS n_chars_tok,
       coalesce(array_to_string(w[1:3], ' '), '') AS head3,
       list_sort(w)[1] AS first_tok,
       list_sort(w)[-1] AS last_tok,
       CAST(coalesce(list_sum(list_transform(list_zip(w, range(1, len(w) + 1)),
                                             p -> length(p[1]) * p[2])), 0) AS BIGINT)
           AS pos_weighted_chars
FROM base
"""


# ----------------------------------------------------- count–min sketch

_CMS_PROBES = ["join", "dup", "the", "scan", "vector", "quantum"]
# 'dup' is the rare tail (~0.09%), 'quantum' is ABSENT (exact 0 —
# estimate is pure collision mass, a query Misra–Gries cannot answer).


def _q_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min point-frequency estimates vs exact counts over the
    documents token stream (operators/sketches.cms_point_estimates):
    per probe term, the CMS estimate, the exact count, and the
    overshoot — the one-sided error the Cormode–Muthukrishnan theorem
    bounds. A deliberately tight 4x64 sketch over ~28k occurrences in
    31 distinct terms, so collisions genuinely fire and the overshoot
    column is non-trivially positive. The oracle replays the identical
    integer pipeline (portable md5-substring bucket hash, min over
    depths), so the gate proves the sketch math, not just the exact
    side. Sketch relation is structurally <= 256 rows -> broadcast."""
    from nycitibike_data_transform_spark.operators.sketches import (
        cms_point_estimates,
    )
    from nycitibike_data_transform_spark.functions.text import token_array

    t = load(spark, sf_dir, "documents")
    # fan_out before the tokenize explode (OPTIMIZATION_r15, guide
    # §2.6/§6): the token stream is consumed twice (sketch + exact
    # side) and a compact one-file input ran both regex/md5 passes on
    # a single core. Interleaved min at sf0.1: 1.93 s → 0.93 s.
    # No-op at real scale (inputs already wide).
    toks = fan_out(t["documents"]).select(
        F.explode(token_array("text")).alias("term")
    )
    return cms_point_estimates(toks, "term", _CMS_PROBES)


_CMS_SQL = r"""
WITH toks AS (
  SELECT t AS term
  FROM documents,
       unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS u(t)
  WHERE length(t) > 0
),
depths AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS v(d)),
sketch AS (
  SELECT d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || term), 1, 8))::BIGINT % 64 AS bucket,
         count(*) AS n
  FROM toks CROSS JOIN depths
  GROUP BY 1, 2
),
probes AS (
  SELECT * FROM (VALUES ('join'), ('dup'), ('the'), ('scan'), ('vector'), ('quantum')) AS p(term)
),
probe_cells AS (
  SELECT term, d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || term), 1, 8))::BIGINT % 64 AS bucket
  FROM probes CROSS JOIN depths
),
est AS (
  SELECT term, min(coalesce(n, 0)) AS cms_estimate
  FROM probe_cells LEFT JOIN sketch USING (d, bucket)
  GROUP BY 1
),
exact AS (
  SELECT term, count(*) AS exact_count FROM toks
  WHERE term IN ('join', 'dup', 'the', 'scan', 'vector', 'quantum')
  GROUP BY 1
)
SELECT term,
       cms_estimate,
       coalesce(exact_count, CAST(0 AS BIGINT)) AS exact_count,
       cms_estimate - coalesce(exact_count, CAST(0 AS BIGINT)) AS overshoot
FROM est LEFT JOIN exact USING (term)
"""


QUERIES: dict[str, QuerySpec] = {
    "cms_estimates": QuerySpec(_q_cms_estimates, _CMS_SQL),
    "collection_functions": QuerySpec(
        _q_collection_functions, _COLLECTION_FUNCTIONS_SQL
    ),
    "table_profile": QuerySpec(_q_table_profile, _TABLE_PROFILE_SQL),
    "table_profile_approx": QuerySpec(
        _q_table_profile_approx, _TABLE_PROFILE_APPROX_SQL
    ),
    "asof_purchase_click": QuerySpec(_q_asof_purchase_click, _ASOF_SQL),
    "null_semantics": QuerySpec(_q_null_semantics, _NULL_SEMANTICS_SQL),
    "fuzzy_name_pairs": QuerySpec(_q_fuzzy_name_pairs, _FUZZY_SQL),
    "word_frequencies": QuerySpec(_q_word_frequencies, _WORD_FREQUENCIES_SQL),
    "heavy_hitters": QuerySpec(_q_heavy_hitters, _HEAVY_HITTERS_SQL),
    "mg_estimates": QuerySpec(_q_mg_estimates, _MG_ESTIMATES_SQL),
    "range_join_tiers": QuerySpec(_q_range_join_tiers, _RANGE_JOIN_SQL),
    "grouping_sets": QuerySpec(_q_grouping_sets, _GROUPING_SETS_SQL),
    "correlated_subquery": QuerySpec(_q_correlated_subquery, _CORRELATED_SQL),
    "quantiles": QuerySpec(_q_quantiles, _QUANTILES_SQL),
    "dispersion": QuerySpec(_q_dispersion, _DISPERSION_SQL),
    "argmax_orders": QuerySpec(_q_argmax, _ARGMAX_SQL),
    "collect_sorted": QuerySpec(_q_collect_sorted, _COLLECT_SORTED_SQL),
    "unpivot_money": QuerySpec(_q_unpivot, _UNPIVOT_SQL),
    "date_functions": QuerySpec(_q_date_functions, _DATE_FUNCTIONS_SQL),
    "string_functions": QuerySpec(_q_string_functions, _STRING_FUNCTIONS_SQL),
}
