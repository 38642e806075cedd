"""TPC-H-shape relational suite — subquery & decorrelation surface.

The reference's declared-but-empty MART layer (reference
``README.md:28-29``, ``terraform.tfvars:59-60``) is an analysis-query
surface; ``queries/marts.py`` built the aggregation half (Q1/Q3/Q5/
Q6/Q7/Q10/Q21 shapes). This module completes the classic relational
patterns a user of a warehouse engine runs daily — every flavor of
subquery, each DE-CORRELATED into the scalable Spark plan while the
DuckDB oracle keeps the textbook correlated/nested formulation, so
the correctness gate itself proves each rewrite exact:

- Q4  shape: EXISTS           → semi-join with a compound condition
- Q9  shape: multi-dim star   → profit expression over 4 joins
- Q11 shape: HAVING vs global → 1-row scalar aggregate, broadcast
- Q13 shape: LEFT JOIN + double aggregation (distribution of counts)
- Q14 shape: conditional aggregation ratio (CASE inside SUM)
- Q15 shape: agg = scalar max  → 1-row max, broadcast equality join
- Q17 shape: correlated AVG    → per-key pre-aggregate + rejoin
- Q18 shape: IN over grouped HAVING → single aggregation reused
- Q19 shape: OR-of-ANDs join predicate → pushdown-friendly prescreen
- Q22 shape: scalar subquery + NOT EXISTS → broadcast scalar + anti-join

Determinism notes (the repo-wide contract in ``queries/__init__``):
quantities are integral (verified: 0 non-integer at sf0.01) and money
columns are 2-decimal, so every aggregate and every threshold
comparison below runs on exact fixed-point longs / DECIMALs — the
oracles use the same exact predicates inside their correlated
formulations, never a floating comparison that could flip at a
boundary.

100 TB posture: nation/region are constant-size (broadcast pinned);
part/supplier/customer scale with the corpus, so their joins are left
to AQE (broadcast at test scale, shuffle at warehouse scale). Scalar
aggregates (Q11/Q15/Q22) produce 1-row frames — broadcast cross joins
of metadata size at any scale. No correlated re-scan anywhere: every
textbook correlated subquery is computed once as a keyed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.money import (
    fast_money_sum,
    fast_revenue_sum,
    to_units,
    units_to_amount,
)
from nycitibike_data_transform_spark.queries import QuerySpec, load


def _rev_units(price: str = "l_extendedprice", discount: str = "l_discount") -> F.Column:
    """price·(1−discount) in exact 10^-4 fixed-point units."""
    return to_units(price, 2) * (F.lit(100) - to_units(discount, 2))


def _qty_long(col: str = "l_quantity") -> F.Column:
    """Integral quantity stored as double → exact long."""
    return F.col(col).cast("long")


# --------------------------------------------------- Q4: EXISTS → semi-join

def _q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (in a date window) with at least one
    line item shipped > 60 days after the order date, counted per
    priority. The textbook EXISTS becomes one LEFT SEMI join whose
    condition spans both sides (orderkey equality + the late-ship
    inequality) — one shuffle on orderkey, no re-scan per order."""
    t = load(spark, sf_dir, "orders", "lineitem")
    window = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = window.join(
        t["lineitem"],
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_ORDER_PRIORITY_SQL = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate <  DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
ORDER BY 1
"""

# ------------------------------------- Q13: outer join + double aggregation

def _q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer 1995 order
    counts. The date predicate lives in the LEFT JOIN condition (not a
    WHERE — that would drop zero-order customers, 326 of them at
    sf0.01), then two aggregations: per-customer count, then the
    histogram of those counts. Both shuffles are on shrinking domains
    (customers, then distinct counts)."""
    t = load(spark, sf_dir, "customer", "orders")
    o95 = t["orders"].select("o_custkey", "o_orderkey", "o_orderdate")
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(
            o95,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_CUSTOMER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderdate >= DATE '1995-01-01'
   AND o.o_orderdate <  DATE '1996-01-01'
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""

# -------------------------------------- Q14: conditional aggregation ratio

def _q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of March-1996 revenue from ECONOMY-type
    parts — CASE inside SUM, one join, one global aggregate. Revenue
    accumulates in exact 10^-4 units; the share is one IEEE division
    of two exact doubles, rounded to 6 (repo convention for derived
    ratios). The part join is AQE-sized (broadcast at test scale;
    part grows with the corpus, so not pinned)."""
    t = load(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    joined = li.join(
        t["part"].select("p_partkey", "p_type"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    units = _rev_units()
    agg = joined.agg(
        units_to_amount(
            F.sum(F.when(F.col("p_type") == "ECONOMY", units).otherwise(F.lit(0))), 4
        ).alias("promo_revenue"),
        units_to_amount(F.sum(units), 4).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6).alias(
            "promo_share_pct"
        ),
        "n_items",
    )


_PROMO_REVENUE_SQL = """
WITH agg AS (
  SELECT
    CAST(CAST(sum(CASE WHEN p.p_type = 'ECONOMY'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS promo_revenue,
    CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE)
        AS total_revenue,
    count(*) AS n_items
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= DATE '1996-03-01'
    AND l.l_shipdate <  DATE '1996-04-01'
)
SELECT promo_revenue, total_revenue,
       round(100.0 * promo_revenue / total_revenue, 6) AS promo_share_pct,
       n_items
FROM agg
"""

# -------------------------------- Q15: aggregate equals a scalar maximum

def _q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose Q1-1996 revenue equals the
    maximum. The textbook correlated ``= (SELECT max(...) FROM view)``
    becomes: aggregate once, take the 1-row max, broadcast it back as
    an equality filter. Comparison happens on exact long units —
    double equality would be exact here too (same integers), but units
    keep the plan integer-only until the final projection."""
    t = load(spark, sf_dir, "lineitem", "supplier")
    per_supp = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_units()).alias("units"))
    )
    mx = per_supp.agg(F.max("units").alias("mx"))
    return (
        per_supp.join(F.broadcast(mx), F.col("units") == F.col("mx"))
        .join(
            t["supplier"].select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            units_to_amount(F.col("units"), 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate <  DATE '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_revenue
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total = (SELECT max(total) FROM rev)
ORDER BY s_suppkey
"""

# --------------------------- Q17: correlated AVG → per-key pre-aggregate

def _q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from Brand#17 line items whose
    quantity is below 20% of that part's average quantity. The
    correlated AVG subquery is computed ONCE as a per-part (count,
    sum) aggregate — restricted by semi-join to the brand's parts so
    the aggregate only touches needed groups — then rejoined. The
    threshold test is exact integer arithmetic:
    qty < 0.2·(sum/n)  ⇔  5·qty·n < sum  (quantities are integral).
    The oracle keeps two correlated scalar subqueries with the same
    exact predicate."""
    t = load(spark, sf_dir, "lineitem", "part")
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#17").select("p_partkey")
    li_brand = t["lineitem"].join(
        brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    per_part = li_brand.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum(_qty_long()).alias("sum_qty"),
    )
    qualified = li_brand.join(
        per_part.withColumnRenamed("l_partkey", "pp_key"),
        F.col("l_partkey") == F.col("pp_key"),
    ).filter(F.lit(5) * _qty_long() * F.col("n_li") < F.col("sum_qty"))
    return qualified.agg(
        F.round(fast_money_sum("l_extendedprice") / F.lit(7.0), 6).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_SMALL_QTY_REVENUE_SQL = """
SELECT round(CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) / 7.0, 6)
         AS avg_yearly,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#17'
  AND 5 * CAST(l.l_quantity AS BIGINT)
        * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      < (SELECT sum(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
"""

# ------------------------------ Q18: IN over grouped HAVING, agg reused

def _q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 200, with
    their customers, top-100 by order value. The textbook
    ``IN (GROUP BY ... HAVING)`` + outer re-aggregation collapses to
    ONE per-order aggregate reused for both the filter and the output
    column — the oracle keeps the double-scan textbook form, proving
    the reuse exact. Quantity sums are exact longs."""
    t = load(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_qty_long()).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_LARGE_VOLUME_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY 1
                       HAVING sum(CAST(l_quantity AS BIGINT)) > 200)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""

# --------------------------- Q19: OR-of-ANDs predicate with prescreens

def _q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/
    quantity conjunctions. The plan point: the partkey equi-join is
    hoisted out of the disjunction, and the IMPLIED top-level
    predicates (quantity ∈ [1,30], size ≤ 25, brand ∈ {12,23,24}) are
    prescreened on each side so they reach the parquet scans as
    pushed filters — the residual OR evaluates post-join on the small
    survivor set."""
    t = load(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(F.col("l_quantity").between(1, 30))
    pt = t["part"].filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#24")
        & (F.col("p_size") <= 25)
    )
    joined = li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        fast_revenue_sum("l_extendedprice", "l_discount").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_DISJUNCTIVE_SQL = """
SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE)
         AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 20 AND 30)
"""

# ------------------- Q22: scalar subquery + NOT EXISTS → anti-join

def _q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    who never placed an URGENT order, summarized per nation. Textbook
    form = scalar AVG subquery + NOT EXISTS; here the scalar becomes a
    1-row (Σ units, count) aggregate broadcast into an EXACT integer
    comparison (bal > avg ⇔ bal_units·n > Σunits — no float
    boundary), and the NOT EXISTS becomes a LEFT ANTI join against
    the urgent-order custkeys. Nation attaches via pinned broadcast
    (constant 25 rows)."""
    t = load(spark, sf_dir, "customer", "orders", "nation")
    cust = t["customer"]
    pos_stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(to_units("c_acctbal")).alias("sum_units"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = cust.join(F.broadcast(pos_stats)).filter(
        to_units("c_acctbal") * F.col("n_pos") > F.col("sum_units")
    )
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    idle = rich.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        idle.join(
            F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fast_money_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("nation_name")
    )


_IDLE_RICH_SQL = """
SELECT n.n_name AS nation_name, count(*) AS numcust,
       CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(c.c_acctbal AS DECIMAL(18,2))
        * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
         WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
ORDER BY 1
"""

# ------------------------------ Q9: profit expression over a 4-way star

def _q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per (supplier nation, ship year) profit on
    gizmo parts, profit = price·(1−disc) − retailprice·qty (this
    schema has no partsupp/supplycost; retailprice·qty is the cost
    leg). The whole expression folds into ONE exact 10^-4 fixed-point
    unit sum — no decimal allocation per row. Nation broadcast pinned
    (constant); part/supplier joins AQE-sized."""
    t = load(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    gizmo = (
        t["part"]
        .filter(F.col("p_name").like("%gizmo%"))
        .select("p_partkey", "p_retailprice")
    )
    profit_units = _rev_units() - to_units("p_retailprice", 2) * _qty_long() * F.lit(
        100
    )
    return (
        t["lineitem"]
        .join(gizmo, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("l_shipdate").cast("int").alias("profit_year"),
        )
        .agg(
            units_to_amount(F.sum(profit_units), 4).alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_PROFIT_SQL = """
SELECT n.n_name AS nation_name,
       CAST(year(l.l_shipdate) AS INTEGER) AS profit_year,
       CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS profit,
       count(*) AS n_items
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%gizmo%'
GROUP BY 1, 2
"""

# ----------------------- Q11: HAVING against a global scalar aggregate

def _q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds 1.3× the average
    part's revenue (the textbook fixed fraction is scale-dependent;
    an average-multiple keeps the query meaningful at every sf). The
    global scalar (Σ value, #parts) is a 1-row aggregate of the
    ALREADY-GROUPED frame — metadata-sized at any scale — broadcast
    back as a filter. The threshold compares in DECIMAL(38,0) so the
    products stay exact even when units·n_parts would overflow int64
    at extreme scale (the per-part frame is small, so the decimal
    comparison is off the hot path)."""
    t = load(spark, sf_dir, "lineitem")
    pv = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.sum(_rev_units()).alias("value_units"))
    )
    scal = pv.agg(
        F.sum(F.col("value_units").cast("decimal(38,0)")).alias("tot_units"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.join(F.broadcast(scal))
        .filter(
            F.col("value_units").cast("decimal(38,0)") * F.col("n_parts") * F.lit(10)
            > F.col("tot_units") * F.lit(13)
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            units_to_amount(F.col("value_units"), 4).alias("part_value"),
        )
    )


_IMPORTANT_PARTS_SQL = """
WITH pv AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS v
  FROM lineitem
  GROUP BY 1
)
SELECT l_partkey AS partkey, CAST(v AS DOUBLE) AS part_value
FROM pv
WHERE v * (SELECT count(*) FROM pv) * 10 > (SELECT sum(v) FROM pv) * 13
"""


QUERIES: dict[str, QuerySpec] = {
    "order_priority_check": QuerySpec(_q_order_priority_check, _ORDER_PRIORITY_SQL),
    "customer_distribution": QuerySpec(
        _q_customer_distribution, _CUSTOMER_DISTRIBUTION_SQL
    ),
    "promo_revenue": QuerySpec(_q_promo_revenue, _PROMO_REVENUE_SQL),
    "top_supplier": QuerySpec(_q_top_supplier, _TOP_SUPPLIER_SQL),
    "small_qty_revenue": QuerySpec(_q_small_qty_revenue, _SMALL_QTY_REVENUE_SQL),
    "large_volume_customers": QuerySpec(_q_large_volume_customers, _LARGE_VOLUME_SQL),
    "disjunctive_revenue": QuerySpec(_q_disjunctive_revenue, _DISJUNCTIVE_SQL),
    "idle_rich_customers": QuerySpec(_q_idle_rich_customers, _IDLE_RICH_SQL),
    "profit_by_nation_year": QuerySpec(_q_profit_by_nation_year, _PROFIT_SQL),
    "important_parts": QuerySpec(_q_important_parts, _IMPORTANT_PARTS_SQL),
}
