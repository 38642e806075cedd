"""Core parity queries — SURVEY.md §2.1-§2.4 operator inventory.

Each query exercises reference operators (S/P/U/J rows) on the
driver's testdata; the oracle SQL states identical semantics for
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.decode import payment_type_description
from nycitibike_data_transform_spark.functions.geo import haversine
from nycitibike_data_transform_spark.models.rides import stage_rides
from nycitibike_data_transform_spark.models.zones import location_dim
from nycitibike_data_transform_spark.queries import QuerySpec, load

# ---------------------------------------------------------------- dim model

def _q_location_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rename + P5 replace + broadcast dim join (zones model)."""
    t = load(spark, sf_dir, "nation", "region")
    return location_dim(t["nation"], t["region"])


_LOCATION_DIM_SQL = """
SELECT n.n_nationkey AS location_id,
       n.n_name      AS neighborhood,
       r.r_name      AS borough,
       replace(r.r_name, 'AMERICA', 'AMERICA ZONE') AS service_zone
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""

# ------------------------------------------------------------ flagship query

def _q_stage_rides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: conform-union of 3 heterogeneous feeds + filtered dim
    + double broadcast left join + CASE decode (U1, P2-P8, J1, J2)."""
    t = load(spark, sf_dir, "lineitem", "nation", "region")
    return stage_rides(t["lineitem"], t["nation"], t["region"])


_STAGE_RIDES_SQL = """
WITH dim AS (
  SELECT n.n_nationkey AS location_id,
         n.n_name      AS neighborhood,
         r.r_name      AS borough
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name <> 'AFRICA'
),
feeds AS (
  SELECT l_orderkey AS order_key,
         l_linenumber AS line_number,
         l_shipdate AS pickup_ts,
         l_suppkey % 25 AS pickup_location_id,
         l_partkey % 25 AS dropoff_location_id,
         l_quantity AS quantity,
         l_extendedprice AS fare_amount,
         l_discount AS discount,
         l_tax AS tax,
         l_linenumber AS payment_type,
         CAST(l_suppkey AS VARCHAR) AS vendor_id,
         CAST(NULL AS VARCHAR) AS sr_flag,
         'yellow' AS source
  FROM lineitem WHERE l_returnflag = 'N'
  UNION ALL
  SELECT l_orderkey, l_linenumber, l_shipdate,
         l_suppkey % 25, l_partkey % 25,
         l_quantity, l_extendedprice, l_discount,
         CAST(NULL AS DOUBLE), l_linenumber,
         '', CAST(NULL AS VARCHAR), 'green'
  FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT l_orderkey, l_linenumber, l_shipdate,
         l_suppkey % 25, l_partkey % 25,
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER),
         '', l_linestatus, 'fhv'
  FROM lineitem WHERE l_returnflag = 'A'
)
SELECT f.*,
       pu.borough AS pickup_borough,
       pu.neighborhood AS pickup_neighborhood,
       do_.borough AS dropoff_borough,
       do_.neighborhood AS dropoff_neighborhood,
       CASE f.payment_type
            WHEN 1 THEN 'Credit card'
            WHEN 2 THEN 'Cash'
            WHEN 3 THEN 'No charge'
            WHEN 4 THEN 'Dispute'
            WHEN 5 THEN 'Unknown'
            WHEN 6 THEN 'Voided trip'
       END AS payment_type_desc
FROM feeds f
LEFT JOIN dim pu  ON f.pickup_location_id = pu.location_id
LEFT JOIN dim do_ ON f.dropoff_location_id = do_.location_id
"""

# ------------------------------------------------- filter/projection pushdown

def _q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter → 3-column projection. Catalyst pushes both into
    the parquet scan (PushedFilters + ReadSchema, SURVEY.md §4)."""
    t = load(spark, sf_dir, "orders")
    return (
        t["orders"]
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000.0))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_FILTER_PROJECT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0
"""

# ----------------------------------------------------------------- decode P6

def _q_payment_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE decode incl. out-of-domain -> NULL (linenumber 7), grouped
    count (exact, engine-portable)."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .select(payment_type_description("l_linenumber").alias("payment_desc"))
        .groupBy("payment_desc")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_PAYMENT_DECODE_SQL = """
SELECT CASE l_linenumber
            WHEN 1 THEN 'Credit card'
            WHEN 2 THEN 'Cash'
            WHEN 3 THEN 'No charge'
            WHEN 4 THEN 'Dispute'
            WHEN 5 THEN 'Unknown'
            WHEN 6 THEN 'Voided trip'
       END AS payment_desc,
       count(*) AS n
FROM lineitem
GROUP BY 1
"""

# -------------------------------------------------------------- haversine P9

_HAVERSINE_POINT = (40.75, -73.98)  # midtown reference point


def _synthetic_coords(customer: DataFrame) -> DataFrame:
    """Deterministic pseudo-coordinates in the NYC bbox derived from
    customer keys (testdata has no lat/lng; FIXTURES.md §4 bbox)."""
    return customer.select(
        F.col("c_custkey"),
        (F.lit(40.5) + (F.col("c_custkey") % 45) * F.lit(0.01)).alias("lat"),
        (F.lit(-74.3) + (F.col("c_custkey") % 60) * F.lit(0.01)).alias("lng"),
    )


def _q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intended-semantics Haversine in both units (P9; the reference's
    macro is broken for 'mi', SURVEY.md §2.2 warning b)."""
    t = load(spark, sf_dir, "customer")
    coords = _synthetic_coords(t["customer"])
    lat0, lng0 = (F.lit(v) for v in _HAVERSINE_POINT)
    return coords.select(
        "c_custkey",
        F.round(haversine(F.col("lat"), F.col("lng"), lat0, lng0, "km"), 6).alias("dist_km"),
        F.round(haversine(F.col("lat"), F.col("lng"), lat0, lng0, "mi"), 6).alias("dist_mi"),
    )


_HAVERSINE_SQL = """
WITH coords AS (
  SELECT c_custkey,
         40.5 + (c_custkey % 45) * 0.01 AS lat,
         -74.3 + (c_custkey % 60) * 0.01 AS lng
  FROM customer
)
SELECT c_custkey,
       round(6371.0 * acos(least(1.0, greatest(-1.0,
           cos(radians(lat)) * cos(radians(40.75)) * cos(radians(-73.98) - radians(lng))
         + sin(radians(lat)) * sin(radians(40.75))))), 6) AS dist_km,
       round(3959.0 * acos(least(1.0, greatest(-1.0,
           cos(radians(lat)) * cos(radians(40.75)) * cos(radians(-73.98) - radians(lng))
         + sin(radians(lat)) * sin(radians(40.75))))), 6) AS dist_mi
FROM coords
"""

# ------------------------------------------------------------------- set ops

def _q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 INTERSECT (set semantics): nation keys of customers ∩ suppliers."""
    t = load(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


def _q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 EXCEPT (set semantics): nations with a high-balance customer
    but no high-balance supplier.

    Unfiltered customer-vs-supplier nations is EMPTY at every SF (both
    sides cover all 25 nations), so r1/r2's green hash only proved
    empty==empty (VERDICT r2 "What's wrong" #3). The acctbal > 9000
    filters create a verified asymmetry: 18 rows at sf0.01."""
    t = load(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(
            t["supplier"]
            .filter(F.col("s_acctbal") > 9000)
            .select(F.col("s_nationkey").alias("nationkey"))
        )
    )


_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
EXCEPT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
"""

# ---------------------------------------------------------- semi / anti join

def _q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 left-semi (EXISTS): customers that placed at least one order."""
    t = load(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def _q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 left-anti (NOT EXISTS): customers with no URGENT order.

    The previous shape (parts never ordered) is EMPTY at every SF —
    the generator references every partkey — so its green hash only
    proved empty==empty (VERDICT r2 "What's wrong" #3). Anti-joining
    against the URGENT slice of orders leaves 203 rows at sf0.01:
    the filter lands on the join's build side BEFORE the anti
    semantics, the exact pattern Catalyst pushes into the shuffle."""
    t = load(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""

# ------------------------------------------------------------------ registry

QUERIES: dict[str, QuerySpec] = {
    "location_dim": QuerySpec(_q_location_dim, _LOCATION_DIM_SQL),
    "stage_rides": QuerySpec(_q_stage_rides, _STAGE_RIDES_SQL),
    "filter_project": QuerySpec(_q_filter_project, _FILTER_PROJECT_SQL),
    "payment_decode": QuerySpec(_q_payment_decode, _PAYMENT_DECODE_SQL),
    "haversine": QuerySpec(_q_haversine, _HAVERSINE_SQL),
    "set_intersect": QuerySpec(_q_intersect, _INTERSECT_SQL),
    "set_except": QuerySpec(_q_except, _EXCEPT_SQL),
    "semi_join": QuerySpec(_q_semi_join, _SEMI_JOIN_SQL),
    "anti_join": QuerySpec(_q_anti_join, _ANTI_JOIN_SQL),
}
