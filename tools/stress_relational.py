"""Scaling stress for the relational (TPC-H-shape) suite.

Builds a K× replica of sf0.1's FACT tables — lineitem and orders with
orderkeys shifted per copy (custkey/partkey/suppkey unchanged, so the
dimension tables stay 1× and per-dimension fan-in grows K×, the
realistic warehouse growth mode) — then times the FIRST execution of
a fresh plan per query at 1× and K×.

What "passes": every query should grow ≈K (linear in facts), never
≈K². The interesting bars:

- supplier_wait / large_volume_customers: per-ORDER aggregates — the
  order domain itself grows K×, so the dedup/HAVING shuffles carry K×
  groups. Linear growth shows the de-correlated single-aggregate
  formulations never re-scan per order.
- small_qty_revenue: the per-part (count, sum) pre-aggregate sees K×
  rows per part; linear growth shows the decorrelated rejoin never
  multiplies (the correlated form would re-scan lineitem per row).
- important_parts / top_supplier / idle_rich_customers: the scalar
  (1-row) aggregates must stay scalar — any accidental re-computation
  per row would blow past K.
- customer_distribution: the per-customer count domain is fixed (1×
  customers), only counts grow.

Measured at K=10 (60M lineitem rows, 2026-08-14): all thirteen
queries ≤3.6× wall at 10× data — order_priority_check 2.27×,
customer_distribution 0.15×, promo_revenue 1.0×, top_supplier 1.96×,
small_qty_revenue 3.55×, large_volume_customers 3.0×,
disjunctive_revenue 0.8×, idle_rich_customers 2.44×,
profit_by_nation_year 0.62×, important_parts 1.38×, supplier_wait
2.03×, pricing_summary 0.39×, revenue_by_nation 2.11×. The first run
caught supplier_wait at 17.3× (its two consumers recomputed the
lineitem⋈orders join, with a countDistinct Expand on top) — fixed by
the single-pass window rewrite in queries/marts.py; the ratio above
is the post-fix shape.

Usage: python tools/stress_relational.py [K] [scratch_dir]
Prints one JSON line with per-query [t_1x, t_Kx, ratio].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.queries import all_queries
from nycitibike_data_transform_spark.session import get_spark

QUERIES = (
    "order_priority_check",
    "customer_distribution",
    "promo_revenue",
    "top_supplier",
    "small_qty_revenue",
    "large_volume_customers",
    "disjunctive_revenue",
    "idle_rich_customers",
    "profit_by_nation_year",
    "important_parts",
    "supplier_wait",
    "pricing_summary",
    "revenue_by_nation",
)

_SHIFT = 1_000_000_000
_COPY_TABLES = ("region", "nation", "customer", "supplier", "part", "events")


def build(spark, factor: int, base: str) -> None:
    src = "/root/testdata/sf0.1"
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    od = spark.read.parquet(f"{src}/orders.parquet")
    big_li, big_od = li, od
    for i in range(1, factor):
        shift = F.lit(i * _SHIFT)
        big_li = big_li.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + shift)
        )
        big_od = big_od.unionByName(
            od.withColumn("o_orderkey", F.col("o_orderkey") + shift)
        )
    big_li.repartition(32).write.mode("overwrite").parquet(f"{base}/lineitem.parquet")
    big_od.repartition(32).write.mode("overwrite").parquet(f"{base}/orders.parquet")
    for t in _COPY_TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{base}/{t}.parquet"
        )


def time_fresh(spark, sf_dir: str, name: str, runs: int = 2) -> float:
    q = all_queries()[name]
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_rel_{factor}x"
    spark = get_spark("stress_relational")
    if not os.path.exists(f"{base}/lineitem.parquet"):
        build(spark, factor, base)
    n = spark.read.parquet(f"{base}/lineitem.parquet").count()
    out = {"factor": factor, "lineitem_rows": n, "queries": {}}
    for name in QUERIES:
        t1 = time_fresh(spark, "/root/testdata/sf0.1", name)
        tk = time_fresh(spark, base, name)
        out["queries"][name] = {
            "t_1x": t1,
            f"t_{factor}x": tk,
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
