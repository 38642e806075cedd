"""Dedup skew stress — measures the r1 VERDICT's hot-shingle hazard.

Replicating every document K times multiplies each shingle's document
frequency by K, so the exact tier's shingle self-join does K² the
pair work (the skew pathology: one hot shingle ⇒ one quadratic
reducer), while the blocked tier (MinHash banding → per-pair
array_intersect verification) only grows with the number of TRUE
near-dup pairs. This harness times both on a K× replica of
sf0.1/documents (min-of-2 fresh plans, first-execution timing — AQE
caches materialized stages per DataFrame instance).

Usage: python tools/stress_dedup.py [K] [scratch_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.dedup import ngram_jaccard_pairs
from nycitibike_data_transform_spark.session import get_spark


def build(spark, factor: int, base: str) -> None:
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = docs
    for i in range(1, factor):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    big.repartition(32).write.mode("overwrite").parquet(f"{base}/documents.parquet")


def time_fresh(spark, base: str, mode: str, runs: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), -1
    for _ in range(runs):
        df = ngram_jaccard_pairs(
            spark.read.parquet(f"{base}/documents.parquet"), mode=mode
        )
        t0 = time.time()
        rows = df.count()
        best = min(best, time.time() - t0)
    return best, rows


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_dedup_{factor}x"
    spark = get_spark("stress-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{base}/documents.parquet"):
        build(spark, factor, base)

    # warmup: JIT + page cache
    ngram_jaccard_pairs(spark.read.parquet(f"{base}/documents.parquet")).count()

    out = {"factor": factor}
    for mode in ("blocked", "exact"):
        sec, rows = time_fresh(spark, base, mode)
        out[mode] = {"sec": round(sec, 2), "pairs": rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
