"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementations live in ``nycitibike_data_transform_spark``; this
module is a thin shim over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nycitibike_data_transform_spark.models.rides import stage_rides
from nycitibike_data_transform_spark.queries import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's AUX_TLC_RIDES re-expressed):
    conform-union of 3 heterogeneous feeds + filtered broadcast dim
    joined twice + CASE decode. See models/rides.py."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    lineitem = spark.read.parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    nation = spark.read.parquet(f"{SMOKE_SF_DIR}/nation.parquet")
    region = spark.read.parquet(f"{SMOKE_SF_DIR}/region.parquet")
    return stage_rides(lineitem, nation, region)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.9
    north-star additions)."""
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query — since round 5 EVERY
    registry query has one: sketch operators whose raw outputs are
    engine-specific (minhash/simhash/LSH-ANN/HLL/xxhash sampling)
    emit closed-form invariant verdicts the oracle states exactly
    (containment, recall floors, rtol bounds, split disjointness)."""
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle}
