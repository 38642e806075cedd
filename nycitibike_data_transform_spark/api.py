"""Top-level convenience API — the two-line entry points.

``run_sql`` makes the engine usable as a plain SQL endpoint over the
testdata/lake tables (register once per session, then any ANSI SQL
Catalyst accepts); ``run_query`` dispatches into the named-query
registry the driver uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nycitibike_data_transform_spark.catalog import register_testdata
from nycitibike_data_transform_spark.queries import all_queries


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the testdata tables as views and evaluate a SQL query
    against them (idempotent registration; same Catalyst plan as the
    equivalent DataFrame code)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    register_testdata(spark, sf_dir)
    return spark.sql(sql)


def run_query(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Evaluate a named query from the registry (the same callables the
    driver contract exposes)."""
    registry = all_queries()
    if name not in registry:
        raise KeyError(f"unknown query {name!r}; available: {sorted(registry)}")
    return registry[name].spark(spark, sf_dir)
