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

    The ``events`` table carries TIMESTAMP(NANOS) parquet timestamps,
    which Spark's vectorized reader rejects; we read them as nanos
    longs and truncate to microsecond timestamps (identical to what
    DuckDB's ns→µs cast does on the oracle side)."""
    from nycitibike_data_transform_spark.catalog import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    names = tables or TESTDATA_TABLES
    return {t: load_table(spark, sf_dir, t) for t in names}


def all_queries() -> dict[str, QuerySpec]:
    from nycitibike_data_transform_spark.queries import advanced, core, events, llmdata, marts

    merged: dict[str, QuerySpec] = {}
    for mod in (core, marts, advanced, events, llmdata):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    return merged
