"""SparkSession builder tuned for this engine.

The reference delegates all execution to BigQuery (reference
``dbt/nycitibike_transform/profiles.yml:2``); our equivalent of "the
warehouse" is a Catalyst/Tungsten session configured for:

- AQE (runtime re-planning, partition coalescing, skew-join handling),
- UTC session timezone (parity with the DuckDB oracle and with the
  reference's timestamp semantics),
- Arrow for any pandas interchange,
- shuffle partitions sized to the machine, not the 200 default.

On a real cluster the same builder applies — only ``master`` and the
memory sizing change; AQE re-sizes shuffles at runtime so the static
``spark.sql.shuffle.partitions`` is a hint, not a commitment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def get_spark(
    app_name: str = "nycitibike_data_transform_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # ratio-divisible bucket counts (16 ⋈ 8) still join co-located
        # (see bucketing.py) — off by default upstream, no cost when
        # no bucketed tables participate
        .config("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable parity configs to an externally-created
    session (e.g. the driver's). Only touches runtime SQL confs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    return spark
