"""Catalog conventions + testdata registration.

The reference encodes a 4-level medallion hierarchy in BigQuery dataset
names — ``{ENV}_{LevelNumeral}_{LevelID}___{descriptor}`` (reference
``README.md:18-29``, ``terraform/terraform.tfvars:47-61``) with two
environments CORE/DEV realized by dataset-name prefixes
(``terraform/a2_config_second_apply/main.tf:239-255``).

Spark mapping: a flat naming convention ``{env}_{layer}__{table}`` over
catalog-registered tables, plus a directory convention for persisted
layers ``{warehouse}/{env}/{layer}/{table}/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYERS = (
    "1_src",
    "2_stg",
    "2_dim",
    "3_prep",
    "4_mart",
)

ENVS = ("core", "dev")

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_name(env: str, layer: str, table: str) -> str:
    """``{env}_{layer}__{table}``, validated against the declared envs
    and layers (mirrors the reference's compile-time validation idiom,
    ``macros/dist_lat_lng.sql:4-5``: fail at plan-build time)."""
    env = env.lower()
    layer = layer.lower()
    if env not in ENVS:
        raise ValueError(f"unknown env {env!r}; expected one of {ENVS}")
    if layer not in LAYERS:
        raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
    return f"{env}_{layer}__{table.lower()}"


def layer_path(warehouse: str, env: str, layer: str, table: str) -> str:
    return f"{warehouse}/{env}/{layer}/{table}"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table, normalizing timestamps.

    The driver's parquet has shipped two temporal encodings across
    rounds: TIMESTAMP(NANOS) (rejected by Spark's vectorized reader —
    read as nanos longs under the legacy conf and truncated to µs) and
    plain timestamp[us] with no timezone (Spark reads TIMESTAMP_NTZ,
    DuckDB reads naive TIMESTAMP). Both are normalized to session-tz
    TIMESTAMP here — the session tz is pinned to UTC, so the wall-clock
    values are bit-identical to DuckDB's naive reading and every
    downstream instant function (unix_micros, window, watermark) works
    unchanged.

    SIDE EFFECT (ADVICE r4): this sets ``spark.sql.session.timeZone``
    to UTC and ``spark.sql.legacy.parquet.nanosAsLong`` on the WHOLE
    session, not just this read — required because the external driver
    hands us an arbitrarily-configured session at query time, and the
    oracle contract needs UTC wall clocks everywhere. Library callers
    who depend on a non-UTC session timezone should re-set it after
    loading (timestamps loaded here are already wall-clock-normalized
    and stay correct either way)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        kind = field.dataType.simpleString()
        if name == "events" and field.name == "ts" and kind == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif kind == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver-generated parquet table (TESTDATA.md) keyed
    by table name."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for the SQL API)
    and return the DataFrames. Idempotent."""
    dfs = load_testdata(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
