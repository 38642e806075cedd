"""Source connectors.

The reference exposes two source shapes:

- **External parquet tables**: globbed GZIP parquet with schema
  autodetect (reference ``terraform/a2_config_second_apply/main.tf:289-306``).
  Spark's parquet reader is the direct equivalent — self-describing
  schema, predicate pushdown, column pruning; gzip codec handled
  natively. Unlike BigQuery external tables (which "cannot be
  partitioned", reference ``main.tf:301-304`` comment), Spark scans
  support partition discovery + dynamic partition pruning for free
  when the lake layout is hive-partitioned — a deliberate upgrade.

- **CSV seeds with forced column types**: the 265-row taxi-zone lookup
  with ``locationid`` forced NUMERIC (reference ``dbt_project.yml:16-21``).
  Spark equivalent: explicit StructType (never ``inferSchema`` in a
  pipeline — a second pass over the data and nondeterministic types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet_source(
    spark: SparkSession,
    path: str | list[str],
    merge_schema: bool = False,
) -> DataFrame:
    """Schema-on-read parquet scan over a path or glob.

    ``merge_schema=True`` reconciles per-file schema drift (the
    autodetect-over-many-files behavior of the reference's external
    tables); leave it off when files are homogeneous — schema merge
    costs a footer read per file at planning time.
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    paths = path if isinstance(path, list) else [path]
    return reader.parquet(*paths)


#: Seed schema for the taxi-zone lookup (reference
#: ``seeds/x_seed_taxi_zone_lookup.csv:1`` header; ``locationid``
#: forced NUMERIC per ``dbt_project.yml:19-21`` — BigQuery NUMERIC is
#: DecimalType(38,9) in Spark).
TAXI_ZONE_LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("locationid", T.DecimalType(38, 9), False),
        T.StructField("borough", T.StringType(), True),
        T.StructField("zone", T.StringType(), True),
        T.StructField("service_zone", T.StringType(), True),
    ]
)


def read_csv_seed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """Load a seed CSV with a declared schema (dbt seed analogue)."""
    return spark.read.csv(path, header=header, schema=schema, mode="FAILFAST")


#: The documents table's schema when delivered as JSONL (the standard
#: LLM-corpus interchange format — one JSON object per line). Not in
#: the reference (no text surface); north-star addition.
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_jsonl_documents(
    spark: SparkSession,
    path: str | list[str],
    strict: bool = False,
) -> DataFrame:
    """Read an LLM document corpus from JSONL (gzip handled natively).

    Declared schema — never ``inferSchema`` in a pipeline (a second
    full pass over 100 TB and nondeterministic types). By default
    malformed lines land in a ``_corrupt_record`` column (PERMISSIVE)
    so a few bad lines in a petabyte crawl don't kill the job and the
    caller can count/quarantine them; ``strict=True`` switches to
    FAILFAST for ingest paths that must stop on corruption.

    Caveat: Spark refuses a query whose only referenced column is the
    internal corrupt-record column straight off a raw JSON scan —
    ``cache()`` the frame (or persist it to parquet) before filtering
    on ``_corrupt_record`` alone.
    """
    mode = "FAILFAST" if strict else "PERMISSIVE"
    schema = DOCUMENTS_JSONL_SCHEMA
    if not strict:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType(), True)]
        )
    # pass the list itself — *unpacking* would send the second path
    # into DataFrameReader.json's schema parameter
    paths = path if isinstance(path, list) else [path]
    return spark.read.schema(schema).option("mode", mode).json(paths)


def write_jsonl_documents(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Write a corpus as JSONL (one object per line), optionally
    repartitioned to a fixed shard count — pair with
    ``shard_manifest``'s deterministic md5 routing for stable export
    layouts."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").json(path)
