"""Sink/source format roundtrips (S1/S3 beyond parquet: ORC, JSON,
CSV; compression codecs) — formats the Spark target adds over the
reference's parquet+CSV surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, nation, tmp_path_factory, fmt):
    out = str(tmp_path_factory.mktemp("sink") / fmt)
    writer = nation.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(out)
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        reader = reader.schema(nation.schema)  # no inference in pipelines
        if fmt == "csv":
            reader = reader.option("header", "true")
    back = reader.load(out)
    assert back.schema == nation.schema
    assert sorted(r["n_nationkey"] for r in back.collect()) == sorted(
        r["n_nationkey"] for r in nation.collect()
    )


def test_compressed_parquet_roundtrip(spark, nation, tmp_path_factory):
    """GZIP parquet — the reference's exact lake format
    (``main.tf:298``); zstd as the modern default."""
    for codec in ("gzip", "zstd", "snappy"):
        out = str(tmp_path_factory.mktemp("codec") / codec)
        nation.write.mode("overwrite").option("compression", codec).parquet(out)
        assert spark.read.parquet(out).count() == 25


def test_delta_iceberg_gated(spark, nation, tmp_path):
    """Table formats need jars absent from this environment — the
    failure must be a loud error naming the format (ClassNotFound /
    DATA_SOURCE_NOT_FOUND), not a silent fallback."""
    with pytest.raises(Exception, match="(?i)delta|DATA_SOURCE_NOT_FOUND|ClassNotFound"):
        nation.write.format("delta").save(str(tmp_path / "delta"))
