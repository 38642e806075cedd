"""Compression-ratio quality signal (operators/compression.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.compression import (
    ratio_verdict,
    zlib_ratio,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetitive_text_compresses_far_better_than_prose(spark):
    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "zebras quietly examine forty juicy peaches beside the river "
        "under a waxing gibbous moon in late autumn twilight today"
    )
    df = _frame(
        spark,
        [(1, "spam " * 200), (2, prose)],
    ).select("doc_id", zlib_ratio(F.col("text")).alias("r"))
    out = {r["doc_id"]: r["r"] for r in df.collect()}
    assert out[1] < out[2] / 3  # repetition compresses dramatically better
    assert 0 < out[1] < 0.1
    assert 0.3 < out[2] <= 1.1


def test_null_and_empty_text_get_null_ratio_and_verdict(spark):
    df = _frame(spark, [(1, None), (2, ""), (3, "hello world")])
    out = {
        r["doc_id"]: (r["r"], r["ok"])
        for r in df.select(
            "doc_id",
            zlib_ratio(F.col("text")).alias("r"),
            ratio_verdict(F.col("text"), zlib_ratio(F.col("text"))).alias("ok"),
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (None, None)
    assert out[3][0] > 0 and out[3][1] is True


def test_verdict_true_across_testdata(spark, sf_dir):
    from nycitibike_data_transform_spark.queries import all_queries

    out = all_queries()["compression_signal"].spark(spark, sf_dir)
    assert out.filter(F.col("ratio_ok") == False).count() == 0  # noqa: E712
