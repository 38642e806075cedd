"""OPTIMIZATION_r15 regression pins: the compact-input fan-out paths
and the conf hygiene of the stream-scoped state-partition override.

The fan_out moves are pure parallelism changes — these tests pin (a)
the fan actually happens at the shared choke points (a future refactor
that drops it would silently serialize every tokenize consumer again),
(b) results are unchanged, and (c) the temporary shuffle-partition
override inside streaming_source_mix never leaks into the session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.dedup import tokenize
from nycitibike_data_transform_spark.operators.spans import _spans_with_positions


def _compact_docs(spark):
    rows = [(i, f"alpha beta gamma delta epsilon tok{i}") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)


def test_tokenize_fans_out_compact_input(spark):
    docs = _compact_docs(spark)
    assert docs.rdd.getNumPartitions() == 1
    toks = tokenize(docs, "text")
    assert (
        toks.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    ), "tokenize must widen a compact input to cluster parallelism"
    # same rows as the unfanned formulation
    from nycitibike_data_transform_spark.functions.text import token_array

    expect = sorted(
        docs.withColumn("tokens", token_array("text")).collect(),
        key=lambda r: r["doc_id"],
    )
    got = sorted(toks.collect(), key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["tokens"]) for r in got] == [
        (r["doc_id"], r["tokens"]) for r in expect
    ]


def test_tokenize_noop_on_wide_input(spark):
    wide = _compact_docs(spark).repartition(spark.sparkContext.defaultParallelism + 2)
    toks = tokenize(wide, "text")
    # already at/above target parallelism: fan_out must not add a shuffle
    assert toks.rdd.getNumPartitions() == wide.rdd.getNumPartitions()


def test_spans_base_fans_out_compact_input(spark):
    docs = _compact_docs(spark)
    base, spans = _spans_with_positions(docs, 3, "doc_id", "text")
    assert (
        base.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    ), "span tokenization must widen a compact input"
    # position stream is unchanged: one row per window, 1-based pos
    n_tok = 6  # every doc has 6 tokens
    per_doc = n_tok - 3 + 1
    assert spans.count() == 50 * per_doc
    pos_bounds = spans.agg(
        F.min("pos").alias("lo"), F.max("pos").alias("hi")
    ).first()
    assert (pos_bounds["lo"], pos_bounds["hi"]) == (1, per_doc)


def test_streaming_source_mix_restores_shuffle_partitions(spark, sf_dir):
    from nycitibike_data_transform_spark.queries.llmdata import (
        _q_streaming_source_mix,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = _q_streaming_source_mix(spark, sf_dir)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before, (
        "the stream-scoped state-partition override must restore the "
        "session conf"
    )
    assert out.count() > 0


def test_quantiles_array_percentile_matches_scalar(spark):
    rows = [(flag, float(v)) for flag in ("A", "B") for v in range(1, 101)]
    df = spark.createDataFrame(rows, "flag string, x double")
    arr = (
        df.groupBy("flag")
        .agg(F.expr("percentile(x, array(0.5D, 0.9D, 0.99D))").alias("ps"))
        .select(
            "flag",
            F.round(F.col("ps")[0], 6).alias("p50"),
            F.round(F.col("ps")[1], 6).alias("p90"),
            F.round(F.col("ps")[2], 6).alias("p99"),
        )
    )
    scalar = df.groupBy("flag").agg(
        F.round(F.expr("percentile(x, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(x, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(x, 0.99)"), 6).alias("p99"),
    )
    assert sorted(map(tuple, arr.collect())) == sorted(
        map(tuple, scalar.collect())
    )
