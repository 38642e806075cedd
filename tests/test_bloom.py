"""Bloom prefilter: no false negatives ever, FPR within the sizing
bound, and losslessness as a prefilter in front of an exact join."""

from __future__ import annotations

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
)


def test_no_false_negatives(spark):
    keys = spark.range(0, 2_000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    bloom = bloom_build(keys, "k", m_bits=1 << 16)
    assert bloom_prefilter(keys, "k", bloom).count() == 2_000


def test_false_positive_rate_within_bound(spark):
    members = spark.range(0, 2_000).select(
        F.concat(F.lit("in_"), F.col("id")).alias("k")
    )
    # m = 2^16 bits for n = 2000 keys, k = 7 -> theoretical FPR ~0.1%
    bloom = bloom_build(members, "k", m_bits=1 << 16)
    outsiders = spark.range(0, 20_000).select(
        F.concat(F.lit("out_"), F.col("id")).alias("k")
    )
    fp = bloom_prefilter(outsiders, "k", bloom).count()
    assert fp / 20_000 < 0.01  # order-of-magnitude headroom over theory


def test_lossless_prefilter_before_exact_join(spark, sf_dir):
    """prefilter -> exact semi-join must equal the plain exact
    semi-join — the no-false-negative property applied to the
    decontaminate/span shuffle-cut pattern."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = docs.select(F.col("source").alias("k")).distinct().limit(2)
    corpus = docs.select("doc_id", F.col("source").alias("k"))
    bloom = bloom_build(probe, "k", m_bits=1 << 10)
    plain = set(
        r["doc_id"]
        for r in corpus.join(probe, "k", "left_semi").collect()
    )
    prefiltered = set(
        r["doc_id"]
        for r in bloom_prefilter(corpus, "k", bloom)
        .join(probe, "k", "left_semi")
        .collect()
    )
    assert prefiltered == plain
    assert plain  # non-vacuous


def test_null_keys_never_match(spark):
    members = spark.createDataFrame([("a",), ("b",)], "k string")
    bloom = bloom_build(members, "k", m_bits=1 << 8)
    probe = spark.createDataFrame([("a",), (None,)], "k string")
    got = bloom_prefilter(probe, "k", bloom).collect()
    assert [r["k"] for r in got] == ["a"]


def test_rejects_unaligned_m_bits(spark):
    import pytest

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "k", m_bits=100)


def test_plan_is_scalar_broadcast_no_shuffle(spark):
    """The membership test must add zero SHUFFLE exchanges — the
    bitset rides a 1-row broadcast (scalar-broadcast shape) and each
    probe is an element_at into the array attribute."""
    from nycitibike_data_transform_spark.plans import count_exchanges

    members = spark.range(100).select(F.col("id").cast("string").alias("k"))
    bloom = bloom_build(members, "k", m_bits=1 << 10)
    probe = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    filtered = bloom_prefilter(probe, "k", bloom)
    assert count_exchanges(filtered) == 0


def test_decontaminate_bloom_prefilter_identical_results(spark, sf_dir):
    """flag_contaminated(bloom_prefilter=True) must return exactly the
    plain shuffle tier's rows — the lossless-prefilter contract on the
    real operator."""
    from nycitibike_data_transform_spark.catalog import load_table
    from nycitibike_data_transform_spark.operators.dedup import flag_contaminated

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    plain = sorted(
        map(tuple, flag_contaminated(docs, bench, method="shuffle").collect())
    )
    pre = sorted(
        map(
            tuple,
            flag_contaminated(
                docs, bench, method="shuffle", bloom_prefilter=True
            ).collect(),
        )
    )
    assert pre == plain
    assert any(r[2] == 1 for r in plain)  # non-vacuous: contamination exists
