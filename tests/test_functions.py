"""Unit tests for the column-function library (SURVEY.md §5.2 layer 1)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.decode import decode, payment_type_description
from nycitibike_data_transform_spark.functions.geo import haversine
from nycitibike_data_transform_spark.functions.text import (
    language_id,
    quality_score_columns,
    text_fingerprint,
    token_count,
)
from nycitibike_data_transform_spark.functions.vectors import cosine_similarity, dot_product


def test_haversine_known_distance(spark):
    # Times Square (40.758, -73.9855) to Empire State (40.7484, -73.9857):
    # ~1.06 km per standard great-circle calculators.
    df = spark.createDataFrame([(40.758, -73.9855, 40.7484, -73.9857)], "a double, b double, c double, d double")
    km = df.select(haversine("a", "b", "c", "d", "km").alias("d")).first()["d"]
    mi = df.select(haversine("a", "b", "c", "d", "mi").alias("d")).first()["d"]
    assert km == pytest.approx(1.067, abs=0.01)
    assert mi == pytest.approx(0.663, abs=0.01)
    assert km / mi == pytest.approx(6371.0 / 3959.0, rel=1e-9)


def test_haversine_identical_points_zero_not_nan(spark):
    df = spark.createDataFrame([(40.7, -74.0)], "lat double, lng double")
    d = df.select(haversine("lat", "lng", F.lit(40.7), F.lit(-74.0), "km").alias("d")).first()["d"]
    # not NaN (the clamp), and ~0 up to acos'ing a double that rounds
    # epsilon below 1.0 (≈9e-5 km of noise)
    assert d == pytest.approx(0.0, abs=1e-3)


def test_haversine_invalid_unit_raises_at_build_time():
    # plan-build-time validation (the dbt raise_compiler_error analogue)
    with pytest.raises(ValueError, match="unit"):
        haversine("a", "b", "c", "d", "furlongs")


def test_payment_decode_domain_and_null(spark):
    df = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6, 7, None]], "pt int")
    got = [r["d"] for r in df.select(payment_type_description("pt").alias("d")).collect()]
    assert got[:6] == ["Credit card", "Cash", "No charge", "Dispute", "Unknown", "Voided trip"]
    assert got[6] is None  # out-of-domain -> NULL
    assert got[7] is None  # NULL -> NULL


def test_decode_empty_mapping_raises():
    with pytest.raises(ValueError):
        decode("x", {})


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("",), ("   ",), ("one",), ("a  b\t c\n",)], "t string"
    )
    got = [r["n"] for r in df.select(token_count("t").alias("n")).collect()]
    assert got == [3, 0, 0, 1, 3]


def test_quality_scores(spark):
    df = spark.createDataFrame([("The cat, and the dog!",)], "t string")
    cols = quality_score_columns(F.col("t"))
    row = df.select(*[c.alias(k) for k, c in cols.items()]).first()
    assert row["n_tokens"] == 5
    assert row["n_chars"] == 21
    assert row["punct_ratio"] == pytest.approx(2 / 21)
    # 'the' twice + 'and' once over 5 tokens
    assert row["stopword_ratio"] == pytest.approx(3 / 5)


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("el gato de la casa el perro",),
            ("der hund und die katze und der vogel",),
            ("xyzzy plugh",),
        ],
        "t string",
    )
    got = [r["lang"] for r in df.select(language_id("t").alias("lang")).collect()]
    assert got == ["en", "es", "de", None]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",), ("other",)], "t string")
    got = [r["f"] for r in df.select(text_fingerprint("t").alias("f")).collect()]
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_vector_math(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>")
    row = df.select(
        dot_product("a", "b").alias("dot"), cosine_similarity("a", "b").alias("cos")
    ).first()
    assert row["dot"] == pytest.approx(32.0)
    assert row["cos"] == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>")
    assert df.select(cosine_similarity("a", "b").alias("c")).first()["c"] is None


def test_scrub_pii(spark):
    from nycitibike_data_transform_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [
            ("contact bob@example.com or visit https://foo.io/x?id=1 now",),
            ("call 5551234567 today",),
            ("clean text stays clean",),
        ],
        "t string",
    )
    got = [r["s"] for r in df.select(scrub_pii("t").alias("s")).collect()]
    assert got[0] == "contact <EMAIL> or visit <URL> now"
    assert got[1] == "call <NUM> today"
    assert got[2] == "clean text stays clean"
