"""Deterministic sampling/splitting semantics."""

from __future__ import annotations

import pytest

from nycitibike_data_transform_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
)


def test_hash_sample_deterministic_and_roughly_sized(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = {r["doc_id"] for r in hash_sample(docs, 0.2, "doc_id").collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, 0.2, "doc_id").collect()}
    assert s1 == s2  # re-run identical
    assert 0.1 < len(s1) / docs.count() < 0.3
    # larger fraction is a superset (monotone in the same hash order)
    s_half = {r["doc_id"] for r in hash_sample(docs, 0.5, "doc_id").collect()}
    assert s1 <= s_half


def test_train_test_split_disjoint_exhaustive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train, test = train_test_split(docs, "doc_id", test_fraction=0.25)
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == docs.count()
    assert 0.15 < len(te) / docs.count() < 0.35


def test_stratified_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    keep_all, drop_all = langs[0], langs[1]
    out = stratified_sample(docs, "lang", {keep_all: 1.0, drop_all: 0.0}, "doc_id")
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got == {keep_all}  # 1.0-stratum fully kept, 0.0 and unlisted dropped
    assert out.filter(out.lang == keep_all).count() == docs.filter(docs.lang == keep_all).count()


def test_validation():
    with pytest.raises(ValueError):
        train_test_split(None, "id", test_fraction=1.5)
    with pytest.raises(ValueError):
        hash_sample(None, -0.1, "id")
    with pytest.raises(ValueError):
        stratified_sample(None, "lang", {"en": 2.0}, "id")


def test_weighted_sample_prefers_heavy_rows(spark):
    from nycitibike_data_transform_spark.operators.sampling import weighted_sample

    rows = [(i, 1) for i in range(200)] + [(1000 + i, 100_000) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    picked = {r["doc_id"] for r in weighted_sample(df, "weight", 10, "doc_id").collect()}
    # weight ratio 1e5:1 — the ten heavy rows dominate the top-10
    assert sum(1 for d in picked if d >= 1000) >= 9


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    from nycitibike_data_transform_spark.operators.sampling import weighted_sample

    rows = [(i, (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    a = [tuple(r) for r in weighted_sample(df, "weight", 50, "doc_id").collect()]
    b = [tuple(r) for r in weighted_sample(df.repartition(13), "weight", 50, "doc_id").collect()]
    assert sorted(a) == sorted(b) and len(a) == 50


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from nycitibike_data_transform_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, None), (4, 10)], "doc_id long, weight long"
    )
    picked = [r["doc_id"] for r in weighted_sample(df, "weight", 10, "doc_id").collect()]
    assert picked == [4]
