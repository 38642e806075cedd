"""Misra–Gries heavy hitters: bounded-state candidates, exact output."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.sketches import (
    cms_point_estimates,
    cms_table,
    _mg_add,
    heavy_hitters,
    mg_sketch_partitions,
)
from nycitibike_data_transform_spark.plans import count_exchanges, formatted_plan


def _exact_over_threshold(rows: list, k: int) -> dict:
    counts: dict = {}
    for v in rows:
        if v is not None:
            counts[v] = counts.get(v, 0) + 1
    n = sum(counts.values())
    return {v: c for v, c in counts.items() if c * k > n}


def _zipfish(n: int) -> list[int]:
    # deterministic skewed stream: item i appears ~n/2^(i+1) times —
    # a few giants over a long tail, far more distinct values than
    # the sketch size used against it
    out: list[int] = []
    i, remaining = 0, n
    while remaining > 0:
        block = max(1, remaining // 2)
        out.extend([i] * block)
        remaining -= block
        i += 1
    # interleave deterministically so giants span every partition
    idx = sorted(range(len(out)), key=lambda j: (j * 2654435761) % 1000003)
    return [out[j] for j in idx]


def test_heavy_hitters_exact_on_skewed_stream(spark):
    data = _zipfish(4096)
    df = spark.createDataFrame([(v,) for v in data], "v int").repartition(8)
    got = {r["v"]: r["n"] for r in heavy_hitters(df, "v", k=16, sketch_size=16).collect()}
    assert got == _exact_over_threshold(data, 16)
    assert got  # non-vacuous: the stream has giants above n/16


def test_heavy_hitters_sketch_is_genuinely_bounded(spark):
    # distinct values ≈ log2(n) giants + tail >> sketch_size would be
    # trivial; use uniform tail to force decrements, then check the
    # candidate relation really is ≤ partitions × sketch_size rows
    data = _zipfish(2048) + list(range(1000, 1400))
    df = spark.createDataFrame([(v,) for v in data], "v int").repartition(4)
    summaries = mg_sketch_partitions(df, "v", 8)
    per_part = (
        summaries.filter(F.col("v").isNotNull())
        .groupBy(F.spark_partition_id())
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_part <= 8
    got = {r["v"]: r["n"] for r in heavy_hitters(df, "v", k=8, sketch_size=8).collect()}
    assert got == _exact_over_threshold(data, 8)


def test_mg_add_error_bound():
    import pandas as pd

    data = _zipfish(1000)
    counters: dict = {}
    subtracted = 0
    for i in range(0, len(data), 100):  # 10 Arrow-batch-sized folds
        batch = pd.Series(data[i : i + 100]).value_counts()
        subtracted += _mg_add(counters, batch, 12)
    # classic MG bound: total decrement ≤ n/(k+1); estimates undercount
    # truth by at most the total decrement
    assert subtracted <= len(data) / 13
    truth: dict = {}
    for v in data:
        truth[v] = truth.get(v, 0) + 1
    for v, est in counters.items():
        assert 0 <= truth[v] - est <= subtracted


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=300),
    st.integers(1, 12),
)
def test_heavy_hitters_matches_naive(spark, values, k):
    df = spark.createDataFrame([(v,) for v in values], "v int").repartition(3)
    got = {r["v"]: r["n"] for r in heavy_hitters(df, "v", k=k).collect()}
    assert got == _exact_over_threshold(values, k)


def test_heavy_hitters_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), (None,), (None,), ("b",)], "v string"
    )
    # n counts non-null rows only (4): 'a' (3) > 4/2, 'b' (1) is not
    got = {r["v"]: r["n"] for r in heavy_hitters(df, "v", k=2).collect()}
    assert got == {"a": 3}


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "v string")
    assert heavy_hitters(df, "v", k=4).count() == 0


def test_heavy_hitters_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "v", k=0)
    with pytest.raises(ValueError, match="sketch_size"):
        heavy_hitters(df, "v", k=8, sketch_size=4)


def test_heavy_hitters_plan_shape(spark, sf_dir):
    # the full-data side must meet the candidates via BROADCAST semi
    # join (candidates as data, never a giant isin literal / SMJ), and
    # the only full-data shuffle is the candidate-filtered groupBy
    words = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(F.explode(F.split("p_type", " ")).alias("w"))
    )
    out = heavy_hitters(words, "w", k=20, sketch_size=24)
    plan = formatted_plan(out)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert count_exchanges(out) <= 3, plan  # groupBy + two metadata aggs


def test_mg_estimates_bounds(spark):
    from nycitibike_data_transform_spark.operators.sketches import mg_estimates

    data = _zipfish(3000) + list(range(500, 900))
    df = spark.createDataFrame([(v,) for v in data], "v int").repartition(5)
    truth: dict = {}
    for v in data:
        truth[v] = truth.get(v, 0) + 1
    rows = mg_estimates(df, "v", sketch_size=10).collect()
    assert rows
    bound = len(data) // 11
    emitted = set()
    for r in rows:
        assert r["max_undercount"] == bound
        emitted.add(r["v"])
        # never overcounts; undercounts by at most the bound
        assert r["est"] <= truth[r["v"]]
        assert truth[r["v"]] - r["est"] <= bound
    # anything NOT emitted is provably below the bound
    for v, c in truth.items():
        if v not in emitted:
            assert c <= bound


def test_mg_estimates_validation(spark):
    from nycitibike_data_transform_spark.operators.sketches import mg_estimates

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="sketch_size"):
        mg_estimates(df, "v", 0)


def test_mg_sketch_exact_above_2_53(spark):
    """ADVICE r8 medium: items above 2^53 must survive the sketch's
    pandas→Arrow round-trip exactly. The old list+[None] construction
    coerced integral items to float64, rounding 2^53+1 to 2^53 —
    both the candidate set and mg_estimates then carried corrupted
    item values."""
    from nycitibike_data_transform_spark.operators.sketches import mg_estimates

    big = (1 << 53) + 1           # not representable in float64
    big2 = (1 << 62) + 12345      # deep into the rounded zone
    data = [(big,)] * 40 + [(big2,)] * 25 + [(big + 2,)] * 3 + [(None,)] * 2
    df = spark.createDataFrame(data, "v long").repartition(4)

    hh = {r["v"]: r["n"] for r in heavy_hitters(df, "v", k=3).collect()}
    assert hh == {big: 40, big2: 25}

    est = {r["v"]: r["est"] for r in mg_estimates(df, "v", sketch_size=8).collect()}
    assert set(est) <= {big, big2, big + 2}
    assert big in est and big2 in est  # exact item values, never big±1

    # raw summaries carry exact items and Int64 (not float) counts
    rows = mg_sketch_partitions(df, "v", 8).collect()
    items = {r["v"] for r in rows if r["v"] is not None}
    assert items <= {big, big2, big + 2}


def test_mg_sketch_exact_above_2_53_string_and_double(spark):
    """The dtype fix must not regress non-integral item types: object
    dtype keeps strings and doubles flowing exactly as before."""
    df = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 10 + [("c",)] * 2, "v string"
    ).repartition(3)
    hh = {r["v"]: r["n"] for r in heavy_hitters(df, "v", k=3).collect()}
    assert hh == {"a": 30}

    dfd = spark.createDataFrame(
        [(1.5,)] * 20 + [(2.25,)] * 8 + [(3.0,)] * 1, "v double"
    ).repartition(3)
    hhd = {r["v"]: r["n"] for r in heavy_hitters(dfd, "v", k=2).collect()}
    assert hhd == {1.5: 20}


# ---------------------------------------------------- count–min sketch


def _cms_df(spark, items):
    return spark.createDataFrame([(i,) for i in items], "term string")


def test_cms_table_bounded_and_mass_preserving(spark):
    import hashlib

    items = [f"t{i % 7}" for i in range(200)]
    rows = cms_table(_cms_df(spark, items), "term", depth=3, width=8).collect()
    assert len(rows) <= 3 * 8
    # every depth row holds the full stream mass
    by_d: dict = {}
    for r in rows:
        by_d[r["d"]] = by_d.get(r["d"], 0) + r["n"]
    assert by_d == {0: 200, 1: 200, 2: 200}
    # bucket hash pins to the portable md5-substring scheme
    for r in rows[:5]:
        pass  # buckets verified via the point-estimate parity below
    h = int(hashlib.md5(b"0:t0").hexdigest()[:8], 16) % 8
    assert any(r["d"] == 0 and r["bucket"] == h and r["n"] >= items.count("t0") - 0 for r in rows)


def test_cms_estimates_one_sided_and_exact_for_absent(spark):
    items = [f"t{i % 11}" for i in range(400)] + ["rare"]
    probes = ["t0", "t5", "rare", "never_seen"]
    out = {
        r["term"]: r
        for r in cms_point_estimates(
            _cms_df(spark, items), "term", probes, depth=4, width=16
        ).collect()
    }
    assert set(out) == set(probes)
    for term, r in out.items():
        true = items.count(term)
        assert r["exact_count"] == true
        assert r["cms_estimate"] >= true  # one-sided: never undercounts
        assert r["overshoot"] == r["cms_estimate"] - true >= 0
    assert out["never_seen"]["exact_count"] == 0


def test_cms_wide_sketch_is_exact(spark):
    # width >> distinct items → collisions vanish, estimate == exact
    items = ["a"] * 5 + ["b"] * 3 + ["c"]
    out = {
        r["term"]: r
        for r in cms_point_estimates(
            _cms_df(spark, items), "term", ["a", "b", "c"], depth=4, width=4096
        ).collect()
    }
    assert [(out[t]["cms_estimate"], out[t]["exact_count"]) for t in "abc"] == [
        (5, 5),
        (3, 3),
        (1, 1),
    ]


def test_cms_ignores_nulls_and_validates(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "term string")
    out = cms_point_estimates(df, "term", ["a"]).collect()
    assert out[0]["exact_count"] == 2 and out[0]["cms_estimate"] >= 2
    with pytest.raises(ValueError):
        cms_table(df, "term", depth=0)
    with pytest.raises(ValueError):
        cms_point_estimates(df, "term", [])
    with pytest.raises(ValueError):
        cms_point_estimates(df, "term", ["a", "a"])


@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=2, max_value=32),
)
@settings(max_examples=8, deadline=None)
def test_cms_one_sided_property(spark, items, depth, width):
    vals = [f"v{i}" for i in items]
    probes = sorted(set(vals))[:5] + ["absent_probe"]
    out = {
        r["term"]: r
        for r in cms_point_estimates(
            _cms_df(spark, vals), "term", probes, depth=depth, width=width
        ).collect()
    }
    for term in probes:
        true = vals.count(term)
        assert out[term]["exact_count"] == true
        assert out[term]["cms_estimate"] >= true
