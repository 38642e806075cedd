"""Similarity-search operators: exact correctness + ANN recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    srp_bucket,
)

VECS = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0]),  # closest to 1
    (3, [0.0, 1.0, 0.0]),
    (4, [0.0, 0.9, 0.2]),  # closest to 3
    (5, [-1.0, 0.0, 0.0]),  # anti-parallel to 1
]


def _emb(spark):
    return spark.createDataFrame(VECS, "vec_id bigint, embedding array<float>")


def test_cosine_topk_exact_ordering(spark):
    emb = _emb(spark)
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 1), k=4).collect()
    ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0] == 2  # most similar
    assert ranked[-1] == 5  # anti-parallel last
    assert all(r["query_id"] == 1 for r in out)


def test_cosine_topk_excludes_self(spark):
    emb = _emb(spark)
    out = cosine_topk(emb, emb, k=10).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in out)


def test_cosine_topk_auto_matches_brute_below_gate(spark):
    # below BRUTE_MAX_CORPUS_ROWS the auto gate must produce the SAME
    # plan/rows as the explicit brute tier (VERDICT r5 item #3)
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") <= 2)
    auto = sorted(map(tuple, cosine_topk(emb, q, k=3, method="auto").collect()))
    brute = sorted(map(tuple, cosine_topk(emb, q, k=3, method="brute").collect()))
    assert auto == brute and len(auto) > 0


def test_cosine_topk_auto_routes_to_lsh_above_gate(spark):
    # force the gate with a tiny threshold: the plan must switch to
    # the banded equi-join tier — no BroadcastNestedLoopJoin anywhere
    emb = spark.createDataFrame(
        [(i, [float(i % 7) + 0.1, 1.0 - float(i % 5) / 5.0, 0.3]) for i in range(40)],
        "vec_id bigint, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") < 3)
    out = cosine_topk(emb, q, k=3, method="auto", brute_max_corpus_rows=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    rows = out.collect()
    assert len(rows) > 0
    assert {c for c in out.columns} == {"query_id", "neighbor_id", "rank", "cosine"}


def test_cosine_topk_rejects_unknown_method(spark):
    import pytest

    with pytest.raises(ValueError, match="auto|brute"):
        cosine_topk(_emb(spark), _emb(spark), method="banded")


def test_srp_bucket_deterministic_and_bounded(spark):
    emb = _emb(spark)
    b1 = {r["vec_id"]: r["bucket"] for r in srp_bucket(emb, "embedding", 3, bits=6).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in srp_bucket(emb, "embedding", 3, bits=6).collect()}
    assert b1 == b2  # deterministic hyperplanes
    assert all(0 <= v < 64 for v in b1.values())


def test_lsh_recall_on_testdata(spark, sf_dir):
    """ANN recall vs exact top-5 on the real embeddings table: the
    single-band SRP index should recover a solid share of true
    neighbors (it's approximate by construction)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_lsh(emb, queries, dim=64, k=5, bits=4, bands=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall collapsed: {recall}"


def test_ivf_recall_on_testdata(spark, sf_dir):
    """IVF (kmeans coarse quantizer + nprobe lists) recall vs exact
    top-5 — approximate by construction; probe depth trades recall."""
    from nycitibike_data_transform_spark.operators.similarity import cosine_topk_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_ivf(emb, queries, dim=64, k=5, n_centroids=16, nprobe=6).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.5


def test_ivf_centroids_deterministic(spark, sf_dir):
    from nycitibike_data_transform_spark.operators.similarity import train_ivf_centroids
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1 = train_ivf_centroids(emb, dim=64, n_centroids=8, iterations=1)
    c2 = train_ivf_centroids(emb, dim=64, n_centroids=8, iterations=1)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 64)


def test_null_and_ragged_vectors_survive_all_tiers(spark):
    """A NULL embedding or wrong-length vector must be filtered out
    JVM-side, not crash the Arrow matmul in the Python worker."""
    from nycitibike_data_transform_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, None),            # NULL vector
        (4, [1.0, 2.0]),      # ragged length
        (5, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 1")
    for out in (
        cosine_topk(emb, q, k=3),
        cosine_topk_lsh(emb, q, dim=3, k=3, bits=2, bands=4),
        cosine_topk_ivf(emb, q, dim=3, k=3, n_centroids=2, nprobe=2),
    ):
        got = {r["neighbor_id"] for r in out.collect()}
        assert 3 not in got and 4 not in got  # guarded rows never rank


def test_zero_norm_query_returns_no_neighbors(spark):
    from nycitibike_data_transform_spark.operators.similarity import cosine_topk

    rows = [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(emb, emb.filter("vec_id = 1"), k=2)
    # cosine undefined against a zero vector → no ranked neighbors
    assert out.count() == 0


def test_auto_gate_trusts_caller_supplied_sizes(spark, sf_dir):
    """ADVICE r6: looping callers pass corpus_rows/lsh_dim to skip the
    per-call probe jobs. A declared size above the gate must route to
    the SRP tier (identical to calling cosine_topk_lsh directly) even
    though the actual corpus is tiny; a declared size below keeps the
    exact brute plan."""
    from nycitibike_data_transform_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    routed = cosine_topk(emb, q, k=3, corpus_rows=200_000, lsh_dim=64)
    direct = cosine_topk_lsh(emb, q, dim=64, k=3)
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, direct.collect())
    )
    exact = cosine_topk(emb, q, k=3, corpus_rows=10, method="auto")
    brute = cosine_topk(emb, q, k=3, method="brute")
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, brute.collect()))
