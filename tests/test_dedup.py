"""Dedup operator family semantics on known fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_dedup,
    hamming_distance64,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The quick  brown fox jumps over the lazy dog"),  # exact dup after normalize
    (3, "the quick brown fox jumps over the lazy cat"),  # near dup (1 token差)
    (4, "completely different text about spark engines and shuffles here"),
    (5, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_exact_dedup_groups(spark):
    out = exact_dedup(_docs(spark)).collect()
    by_id = {r["doc_id"]: r["n_copies"] for r in out}
    assert by_id[1] == 2  # docs 1+2 collapse, min id wins
    assert 2 not in by_id
    assert by_id[3] == 1 and by_id[4] == 1 and by_id[5] == 1


def test_drop_exact_duplicates_keeps_all_columns(spark):
    out = drop_exact_duplicates(_docs(spark))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4, 5]
    assert out.columns == ["doc_id", "text"]


def test_shingles_short_arrays_empty(spark):
    df = spark.createDataFrame([(["a", "b"],), (["a", "b", "c", "d"],)], "t array<string>")
    got = [r["s"] for r in df.select(shingles(F.col("t"), 3).alias("s")).collect()]
    assert got[0] == []
    assert got[1] == ["a b c", "b c d"]


def test_ngram_jaccard_finds_near_dups(spark):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(_docs(spark)).collect()}
    assert pairs[(1, 2)] == 1.0  # identical after normalization
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_candidates_superset_of_real_dups(spark):
    cands = {(r["doc_a"], r["doc_b"]) for r in minhash_candidate_pairs(_docs(spark)).collect()}
    assert (1, 2) in cands  # identical shingle sets always collide
    assert not any(4 in p for p in cands)  # unrelated text shouldn't bucket


def test_simhash_near_dup_distance(spark):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(_docs(spark)).collect()}
    df = spark.createDataFrame(
        [(sh[1], sh[2]), (sh[1], sh[3]), (sh[1], sh[4])], "a bigint, b bigint"
    )
    d12, d13, d14 = [r["d"] for r in df.select(hamming_distance64(F.col("a"), F.col("b")).alias("d")).collect()]
    assert d12 == 0  # identical token sets
    assert d13 < d14  # near-dup closer than unrelated
    assert d13 <= 16


def test_blocked_jaccard_equals_exact(spark):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), mode="exact").collect()
    }
    blocked = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), mode="blocked").collect()
    }
    assert blocked == exact


def test_near_dedup_docs_drops_higher_id_members(spark):
    from nycitibike_data_transform_spark.operators.dedup import near_dedup_docs

    kept = sorted(r["doc_id"] for r in near_dedup_docs(_docs(spark)).collect())
    # pairs (1,2) J=1.0 and (1,3) J=0.75 drop docs 2 and 3
    assert kept == [1, 4, 5]


def test_embedding_grid_equals_broadcast(spark, sf_dir):
    from nycitibike_data_transform_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    grid = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_near_dup_pairs(emb, 0.4, method="grid").collect()
    }
    bcast = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_near_dup_pairs(emb, 0.4, method="broadcast").collect()
    }
    assert grid == bcast
    assert grid  # non-vacuous: qualifying pairs exist at 0.4


def test_embedding_srp_subset_of_exact(spark, sf_dir):
    from nycitibike_data_transform_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    srp = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, 0.4, method="srp").collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, 0.4, method="broadcast").collect()
    }
    assert srp <= exact  # SRP candidates re-ranked exactly: no false positives


def test_blocked_equals_exact_on_testdata_corpus(spark, sf_dir):
    """ADVICE r3: dedup_clusters builds its pair graph with
    mode="blocked" while its oracle computes the exact all-pairs
    closure — pin blocked == exact on the driver's own documents
    corpus so an LSH recall miss can't silently desync clusters."""
    from nycitibike_data_transform_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, mode="exact").collect()
    }
    blocked = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, mode="blocked").collect()
    }
    assert blocked == exact
    assert exact  # non-vacuous: the corpus must actually contain near-dups


def test_auto_method_routes_by_threshold(spark, sf_dir):
    """VERDICT r2 item #7: method="auto" picks the linear SRP tier at
    high thresholds (>= AUTO_SRP_THRESHOLD) and falls back to the exact
    grid tier below it, warning that exact low-threshold near-dup is
    inherently quadratic."""
    import warnings

    from nycitibike_data_transform_spark.operators.dedup import (
        AUTO_SRP_THRESHOLD,
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # high threshold: no warning
        hi_auto = embedding_near_dup_pairs(emb, AUTO_SRP_THRESHOLD)
    hi_srp = embedding_near_dup_pairs(emb, AUTO_SRP_THRESHOLD, method="srp")
    assert {(r["id_a"], r["id_b"]) for r in hi_auto.collect()} == {
        (r["id_a"], r["id_b"]) for r in hi_srp.collect()
    }

    with pytest.warns(ResourceWarning, match="grid tier"):
        lo_auto = embedding_near_dup_pairs(emb, 0.4)
    lo_exact = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_near_dup_pairs(emb, 0.4, method="broadcast").collect()
    }
    got = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in lo_auto.collect()
    }
    assert got == lo_exact  # low-threshold auto == exact tier
    assert got
