"""BM25 lexical retrieval + bounded inverted index
(operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_scores,
    bm25_topk,
    inverted_index,
)
from nycitibike_data_transform_spark.plans import formatted_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_ref(corpus: dict[int, str], terms: list[str]) -> dict[int, float]:
    """Independent Python reference of the exact documented formula,
    with the operator's round-then-decimal-sum determinism contract."""
    toks = {d: t.split() if t else [] for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out: dict[int, float] = {}
    for d, v in toks.items():
        score = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(v) / avgdl)
            )
            score += round(s, 6)
        if score:
            out[d] = round(score, 6)
    return out


CORPUS = {
    1: "spark join join window",
    2: "join scan scan scan scan scan scan scan",
    3: "window window window window",
    4: "dup spark",
    5: "",
}


def test_bm25_matches_reference_formula(spark):
    docs = _docs(spark, list(CORPUS.items())[::-1])
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["join", "dup"]).collect()
    }
    assert got == pytest.approx(_bm25_ref(CORPUS, ["join", "dup"]))


def test_bm25_rare_term_outranks_common(spark):
    # 'dup' appears in one doc, 'join' in two — doc 4's single rare
    # occurrence must outscore doc 2's single common occurrence at
    # comparable length; IDF is the mechanism.
    docs = _docs(spark, list(CORPUS.items()))
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["join", "dup"]).collect()}
    assert got[4] > got[2]


def test_bm25_length_normalization(spark):
    # same tf, longer doc → lower score (b > 0)
    rows = [(1, "join pad pad pad pad pad pad pad"), (2, "join pad")]
    got = {r["doc_id"]: r["score"] for r in bm25_scores(_docs(spark, rows), ["join"]).collect()}
    assert got[2] > got[1]


def test_bm25_nonmatching_docs_absent_and_counts(spark):
    docs = _docs(spark, list(CORPUS.items()))
    rows = {r["doc_id"]: r for r in bm25_scores(docs, ["join", "dup"]).collect()}
    assert set(rows) == {1, 2, 4}  # 3 and 5 match nothing
    assert rows[1]["n_terms_matched"] == 1
    assert rows[4]["n_terms_matched"] == 1
    both = bm25_scores(_docs(spark, [(9, "join dup"), (8, "join")]), ["join", "dup"])
    assert {r["doc_id"]: r["n_terms_matched"] for r in both.collect()} == {9: 2, 8: 1}


def test_bm25_topk_order_and_tiebreak(spark):
    rows = [(i, "join") for i in range(10)]  # all identical scores
    top = bm25_topk(_docs(spark, rows), ["join"], k=3).collect()
    assert [r["doc_id"] for r in top] == [0, 1, 2]  # doc_id tie-break


def test_bm25_validates_terms(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        bm25_scores(docs, [])
    with pytest.raises(ValueError):
        bm25_scores(docs, ["a", "a"])


def test_bm25_plan_broadcasts_scalars_no_doclength_join(spark):
    # dl rides the token row: exactly one scan-side aggregate feeds the
    # scoring join; the corpus scalars and df enter as broadcasts.
    plan = formatted_plan(bm25_scores(_docs(spark, list(CORPUS.items())), ["join"]))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_inverted_index_exact_stats_and_cap(spark):
    rows = [
        (1, "a a a b"),
        (2, "a b b"),
        (3, "a"),
        (4, "a c"),
    ]
    out = {r["term"]: r for r in inverted_index(_docs(spark, rows), postings_cap=2).collect()}
    assert out["a"]["df"] == 4 and out["a"]["total_tf"] == 6
    # top-2 by (tf desc, doc_id): doc 1 (tf 3), doc 2 (tf 1... ties on
    # tf=1 break by doc_id → doc 2); rendered in doc_id order
    assert out["a"]["top_postings"] == "1:3,2:1"
    # b's top-2 by (tf desc, doc_id) is {doc 2 (tf 2), doc 1 (tf 1)},
    # rendered in doc_id order
    assert out["b"]["top_postings"] == "1:1,2:2"
    assert out["c"]["df"] == 1 and out["c"]["top_postings"] == "4:1"


def test_inverted_index_postings_never_exceed_cap(spark):
    rows = [(i, "hot") for i in range(50)]
    out = inverted_index(_docs(spark, rows), postings_cap=3).collect()
    (row,) = out
    assert row["df"] == 50
    assert len(row["top_postings"].split(",")) == 3


def test_inverted_index_validates_cap(spark):
    with pytest.raises(ValueError):
        inverted_index(_docs(spark, [(1, "x")]), postings_cap=0)


def test_inverted_index_blank_and_null_text_yield_no_terms(spark):
    rows = [(1, ""), (2, None), (3, "ok")]
    out = inverted_index(_docs(spark, rows)).collect()
    assert [(r["term"], r["df"]) for r in out] == [("ok", 1)]
