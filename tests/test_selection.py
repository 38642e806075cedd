"""Corpus selection/shuffle operators: the two-phase prefix sums must
match naive greedy references, shuffles must be seeded permutations,
and the containment prefix filter must be lossless vs all-pairs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from nycitibike_data_transform_spark.operators.dedup import containment_pairs
from nycitibike_data_transform_spark.operators.selection import (
    deterministic_shuffle,
    token_budget_select,
)

# ------------------------------------------------- token_budget_select


@pytest.fixture(scope="module")
def scored(spark):
    # scores with ties (ids break them), token counts chosen so the
    # budget boundary lands mid-corpus and a LATER smaller doc would
    # still fit (proving take-while, not best-fit)
    rows = [
        (1, 0.9, 10),
        (2, 0.9, 20),   # tie with 1 → id order
        (3, 0.5, 40),
        (4, 0.5, 5),    # would fit after 3 overflows the budget=60 case
        (5, 0.1, 1),
    ]
    return spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")


def _greedy(rows, budget):
    out, cum = {}, 0
    for did, score, tok in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += tok
        out[did] = (cum, 1 if cum <= budget else 0)
    return out


def test_budget_matches_greedy_reference(spark, scored):
    rows = [(r["doc_id"], r["score"], r["n_tokens"]) for r in scored.collect()]
    for budget in (0, 29, 30, 31, 60, 75, 76, 1000):
        got = {
            r["doc_id"]: (r["cum_tokens"], r["selected"])
            for r in token_budget_select(scored, budget).collect()
        }
        assert got == _greedy(rows, budget), f"budget={budget}"


def test_take_while_not_best_fit(spark, scored):
    # budget 60: docs 1,2 fit (cum 30); doc 3 overflows at 70; doc 4
    # (cum 75) and 5 (cum 76) must NOT be back-filled even though
    # doc 4 alone would fit in the remaining 30
    got = {r["doc_id"]: r["selected"] for r in token_budget_select(scored, 60).collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0}


def test_equal_scores_fall_back_to_id_order(spark):
    df = spark.createDataFrame(
        [(i, 0.5, 10) for i in range(1, 8)], "doc_id long, score double, n_tokens long"
    )
    got = {r["doc_id"]: r["selected"] for r in token_budget_select(df, 35).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0}


def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "doc_id long, score double, n_tokens long")
    assert token_budget_select(empty, 100).count() == 0
    with pytest.raises(ValueError):
        token_budget_select(empty, -1)
    strs = spark.createDataFrame([("a", 0.5, 1)], "doc_id string, score double, n_tokens long")
    with pytest.raises(TypeError):
        token_budget_select(strs, 10)


def test_null_score_raises(spark):
    df = spark.createDataFrame(
        [(1, None, 10)], "doc_id long, score double, n_tokens long"
    )
    with pytest.raises(Exception, match="NULL score"):
        token_budget_select(df, 10).collect()


# ------------------------------------------------ deterministic_shuffle


def test_shuffle_is_seeded_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = deterministic_shuffle(df, seed="s1", n_shards=7).collect()
    assert sorted(r["shuffle_pos"] for r in out) == list(range(1, 201))
    # position order == (md5 key, id) order, verified against hashlib
    expected = sorted(
        range(200), key=lambda i: (hashlib.md5(f"s1:{i}".encode()).hexdigest(), i)
    )
    got = [r["doc_id"] for r in sorted(out, key=lambda r: r["shuffle_pos"])]
    assert got == expected
    # round-robin shards
    assert all(r["shard_id"] == (r["shuffle_pos"] - 1) % 7 for r in out)


def test_shuffle_stable_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    a = {r["doc_id"]: r["shuffle_pos"] for r in deterministic_shuffle(df, "x").collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in deterministic_shuffle(df, "x").collect()}
    c = {r["doc_id"]: r["shuffle_pos"] for r in deterministic_shuffle(df, "y").collect()}
    assert a == b
    assert a != c  # 64! orders; identical permutation ≈ impossible
    with pytest.raises(ValueError):
        deterministic_shuffle(df, "x", n_shards=0)


def test_shuffle_null_id_raises(spark):
    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with pytest.raises(Exception, match="NULL doc_id"):
        deterministic_shuffle(df, "s").collect()


# -------------------------------------------------- containment_pairs


@pytest.fixture(scope="module")
def contain_docs(spark):
    quote = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, quote),  # fully quoted inside 2 → containment 1.0, low jaccard
        (2, "intro words here " + quote + " and a very long tail of unrelated "
            "tokens one two three four five six seven eight nine ten"),
        (3, "completely different content with no shared trigrams at all ok"),
        (4, quote),  # exact dup of 1: both directions with 1 and 2
        (5, None),   # NULL text: no shingles, never appears
        (6, "xy"),   # too short for a trigram
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_containment(rows, n, threshold):
    def sh(text):
        if not text:
            return set()
        w = text.lower().split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sets = {did: sh(t) for did, t in rows}
    out = set()
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b or not sb:
                continue
            ov = len(sa & sb)
            if ov / len(sa) >= threshold:
                out.add((a, b, len(sa), ov))
    return out


def test_containment_matches_all_pairs(spark, contain_docs):
    rows = [(r["doc_id"], r["text"]) for r in contain_docs.collect()]
    for t in (0.5, 0.8, 1.0):
        got = {
            (r["src_doc"], r["dst_doc"], r["src_shingles"], r["overlap"])
            for r in containment_pairs(contain_docs, threshold=t).collect()
        }
        assert got == _exact_containment(rows, 3, t), f"threshold={t}"


def test_containment_finds_partial_copy_jaccard_misses(spark, contain_docs):
    got = containment_pairs(contain_docs, threshold=0.8).collect()
    directed = {(r["src_doc"], r["dst_doc"]): r["containment"] for r in got}
    assert directed[(1, 2)] == 1.0          # quote fully contained
    assert (2, 1) not in directed           # big doc not contained in quote
    assert directed[(1, 4)] == 1.0 and directed[(4, 1)] == 1.0  # exact dup: both
    assert not any(3 in p or 5 in p or 6 in p for p in directed)


def test_containment_threshold_validation(spark, contain_docs):
    with pytest.raises(ValueError):
        containment_pairs(contain_docs, threshold=0.0)
    with pytest.raises(ValueError):
        containment_pairs(contain_docs, threshold=1.5)


# ------------------------------------------- hypothesis differentials

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(0.0, 1.0, allow_nan=False), st.integers(0, 50)),
        min_size=0,
        max_size=20,
    ),
    st.integers(0, 300),
)
def test_budget_select_differential(spark, score_toks, budget):
    rows = [(i, round(s, 6), t) for i, (s, t) in enumerate(score_toks)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    got = {
        r["doc_id"]: (r["cum_tokens"], r["selected"])
        for r in token_budget_select(df, budget).collect()
    }
    assert got == _greedy(rows, budget)


# small token alphabet so random docs actually share shingles
_WORDS = st.sampled_from(["a", "b", "c", "d"])
_DOC = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_DOC, min_size=0, max_size=10), st.sampled_from([0.5, 0.8, 1.0]))
def test_containment_differential(spark, texts, threshold):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows or [(0, None)], "doc_id long, text string")
    if not rows:
        rows = [(0, None)]
    got = {
        (r["src_doc"], r["dst_doc"], r["src_shingles"], r["overlap"])
        for r in containment_pairs(df, n=2, threshold=threshold).collect()
    }
    assert got == _exact_containment(rows, 2, threshold)


# ------------------------------------------- cross-mode containment


def _exact_cross_containment(src_rows, dst_rows, n, threshold):
    def sh(text):
        if not text:
            return set()
        w = text.lower().split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    out = set()
    for a, ta in src_rows:
        sa = sh(ta)
        if not sa:
            continue
        for b, tb in dst_rows:
            if a == b:
                continue
            ov = len(sa & sh(tb))
            if ov / len(sa) >= threshold:
                out.add((a, b, len(sa), ov))
    return out


def test_containment_cross_mode_matches_all_pairs(spark, contain_docs):
    rows = [(r["doc_id"], r["text"]) for r in contain_docs.collect()]
    src_rows = [r for r in rows if r[0] in (1, 3, 6)]
    dst_rows = [r for r in rows if r[0] in (2, 4, 5)]
    src = contain_docs.filter(F.col("doc_id").isin([i for i, _ in src_rows]))
    dst = contain_docs.filter(F.col("doc_id").isin([i for i, _ in dst_rows]))
    for t in (0.5, 0.8, 1.0):
        got = {
            (r["src_doc"], r["dst_doc"], r["src_shingles"], r["overlap"])
            for r in containment_pairs(src, threshold=t, dst=dst).collect()
        }
        assert got == _exact_cross_containment(src_rows, dst_rows, 3, t), f"t={t}"
    # no within-side pairs ever appear: 1 and 4 are exact dups but sit
    # on opposite sides, so only the (1→4 src→dst) direction shows
    directed = {
        (r["src_doc"], r["dst_doc"])
        for r in containment_pairs(src, threshold=0.8, dst=dst).collect()
    }
    assert (1, 4) in directed and (4, 1) not in directed


@settings(max_examples=5, deadline=None)
@given(
    st.lists(_DOC, min_size=0, max_size=6),
    st.lists(_DOC, min_size=0, max_size=6),
)
def test_containment_cross_differential(spark, src_texts, dst_texts):
    src_rows = list(enumerate(src_texts))
    dst_rows = [(100 + i, t) for i, t in enumerate(dst_texts)]
    src = spark.createDataFrame(src_rows or [(0, None)], "doc_id long, text string")
    dst = spark.createDataFrame(dst_rows or [(100, None)], "doc_id long, text string")
    if not src_rows:
        src_rows = [(0, None)]
    if not dst_rows:
        dst_rows = [(100, None)]
    got = {
        (r["src_doc"], r["dst_doc"], r["src_shingles"], r["overlap"])
        for r in containment_pairs(src, n=2, threshold=0.5, dst=dst).collect()
    }
    assert got == _exact_cross_containment(src_rows, dst_rows, 2, 0.5)


def test_budget_select_extreme_score_magnitudes(spark):
    # large-magnitude scores over a tiny range: the naive -score/width
    # bucket quotient would overflow the long cast; the shifted
    # (hi - score)/width form stays in [0, MAX_BUCKETS]
    rows = [
        (1, 1e9 + 2e-6, 10),
        (2, 1e9 + 1e-6, 20),
        (3, 1e9, 30),
        (4, -1e9, 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    got = {
        r["doc_id"]: (r["cum_tokens"], r["selected"])
        for r in token_budget_select(df, 35).collect()
    }
    assert got == _greedy(rows, 35)


# ------------------------------------------------ dsir_logratio_weights


def test_dsir_logratio_matches_hand_computation(spark):
    """Micro-corpus against a hand-derived expectation: target doc 1
    'a a b' vs raw corpus {1, 2, 3}; doc 2 is a verbatim copy of the
    target text (must score identically), doc 3 is fully off-domain
    (must score the exact negative hand value). Add-one smoothing over
    the shared vocabulary {a, b, z}: N_t=3, N_r=9, V=3."""
    from nycitibike_data_transform_spark.operators.selection import (
        dsir_logratio_weights,
    )

    docs = spark.createDataFrame(
        [(1, "a a b", "tgt"), (2, "a a b", "raw"), (3, "z z z", "raw")],
        "doc_id bigint, text string, source string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_logratio_weights(
            docs, is_target=F.col("source") == "tgt"
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_tokens"] == 3 and out[3]["n_tokens"] == 3
    # lr(a)=ln(3/6)-ln(5/12), lr(b)=ln(2/6)-ln(3/12), lr(z)=ln(1/6)-ln(4/12)
    assert out[1]["dsir_logratio"] == pytest.approx(0.217442, abs=1e-6)
    assert out[2]["dsir_logratio"] == out[1]["dsir_logratio"]  # same text
    assert out[3]["dsir_logratio"] == pytest.approx(-0.693147, abs=1e-6)


def test_dsir_logratio_omits_tokenless_docs(spark):
    """A token-less document has no unigram distribution — it is
    omitted, not scored 0 (0 means 'indistinguishable from raw')."""
    from nycitibike_data_transform_spark.operators.selection import (
        dsir_logratio_weights,
    )

    docs = spark.createDataFrame(
        [(1, "a b", True), (2, "", False), (3, None, False)],
        "doc_id bigint, text string, t boolean",
    )
    got = dsir_logratio_weights(docs, is_target=F.col("t")).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_dsir_hashed_ngram_feature_construction(spark):
    """The hashed feature array is exactly {1:t_i} ∪ {2:t_i t_{i+1}}
    bucketed by the engine-portable md5-substring hash — pinned against
    an independent hashlib computation, including the 1-token doc (no
    bigrams) and the empty doc (no features)."""
    from nycitibike_data_transform_spark.operators.selection import (
        hashed_ngram_features,
    )

    B = 10_000

    def bucket(feat: str) -> int:
        return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % B

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["f"]
        for r in docs.select(
            "doc_id", hashed_ngram_features("text", B).alias("f")
        ).collect()
    }
    assert got[1] == [bucket(f) for f in ("1:a", "1:b", "1:c", "2:a b", "2:b c")]
    assert got[2] == [bucket("1:solo")]
    assert got[3] == []


def test_dsir_hashed_ngram_word_order_signal(spark):
    """The reason this variant exists (VERDICT r14 item 4): two docs
    with IDENTICAL unigram multisets but different word order must
    score differently when the target matches one order — the unigram
    estimator is blind to this by construction (same doc pair scores
    identically under dsir_logratio_weights)."""
    from nycitibike_data_transform_spark.operators.selection import (
        dsir_hashed_ngram_weights,
        dsir_logratio_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "red fish blue fish", True),   # target order
            (2, "red fish blue fish", False),  # same order, raw
            (3, "fish red fish blue", False),  # same unigrams, reordered
        ],
        "doc_id bigint, text string, t boolean",
    )
    ngram = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_hashed_ngram_weights(docs, is_target=F.col("t")).collect()
    }
    assert ngram[2] == ngram[1]  # verbatim copy ties the target
    assert ngram[3] < ngram[1]  # reordered doc reads less like the target
    uni = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_logratio_weights(docs, is_target=F.col("t")).collect()
    }
    assert uni[3] == uni[1]  # the unigram member cannot see the difference


def test_dsir_hashed_ngram_omits_tokenless_and_counts_features(spark):
    """Same omission contract as the unigram variant, and n_features is
    2k−1 for a k-token doc (k unigrams + k−1 bigrams)."""
    from nycitibike_data_transform_spark.operators.selection import (
        dsir_hashed_ngram_weights,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d", True), (2, "", False), (3, None, False), (4, "x", False)],
        "doc_id bigint, text string, t boolean",
    )
    got = {
        r["doc_id"]: r["n_features"]
        for r in dsir_hashed_ngram_weights(docs, is_target=F.col("t")).collect()
    }
    assert got == {1: 7, 4: 1}


def test_dsir_target_docs_outrank_offdomain_in_selection(spark):
    """End-to-end monotonicity on a bigger frame: every doc sharing
    the target's vocabulary outranks every disjoint-vocabulary doc in
    the (rounded-weight, id) selection order."""
    from nycitibike_data_transform_spark.operators.selection import (
        dsir_logratio_weights,
    )

    rows = [(i, "alpha beta gamma delta", i < 3) for i in range(6)]
    rows += [(i, "omega psi chi phi", False) for i in range(6, 12)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, t boolean")
    got = (
        dsir_logratio_weights(docs, is_target=F.col("t"))
        .orderBy(F.col("dsir_logratio").desc(), F.col("doc_id"))
        .collect()
    )
    assert [r["doc_id"] for r in got[:6]] == [0, 1, 2, 3, 4, 5]
    assert all(r["dsir_logratio"] > 0 for r in got[:6])
    assert all(r["dsir_logratio"] < 0 for r in got[6:])
