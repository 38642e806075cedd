"""Semantics of the r4 LLM-pipeline queries (decontaminate /
stratified_sample / source_mix_report) on constructed fixtures — the
sf0.01 oracle hashes prove engine parity; these pin the *intent*.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.queries import all_queries


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """documents.parquet where doc_id 0 and 50 are benchmark members
    (id % 50 == 0); doc 1 copies doc 0's text, doc 2 is disjoint."""
    out = tmp_path_factory.mktemp("llmdata_docs")
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "web"),
        (50, "one two three four five six", "en", "web"),
        (1, "alpha beta gamma delta epsilon zeta", "en", "web"),  # contaminated by 0
        (2, "totally different words here folks okay", "en", "books"),
        (3, "one two three unrelated tail words", "en", "books"),  # shares "one two three" with 50
        (4, "ein zwei drei vier fünf sechs", "de", "web"),
        (5, "sieben acht neun zehn elf zwölf", "de", "web"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return str(out)


def test_decontaminate_flags_benchmark_overlap(spark, docs_dir):
    got = {
        r["doc_id"]: (r["n_contaminated"], r["contaminated"])
        for r in all_queries()["decontaminate"].spark(spark, docs_dir).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}  # benchmark ids 0/50 excluded
    assert got[1][1] == 1 and got[1][0] == 4  # 4 shared trigrams with doc 0
    assert got[3] == (1, 1)  # "one two three" from doc 50
    assert got[2] == (0, 0) and got[4] == (0, 0) and got[5] == (0, 0)


def test_stratified_sample_exact_quota_and_determinism(spark, docs_dir):
    q = all_queries()["stratified_sample"]
    first = {(r["doc_id"], r["lang"]) for r in q.spark(spark, docs_dir).collect()}
    again = {(r["doc_id"], r["lang"]) for r in q.spark(spark, docs_dir).collect()}
    assert first == again  # content-derived order: stable across runs
    by_lang = {}
    for _, lang in first:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    # ceil(0.2 * 5) = 1 for en, ceil(0.2 * 2) = 1 for de
    assert by_lang == {"en": 1, "de": 1}


def test_source_mix_report_shares_sum_to_one(spark, docs_dir):
    rows = all_queries()["source_mix_report"].spark(spark, docs_dir).collect()
    assert {(r["source"], r["lang"]) for r in rows} == {
        ("web", "en"),
        ("web", "de"),
        ("books", "en"),
    }
    assert math.isclose(sum(r["token_share"] for r in rows), 1.0, abs_tol=1e-5)
    web_en = next(r for r in rows if r["source"] == "web" and r["lang"] == "en")
    assert web_en["n_docs"] == 3 and web_en["n_tokens"] == 18


def test_dedup_keep_best_retains_longest_member(spark, docs_dir):
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in all_queries()["dedup_keep_best"].spark(spark, docs_dir).collect()
    }
    # docs 0 and 1 are exact copies -> one cluster, equal length, tie
    # breaks to the lower id; everything else is a singleton
    assert set(got) == {0, 2, 3, 4, 5, 50}
    assert got[0] == (0, 2)
    assert all(got[d] == (d, 1) for d in (2, 3, 4, 5, 50))


def test_resample_balanced_uniform_quota(spark, docs_dir):
    rows = all_queries()["resample_balanced"].spark(spark, docs_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # min source (books) has 2 docs -> quota = ceil(0.6 * 2) = 2 from
    # EVERY source, so the 5-doc web source is strictly downsampled
    assert {s: len(v) for s, v in by_src.items()} == {"web": 2, "books": 2}
    again = {
        (r["doc_id"], r["source"])
        for r in all_queries()["resample_balanced"].spark(spark, docs_dir).collect()
    }
    assert {(d, s) for s, v in by_src.items() for d in v} == again


def test_dedup_incremental_flags_cross_set_dups(spark, docs_dir):
    # batch = doc_id % 5 == 4 -> only doc 4 ("ein zwei drei...") is in
    # the batch; it matches nothing in the corpus
    got = {
        r["doc_id"]: (r["n_matches"], r["is_dup"])
        for r in all_queries()["dedup_incremental"].spark(spark, docs_dir).collect()
    }
    assert got == {4: (0, 0)}


def test_incremental_near_dup_operator_cross_set_only(spark):
    from nycitibike_data_transform_spark.operators.dedup import incremental_near_dup

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated corpus text body here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),  # dup of 1
         (11, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
         (12, "nothing like anything indexed so far at all")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["is_dup"])
        for r in incremental_near_dup(corpus, batch).collect()
    }
    assert got[10] == (1, 1)
    assert got[11][1] == 1  # near-dup found
    assert got[12] == (0, 0)
    # batch-internal dups (10 vs 11) must NOT count: cross-set only
    assert got[10][0] == 1 and got[11][0] == 1


# ----------------------------------------------------- r5 queries


def test_curriculum_stages_orders_easy_to_hard(spark, sf_dir):
    from nycitibike_data_transform_spark.catalog import load_table

    out = all_queries()["curriculum_stages"].spark(spark, sf_dir)
    rows = out.collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    assert {r["stage"] for r in rows} == {1, 2, 3, 4}
    # within every source, each stage-1 doc is no longer than any
    # stage-4 doc (ntile over (n_tokens, doc_id) is monotone)
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for members in by_source.values():
        s1 = [r["n_tokens"] for r in members if r["stage"] == 1]
        s4 = [r["n_tokens"] for r in members if r["stage"] == 4]
        if s1 and s4:
            assert max(s1) <= min(s4)
        # ntile balance: stage sizes differ by at most one
        sizes = [sum(1 for r in members if r["stage"] == s) for s in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1


def test_embedding_dedup_drops_exactly_pair_members(spark, sf_dir):
    """The bounded audit must agree with the FULL-corpus SemDeDup
    rule on every probe id: dropped iff the exhaustive grid tier
    finds a lower-id witness at/above the threshold."""
    from nycitibike_data_transform_spark.catalog import load_table
    from nycitibike_data_transform_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from nycitibike_data_transform_spark.queries.llmdata import _NEAR_DUP_PROBES

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, 0.45, method="grid")
    full_dropped = {r["id_b"] for r in pairs.collect()}
    kept = {r["vec_id"] for r in all_queries()["embedding_dedup"].spark(spark, sf_dir).collect()}
    probe_ids = {
        r["vec_id"]
        for r in emb.filter(emb.vec_id < _NEAR_DUP_PROBES).select("vec_id").collect()
    }
    assert kept == probe_ids - full_dropped
    assert len(probe_ids & full_dropped) > 0  # non-vacuous at sf0.001


def test_perplexity_semantics_on_fixture(spark, tmp_path):
    """Repeated boilerplate scores LOW perplexity, a doc of
    corpus-rare tokens scores HIGH; hand-checked closed form on a
    tiny corpus."""
    import math

    rows = [
        (1, "a a a a"),        # common tokens
        (2, "a a a a"),
        (3, "x y z q"),        # singletons
    ]
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    from nycitibike_data_transform_spark.queries import all_queries

    out = {
        r["doc_id"]: r
        for r in all_queries()["perplexity_score"].spark(spark, str(tmp_path)).collect()
    }
    # corpus: N=12; 'a' count 8, singles count 1 each
    assert out[1]["log_perplexity"] == round(math.log(12) - math.log(8), 6)
    assert out[3]["log_perplexity"] == round(math.log(12) - 0.0, 6)
    assert out[3]["log_perplexity"] > out[1]["log_perplexity"]
    assert out[1]["n_tokens"] == 4


def test_perplexity_empty_docs_get_null(spark, tmp_path):
    rows = [(1, None), (2, ""), (3, "hello hello world")]
    spark.createDataFrame(
        [(i, t, "en", "web", len(t) if t else 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    from nycitibike_data_transform_spark.queries import all_queries

    out = {
        r["doc_id"]: r
        for r in all_queries()["perplexity_score"].spark(spark, str(tmp_path)).collect()
    }
    assert out[1]["log_perplexity"] is None and out[1]["n_tokens"] == 0
    assert out[2]["log_perplexity"] is None
    assert out[3]["log_perplexity"] is not None and out[3]["n_tokens"] == 3


def test_embedding_quantize_zero_vector_guard(spark, tmp_path):
    """Zero-norm vector → scale 0, all codes 0, zero reconstruction
    error (no division-by-zero NULL leak); a normal vector's max
    component maps to ±127."""
    rows = [
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [0.5, -0.25, 0.125, 0.0]),
    ]
    spark.createDataFrame(
        [(i, v, 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    from nycitibike_data_transform_spark.queries import all_queries

    out = {
        r["vec_id"]: r
        for r in all_queries()["embedding_quantize"].spark(spark, str(tmp_path)).collect()
    }
    assert out[1]["scale"] == 0.0
    assert out[1]["code_sum"] == 0 and out[1]["code_l1"] == 0
    assert out[1]["n_zero"] == 4 and out[1]["recon_err"] == 0.0
    # power-of-two components quantize exactly: 0.5→127, -0.25→-64 (rounded
    # from -63.5 away), 0.125→32 (31.75→32), 0→0
    assert out[2]["max_code"] == 127
    assert out[2]["n_zero"] == 1
    assert out[2]["recon_err"] < 1e-4


def test_padded_batches_invariants(spark, sf_dir):
    """Every batch is full except possibly the last; batch max length
    is non-increasing with batch_id (the length-sorted contract); and
    total docs are conserved."""
    from nycitibike_data_transform_spark.catalog import load_table
    from nycitibike_data_transform_spark.queries import all_queries

    rows = sorted(
        all_queries()["padded_batches"].spark(spark, sf_dir).collect(),
        key=lambda r: r["batch_id"],
    )
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows[:-1]:
        assert r["n_docs"] == 32
    maxes = [r["max_tokens"] for r in rows]
    assert maxes == sorted(maxes, reverse=True)
    for r in rows:
        assert r["padding_waste"] == r["n_docs"] * r["max_tokens"] - r["sum_tokens"]
        assert r["min_tokens"] <= r["max_tokens"]


# ------------------------------------------- Gopher repetition battery


def test_gopher_repetition_known_fractions(spark):
    from nycitibike_data_transform_spark.queries.llmdata import (
        gopher_repetition_signals,
    )

    rows = [
        # "a b a b a b": bigrams = [a b, b a, a b, b a, a b]
        # top = 'a b' (count 3, len 3) -> 9 chars / 11 total
        # dup mass = 3*3 ('a b') + 2*3 ('b a') = 15 / 11 (can exceed 1)
        (1, "a b a b a b"),
        # no repeated bigram: top = first lexicographic tie 'x y'
        (2, "x y z"),
        (3, ""),  # blank -> zero fracs, row still emitted
        (4, None),  # NULL text behaves like blank
        (5, "solo"),  # <2 tokens: no bigrams at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_repetition_signals(df).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1]["n_chars_norm"] == 11
    assert got[1]["top2_char_frac"] == pytest.approx(round(9 / 11, 6))
    assert got[1]["dup2_char_frac"] == pytest.approx(round(15 / 11, 6))
    assert got[2]["top2_char_frac"] == pytest.approx(round(3 / 5, 6))
    assert got[2]["dup2_char_frac"] == 0.0
    for d in (3, 4):
        assert got[d]["n_chars_norm"] == 0
        assert got[d]["top2_char_frac"] == 0.0
        assert got[d]["dup2_char_frac"] == 0.0
    assert got[5]["top2_char_frac"] == 0.0 and got[5]["n_chars_norm"] == 4


def test_gopher_repetition_tiebreak_prefers_longer_gram(spark):
    from nycitibike_data_transform_spark.queries.llmdata import (
        gopher_repetition_signals,
    )

    # 'aa bb' and 'c d' both occur once; count tie -> longer char
    # length wins the 'most frequent' slot (then lexicographic)
    df = spark.createDataFrame([(1, "aa bb c d")], "doc_id long, text string")
    (row,) = gopher_repetition_signals(df).collect()
    # bigrams: 'aa bb'(5), 'bb c'(4), 'c d'(3) — all count 1 -> 'aa bb'
    assert row["top2_char_frac"] == pytest.approx(round(5 / 9, 6))


# ------------------------------------------------------- Zipf fit


def _zipf_ref(freqs: dict[str, int]) -> tuple[int, int, float, float]:
    """Scaled-int regression reference with naive global ranks —
    the Spark side uses banded ranks, so equality here proves the
    band decomposition reproduces the global (n desc, term) order."""
    import math

    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (round(math.log(r) * 1e6), round(math.log(n) * 1e6))
        for r, (_, n) in enumerate(ranked, start=1)
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = k * sxx - sx * sx
    slope = 0.0 if den == 0 else round((k * sxy - sx * sy) / den, 6)
    total = sum(freqs.values())
    return k, total, slope, round(max(freqs.values()) / total, 6)


def _zipf_run(spark, freqs: dict[str, int]):
    from nycitibike_data_transform_spark.queries.llmdata import _q_zipf_fit  # noqa: F401
    # drive the same pipeline through a crafted corpus: one doc per
    # term, the term repeated n times
    import tempfile, os

    rows = [(i, " ".join([t] * n)) for i, (t, n) in enumerate(freqs.items())]
    d = tempfile.mkdtemp(prefix="zipf_")
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    (row,) = _q_zipf_fit(spark, d).collect()
    return row


def test_zipf_fit_matches_scaled_int_reference(spark):
    # frequencies spanning several log2 bands, with ties (same n,
    # different terms) and band gaps — the banded rank must reproduce
    # the naive global order exactly
    freqs = {
        "alpha": 1000, "beta": 500, "gamma": 500, "delta": 129,
        "eps": 128, "zeta": 17, "eta": 17, "theta": 3, "iota": 1,
        "kappa": 1,
    }
    row = _zipf_run(spark, freqs)
    k, total, slope, top = _zipf_ref(freqs)
    assert row["vocab_size"] == k
    assert row["n_tokens"] == total
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-6)
    assert row["top_share"] == pytest.approx(top, abs=1e-6)
    assert row["zipf_slope"] < -0.5  # genuinely skewed corpus


def test_zipf_fit_degenerate_single_term(spark):
    row = _zipf_run(spark, {"solo": 7})
    assert row["vocab_size"] == 1
    assert row["zipf_slope"] == 0.0  # den = 0 guard, not NaN
    assert row["top_share"] == 1.0


def test_zipf_fit_uniform_corpus_slope_near_zero(spark):
    row = _zipf_run(spark, {f"t{i}": 50 for i in range(20)})
    # all-equal frequencies: y is constant, slope exactly 0
    assert row["zipf_slope"] == pytest.approx(0.0, abs=1e-6)


# ------------------------------------------------------ token entropy


def test_token_entropy_known_values(spark):
    import math, os, tempfile

    from nycitibike_data_transform_spark.queries.llmdata import _q_token_entropy

    rows = [
        (1, "a a b b"),      # uniform over 2 -> exactly 1 bit, norm 1
        (2, "a a a a"),      # single symbol -> 0 bits, norm 0
        (3, "a b c d"),      # uniform over 4 -> exactly 2 bits
        (4, "a a a b"),      # skewed: 2 - (3*log2 3)/4
        (5, ""),             # blank -> zero row
        (6, None),           # NULL -> zero row
    ]
    d = tempfile.mkdtemp(prefix="entropy_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r for r in _q_token_entropy(spark, d).collect()}
    assert got[1]["token_entropy"] == 1.0 and got[1]["entropy_norm"] == 1.0
    assert got[2]["token_entropy"] == 0.0 and got[2]["entropy_norm"] == 0.0
    assert got[3]["token_entropy"] == 2.0
    skew = round(2.0 - round(3 * math.log2(3), 6) / 4, 6)
    assert got[4]["token_entropy"] == pytest.approx(skew, abs=1e-6)
    for doc in (5, 6):
        assert got[doc]["n_tokens"] == 0
        assert got[doc]["token_entropy"] == 0.0
        assert got[doc]["entropy_norm"] == 0.0
    assert got[4]["n_distinct"] == 2 and got[3]["n_distinct"] == 4
