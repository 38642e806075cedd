"""BPE merge induction: hand-checked fixture + invariants."""

from __future__ import annotations

from nycitibike_data_transform_spark.operators.bpe import learn_bpe_merges


def _docs(spark, text):
    return spark.createDataFrame(
        [(1, text, "en", "web", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_learn_bpe_merges_hand_checked(spark):
    # freq: banana x3, bandana x2, a x5 — worked by hand:
    # round 1: (a,n) count 10; round 2: tie at 5 between (an,a) and
    # (b,an), lexicographic s1 picks (an,a); round 3: (b,an) 5.
    docs = _docs(spark, "banana banana banana bandana bandana a a a a a")
    rows = [tuple(r) for r in learn_bpe_merges(docs, k=3).collect()]
    assert rows == [
        (1, "a", "n", "an", 10),
        (2, "an", "a", "ana", 5),
        (3, "b", "an", "ban", 5),
    ]


def test_learn_bpe_merges_greedy_leftmost(spark):
    # 'aaaa' must merge greedily left-to-right: (a,a)->aa gives
    # [aa, aa], so round 2 learns (aa,aa) — a non-greedy overlap
    # count would disagree
    docs = _docs(spark, "aaaa aaaa aaaa")
    rows = [tuple(r) for r in learn_bpe_merges(docs, k=2).collect()]
    assert rows[0] == (1, "a", "a", "aa", 9)  # 3 adjacent pairs x3 words
    assert rows[1] == (2, "aa", "aa", "aaaa", 3)


def test_learn_bpe_merges_stops_when_dry(spark):
    # single-char words only: no adjacent pairs, zero merges
    docs = _docs(spark, "a b c a b c")
    assert learn_bpe_merges(docs, k=4).count() == 0


def test_learn_bpe_merges_filters_non_alpha(spark):
    # the shared tokenizer lowercases first (AB trains as ab, same as
    # the oracle's lower(text)); digit/emoji words are excluded by the
    # ^[a-z]+$ filter
    docs = _docs(spark, "AB AB 12 12 🚀🚀 ab")
    rows = [tuple(r) for r in learn_bpe_merges(docs, k=1).collect()]
    assert rows == [(1, "a", "b", "ab", 3)]


def test_bpe_oracles_match_engine_on_dry_corpus(spark, tmp_path):
    """The corpus dries after 1 merge (review finding: the oracle's
    cross join annihilated the vocab here) — both engines must return
    the early-stopped segmentation."""
    import duckdb

    from nycitibike_data_transform_spark.operators.bpe import (
        bpe_segment_oracle_sql,
        learn_bpe_merges,
    )

    docs = _docs(spark, "ab ab ab c c")
    docs.coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    _, seg = learn_bpe_merges(
        spark.read.parquet(f"{tmp_path}/documents.parquet"),
        k=5,
        return_segmentation=True,
    )
    from pyspark.sql import functions as F

    pieces = F.split(F.expr("substring(rep, 2, length(rep) - 2)"), "><")
    engine = {
        (r["word"], r["freq"], r["n_pieces"], r["pieces"])
        for r in seg.select(
            "word",
            "freq",
            F.size(pieces).cast("int").alias("n_pieces"),
            F.concat_ws(" ", pieces).alias("pieces"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = set(map(tuple, con.execute(bpe_segment_oracle_sql(5)).fetchall()))
    assert engine == oracle
    assert engine == {("ab", 3, 1, "ab"), ("c", 2, 1, "c")}
