"""BPE merge induction — learn byte-pair-encoding merges from a
corpus (Sennrich et al. 2016), the tokenizer-training step of an LLM
data pipeline (north-star addition, SURVEY.md §2.9; the counting
side of ``bpe_token_count`` already ships — this learns the merges
that tokenizer applies).

Algorithm (k rounds): symbolize each distinct word into characters;
each round, count adjacent symbol pairs corpus-wide (weighted by word
frequency), pick the most frequent pair (ties: lexicographic), and
merge every occurrence greedily left-to-right.

Engine-portable exact semantics: a word's symbolization is a
bracketed string ``<s><y><m>``; applying a merge is ONE string
``replace('<a><b>' → '<ab>')`` — both Spark and DuckDB scan
left-to-right non-overlapping, which IS greedy BPE merging (verified:
``<b><a><b><a>`` → ``<ba><ba>``), and the bracket framing makes a
cross-symbol false match impossible because ``<``/``>`` never occur
inside a symbol (words are filtered to ``^[a-z]+$``; the filter also
pins both engines to one-codepoint-per-char semantics — Java regex
walks UTF-16 units, DuckDB walks codepoints, so astral characters
would symbolize differently). The DuckDB oracle replays the SAME k
rounds as a chained CTE pipeline, making the driver gate an exact
end-to-end check of an iterative algorithm (the connected-components
precedent).

Scale shape: the corpus is scanned ONCE into a word-frequency vocab
(cached — vocab-sized, not corpus-sized); each round is a
vocab-local pair count (map-side combinable, one shuffle on the pair
key) plus a 1-row argmax collect — the learned model parameter, the
same driver-side footprint as the IVF k-means centroids. k rounds =
k tiny jobs over the cached vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MERGES_SCHEMA = (
    "step int, left_sym string, right_sym string, merged string, pair_count long"
)


def learn_bpe_merges(
    docs: DataFrame, k: int = 5, return_segmentation: bool = False
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Learn ``k`` BPE merges from ``docs.text``; returns one row per
    learned merge (step, left_sym, right_sym, merged, pair_count).
    Stops early if no adjacent pair remains. With
    ``return_segmentation=True`` also returns the final segmented
    vocab (word, freq, rep) — the merges APPLIED."""
    from nycitibike_data_transform_spark.functions.text import token_array

    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(token_array("text")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.col("w").alias("word"),
            "freq",
            F.regexp_replace(F.col("w"), "(.)", "<$1>").alias("rep"),
        )
        .persist()
    )
    try:
        merges: list[tuple[int, str, str, str, int]] = []
        cur = vocab
        for step in range(1, k + 1):
            lists = cur.select(
                "freq",
                F.split(
                    F.expr("substring(rep, 2, length(rep) - 2)"), "><"
                ).alias("l"),
            ).filter(F.size("l") > 1)
            pairs = lists.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("l"), 1, F.size("l") - 1),
                        F.slice(F.col("l"), 2, F.size("l") - 1),
                        lambda a, b: F.struct(a.alias("s1"), b.alias("s2")),
                    )
                ).alias("p"),
            )
            counts = pairs.groupBy("p.s1", "p.s2").agg(
                F.sum("freq").cast("long").alias("cnt")
            )
            best = counts.orderBy(
                F.col("cnt").desc(), F.col("s1"), F.col("s2")
            ).limit(1).collect()
            if not best:
                break
            s1, s2, cnt = best[0]["s1"], best[0]["s2"], best[0]["cnt"]
            merges.append((step, s1, s2, s1 + s2, cnt))
            cur = cur.withColumn(
                "rep",
                F.replace(
                    F.col("rep"),
                    F.lit(f"<{s1}><{s2}>"),
                    F.lit(f"<{s1}{s2}>"),
                ),
            )
        merges_df = spark.createDataFrame(merges, _MERGES_SCHEMA)
        if return_segmentation:
            # Materialize the segmentation into its own cache WHILE the
            # vocab cache is still hot, so the caller's consumption does
            # not re-derive the vocab with a full extra corpus scan
            # (ADVICE r5). The segmentation cache is vocab-sized
            # (distinct words), not corpus-sized; the caller may
            # .unpersist() it when done.
            seg = cur.persist()
            seg.count()
            return merges_df, seg
        return merges_df
    finally:
        vocab.unpersist()


def bpe_merges_oracle_sql(k: int = 5) -> str:
    """The SAME k rounds as a chained-CTE DuckDB pipeline (one
    cnt/best/sym level per round), so the correctness gate replays the
    iteration exactly rather than spot-checking it."""
    parts = [
        r"""WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt FROM documents
),
words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(nt, ' ')) AS w FROM norm
        WHERE length(coalesce(nt, '')) > 0)
  WHERE regexp_matches(w, '^[a-z]+$')
  GROUP BY 1
),
sym1 AS (
  SELECT w, freq, regexp_replace(w, '(.)', '<\1>', 'g') AS rep FROM words
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
cnt{i} AS (
  SELECT s1, s2, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, l[i] AS s1, l[i+1] AS s2
    FROM (SELECT freq,
                 string_split(substring(rep, 2, length(rep) - 2), '><') AS l
          FROM sym{i})
         , unnest(generate_series(1, len(l) - 1)) AS t(i)
    WHERE len(l) > 1
  ) GROUP BY 1, 2
),
best{i} AS (SELECT s1, s2, cnt FROM cnt{i} ORDER BY cnt DESC, s1, s2 LIMIT 1),
sym{i + 1} AS (
  -- LEFT JOIN, not a cross join: when round {i} finds no pair,
  -- best{i} is empty and a cross join would annihilate the vocab,
  -- diverging from the engine's early-stop segmentation (review
  -- finding); coalesce keeps the unmerged rep in that case
  SELECT w, freq,
         coalesce(replace(rep, '<' || s1 || '><' || s2 || '>',
                          '<' || s1 || s2 || '>'), rep) AS rep
  FROM sym{i} LEFT JOIN best{i} ON TRUE
)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, s1 AS left_sym, s2 AS right_sym, "
        f"s1 || s2 AS merged, cnt AS pair_count FROM best{i}"
        for i in range(1, k + 1)
    )
    return "".join(parts) + "\n" + selects


def bpe_segment_oracle_sql(k: int = 5) -> str:
    """The same k-round chain, finished with the segmentation of the
    vocab under the learned merges (one row per distinct word)."""
    chain = bpe_merges_oracle_sql(k)
    chain = chain[: chain.index("\nSELECT 1 AS step")]
    return (
        chain
        + f"""
SELECT w AS word, freq,
       CAST(len(l) AS INTEGER) AS n_pieces,
       array_to_string(l, ' ') AS pieces
FROM (SELECT w, freq,
             string_split(substring(rep, 2, length(rep) - 2), '><') AS l
      FROM sym{k + 1})
"""
    )
