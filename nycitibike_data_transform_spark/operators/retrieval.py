"""Lexical retrieval over a token corpus — BM25 scoring and a bounded
inverted index.

The reference stages corpora but exposes no retrieval surface
(``ref:models/`` declares empty PREP/MART layers); these are
upgrade-class operators for the LLM-data brief: BM25 is the standard
lexical ranking function (Robertson et al., TREC-3; the Lucene
practical variant) used for retrieval-based quality filtering and
RAG-style passage selection, and the inverted index is its underlying
access structure — term -> document postings, the other half of the
similarity family next to the embedding ANN tiers
(``operators/similarity.py``).

Scale shapes (the 100 TB posture):

- ``bm25_scores`` filters the token stream to the query's terms BEFORE
  any shuffle — the per-(doc, term) aggregate's input is only the
  matching occurrences, not the corpus. Document length and the corpus
  scalars (N, avgdl) ride along as a 1-row broadcast; per-term document
  frequencies are a ``len(query_terms)``-row broadcast. Top-k is
  ``orderBy().limit()`` -> TakeOrderedAndProject, never a global sort.
- ``inverted_index`` bounds postings per term at ``postings_cap`` via a
  per-term rank window BEFORE collecting — the collected list is
  structurally <= cap rows regardless of how hot the term is, so a
  stop-word's postings never materialize unbounded (same banding
  discipline as ``selection.py``). df/total_tf stay exact: they
  aggregate the full stream map-side-combinably; only the *sample*
  postings are capped.

Determinism contract (hash-compared against DuckDB): BM25's ``ln`` is
libm-divergent, so each per-term score is rounded to 6 decimals and
summed as DECIMAL (order-free exact addition) — the final score is that
exact decimal sum cast to double. All hashes/ranks tie-break on ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.text import token_array

# Lucene-standard defaults (public constants, e.g. Lucene BM25Similarity).
BM25_K1 = 1.2
BM25_B = 0.75


def _terms_lit(query_terms: list[str]) -> Column:
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    return F.array(*[F.lit(t) for t in query_terms])


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-document BM25 score for a bag-of-terms query.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))        (Lucene form,
    always non-negative, so stop-words cannot flip a ranking sign).

    Only documents matching at least one query term appear (tf = 0
    contributes 0 — absent rows and zero rows agree). One corpus scan:
    the token array is built once, the query filter prunes it array-side
    (codegen, no explode of non-matching occurrences), and dl rides on
    the same row, so no separate doc-length join is needed.
    """
    terms = _terms_lit(query_terms)
    toks = token_array(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.filter(toks, lambda t: F.array_contains(terms, t)).alias("qtoks"),
    )
    # Corpus scalars: every doc counts toward N/avgdl, matching or not.
    scalars = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.ln(
        1.0
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    tf_d = F.col("tf").cast("double")
    norm = tf_d + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl)
    term_score = F.round(idf * tf_d * (k1 + 1.0) / norm, 6)
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            term_score.cast("decimal(38,6)").alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("term_score").cast("double").alias("score"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k BM25 matches, fully ordered, doc_id tie-break.
    ``orderBy().limit()`` compiles to TakeOrderedAndProject — per-
    partition heaps of k, never a global sort."""
    scored = bm25_scores(docs, query_terms, text_col, id_col, k1, b)
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings_cap: int = 5,
) -> DataFrame:
    """Bounded inverted index: per term, exact df (documents containing
    it) and total_tf (occurrences), plus a deterministic SAMPLE of the
    top ``postings_cap`` postings by (tf desc, doc_id asc) rendered as
    ``doc:tf`` pairs in doc_id order.

    The rank window partitions by term — at corpus scale the hottest
    term's partition is its df, which is why the *collected* postings
    are rank-capped first: ``collect_list`` only ever sees <= cap rows
    per term. df/total_tf come from the same per-(term, doc) aggregate,
    map-side combinable.
    """
    if postings_cap < 1:
        raise ValueError("postings_cap must be >= 1")
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(token_array(text_col)).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc_id"))
    top = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= postings_cap)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("doc_id", "tf"))
                    ),
                    lambda s: F.concat_ws(":", s["doc_id"], s["tf"]),
                ),
            ).alias("top_postings")
        )
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    return stats.join(top, "term").select(
        "term", "df", "total_tf", "top_postings"
    )
