"""Exact duplicate-span detection (substring-level dedup).

Detects token spans of a fixed width that occur more than once
anywhere in the corpus (across documents OR repeated within one
document) — the span-level analogue of exact document dedup, after
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), which removes repeated ~50-token substrings rather than
whole near-duplicate documents. North-star addition (SURVEY.md §2.9);
the reference has no text surface at all (its models are pure
relational SQL over ride feeds).

Scale shape (the 100 TB plan):

- tokenize + span-explode is a narrow per-row transform — ~n_tokens
  rows per document, same order of growth as the shingle pipeline in
  ``operators/dedup.py``;
- spans shuffle ONCE on their md5 hash for the occurrence count
  (map-side partial aggregation applies — duplicated spans collapse
  early), and the duplicated-hash set joins back to the span stream
  on the same key;
- interval merging (gaps-and-islands) runs per document: one shuffle
  on doc_id, windows sort within a document only — no global sort,
  no driver collect anywhere;
- the md5 span hash (not the raw span text) is what shuffles: 32
  bytes per span regardless of span width.

Everything is built-in Column expressions — no Python UDFs; the whole
pipeline stays inside whole-stage codegen except the two shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.text import normalize_text


def _token_array(text_col: str) -> F.Column:
    """Whitespace tokens of normalized text; NULL/blank → empty array
    (so downstream size/explode never see NULL)."""
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def duplicate_span_stats(
    docs: DataFrame,
    width: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicate-span statistics.

    A *span* is ``width`` consecutive whitespace tokens of the
    normalized text. A span is *duplicated* when its text occurs at
    ``min_count`` or more positions corpus-wide. Overlapping
    duplicated spans are merged into maximal intervals before counting
    covered tokens, so ``dup_tokens`` is the exact number of token
    positions lying inside at least one duplicated span.

    Returns one row per input document:
    ``(doc_id, n_tokens, n_spans, n_dup_spans, dup_tokens,
    dup_token_fraction)`` — documents shorter than ``width`` tokens
    get zero spans and fraction 0.0.
    """
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")

    base = docs.select(
        F.col(id_col).alias("doc_id"), _token_array(text_col).alias("__w")
    ).withColumn("__n_tokens", F.size("__w"))

    # (doc_id, pos, span-hash) — 1-based positions, matching SQL slice
    # semantics so the DuckDB oracle mirrors this expression exactly.
    span_structs = F.when(
        F.col("__n_tokens") >= width,
        F.expr(
            f"transform(sequence(1, __n_tokens - {width - 1}),"
            f" i -> struct(i as pos, concat_ws(' ', slice(__w, i, {width})) as span))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<pos:int,span:string>>"))
    spans = base.select(
        "doc_id", F.explode(span_structs).alias("__s")
    ).select("doc_id", F.col("__s.pos").alias("pos"), F.md5("__s.span").alias("__h"))

    dup_hashes = (
        spans.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= min_count)
        .select("__h")
    )
    dup_positions = spans.join(dup_hashes, "__h").select(
        "doc_id", "pos", (F.col("pos") + F.lit(width - 1)).alias("__end")
    )

    # Gaps-and-islands: merge overlapping [pos, pos+width-1] intervals
    # per document, then count covered token positions exactly.
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max("__end").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup_positions.withColumn(
        "__new_island",
        F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__new_island").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_doc = (
        islands.groupBy("doc_id", "__island")
        .agg(
            F.count(F.lit(1)).alias("__n_pos"),
            (F.max("__end") - F.min("pos") + F.lit(1)).alias("__covered"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("__n_pos").alias("__n_dup_spans"),
            F.sum("__covered").alias("__dup_tokens"),
        )
    )

    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("__n_tokens").cast("long").alias("n_tokens"),
            F.when(
                F.col("__n_tokens") >= width, F.col("__n_tokens") - F.lit(width - 1)
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_spans"),
            F.coalesce(F.col("__n_dup_spans"), F.lit(0)).cast("long").alias(
                "n_dup_spans"
            ),
            F.coalesce(F.col("__dup_tokens"), F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            F.round(
                F.when(F.col("__n_tokens") == 0, F.lit(0.0)).otherwise(
                    F.coalesce(F.col("__dup_tokens"), F.lit(0)).cast("double")
                    / F.col("__n_tokens")
                ),
                6,
            ).alias("dup_token_fraction"),
        )
    )
