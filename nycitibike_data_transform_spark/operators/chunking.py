"""Document chunking — fixed-size overlapping token windows.

The standard pre-training/RAG preparation step: each document becomes
⌈(n_tokens − overlap)/step⌉ chunks of ``chunk_size`` tokens with
``overlap`` tokens shared between neighbors. Pure higher-order
functions (sequence/transform/slice), so chunk explosion happens
JVM-side inside codegen — no Python, no shuffle (a narrow 1→N map;
downstream repartition only if chunk skew matters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.text import normalize_text


def n_chunks_expr(n_tokens: Column, chunk_size: int, overlap: int) -> Column:
    step = chunk_size - overlap
    return F.greatest(
        F.ceil((n_tokens - F.lit(overlap)).cast("double") / F.lit(step)).cast("int"),
        F.lit(1),
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_chunk_tokens) per window.

    ``overlap`` must satisfy 0 ≤ overlap < chunk_size (validated at
    plan-build time). Every document yields ≥1 chunk (a short doc is
    its own single chunk), so no data silently disappears.
    """
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"overlap must be in [0, chunk_size), got {overlap}")
    step = chunk_size - overlap
    tokens = F.split(normalize_text(text_col), " ")
    n = F.size(tokens)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks_expr(n, chunk_size, overlap) - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(tokens, i * step + 1, chunk_size)).alias("chunk_text"),
            F.size(F.slice(tokens, i * step + 1, chunk_size)).alias("n_chunk_tokens"),
        ),
    )
    return df.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def cdc_chunks(
    df: DataFrame,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall where the
    rolling hash of the trailing ``window`` tokens hits a fixed
    pattern (first md5 hex char = '0' → expected chunk ≈ 16 tokens),
    instead of at fixed offsets. The property fixed-size chunking
    lacks: an insertion near the head only re-chunks UP TO the next
    content boundary — every later chunk is byte-identical, so
    chunk-hash dedup across document versions/mirrors still matches
    (the rsync/LBFS/storage-dedup trick, Muthitacharoen et al. 2001,
    applied to corpus text).

    Output: ``(id_col, chunk_id, n_chunk_tokens, chunk_text,
    chunk_hash)`` — chunk_id is 1-based per doc; empty docs yield no
    rows. A boundary cuts AFTER the token that completes the match.

    Scale shape: boundary flags are computed per doc inside codegen
    (one md5 per token over a ``window``-token slice — O(n·window)
    narrow work, no shuffle); the explode carries (pos, token, flag)
    rows into ONE per-doc window (shuffle on doc id) for the running
    boundary count, and one groupBy (doc, chunk) rebuilds chunk text
    via the sorted-struct fold. Same two linear shuffles as the span
    pipeline; the md5 chunk hash (32 bytes) is what any downstream
    cross-corpus dedup shuffles, never the chunk text.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    from pyspark.sql import Window as W

    from nycitibike_data_transform_spark.functions.text import token_array
    from nycitibike_data_transform_spark.operators.util import fan_out

    # fan before the boundary-flag projection (OPTIMIZATION_r16, guide
    # §2.6/§6): the O(n·window) per-token md5 slice hashing runs at the
    # scan, and a compact input (one parquet file ⇒ one task) would
    # compute every flag on one core — this operator builds its own
    # token arrays, so the r15 fan inside the shared tokenize() never
    # covered it. Interleaved A/B at sf0.1: min-of-5 1.576 → 1.435 s.
    # No-op at real scale (inputs already wide).
    base = fan_out(df).select(
        F.col(id_col), token_array(text_col).alias("__w")
    ).withColumn("__n", F.size("__w"))
    cells = F.expr(
        f"""transform(sequence(1, __n),
          i -> struct(
            i as pos,
            element_at(__w, i) as tok,
            CASE WHEN i >= {window}
                  AND substring(md5(concat_ws(' ',
                        slice(__w, i - {window} + 1, {window}))), 1, 1) = '0'
                 THEN 1 ELSE 0 END as b))"""
    )
    flagged = (
        base.filter(F.col("__n") > 0)
        .select(F.col(id_col), F.explode(cells).alias("c"))
        .select(id_col, "c.pos", "c.tok", "c.b")
    )
    w_prev = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    assigned = flagged.withColumn(
        "chunk_id", (F.coalesce(F.sum("b").over(w_prev), F.lit(0)) + 1).cast("int")
    )
    text = F.concat_ws(
        " ", F.expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)")
    )
    return (
        assigned.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_chunk_tokens"),
            text.alias("chunk_text"),
        )
        .withColumn("chunk_hash", F.md5("chunk_text"))
    )
