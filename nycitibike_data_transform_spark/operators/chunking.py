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
