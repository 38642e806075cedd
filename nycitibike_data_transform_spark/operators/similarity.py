"""Similarity search over embedding columns (north-star, SURVEY.md §2.9).

Two tiers:

- **Brute-force cosine top-k** — exact baseline: broadcast the query
  set, zip_with/aggregate dot products JVM-side, rank with a window.
  Right answer, O(queries × corpus) — fine when the query set is small
  or as the verification tier.
- **LSH-bucketed top-k** — the scale path: sign-random-projection
  buckets (SimHash for vectors) prune the candidate space; exact
  cosine re-ranks within buckets. Recall is tunable via bands/bits.

All math in double via higher-order functions; no Python UDF in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.vectors import cosine_similarity
from nycitibike_data_transform_spark.operators.util import fan_out

# ------------------------------------------------------- brute force top-k

def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Physical shape: broadcast-nested-loop of corpus × queries with the
    dot product evaluated in codegen, then a per-query ranking window.
    Broadcast the smaller side (queries) — at 100 TB the corpus stays
    partitioned and never shuffles.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = fan_out(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cand_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("query_vec"), F.col("cand_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ------------------------------------------------- LSH (sign random proj.)

def _projection_vectors(dim: int, bits: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — dependency-free,
    reproducible across runs/machines)."""
    state = seed
    planes: list[list[float]] = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def srp_bucket(
    df: DataFrame, vec_col: str, dim: int, bits: int = 12, seed: int = 7
) -> DataFrame:
    """Append a sign-random-projection bucket id (int in [0, 2^bits))."""
    planes = _projection_vectors(dim, bits, seed)
    bucket = None
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("int"))


def _banded_buckets(
    df: DataFrame, out_id: str, dim: int, bits: int, bands: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec, band, bucket) rows — one per band, each band an
    independent SRP table (seed varies per band)."""
    out = None
    for band in range(bands):
        b = (
            srp_bucket(df, vec_col, dim, bits, seed=7 + 101 * band)
            .select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).alias(f"{out_id}_vec"),
                F.lit(band).alias("band"),
                "bucket",
            )
        )
        out = b if out is None else out.unionByName(b)
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 4,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: a candidate pair needs ALL bits equal in ANY
    of ``bands`` independent SRP tables (recall ≈ 1-(1-p^bits)^bands,
    p = 1-θ/π), then exact cosine re-ranks the candidates.

    Shuffle profile: corpus expands ×bands but the join is a linear
    equi-join on (band, bucket) — broadcastable when the query side is
    small; never O(corpus²). Tune bits↑ for precision (fewer
    candidates), bands↑ for recall."""
    cb = _banded_buckets(fan_out(corpus), "neighbor_id", dim, bits, bands, id_col, vec_col)
    qb = _banded_buckets(queries, "query_id", dim, bits, bands, id_col, vec_col)
    candidates = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_vec", "neighbor_id", "neighbor_id_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("query_id_vec"), F.col("neighbor_id_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
