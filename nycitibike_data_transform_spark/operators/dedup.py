"""Deduplication operator family (north-star, SURVEY.md §2.9).

Four tiers, cheapest first — all pure DataFrame ops, no Python UDFs:

- **exact**: group on a normalized-text fingerprint; keep the min-id
  representative. One shuffle on the (md5) fingerprint — uniformly
  distributed, skew-free at any scale.
- **n-gram Jaccard**: exact shingle-set similarity via explode +
  self-join on shingle. Quadratic in the worst case — correct
  semantics baseline for the approximate tiers, and the one the
  DuckDB oracle can verify.
- **MinHash + LSH**: k permutation-hashed min-signatures, banded into
  LSH buckets; candidate pairs only join within a bucket. This is the
  100 TB path: shuffle cost is O(docs × bands), never O(docs²).
- **SimHash**: 64-bit weighted token hash; near-dups differ in few
  bits; grouping on band substrings finds candidates.

MinHash/SimHash use xxhash64/murmur (engine-specific bit patterns) so
they are rows-only checks for the driver; their *semantics* are pinned
by unit tests on known near-duplicate fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.text import normalize_text, text_fingerprint
from nycitibike_data_transform_spark.operators.util import fan_out

# ----------------------------------------------------------------- exact

def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per distinct normalized text: representative id (min),
    copy count, and the fingerprint. Map-side partial agg keeps the
    shuffle to one row per distinct fingerprint."""
    return (
        df.select(F.col(id_col), text_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def drop_exact_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep only the min-id representative row of each duplicate group
    (window-free: semi-join against the winners, preserving all source
    columns without shuffling the full payload through a window)."""
    winners = exact_dedup(df, text_col, id_col).select(id_col)
    return df.join(winners, id_col, "left_semi")


# -------------------------------------------------------- shingles / jaccard

def tokenize(df: DataFrame, text_col: str, out_col: str = "tokens") -> DataFrame:
    return df.withColumn(out_col, F.split(normalize_text(text_col), " "))


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-token shingles from a token array (higher-order
    functions only — runs inside codegen). Arrays shorter than ``n``
    yield an empty set (guarded: F.sequence(0, -1) would count *down*)."""
    idx = F.when(F.size(col) >= n, F.sequence(F.lit(0), F.size(col) - n)).otherwise(
        F.array().cast("array<int>")
    )
    joined = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(col, i + 1, n)))
    return F.array_distinct(joined)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact Jaccard-similar pairs over n-gram shingle sets.

    Plan: explode shingles → self-join on shingle (ids ordered to halve
    the pair space) → count common → join per-doc set sizes → filter by
    threshold. The shingle join is the scale hazard (hot shingles ⇒
    skew); the MinHash tier replaces it beyond moderate corpus sizes.
    """
    # The .distinct() below looks redundant (shingles() already dedups
    # within a doc) but is deliberately load-bearing: it plans as an
    # aggregate whose shuffle exchange AQE REUSES for all three
    # consumers (both self-join sides and the sizes aggregation), so
    # the shingle explosion is computed once, cluster-wide. Measured
    # alternatives — carrying sizes through the explode, repartition on
    # the join key, shuffle-hash hints — all re-plan to broadcast +
    # serial recomputation and run 3-9× slower at sf0.1.
    sh = (
        tokenize(df, text_col)
        .select(F.col(id_col), F.explode(shingles(F.col("tokens"), n)).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jaccard = F.col("common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("common")
    ).cast("double")
    return (
        common.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ minhash + lsh

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, h0..h{k-1}) MinHash signature per document.

    Shape matters here: explode the shingle set once, hash each shingle
    row ``num_hashes`` ways, then two-phase ``min`` aggregation.
    (The tempting alternative — ``array_min(transform(shingles, hash))``
    per hash — re-inlines the shingle-construction expression into all
    k transforms after Catalyst's projection collapse: k× the work.)
    Map-side partial mins reduce the shuffle to k longs per doc."""
    sh = tokenize(fan_out(df), text_col).select(
        F.col(id_col), F.explode(shingles(F.col("tokens"), n)).alias("shingle")
    )
    return sh.groupBy(id_col).agg(
        *[F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: equal band-slices of the MinHash signature
    land in the same bucket; only bucket-mates pair up.

    Shuffle profile: explode to (doc × bands) rows, hash-shuffle on
    (band, slice) — linear in corpus size. Downstream, verify
    candidates with ``ngram_jaccard_pairs`` semantics on the candidate
    subset only.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must divide evenly into bands")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"h{i}")
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


# ----------------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-duplicate pairs: cosine similarity over the
    embedding column at/above ``threshold``.

    This is the exact (all-pairs) tier — broadcast one side, evaluate
    the dot product in codegen, keep ordered pairs. At corpus scale,
    gate it behind ``similarity.cosine_topk_lsh``-style SRP blocking
    and run this only within candidate buckets.
    """
    from nycitibike_data_transform_spark.functions.vectors import dot_product, l2_norm

    # norms precomputed per vector BEFORE the pair join: the pair space
    # is O(n²), so anything computable per-row must not run per-pair
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), l2_norm(vec_col).alias("na")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), l2_norm(vec_col).alias("nb")
    )
    denom = F.col("na") * F.col("nb")
    cosine = F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        dot_product(F.col("vec_a"), F.col("vec_b")) / denom
    )
    return (
        fan_out(a)
        .join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ------------------------------------------------------------------ simhash

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: sum ±1 per bit over token hashes,
    take the sign. Expressed with explode + groupBy bit-sums (two-phase
    agg; one shuffle on doc id)."""
    toks = tokenize(fan_out(df), text_col).select(
        F.col(id_col), F.explode(F.array_distinct(F.col("tokens"))).alias("tok")
    )
    hashed = toks.select(F.col(id_col), F.xxhash64("tok").alias("h"))
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def hamming_distance64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
