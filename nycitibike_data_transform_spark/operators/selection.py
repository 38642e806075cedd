"""Corpus selection and deterministic shuffling for training export.

Two export-time operators a training-data pipeline needs after
filtering/dedup have decided WHAT is eligible:

- ``token_budget_select``: greedy quality-ordered selection under a
  global token budget ("give me the best N-billion tokens"). The core
  computation is a cumulative token sum over the global quality order
  — the same GLOBAL-prefix-sum shape as ``operators/packing.py``, and
  the same textbook anti-pattern if written as one
  ``Window.orderBy(...)`` (the whole corpus through a single reducer).
  Implemented as the scalable two-phase prefix sum, bucketed on a
  monotone band of the ordering key.

- ``deterministic_shuffle``: a seeded, reproducible global shuffle
  order + shard assignment (training wants corpus order decorrelated
  from crawl/source order, and two runs with the same seed must
  produce byte-identical shards). The global rank over the md5 keys is
  again a two-phase prefix sum: the first two hex chars of the key ARE
  a monotone 256-way bucketing of the key order, so within-bucket
  ranks plus 256 bucket offsets reconstruct the exact global rank —
  no global sort, no single-reducer window.

- ``dsir_logratio_weights``: DSIR-style importance weights (Xie et
  al. 2023, "Data Selection for Language Models via Importance
  Resampling") — per-document log-likelihood ratio between a TARGET
  distribution and the raw corpus, for "select raw data that looks
  like my target domain" pipelines. Unigram variant (the order-free
  degenerate member of DSIR's hashed-n-gram family, same honesty note
  as perplexity_score); weights feed ``weighted_sample`` /
  ``token_budget_select`` or a plain top-k.

- ``dsir_hashed_ngram_weights``: the paper's FULL estimator — unigram
  + bigram features hashed into a fixed bucket space (VERDICT r14
  item 4), so word-order signal (code, math) contributes to the
  weights. Same one-pass explode + scalar-broadcast shape; the ratio
  table is bounded at B rows at any corpus size.

North-star additions (SURVEY.md §2.9); the reference has no corpus
surface (its models are relational SQL over ride feeds,
models/staging/*.sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from nycitibike_data_transform_spark.operators.packing import MAX_BUCKETS


def _null_guard(col: str, op: str) -> F.Column:
    """An error expression fused into a required column so the plan
    cannot prune the check away (same pattern as pack_sequences)."""
    return F.when(
        F.col(col).isNull(),
        F.raise_error(F.lit(f"{op}: NULL {col}")).cast("long"),
    )


def token_budget_select(
    docs: DataFrame,
    budget: int,
    score_col: str = "score",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy take-while selection under a global token budget.

    Documents are ranked by ``(score DESC, id ASC)`` — a total,
    deterministic order — and selected while the running token total
    stays ≤ ``budget`` (take-while: the first overflowing document
    stops the selection; later smaller documents are NOT back-filled,
    which keeps the output a pure prefix of the quality order and
    therefore stable under corpus growth at the tail).

    Output: one row per input doc —
    ``(id_col, score, n_tokens, cum_tokens, selected)`` where
    ``cum_tokens`` is the inclusive running total in selection order
    and ``selected`` is 1 for the kept prefix.

    Scale shape: two-phase global prefix sum. Docs bucket by a
    monotone band of ``-score`` (band width derived from the observed
    score range, per-band totals capped at ``MAX_BUCKETS`` rows);
    running sums run WITHIN bands in parallel, then the band totals —
    metadata-sized — get their own running sum and rejoin as base
    offsets. One shuffle of (id, score, n_tokens) triples; the corpus
    never serializes through one reducer. Caveat: a corpus where one
    score value dominates concentrates its band on one reducer — when
    every score is identical the operator falls back to bucketing by
    id (the order is then purely the id order, same as packing).

    ``id_col`` must be numeric non-NULL; NULL scores raise (a NULL
    would sort nondeterministically between engines).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    id_type = docs.schema[id_col].dataType
    if not isinstance(id_type, NumericType):
        raise TypeError(
            f"token_budget_select: id_col {id_col!r} must be numeric, got "
            f"{id_type.simpleString()}"
        )
    tok = (
        _null_guard(id_col, "token_budget_select")
        .when(
            F.col(score_col).isNull(),
            F.raise_error(F.lit(f"token_budget_select: NULL {score_col}")).cast("long"),
        )
        .otherwise(F.col(tokens_col).cast("long"))
    )
    d = docs.select(
        F.col(id_col),
        F.col(score_col).cast("double").alias("score"),
        tok.alias("__tok"),
    )

    # Band width from the observed score range — computed IN-PLAN as a
    # broadcast 1-row scalar instead of two eager ``.first()`` probes
    # (OPTIMIZATION_r15, guide §5: plan-build driver actions serialize
    # the whole scoring subtree into extra jobs before the real query
    # even starts; measured ~1.3 s of the sf0.1 wrapper's cost). The
    # two-phase prefix sum is exact for ANY monotone banding, so the
    # only requirement is that the CASE below reproduces the same
    # three regimes: empty input (any constant band), constant score
    # (bucket by id, like packing), and the generic shifted-quotient
    # band. All arithmetic mirrors the old driver-side Python float
    # ops as Spark double exprs (same IEEE semantics).
    params = d.agg(
        F.min("score").alias("__lo"),
        F.max("score").alias("__hi"),
        F.min(F.col(id_col).cast("double")).alias("__ilo"),
        F.max(F.col(id_col).cast("double")).alias("__ihi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(MAX_BUCKETS))
    # subnormal range underflowed the division: one band — degenerate
    # perf, still correct
    width = F.when(width <= F.lit(0.0), F.lit(1.0)).otherwise(width)
    span = F.col("__ihi") - F.col("__ilo") + F.lit(1.0)
    iw = F.greatest(F.lit(1).cast("long"), F.floor(span / F.lit(MAX_BUCKETS)) + 1)
    # floor of a monotone map of score, SHIFTED so the quotient is
    # bounded in [0, MAX_BUCKETS]: floor(-score/width) would overflow
    # the long cast (ANSI error / silent collapse) for large-magnitude
    # scores over a tiny range; (hi - score) is monotone DESC in score
    # and bounded by the range itself
    bucket = (
        F.when(F.col("__lo").isNull(), F.lit(0).cast("long"))
        .when(F.col("__hi") == F.col("__lo"), F.floor(F.col(id_col) / iw))
        .otherwise(F.floor((F.col("__hi") - F.col("score")) / width))
        .cast("long")
        .alias("__bucket")
    )
    d = d.crossJoin(F.broadcast(params)).select(id_col, "score", "__tok", bucket)

    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = d.withColumn("__run_in", F.sum("__tok").over(w_in))

    # per-band totals: ≤ MAX_BUCKETS rows — the single-partition window
    # here is over band metadata, not the corpus
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        d.groupBy("__bucket")
        .agg(F.sum("__tok").alias("__btot"))
        .withColumn("__base", F.coalesce(F.sum("__btot").over(w_b), F.lit(0)))
        .select("__bucket", "__base")
    )
    cum = F.col("__base") + F.col("__run_in")
    return (
        within.join(F.broadcast(bases), "__bucket")
        .select(
            F.col(id_col),
            F.col("score"),
            F.col("__tok").alias("n_tokens"),
            cum.cast("long").alias("cum_tokens"),
            (cum <= F.lit(budget)).cast("int").alias("selected"),
        )
    )


def deterministic_shuffle(
    docs: DataFrame,
    seed: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Seeded, reproducible global shuffle position + shard assignment.

    Each doc's shuffle key is ``md5(seed || ':' || id)``; the global
    position is the 1-based rank in ``(key ASC, id ASC)`` order and
    the shard is round-robin ``(position - 1) % n_shards``. Same seed
    → byte-identical order on any cluster size or engine (md5 is
    engine-portable, unlike xxhash64 whose seed handling differs).

    Scale shape: the first two hex chars of the key are a monotone
    256-way bucketing of the key order (fixed-width hex compares
    lexicographically == numerically), so the global rank decomposes
    into parallel within-bucket ``row_number``s plus 256 bucket-count
    offsets — a two-phase prefix sum; no global sort, no
    single-reducer window, one shuffle of (id, 32-byte key) pairs.

    Output: ``(id_col, shuffle_key, shuffle_pos, shard_id)``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # NULL-id guard fused into the key column itself (a separate guard
    # column would be pruned away; same pattern as pack_sequences)
    key = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"deterministic_shuffle: NULL {id_col}")).cast("string"),
    ).otherwise(
        F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    )
    d = docs.select(F.col(id_col), key.alias("shuffle_key"))
    bucket = F.conv(F.substring("shuffle_key", 1, 2), 16, 10).cast("int").alias("__bucket")
    d = d.select(id_col, "shuffle_key", bucket)

    w_in = Window.partitionBy("__bucket").orderBy(
        F.col("shuffle_key").asc(), F.col(id_col).asc()
    )
    within = d.withColumn("__rn", F.row_number().over(w_in))

    # ≤ 256 rows: offsets of each bucket in the global key order
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        d.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__base", F.coalesce(F.sum("__cnt").over(w_b), F.lit(0)))
        .select("__bucket", "__base")
    )
    pos = (F.col("__base") + F.col("__rn")).cast("long")
    return within.join(F.broadcast(bases), "__bucket").select(
        F.col(id_col),
        F.col("shuffle_key"),
        pos.alias("shuffle_pos"),
        ((pos - 1) % F.lit(n_shards)).cast("int").alias("shard_id"),
    )


def dsir_logratio_weights(
    docs: DataFrame,
    is_target,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights: per-document AVERAGE unigram
    log-likelihood ratio ln(p_target(w)) − ln(p_raw(w)), both
    distributions add-one-smoothed over the SHARED corpus vocabulary
    (target docs selected by the boolean Column ``is_target``; raw =
    the whole corpus, target included — DSIR's q vs p). Documents that
    read like the target domain score high; out-of-domain documents
    score negative. The average (not DSIR's raw sum) removes length
    bias so the weight is a rate, comparable across documents —
    callers wanting the paper's sum multiply by ``n_tokens``.

    Returns ``(id_col, n_tokens, dsir_logratio)`` for every tokenful
    document (token-less docs have no distribution and are omitted).

    Determinism (the perplexity_score idiom): the per-document Σ m·lr
    is a DOUBLE fold, executed in the SAME token order on both engines
    — Spark via ``F.aggregate`` over an ``array_sort``-ed struct list,
    the DuckDB oracle via an ORDER BY-qualified aggregate — and ln is
    transcendental, so the final rate is rounded to 6 (contract in
    queries/__init__.py).

    Scale shape (100 TB posture): one tokenize+explode pass feeds
    everything; shuffles are (doc, token) partial-agg, vocab on token,
    the ratio join back on token, and the per-doc fold on doc_id — all
    map-side combinable, no key wider than one document's vocabulary.
    The corpus scalars (N_target, N_raw, |V|) enter as a 1-row scalar
    broadcast (crossJoin, the adjudicated PLAN_AUDIT pattern); the
    per-token ratio table shuffles on token — no broadcast dependence
    on vocabulary size.
    """
    from nycitibike_data_transform_spark.functions.text import token_array

    tok_rows = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.cast("boolean").alias("__t"),
        F.explode(token_array(text_col)).alias("tok"),
    )
    return _dsir_ratio_fold(tok_rows, id_col, count_alias="n_tokens")


def hashed_ngram_features(text_col, n_buckets: int) -> F.Column:
    """DSIR's hashed n-gram feature array (Xie et al. 2023 §3: unigrams
    AND bigrams hashed into ``n_buckets`` buckets): for token sequence
    ``t_1..t_k``, the features are ``1:t_i`` for each token and
    ``2:t_i t_{i+1}`` for each adjacent pair (type prefixes keep the
    two feature spaces from colliding PRE-hash), each mapped to
    ``conv(md5(feat)[:8], 16, 10) % n_buckets``. md5-substring is the
    repo's one engine-portable hash (DuckDB: ``('0x' ||
    substr(md5(f),1,8))::BIGINT % B`` — the deterministic surrogate for
    the paper's xxhash; 8 hex chars fit a signed long, so no unsigned
    wrap on either engine). Pure Column expression — transform/sequence
    build the bigrams array-side, no UDF, no second explode pass.
    """
    from nycitibike_data_transform_spark.functions.text import token_array

    toks = token_array(text_col)
    uni = F.transform(toks, lambda t: F.concat(F.lit("1:"), t))
    big = F.when(
        F.size(toks) >= 2,
        F.transform(
            # sequence(1, k-1) would run DESCENDING for k=1 — guarded
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.lit("2:"),
                F.element_at(toks, i),
                F.lit(" "),
                F.element_at(toks, i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(uni, big),
        lambda feat: F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets),
    )


def dsir_hashed_ngram_weights(
    docs: DataFrame,
    is_target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """DSIR importance weights over the paper's hashed n-gram features
    (VERDICT r14 item 4 — the full estimator, not the unigram member):
    per-document average log-likelihood ratio between the target and raw
    bucket distributions, add-one-smoothed over the FIXED ``n_buckets``
    feature space (the hashed space has a known size, so smoothing uses
    ``B``, not the observed-vocabulary count the unigram variant uses).
    Word-order signal (code, math) survives via the bigram features.

    Returns ``(id_col, n_features, dsir_logratio)`` for every tokenful
    document — ``n_features`` = unigram + bigram occurrences = 2k−1 for
    a k-token doc. Token-less docs are omitted (no distribution), same
    contract as the unigram variant.

    Scale shape matches ``dsir_logratio_weights``: ONE feature-explode
    pass; shuffles on (doc, bucket) partial-agg, bucket, and doc; corpus
    scalars enter as a 1-row broadcast. The bucket table is ≤ B rows
    regardless of corpus size — at 100 TB the ratio join's build side is
    a bounded 10k-row relation, so the fold BROADCASTS it
    (``broadcast_ratio=True``): the per-(doc,bucket) count relation —
    the pipeline's largest — joins the ratio table as a broadcast hash
    join instead of being re-shuffled on bucket (guide §3.1/§2.4: one
    full shuffle of the big side removed at any scale; measured
    plan-shape SortMergeJoin → BroadcastHashJoin, locally neutral at
    sf0.1 — 3.43 s both sides, min-of-5 interleaved). The unigram
    variant keeps the shuffle join: its ratio table is the observed
    vocabulary, unbounded in corpus size.
    """
    feat_rows = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.cast("boolean").alias("__t"),
        F.explode(hashed_ngram_features(text_col, n_buckets)).alias("tok"),
    )
    return _dsir_ratio_fold(
        feat_rows,
        id_col,
        count_alias="n_features",
        smooth_v=F.lit(n_buckets),
        # broadcast only while the ratio table is broadcast-SIZED
        # (ADVICE r15): n_buckets is caller-controlled, and a huge
        # bucket space (1e8+) would force a multi-GB broadcast build
        # side; ~16 bytes/row keeps 4M buckets under ~100 MB framed —
        # past that, fall back to the shuffle join like the unigram
        # variant
        broadcast_ratio=n_buckets <= 4_000_000,
    )


def _dsir_ratio_fold(
    feat_rows: DataFrame,
    id_col: str,
    count_alias: str,
    smooth_v: F.Column | None = None,
    broadcast_ratio: bool = False,
) -> DataFrame:
    """Shared DSIR pipeline from exploded (doc_id, __t, tok) feature
    rows to per-doc average log-ratio: per-(doc,feature) counts →
    feature-marginal counts → 1-row scalar broadcast → smoothed ratio →
    deterministic per-doc fold (array_sort by feature key, so the
    DOUBLE additions run in the same order as the oracle's ORDER
    BY-qualified aggregate). ``smooth_v`` is the smoothing denominator
    — observed-vocabulary count when None (unigram), the fixed bucket
    count for hashed features. ``broadcast_ratio`` marks the ratio
    table as a broadcast build side — ONLY safe when the feature space
    is bounded by construction (the hashed-bucket variant); the
    unigram ratio table grows with the corpus vocabulary and must stay
    a shuffle join."""
    per = feat_rows.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("__m"),
        # is_target is constant per document; first() under the
        # (doc, tok) group is that constant
        F.first("__t").alias("__t"),
    )
    vocab = per.groupBy("tok").agg(
        F.sum("__m").alias("__cr"),
        F.sum(F.when(F.col("__t"), F.col("__m")).otherwise(F.lit(0))).alias(
            "__ct"
        ),
    )
    scalars = vocab.agg(
        F.sum("__cr").alias("__nr"),
        F.sum("__ct").alias("__nt"),
        F.count(F.lit(1)).alias("__v"),
    )
    v = F.col("__v") if smooth_v is None else smooth_v
    ratio = vocab.crossJoin(F.broadcast(scalars)).select(
        "tok",
        (
            F.log(
                (F.col("__ct") + 1).cast("double")
                / (F.col("__nt") + v).cast("double")
            )
            - F.log(
                (F.col("__cr") + 1).cast("double")
                / (F.col("__nr") + v).cast("double")
            )
        ).alias("__lr"),
    )
    if broadcast_ratio:
        ratio = F.broadcast(ratio)
    return (
        per.join(ratio, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("__m").alias("__n"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("tok", "__m", "__lr"))),
                F.lit(0.0),
                lambda acc, x: acc + x["__m"].cast("double") * x["__lr"],
            ).alias("__s"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            F.col("__n").cast("long").alias(count_alias),
            F.round(F.col("__s") / F.col("__n"), 6).alias("dsir_logratio"),
        )
    )
