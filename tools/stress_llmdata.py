"""Scaling stress for the r4 LLM-pipeline queries.

Builds a K× replica of sf0.1/documents by unioning id-shifted copies
(the shift is a multiple of the decontamination modulus, so benchmark
membership is preserved), then times the FIRST execution of a fresh
plan per query at 1× and K×.

What "passes": decontaminate / stratified_sample / source_mix_report
grow ~linearly in docs (no quadratic term: broadcast-semi-join, single
stratum shuffle, two-phase agg). dedup_clusters is a harder bar: every
replica group is a K-clique of exact dups, so its verified PAIR graph
grows ~K² per dup group — wall time growing ≈K (not K²) shows the
banded candidate join + label propagation stay bounded by docs+pairs,
never docs².

Measured at K=10 (50k docs, 250k verified pairs, 2026-08-13):
decontaminate 1.15×, stratified_sample 1.72×, source_mix_report 1.44×,
dedup_clusters 7.7× (vs ~100× pair growth — and down from 80× before
connected_components checkpointed its edge list; see graph.py),
dedup_incremental ~1× (banded cross-set join).

Round-5 run (2026-08-14, same K): decontaminate 1.94×, stratified
1.40×, source_mix 1.29×, dedup_clusters 9.7×, dedup_incremental ~1×,
span_dedup 1.73×, mixture_plan 1.26×, shard_manifest 1.19× — the span
pipeline's hash-count shuffle grows linearly even though every
replica group multiplies duplicate-span occurrences by K.

Late-r5 run (2026-08-14, K=10, 50k docs, incl. the new entries):
decontaminate 1.69×, stratified 1.56×, source_mix 1.36×,
dedup_clusters 7.05×, dedup_incremental 2.35×, span_dedup 1.58×,
span_strip 1.43×, mixture_plan 1.27×, shard_manifest 1.05×,
perplexity 1.11×, pack_render 1.48×, token_budget_select 4.67×,
global_shuffle 3.42×, bigram_lm 1.19×, containment_pairs 7.17× (vs
~100× true-pair growth), cdc_chunks 4.5×, split_leakage 4.57×,
padded_batches 1.66×, embedding_quantize 0.79×. All sub-linear in
work.

Usage: python tools/stress_llmdata.py [K] [scratch_dir]
Prints one JSON line with per-query [t_1x, t_Kx, ratio].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.queries import all_queries
from nycitibike_data_transform_spark.session import get_spark

QUERIES = (
    "decontaminate",
    "stratified_sample",
    "source_mix_report",
    "dedup_clusters",
    "dedup_incremental",
    # r5: span explode + hash-shuffle count + per-doc island merge —
    # K× docs means K× spans AND K× occurrences of every duplicated
    # span (replica groups), so ~K growth proves the count/join path
    # has no pairwise term
    "span_dedup",
    "span_strip",
    "mixture_plan",
    "shard_manifest",
    # r5 tail: vocab-count + ordered-fold (perplexity) and the packed
    # bin renderer (prefix sum + segment explode) — both linear shapes
    "perplexity_score",
    "pack_render",
    # r5 export batch: the two two-phase prefix sums (band/bucket
    # windows + metadata-sized offset tables) and the bigram
    # map-side-combinable count — all linear shapes
    "token_budget_select",
    "global_shuffle",
    "bigram_lm",
    # hard bar like dedup_clusters: replica groups are K-cliques of
    # exact dups, so TRUE containment pairs grow ~K² per dup group;
    # ~K wall growth shows the prefix-filter candidate join stays
    # bounded by docs + true pairs, never docs²
    "containment_pairs",
    # linear shapes: per-doc boundary flags + two doc-keyed shuffles
    # (cdc), and val-signatures × train-shingles cross probe (leakage)
    "cdc_chunks",
    "split_leakage",
    # late-r5: length-bucket rank decomposition (the offset table stays
    # #distinct-lengths-sized while docs grow K×) and the shuffle-free
    # per-vector quantization fold
    "padded_batches",
    "embedding_quantize",
)


def build(spark, factor: int, base: str) -> None:
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big = docs
    for i in range(1, factor):
        # shift is a multiple of 50 (the decontamination modulus) so
        # replica k of a benchmark doc stays a benchmark doc
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    big.repartition(32).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    big_emb = emb
    for i in range(1, factor):
        big_emb = big_emb.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    big_emb.repartition(32).write.mode("overwrite").parquet(
        f"{base}/embeddings.parquet"
    )


def time_fresh(spark, sf_dir: str, name: str, runs: int = 2) -> float:
    q = all_queries()[name]
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_llmdata_{factor}x"
    spark = get_spark("stress_llmdata")
    if not all(
        os.path.exists(f"{base}/{t}.parquet") for t in ("documents", "embeddings")
    ):
        build(spark, factor, base)
    n = spark.read.parquet(f"{base}/documents.parquet").count()
    out = {"factor": factor, "docs": n, "queries": {}}
    for name in QUERIES:
        t1 = time_fresh(spark, "/root/testdata/sf0.1", name)
        tk = time_fresh(spark, base, name)
        out["queries"][name] = {
            "t_1x": t1,
            f"t_{factor}x": tk,
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
