"""Whole-registry scale stress (VERDICT r6 item #2): build a complete,
cross-table-consistent K× replica of sf0.1 ("sf1" at K=10) and time the
FIRST execution of a fresh plan for EVERY registry query at 1× and K×,
reporting per-query and per-family wall ratios.

Replica construction (conventions shared with the per-family stress
tools, so the same invariants hold):

- ``lineitem`` / ``orders``: orderkey-shifted copies (stress_relational's
  growth mode — dimensions stay 1×, per-dimension fan-in grows K×).
- ``documents`` / ``embeddings``: id-shifted copies; the shift is a
  multiple of the decontamination modulus so benchmark membership is
  preserved, and document↔embedding id pairing is preserved per copy.
- ``events``: event_id- AND user_id-shifted copies — the user domain
  grows K× (sessionize/streak/funnel group counts grow linearly, the
  realistic growth mode), while the time span stays fixed (per-hour
  densities grow K×).
- dims (``region nation customer supplier part``) + the aux-NYC fixture
  inputs: unchanged (1×).

Reading the ratios: linear shapes should land ≈K (±JVM noise; small
queries are dominated by fixed per-job overhead and land well BELOW K).
Known super-linear-by-SEMANTICS queries — replica groups are K-cliques
of near-dups, so their TRUE OUTPUT grows ~K² — are listed in
``OUTPUT_QUADRATIC`` with the invariant that wall growth must stay far
below K² (pair-bounded, never corpus²-bounded).

Usage: python tools/stress_full.py [K] [scratch_dir] [query ...]
Prints one JSON line: {query: [t_1x, t_Kx, ratio]} + per-family rollup.
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

BASE = "/root/testdata/sf0.1"
_DOC_SHIFT = 10_000_000  # multiple of 50 = decontamination modulus
_KEY_SHIFT = 1_000_000_000

# true output grows ~K² per replica dup-group; wall must stay << K²
OUTPUT_QUADRATIC = {
    "ngram_jaccard",
    "minhash_pairs",
    "dedup_near",
    "dedup_clusters",
    "containment_pairs",
    "crossmodal_dup_check",
    "fuzzy_name_pairs",
    "edit_distance_pairs",
    "span_dedup",
    "split_leakage",
}


def _replicate(df, factor: int, shifts: dict[str, int]):
    big = df
    for i in range(1, factor):
        copy = df
        for col, step in shifts.items():
            copy = copy.withColumn(col, F.col(col) + F.lit(i * step))
        big = big.unionByName(copy)
    return big


def build(spark, factor: int, base: str) -> None:
    plans = {
        "lineitem": {"l_orderkey": _KEY_SHIFT},
        "orders": {"o_orderkey": _KEY_SHIFT},
        "documents": {"doc_id": _DOC_SHIFT},
        "embeddings": {"vec_id": _DOC_SHIFT},
        "events": {"event_id": _DOC_SHIFT, "user_id": _DOC_SHIFT},
    }
    for table in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        src = spark.read.parquet(f"{BASE}/{table}.parquet")
        out = _replicate(src, factor, plans.get(table, {})) if table in plans else src
        out.repartition(32).write.mode("overwrite").parquet(
            f"{base}/{table}.parquet"
        )


def time_fresh(spark, sf_dir: str, name: str, runs: int = 1) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        q = all_queries()[name]
        # construction included: EAGER (training) queries work here
        df = q.spark(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def family_of(name: str) -> str:
    for mod_name in (
        "core", "marts", "relational", "advanced",
        "events", "llmdata", "aux_nyc", "textprep", "dbt_compat",
    ):
        mod = __import__(
            f"nycitibike_data_transform_spark.queries.{mod_name}",
            fromlist=["QUERIES"],
        )
        if name in mod.QUERIES:
            return mod_name
    return "?"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_full_{factor}x"
    names = sys.argv[3:] or list(all_queries())
    spark = get_spark("stress_full")
    if not os.path.exists(f"{base}/_BUILT"):
        build(spark, factor, base)
        open(f"{base}/_BUILT", "w").write(str(factor))
    # session warmup: JVM/codegen cold-start otherwise lands entirely
    # on the first few 1× timings and poisons their ratios
    for w in ("pricing_summary", "text_stats", "dedup_exact"):
        time_fresh(spark, BASE, w)
    out: dict[str, list[float]] = {}
    fam: dict[str, list[float]] = {}
    for name in names:
        try:
            # min-of-2 on the small 1× side (discards residual compile
            # noise); single fresh run at K× where real work dominates
            t1 = time_fresh(spark, BASE, name, runs=2)
            tk = time_fresh(spark, base, name)
        except Exception as exc:  # keep the sweep going; report the failure
            out[name] = [str(exc)[:120]]  # type: ignore[list-item]
            continue
        ratio = round(tk / t1, 2) if t1 > 0 else float("inf")
        out[name] = [t1, tk, ratio]
        f = family_of(name)
        fam.setdefault(f, [0.0, 0.0])
        fam[f][0] += t1
        fam[f][1] += tk
        print(f"{name}: {t1} -> {tk}  ({ratio}x)", file=sys.stderr, flush=True)
    rollup = {
        f: [round(a, 1), round(b, 1), round(b / a, 2) if a else None]
        for f, (a, b) in sorted(fam.items())
    }
    print(json.dumps({"factor": factor, "queries": out, "families": rollup}))


if __name__ == "__main__":
    main()
