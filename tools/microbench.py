"""Pre-commit plan-shape probe for a single registry query.

VERDICT r12 process note: the r12 "zero-shuffle" rewrite of
``repetition_strip`` was 70× slower and still reached a commit before
the full bench sweep caught it.  This tool is the missing pre-commit
step: time ONE registry query, min-of-N after a warm-up run, at a small
SF — seconds of feedback instead of a 4-minute sweep.

Workflow rule (ROUND13_NOTES): any diff that changes a registry query's
plan shape runs this FIRST, on both sides of the diff (``git stash``
makes that a 30-second check), and the before/after numbers go in the
commit message or round notes.

Usage::

    python tools/microbench.py repetition_strip                # sf0.01
    python tools/microbench.py span_strip --sf-dir /root/testdata/sf0.1
    python tools/microbench.py dedup_near --runs 5 --explain

Prints one JSON line: ``{"query": ..., "sf_dir": ..., "warm_sec": ...,
"min_sec": ..., "runs": [...], "exchanges": N, "foreign_cpu_sec": ...}``.
``foreign_cpu_sec`` is bench.py's co-tenant stamp over the timed block
(VERDICT r13 item 8): probe numbers feed commit decisions, so they
carry the same contamination evidence as graded bench runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("query", help="registry query name (see queries())")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=3, help="timed runs after warm-up")
    ap.add_argument(
        "--explain", action="store_true", help="also print the formatted plan"
    )
    args = ap.parse_args()

    from nycitibike_data_transform_spark.plans import count_exchanges
    from nycitibike_data_transform_spark.queries import _EAGER_CACHE, all_queries
    from nycitibike_data_transform_spark.session import get_spark

    registry = all_queries()
    if args.query not in registry:
        sys.exit(f"unknown query {args.query!r}; try: {', '.join(sorted(registry))}")
    spec = registry[args.query]
    spark = get_spark(
        "microbench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    from bench import _CLK_TCK, _foreign_cpu_delta_jiffies, _foreign_cpu_samples

    foreign_before = _foreign_cpu_samples()
    t0 = time.time()
    df = spec.spark(spark, args.sf_dir)
    df.write.mode("overwrite").format("noop").save()
    warm = time.time() - t0
    if args.explain:
        df.explain("formatted")

    runs: list[float] = []
    for _ in range(args.runs):
        # time FRESH plans, not memo hits (same discipline as bench.py)
        _EAGER_CACHE.clear()
        t0 = time.time()
        spec.spark(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(round(time.time() - t0, 3))

    print(
        json.dumps(
            {
                "query": args.query,
                "sf_dir": args.sf_dir,
                "warm_sec": round(warm, 3),
                "min_sec": min(runs),
                "runs": runs,
                "exchanges": count_exchanges(df),
                "foreign_cpu_sec": round(
                    _foreign_cpu_delta_jiffies(
                        foreign_before, _foreign_cpu_samples()
                    )
                    / _CLK_TCK,
                    1,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
