"""One-session interleaved A/B for a registry query behind an env switch.

ROUND15_NOTES methodology: fresh-session pairs are unreliable on a box
whose throughput drifts on a minutes scale, so both variants run in the
SAME SparkSession, warmed once each, then N timed pairs with
alternating order; the verdict is min-per-variant (plus the paired
deltas for a drift sanity check).

Usage::

    python tools/ab_interleaved.py containment_pairs SPARK_GRAFT_CT_SETS legacy \
        [--sf-dir /root/testdata/sf0.1] [--pairs 5]

Variant A = env var UNSET (the new default path); variant B = env var
set to the given value (the legacy path). Prints one JSON line.
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
    ap.add_argument("query")
    ap.add_argument("env_var")
    ap.add_argument("env_value")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--pairs", type=int, default=5)
    args = ap.parse_args()

    from nycitibike_data_transform_spark.queries import _EAGER_CACHE, all_queries
    from nycitibike_data_transform_spark.session import get_spark

    spec = all_queries()[args.query]
    spark = get_spark(
        "ab_interleaved", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    def run(variant: str) -> float:
        if variant == "new":
            os.environ.pop(args.env_var, None)
        else:
            os.environ[args.env_var] = args.env_value
        _EAGER_CACHE.clear()
        t0 = time.time()
        spec.spark(spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.time() - t0, 3)

    warm = {"new": run("new"), "legacy": run("legacy")}
    runs: dict[str, list[float]] = {"new": [], "legacy": []}
    for i in range(args.pairs):
        order = ("new", "legacy") if i % 2 == 0 else ("legacy", "new")
        for v in order:
            runs[v].append(run(v))

    os.environ.pop(args.env_var, None)
    print(
        json.dumps(
            {
                "query": args.query,
                "switch": f"{args.env_var}={args.env_value}",
                "sf_dir": args.sf_dir,
                "warm": warm,
                "new_runs": runs["new"],
                "legacy_runs": runs["legacy"],
                "new_min": min(runs["new"]),
                "legacy_min": min(runs["legacy"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
