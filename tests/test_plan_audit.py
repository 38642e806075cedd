"""Registry-wide plan regression guard.

Builds every registry query's physical plan and fails if any quadratic
join shape (BroadcastNestedLoopJoin / CartesianProduct) appears on a
query that has not been explicitly reviewed and annotated in
tools/plan_audit.py's FLAG_NOTES. A new query that accidentally plans
a nested-loop join breaks the suite instead of shipping silently.
"""

from __future__ import annotations

from nycitibike_data_transform_spark.plans import formatted_plan
from nycitibike_data_transform_spark.queries import all_queries

from tools.plan_audit import FLAG_NOTES


def test_no_unreviewed_quadratic_joins(spark, sf_dir):
    offenders = {}
    for name, spec in all_queries().items():
        plan = formatted_plan(spec.spark(spark, sf_dir))
        flags = [
            f
            for f, marker in (
                ("BNLJ", "BroadcastNestedLoopJoin"),
                ("CART", "CartesianProduct"),
            )
            if marker in plan
        ]
        if flags and name not in FLAG_NOTES:
            offenders[name] = flags
    assert not offenders, (
        f"unreviewed quadratic join shapes: {offenders} — either fix the "
        "plan or add a reviewed justification to tools/plan_audit.FLAG_NOTES"
    )
