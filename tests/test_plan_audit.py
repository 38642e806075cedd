"""Registry-wide plan regression guard.

Builds every registry query's physical plan through the same audit
used for PLAN_AUDIT.md and fails if any scale-hazard flag (BNLJ /
CartesianProduct / global whole-dataset Sort) appears on a query that
has not been explicitly reviewed and annotated in
tools/plan_audit.FLAG_NOTES. A new query that accidentally plans a
nested-loop join or a global sort breaks the suite instead of
shipping silently.
"""

from __future__ import annotations

from nycitibike_data_transform_spark.queries import all_queries

from tools.plan_audit import FLAG_NOTES, audit_one


def test_no_unreviewed_plan_hazards(spark, sf_dir):
    offenders = {}
    for name, spec in all_queries().items():
        flags = audit_one(spec.spark(spark, sf_dir))["flags"]
        if flags != "-" and name not in FLAG_NOTES:
            offenders[name] = flags
    assert not offenders, (
        f"unreviewed plan hazards: {offenders} — either fix the plan or "
        "add a reviewed justification to tools/plan_audit.FLAG_NOTES"
    )
