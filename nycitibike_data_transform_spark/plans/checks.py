"""Plan-shape assertions — the engine's scale contract, made testable.

The reference delegates planning to BigQuery and can't see it
(SURVEY.md §4); we CAN see Catalyst's physical plan, so the properties
that matter at 100 TB — filters reaching the parquet scan, projections
pruning the read schema, dimensions broadcasting, no gratuitous
exchanges — are pinned by tests instead of hoped for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(
        df
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries on every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (column-pruning
    evidence: a 2-column projection must not scan 16 columns)."""
    plan = formatted_plan(df)
    schemas: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        schemas.append(cols)
    return schemas
