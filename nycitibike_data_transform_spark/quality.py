"""Data-quality assertions — the dbt-schema-test analogue.

The reference *intends* data tests every cycle (reference
``setup_script.sh:8`` runs ``dbt test --data``) but ships zero test
definitions and the flag doesn't exist under its dbt version
(SURVEY.md §5.1). These are the checks it should have had, as engine
capabilities: each returns a violations DataFrame (empty = pass) so
callers can assert, quarantine, or alert; ``check_all`` raises with a
compact report.

Each check is a single aggregation/filter — distributed, no collect of
data rows; only violation SAMPLES come back to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Key groups appearing more than once (the invariant the staged
    rides join depends on: dim keys must be unique or left joins fan
    out — SURVEY.md §5.2)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def not_null_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    cond = None
    for c in cols:
        piece = F.col(c).isNull()
        cond = piece if cond is None else cond | piece
    return df.filter(cond)


def accepted_values_violations(
    df: DataFrame, col: str, values: Sequence[object], allow_null: bool = True
) -> DataFrame:
    cond = ~F.col(col).isin(list(values))
    if allow_null:
        cond = cond & F.col(col).isNotNull()
    else:
        cond = cond | F.col(col).isNull()
    return df.filter(cond)


def relationship_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential integrity: child keys with no parent (anti-join —
    one broadcast when the parent is a dim)."""
    return (
        child.filter(F.col(child_key).isNotNull())
        .join(parent, child[child_key] == parent[parent_key], "left_anti")
    )


def expression_violations(df: DataFrame, expr: Column) -> DataFrame:
    """Rows where a boolean invariant does NOT hold (NULL counts as a
    violation — an unknown invariant is a broken invariant)."""
    return df.filter(~F.coalesce(expr, F.lit(False)))


def freshness_violation(
    df: DataFrame, ts_col: str, max_age_seconds: int, now: object
) -> DataFrame:
    """Source-freshness check (the dbt ``source freshness`` analogue,
    matching the reference's 4-hour cadence SLO): returns a one-row
    violation frame when the newest row is older than ``max_age`` —
    or when the source is EMPTY (newest_row NULL): a feed that
    stopped producing entirely is the stalest feed of all, and the
    naive ``age > max`` comparison would silently wave it through
    (NULL compares to nothing).
    ``now`` is passed in (a datetime) so checks are reproducible."""
    age = F.unix_micros(F.lit(now).cast("timestamp")) - F.unix_micros(F.max(F.col(ts_col)))
    out = df.agg(
        F.max(ts_col).alias("newest_row"),
        (age / 1_000_000).alias("age_seconds"),
    )
    return out.filter(
        (F.col("age_seconds") > max_age_seconds) | F.col("newest_row").isNull()
    )


class QualityError(AssertionError):
    pass


def check_all(named_checks: dict[str, DataFrame], sample: int = 5) -> None:
    """Evaluate every check; raise one QualityError naming each failed
    check with its violation count and a small sample."""
    failures: list[str] = []
    for name, violations in named_checks.items():
        n = violations.count()
        if n:
            rows = violations.limit(sample).collect()
            failures.append(f"{name}: {n} violations, e.g. {[tuple(r) for r in rows]}")
    if failures:
        raise QualityError("; ".join(failures))
