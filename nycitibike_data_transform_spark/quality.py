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


# ---- dbt_utils 1.1.1 generic tests not already covered above (the
# reference installs dbt_utils via packages.yml:2; these complete its
# test surface). Every check is a single-pass aggregate or one bounded
# join — violation-frame style, composable with check_all().

def equal_rowcount_violation(a: DataFrame, b: DataFrame) -> DataFrame:
    """``dbt_utils.equal_rowcount``: one violation row when counts
    differ (two count jobs — metadata-scale)."""
    ca, cb = a.count(), b.count()
    spark = a.sparkSession
    if ca == cb:
        return spark.createDataFrame([], "count_a long, count_b long")
    return spark.createDataFrame([(ca, cb)], "count_a long, count_b long")


def fewer_rows_than_violation(df: DataFrame, than: DataFrame) -> DataFrame:
    """``dbt_utils.fewer_rows_than``: violation when df has >= rows."""
    ca, cb = df.count(), than.count()
    spark = df.sparkSession
    if ca < cb:
        return spark.createDataFrame([], "count_df long, count_than long")
    return spark.createDataFrame([(ca, cb)], "count_df long, count_than long")


def not_null_proportion_violation(
    df: DataFrame, col: str, at_least: float
) -> DataFrame:
    """``dbt_utils.not_null_proportion``: one violation row when the
    non-null share of ``col`` falls below ``at_least``. Empty input
    passes (proportion of nothing is vacuously fine — matches
    dbt_utils, whose SQL yields no failing rows on empty relations)."""
    # try_divide: ANSI mode raises on the empty-relation 0/0 otherwise
    out = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.try_divide(F.count(col), F.count(F.lit(1))).alias("not_null_proportion"),
    )
    return out.filter(
        (F.col("n_rows") > 0) & (F.col("not_null_proportion") < at_least)
    )


def accepted_range_violations(
    df: DataFrame,
    col: str,
    min_value: object = None,
    max_value: object = None,
    inclusive: bool = True,
) -> DataFrame:
    """``dbt_utils.accepted_range``: rows outside [min, max]. NULLs
    pass (pair with not_null for strictness — dbt semantics)."""
    c = F.col(col)
    ok = F.lit(True)
    if min_value is not None:
        ok = ok & (c >= min_value if inclusive else c > min_value)
    if max_value is not None:
        ok = ok & (c <= max_value if inclusive else c < max_value)
    return df.filter(c.isNotNull() & ~ok)


def not_constant_violation(df: DataFrame, col: str) -> DataFrame:
    """``dbt_utils.not_constant``: one violation row when every
    (non-empty) relation row holds the same value."""
    out = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(col).alias("n_distinct"),
    )
    return out.filter((F.col("n_rows") > 0) & (F.col("n_distinct") <= 1))


def sequential_values_violations(
    df: DataFrame, col: str, interval: int = 1, partition_by: str | None = None
) -> DataFrame:
    """``dbt_utils.sequential_values``: rows whose value is not exactly
    ``interval`` past the previous row's (ordered by the column itself,
    optionally per partition). One shuffle; lag is windowed, no
    self-join."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_by) if partition_by else Window.partitionBy()
    ).orderBy(col)
    prev = F.lag(F.col(col)).over(w)
    return (
        df.withColumn("__prev", prev)
        .filter(F.col("__prev").isNotNull() & (F.col(col) != F.col("__prev") + interval))
        .drop("__prev")
    )


def mutually_exclusive_ranges_violations(
    df: DataFrame,
    lower_col: str,
    upper_col: str,
    partition_by: str | None = None,
) -> DataFrame:
    """``dbt_utils.mutually_exclusive_ranges`` (zero_length_forbidden +
    no overlaps): rows whose [lower, upper) is empty/inverted or
    overlaps the previous range in ``lower`` order. Windowed lag —
    O(n log n) per partition, never the naive O(n²) self-join."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_by) if partition_by else Window.partitionBy()
    ).orderBy(lower_col, upper_col)
    # materialize the lag BEFORE filtering — window expressions are
    # not allowed directly inside a WHERE clause
    prev = F.col("__prev_upper")
    bad = (F.col(lower_col) >= F.col(upper_col)) | (
        prev.isNotNull() & (F.col(lower_col) < prev)
    )
    return (
        df.withColumn("__prev_upper", F.lag(F.col(upper_col)).over(w))
        .filter(bad)
        .drop("__prev_upper")
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
