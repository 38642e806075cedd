"""dbt_utils macro surface, Spark-first (SURVEY.md §2 completeness —
the reference installs dbt-labs/dbt_utils 1.1.1 via ``packages.yml:2``
and never calls it in its checked-in models; this module closes that
last parity row so a reference user's dbt_utils-based models port
directly). Semantics follow the PUBLIC dbt_utils 1.1.1 documentation;
everything compiles to built-in Column expressions — no UDFs, no
driver-side work, all shapes linear.

Implemented here (the macros with real query-side behavior):

- ``generate_surrogate_key`` — md5 over '-'-joined stringified
  columns with dbt_utils' literal NULL sentinel.
- ``safe_divide`` — NULL on NULL/zero denominator.
- ``star`` — all columns except an exclusion list.
- ``date_spine`` — one row per period in [start, end).
- ``deduplicate`` — keep one row per key by an explicit ordering.

Already covered elsewhere (no second implementation): ``pivot`` /
``unpivot`` (native ``DataFrame.pivot`` / ``unpivot`` — registry
queries ``pivot_qty_by_status``, ``unpivot_money``),
``union_relations`` (``operators/conform.py:conform_union``),
``haversine_distance`` (``functions/geo.py``), and the generic data
tests (``quality.py`` — extended with the dbt_utils-only ones).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# dbt_utils 1.1.1's exact NULL placeholder — keys must match a dbt
# warehouse bit-for-bit so a migration can join old and new tables
SURROGATE_KEY_NULL = "_dbt_utils_surrogate_key_null_"


def generate_surrogate_key(*cols: str | Column) -> Column:
    """``dbt_utils.generate_surrogate_key``: md5 of the '-'-joined
    coalesced string casts. NULLs render as the dbt_utils sentinel
    literal, so NULL != '' (the collision dbt_utils 0.x had and 1.x
    fixed). Deterministic, engine-portable (md5 of the same bytes)."""
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit(SURROGATE_KEY_NULL))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def safe_divide(numerator: Column, denominator: Column) -> Column:
    """``dbt_utils.safe_divide``: NULL when the denominator is NULL or
    zero — never a DIVIDE_BY_ZERO error (ANSI mode) or Inf/NaN."""
    return F.when(
        denominator.isNull() | (denominator == 0), F.lit(None)
    ).otherwise(numerator / denominator)


def star(df: DataFrame, except_: Sequence[str] = ()) -> list[Column]:
    """``dbt_utils.star``: every column except the exclusions —
    validated so a typo'd exclusion fails at plan build, not silently."""
    missing = set(except_) - set(df.columns)
    if missing:
        raise ValueError(f"star(): except columns not in relation: {sorted(missing)}")
    return [F.col(c) for c in df.columns if c not in set(except_)]


_SPINE_STEPS = {"day": "interval 1 day", "week": "interval 7 day",
                "hour": "interval 1 hour", "month": "interval 1 month",
                "year": "interval 1 year"}


def date_spine(
    spark: SparkSession, datepart: str, start_date: str, end_date: str
) -> DataFrame:
    """``dbt_utils.date_spine``: row i is ``start_date + i·datepart``
    for ``0 <= i < datediff(datepart, start_date, end_date)`` — dbt's
    exact construction (dateadd over a generated index), so the end
    bound is EXCLUSIVE and every emitted row is < ``end_date``.

    Calendar steps (month/year) count BOUNDARY CROSSINGS for n and add
    whole calendar units from the ORIGINAL start (day-of-month clamps
    per-addition, e.g. Jan-31 + 1 month = Feb-28/29, + 2 = Mar-31):
    the naive ``sequence(start, end - step, step)`` form silently drops
    the final period whenever start's day-of-month exceeds end's
    (2024-01-31 → 2024-04-15 must yield Jan-31, Feb-29, Mar-31).
    Uniform steps (hour/day/week) keep the sequence form — week means
    7-day steps from start (every row lands in [start, end)), not
    dbt-datediff's week-boundary count, which can omit start itself.

    Bounds enter the plan as bound ``lit`` values, never interpolated
    into SQL text. Built from a 1-row relation: the spine is bounded
    by the date range, never by any fact table, so it broadcasts into
    densification joins."""
    if datepart not in _SPINE_STEPS:
        raise ValueError(
            f"unsupported datepart {datepart!r}; one of {sorted(_SPINE_STEPS)}"
        )
    col = "date_" + datepart
    base = spark.range(1).select(
        F.to_timestamp(F.lit(start_date)).alias("__start"),
        F.to_timestamp(F.lit(end_date)).alias("__end"),
    )
    if datepart in ("month", "year"):
        if datepart == "month":
            n = (
                (F.year("__end") - F.year("__start")) * 12
                + (F.month("__end") - F.month("__start"))
            ).cast("int")
        else:
            n = (F.year("__end") - F.year("__start")).cast("int")
        # sequence(0, n-1) raises on n <= 0 (illegal boundaries) — an
        # empty [start, end) must yield an empty spine, not an error;
        # CASE evaluates only the taken branch
        idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
            F.array().cast("array<int>")
        )
        spine = base.select(F.explode(idx).alias("__i"), "__start").select(
            F.expr(f"timestampadd({datepart.upper()}, __i, __start)").alias(col)
        )
    else:
        step = F.expr(_SPINE_STEPS[datepart])
        seq = F.when(
            F.col("__start") >= F.col("__end"),
            F.array().cast("array<timestamp>"),
        ).otherwise(F.sequence(F.col("__start"), F.col("__end") - step, step))
        spine = base.select(F.explode(seq).alias(col))
    if datepart in ("day", "week", "month", "year"):
        spine = spine.select(F.col(col).cast("date").alias(col))
    return spine


def deduplicate(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """``dbt_utils.deduplicate``: one row per ``partition_by`` key,
    picked by ``order_by`` (pass explicit tie-breaks for determinism).
    One shuffle on the key; the window ranks within groups only."""
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
