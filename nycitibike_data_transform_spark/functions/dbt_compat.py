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
- ``date_spine`` — dbt's dateadd-over-index construction, end
  exclusive (boundary-crossing n for month/year).
- ``deduplicate`` — keep one row per key by an explicit ordering.
- ``get_column_values`` — ordered distinct values as a driver list
  (dbt compiles it to a Jinja literal; introspection, not data path).
- ``get_relations_by_pattern`` — catalog names by LIKE pattern.
- ``pivot_columns`` — dbt_utils.pivot's static agg(CASE...) columns,
  paired with get_column_values.

Already covered elsewhere (no second implementation): ``unpivot``
(native ``DataFrame.unpivot`` — registry query ``unpivot_money``;
``pivot_qty_by_status`` covers the inference-based native pivot),
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
        # stop clamps to at least __start: when 0 < end - start < step
        # the naive __end - step falls BELOW __start and sequence()
        # raises on the inverted boundaries — the correct spine is
        # [start] alone (start is in [start, end)); larger ranges are
        # unaffected (stop = end - step keeps end exclusive)
        stop = F.greatest(F.col("__end") - step, F.col("__start"))
        seq = F.when(
            F.col("__start") >= F.col("__end"),
            F.array().cast("array<timestamp>"),
        ).otherwise(F.sequence(F.col("__start"), stop, step))
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


def get_column_values(
    df: DataFrame,
    col: str,
    order_by: str = "count",
    max_records: int | None = None,
    default: list | None = None,
) -> list:
    """``dbt_utils.get_column_values``: the distinct values of ``col``
    as a driver-side list — dbt compiles this into a Jinja literal, so
    a plain Python list is the faithful analogue (feed it to
    ``pivot_columns`` / ``isin`` / test configs). ``order_by`` is
    ``"count"`` (dbt's default: most frequent first) or ``"value"``;
    ties break on the value for determinism. ``max_records`` caps the
    collect via the same ``limit`` dbt emits. Empty relation returns
    ``default`` (dbt 1.x behavior).

    Scale note: this COLLECTS — it is an introspection macro for
    enum-domain columns (statuses, sources, flags), not a data path;
    the aggregate is one map-side-combined groupBy, and only the
    distinct values reach the driver. Pass ``max_records`` when the
    domain is not known to be bounded."""
    if order_by not in ("count", "value"):
        raise ValueError(f"order_by must be 'count' or 'value', got {order_by!r}")
    agg = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    ordered = (
        agg.orderBy(F.col("__n").desc(), F.col(col).asc())
        if order_by == "count"
        else agg.orderBy(F.col(col).asc())
    )
    if max_records is not None:
        ordered = ordered.limit(max_records)
    vals = [r[0] for r in ordered.select(col).collect()]
    if not vals:
        return list(default) if default is not None else []
    return vals


def get_relations_by_pattern(
    spark: SparkSession,
    table_pattern: str,
    database: str | None = None,
) -> list[str]:
    """``dbt_utils.get_relations_by_pattern``: catalog table names
    matching a SQL ``LIKE`` pattern (``%``/``_`` wildcards), for
    feeding ``union_relations``-style fans. Pure catalog metadata —
    no data is read. With the flat ``{env}_{layer}__{table}`` naming
    (``catalog.table_name``), ``'core_4_mart__%'`` selects one env ×
    layer slice, mirroring the dbt usage over dataset prefixes."""
    import re as _re

    rx = _re.compile(
        "^"
        + "".join(
            ".*" if ch == "%" else "." if ch == "_" else _re.escape(ch)
            for ch in table_pattern.lower()
        )
        + "$"
    )
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    return sorted(t.name for t in tables if rx.match(t.name.lower()))


def pivot_columns(
    col: str,
    values: Sequence[object],
    agg: str = "sum",
    then_value: object = 1,
    else_value: object = 0,
    prefix: str = "",
    suffix: str = "",
) -> list[Column]:
    """``dbt_utils.pivot``: one aggregate Column per pivot value —
    ``agg(CASE WHEN col = value THEN then_value ELSE else_value END)``
    — for use inside ``groupBy(...).agg(*pivot_columns(...))``. The
    values list usually comes from :func:`get_column_values` (the dbt
    pairing). Unlike native ``DataFrame.pivot`` this is the exact
    dbt_utils expression shape: a static column set known at
    plan-build, no pivot-value inference job, map-side combinable."""
    if agg not in ("sum", "max", "min", "count", "avg"):
        raise ValueError(f"unsupported agg {agg!r}")
    fn = getattr(F, agg)
    out = []
    for v in values:
        case = F.when(F.col(col) == F.lit(v), F.lit(then_value)).otherwise(
            F.lit(else_value)
        )
        name = f"{prefix}{v}{suffix}"
        out.append(fn(case).alias(name))
    return out
