"""Schema-conforming projection + N-way UNION ALL.

Re-expresses the reference's staging pattern (reference
``models/2_STG___AUX_TLC/AUX_TLC_RIDES.sql:3-32``): a Jinja mapping
dict conforms four heterogeneous TLC feeds onto one canonical schema —
rename when mapped, pad ``NULL`` when absent (``:22-24``), pad ``''``
for absent ``vendor_id`` (``:16-17``), cast to reconcile types
(``:18-19``) — then glues them with ``UNION ALL`` (bag semantics, no
dedup).

Spark idiom: per-feed ``select`` with alias/cast/literal columns, then
``unionByName`` (name-based, not positional — SURVEY.md §2.3 U1).
Every padded literal carries an explicit cast so union type resolution
is exact rather than silently coerced.

Scale note: conform+union is narrow (no shuffle); at 100 TB the union
of N feeds is N parallel scans whose partitions flow straight into the
downstream stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ConformSpec:
    """Canonical-schema spec for one conform-union.

    ``columns`` maps canonical column name -> Spark SQL type string.
    ``defaults`` maps canonical column name -> literal used when a feed
    lacks the column (the reference pads ``''`` for vendor_id and NULL
    for everything else).
    """

    columns: dict[str, str]
    defaults: dict[str, object] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.columns:
            raise ValueError("ConformSpec needs at least one canonical column")
        unknown = set(self.defaults) - set(self.columns)
        if unknown:
            raise ValueError(f"defaults reference unknown canonical columns: {sorted(unknown)}")


def conform(df: DataFrame, mapping: dict[str, str | Column], spec: ConformSpec) -> DataFrame:
    """Project one feed onto the canonical schema.

    ``mapping``: canonical name -> source column name (or an arbitrary
    Column expression). Canonical columns absent from the mapping are
    padded with ``spec.defaults`` (or NULL), cast to the canonical type.
    """
    unknown = set(mapping) - set(spec.columns)
    if unknown:
        raise ValueError(f"mapping references unknown canonical columns: {sorted(unknown)}")
    cols: list[Column] = []
    for name, dtype in spec.columns.items():
        if name in mapping:
            src = mapping[name]
            c = F.col(src) if isinstance(src, str) else src
        else:
            c = F.lit(spec.defaults.get(name))
        cols.append(c.cast(dtype).alias(name))
    return df.select(*cols)


def conform_union(
    feeds: dict[str, tuple[DataFrame, dict[str, str | Column]]],
    spec: ConformSpec,
    source_column: str | None = None,
) -> DataFrame:
    """Conform every feed and UNION ALL them (bag semantics).

    ``feeds``: feed name -> (DataFrame, mapping). With ``source_column``
    set, a literal feed-name column is added (useful lineage the
    reference lacks; costs nothing).
    """
    if not feeds:
        raise ValueError("conform_union needs at least one feed")
    conformed = []
    for name, (df, mapping) in feeds.items():
        out = conform(df, mapping, spec)
        if source_column:
            out = out.withColumn(source_column, F.lit(name))
        conformed.append(out)
    return reduce(lambda a, b: a.unionByName(b), conformed)
