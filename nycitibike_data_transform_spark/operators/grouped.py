"""Grouped-map transforms (``applyInPandas``) — per-group pandas logic
when the computation genuinely needs the whole group in memory
(per-group model fits, rank-based statistics, library calls).

For anything expressible as window/agg built-ins, prefer those (JVM,
no per-group materialization); this module is the escape hatch and the
pattern demo. Groups must individually fit in executor memory — at
100 TB that means grouping by a high-cardinality key, never by a
low-cardinality one (use salting or two-level aggregation instead).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def group_zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group z-score via applyInPandas (ddof=0; single-member or
    zero-variance groups emit 0.0 rather than NaN/NULL)."""
    out_schema = T.StructType(
        [
            T.StructField(group_col, df.schema[group_col].dataType, True),
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("zscore", T.DoubleType(), True),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        std = float(pdf[value_col].std(ddof=0))
        mean = float(pdf[value_col].mean())
        z = (pdf[value_col] - mean) / std if std > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {group_col: pdf[group_col], id_col: pdf[id_col], "zscore": z.astype(float)}
        )

    return (
        df.select(group_col, id_col, value_col)
        .groupBy(group_col)
        .applyInPandas(per_group, schema=out_schema)
    )
