"""Vector math over ``array<float>`` embedding columns.

North-star addition (SURVEY.md §2.9): similarity primitives built from
Spark's higher-order functions (``zip_with`` + ``aggregate``), which
run JVM-side on the array data — no Python round-trip, no UDF.

Determinism: accumulation is left-to-right in index order in DOUBLE,
which matches a straightforward loop in any engine — the DuckDB oracle
(``list_dot_product`` over ``DOUBLE[]`` casts) produces bit-identical
results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _to_double_array(col: Column | str) -> Column:
    return _as_col(col).cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i, accumulated left-to-right in double."""
    prods = F.zip_with(_to_double_array(a), _to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(col: Column | str) -> Column:
    return F.sqrt(dot_product(col, col))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL-safe on zero vectors (returns NULL
    rather than NaN so downstream ranking skips them)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(dot_product(a, b) / denom)
