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


def valid_embedding(col: Column | str) -> Column:
    """Well-formed vector predicate: non-NULL, non-empty, no NULL /
    NaN / ±Inf elements. Malformed vectors are EXCLUDED (not
    NULL-propagated) by the quantization queries on both engines — a
    DuckDB ``unnest`` produces zero rows for an empty list, so keeping
    them on the Spark side silently desyncs the oracle (review
    finding). The NaN/Inf leg matters under Spark 4's default ANSI
    mode: ``round(NaN)`` cast to int RAISES there, so a single
    NaN-bearing vector would crash embedding_quantize/quantized_topk
    outright while the oracle kept returning rows (ADVICE r5)."""
    c = _as_col(col)
    return (
        c.isNotNull()
        & (F.size(c) > 0)
        & ~F.exists(
            c,
            lambda x: x.isNull()
            | F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf"))),
        )
    )


def int8_scale(col: Column | str) -> Column:
    """Symmetric int8 quantization scale: max|x| / 127 in double."""
    c = _as_col(col)
    return F.array_max(F.transform(c, F.abs)).cast("double") / F.lit(127.0)


def int8_codes(col: Column | str, scale: Column) -> Column:
    """int8 codes round(x/scale) ∈ [−127, 127]; all-zero vectors
    (scale 0) code to zeros. THE single definition shared by the
    export query (embedding_quantize) and the retrieval audit
    (quantized_topk) so the certified quantizer cannot drift from the
    shipped one (review finding)."""
    c = _as_col(col)
    return F.transform(
        c,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round(x.cast("double") / scale))
        .cast("int"),
    )
