"""Enum/dictionary decode — the CASE-WHEN family.

Generalizes the reference's payment-type decode macro (reference
``macros/tlc_payment_type.sql:5-16``; called — under a mismatched name,
SURVEY.md §2.2 warning a — at ``AUX_TLC_RIDES.sql:64``). Unmatched
values decode to NULL, matching the macro's implicit ELSE.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

#: reference ``macros/tlc_payment_type.sql:7-14``
PAYMENT_TYPES: Mapping[int, str] = {
    1: "Credit card",
    2: "Cash",
    3: "No charge",
    4: "Dispute",
    5: "Unknown",
    6: "Voided trip",
}


def decode(col: Column | str, mapping: Mapping[object, object], default: object = None) -> Column:
    """Build a chained ``CASE WHEN col = k THEN v`` Column from a dict.

    A pure expression (Catalyst constant-folds and codegens it); for
    very large mappings prefer a broadcast-join decode dimension — at
    the reference's 6-entry domain the CASE chain is the right shape.
    """
    if not mapping:
        raise ValueError("decode() requires a non-empty mapping")
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for k, v in mapping.items():
        branch = F.when(c == F.lit(k), F.lit(v))
        expr = branch if expr is None else expr.when(c == F.lit(k), F.lit(v))
    return expr.otherwise(F.lit(default))


def payment_type_description(col: Column | str) -> Column:
    """TLC payment-type decode, 1..6 -> description, else NULL."""
    return decode(col, PAYMENT_TYPES)
