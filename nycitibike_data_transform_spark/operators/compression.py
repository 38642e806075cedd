"""Compression-ratio quality signal.

``zlib_ratio`` = compressed bytes / raw bytes of the UTF-8 text — the
classic redundancy detector (boilerplate, keyword stuffing, and
generated spam compress far better than natural prose; CCNet/
RefinedWeb-style pipelines filter on exactly this signal). There is
no SQL expression for DEFLATE, so this is one of the few legitimately
Python-side signals in the engine: an Arrow-batched ``pandas_udf``
(one Python call per ~10k-row batch, zlib itself is C), never a
row-at-a-time ``F.udf``.

Scale shape: pure per-row projection — no shuffle, no state; the only
cost vs a JVM expression is the Arrow transfer of the text column,
paid once, batched. Determinism: zlib with a pinned level is
deterministic for a given input (and CPython bundles a fixed zlib),
but the byte count is NOT portable across engines/libraries — so the
oracle-facing query emits closed-form verdicts (bounds + NULL
pattern), not the raw ratio; the ratio itself is pinned by unit
tests including a repetitive-vs-prose monotonicity check.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: pinned compression level — the default 6; changing it changes every
#: ratio, so it is part of the signal's definition
ZLIB_LEVEL = 6


def zlib_ratio(col: Column) -> Column:
    """compressed/raw UTF-8 byte ratio per text; NULL for NULL or
    empty text (no bytes to measure). The pandas_udf is constructed
    lazily — Spark 4 resolves the return type against the active
    session, so decorating at import time breaks sessionless
    imports."""

    @pandas_udf("double")
    def _ratio_udf(texts: pd.Series) -> pd.Series:
        def ratio(t: str | None) -> float | None:
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, ZLIB_LEVEL)) / len(b)

        return texts.map(ratio)

    return _ratio_udf(col)


def ratio_verdict(text: Column, ratio: Column) -> Column:
    """Engine-portable verdict over the ratio: NULL exactly when the
    text has no bytes, else the ratio must be positive, and for texts
    long enough that the ~11-byte zlib header is amortized (>= 100
    chars) it must sit at or under 1.1 — DEFLATE's stored-block worst
    case adds < 0.1% plus the constant header, so 1.1 holds with wide
    margin for ANY input. Tiny texts can legitimately exceed 1.0
    (header dominates), hence the length gate."""
    has_bytes = text.isNotNull() & (F.length(text) > 0)
    bounds = (ratio > 0) & (
        (F.length(text) < 100) | (ratio <= 1.1)
    )
    return F.when(has_bytes, bounds).otherwise(F.lit(None).cast("boolean"))
