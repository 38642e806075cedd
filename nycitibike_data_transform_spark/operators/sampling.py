"""Sampling & dataset-splitting operators (training-data pipeline
staples; north-star surface, SURVEY.md §2.9).

Everything here is **deterministic by key**, not RNG-by-row: a row's
assignment depends only on its id hash, so re-runs, retries, and
late-arriving partitions all agree — the property that matters when a
100 TB corpus is split once and consumed by many jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, fraction: float, id_col: str, seed: int = 0) -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash (stable across runs
    and engines that share the hash; no shuffle — a pure filter that
    pushes into the scan stage)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    return df.filter(bucket < int(fraction * 1_000_000))


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.2, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic (train, test) split by id
    hash. The same id always lands on the same side — join-safe for
    feature tables split independently."""
    if not 0.0 < test_fraction < 1.0:
        raise ValueError(f"test_fraction must be in (0,1), got {test_fraction}")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    cut = int(test_fraction * 1_000_000)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[object, float], id_col: str, seed: int = 0
) -> DataFrame:
    """Per-stratum hash sampling (deterministic ``sampleBy``): e.g.
    downsample the dominant language while keeping the long tail.
    Strata absent from ``fractions`` are dropped (explicit is safer
    than silently keeping 100%)."""
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {f}")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    cond = None
    for k, f in fractions.items():
        piece = (F.col(strata_col) == F.lit(k)) & (bucket < int(f * 1_000_000))
        cond = piece if cond is None else cond | piece
    return df.filter(cond if cond is not None else F.lit(False))
