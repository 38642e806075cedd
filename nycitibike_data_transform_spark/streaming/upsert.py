"""Streaming upsert materialization: maintain a latest-row-per-key
parquet table from a stream (the CDC "apply changes" / materialized
upsert view — Delta's streaming MERGE pattern, expressed with this
engine's batch merge machinery inside ``foreachBatch``).

Semantics are ARRIVAL-ORDER INDEPENDENT: the winner per key is decided
by the explicit ``order_desc`` columns (e.g. event time, then a
tie-break id), not by which micro-batch happened to arrive last — a
late-arriving older row never overwrites a newer one. That is the
difference between this and blind last-writer-wins CDC apply.

Scale shape per micro-batch: one shuffle of the batch on the key for
the within-batch winner window, one anti-join-free merge (union +
window) against the CURRENT table. At 100 TB the table side should be
partitioned and merged per-partition (``merge_upsert_partitioned``);
this module keeps the whole-table form for the unpartitioned case and
documents the swap point.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.dbt_compat import deduplicate


def _winners(df: DataFrame, keys: list[str], order_desc: list[str]) -> DataFrame:
    from pyspark.sql.types import MapType

    order: list[Column] = [F.col(c).desc() for c in order_desc]
    # deterministic final tie-break so re-runs of the same batch pick
    # the same row (exactly-once replay safety); maps are not
    # orderable in Spark and would fail analysis, so they ride along
    # without contributing to the ordering
    order += [
        F.col(fld.name).asc()
        for fld in df.schema.fields
        if fld.name not in order_desc and not isinstance(fld.dataType, MapType)
    ]
    return deduplicate(df, keys, order)


def apply_upsert_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    order_desc: list[str],
) -> None:
    """The ``foreachBatch`` body — also directly callable for tests
    and for batch backfills (same code path as the stream, the
    batch-parity property the suite pins)."""
    if not batch_df.columns:
        return
    spark = batch_df.sparkSession
    winners = _winners(batch_df, keys, order_desc)
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*winners.columns)
        merged = _winners(existing.unionByName(winners), keys, order_desc)
    else:
        merged = winners
    # break lineage before overwriting the path the plan reads
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)


def upsert_stream_to_table(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    order_desc: list[str],
    checkpoint_dir: str,
):
    """Wire a stream into the upsert view. Returns the started query
    (``availableNow`` friendly — callers pick the trigger)."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: apply_upsert_batch(df, bid, path, keys, order_desc)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
