"""End-to-end corpus export: seeded shuffle → ordered shards → JSONL.

The last mile of a training-data pipeline: after filtering, dedup, and
selection decide WHAT ships, the export decides the byte layout —
and training reproducibility demands that two runs over the same
corpus with the same seed produce identical shards. This composes the
repo's deterministic primitives into that guarantee:

1. ``deterministic_shuffle`` (operators/selection.py) assigns every
   doc a seeded md5 global position and a round-robin shard;
2. one ``repartition(n_shards, shard_id)`` routes each shard wholly
   into a single task (hash-of-shard is many-to-one onto partitions,
   so a shard never splits across tasks) and
   ``sortWithinPartitions(shard_id, shuffle_pos)`` fixes the row
   order inside each task;
3. the JSON writer lays shards out as ``shard_id=N/`` directories —
   exactly one file per shard, rows in shuffle order, bytes stable
   across runs and cluster sizes;
4. a per-shard manifest (doc counts, position ranges, byte sizes) is
   written next to the data and returned to the caller.

Scale shape: one corpus shuffle for the rank (the two-phase prefix
sum inside ``deterministic_shuffle``), one id equi-join to re-attach
payloads (text never travels through the rank computation), and one
routing shuffle for the write. With n_shards ≥ total cores the
routing shuffle is also the parallelism of the write. The manifest
aggregation is map-side combinable to |shards| rows.

North-star addition (SURVEY.md §2.9); the reference's only sink is a
full-refresh relational table (setup_script.sh:7) — a corpus export
surface does not exist there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.selection import deterministic_shuffle


def export_corpus(
    docs: DataFrame,
    out_dir: str,
    seed: str = "export",
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[dict]:
    """Write ``docs`` as ``out_dir/data/shard_id=N/`` JSONL shards in
    seeded shuffle order, plus ``out_dir/_manifest`` (one JSON row per
    shard: n_docs, first/last shuffle position, payload bytes).

    Returns the manifest as a list of dicts (|shards| rows — driver
    metadata, not corpus data). Same corpus + same seed → byte
    identical shard contents, independent of input partitioning.
    """
    order = deterministic_shuffle(
        docs.select(id_col), seed=seed, n_shards=n_shards, id_col=id_col
    )
    routed = docs.join(order, id_col)

    (
        routed.drop("shuffle_key")
        .repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "shuffle_pos")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .json(f"{out_dir}/data")
    )

    manifest = (
        routed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("shuffle_pos").alias("first_pos"),
            F.max("shuffle_pos").alias("last_pos"),
            F.sum(F.coalesce(F.length(text_col), F.lit(0)))
            .cast("long")
            .alias("text_bytes"),
        )
        .orderBy("shard_id")
    )
    manifest.coalesce(1).write.mode("overwrite").json(f"{out_dir}/_manifest")
    return [r.asDict() for r in manifest.collect()]
