"""Cross-micro-batch state: the stateful operator must accumulate over
multiple batches and end up agreeing with the batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.streaming.stateful import running_user_totals


@pytest.fixture(scope="module")
def split_events(spark, sf_dir, tmp_path_factory):
    """events split into 3 files so maxFilesPerTrigger=1 produces 3
    micro-batches — state must survive batch boundaries."""
    out = tmp_path_factory.mktemp("events_split")
    from nycitibike_data_transform_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    for i in range(3):
        ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(out / f"part{i}"))
    return ev, str(out)


def test_stateful_totals_match_batch(spark, split_events):
    ev_batch, path = split_events
    schema = spark.read.parquet(f"{path}/part0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{path}/part*")
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    # memory sink in update mode appends every emission; the LAST
    # emission per user is the final state
    emitted = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM user_totals
        ) WHERE rn = 1
        """
    ).collect()
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in emitted}

    expected = {
        r["user_id"]: (r["n"], r["t"])
        for r in ev_batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("t"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for u in expected:
        assert got[u][0] == expected[u][0]
        assert got[u][1] == pytest.approx(expected[u][1], abs=0.05)


def test_multiple_batches_actually_ran(spark, split_events):
    _, path = split_events
    # each user appears in >1 file, so per-user emissions must exceed 1
    n_emissions = spark.sql("SELECT count(*) n FROM user_totals").first()["n"]
    n_users = spark.sql("SELECT count(DISTINCT user_id) n FROM user_totals").first()["n"]
    assert n_emissions > n_users
