"""Bucketed tables: pre-shuffled storage so repeated joins on the
bucket key are co-located (zero Exchange) — the 100 TB answer to
"this join runs every 4 hours on the same key"."""

from __future__ import annotations

import uuid

import pytest

from nycitibike_data_transform_spark.plans import count_exchanges, formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf, set by session.get_spark()
    suffix = uuid.uuid4().hex[:8]
    orders_t, lineitem_t = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").format("parquet").saveAsTable(orders_t)
    )
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").format("parquet").saveAsTable(lineitem_t)
    )
    yield orders_t, lineitem_t
    spark.sql(f"DROP TABLE IF EXISTS {orders_t}")
    spark.sql(f"DROP TABLE IF EXISTS {lineitem_t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    o = spark.table(orders_t)
    l = spark.table(lineitem_t)
    joined = l.join(o, l.l_orderkey == o.o_orderkey).select("o_orderkey", "l_quantity")
    assert count_exchanges(joined) == 0, formatted_plan(joined)


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    _, lineitem_t = bucketed_tables
    from pyspark.sql import functions as F

    l = spark.table(lineitem_t)
    agg = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert count_exchanges(agg) == 0, formatted_plan(agg)


def test_bucketed_results_match_plain(spark, sf_dir, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    bucketed = spark.table(lineitem_t).join(
        spark.table(orders_t),
        spark.table(lineitem_t).l_orderkey == spark.table(orders_t).o_orderkey,
    )
    plain_l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain_o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = plain_l.join(plain_o, plain_l.l_orderkey == plain_o.o_orderkey)
    assert bucketed.count() == plain.count()
