"""applyInPandas grouped-map operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.operators.grouped import group_zscore


def test_group_zscore_matches_window_formulation(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        r["o_orderkey"]: r["zscore"]
        for r in group_zscore(orders, "o_orderstatus", "o_totalprice", "o_orderkey").collect()
    }
    # reference formulation with built-in window functions (ddof=0)
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus")
    expected = {
        r["o_orderkey"]: r["z"]
        for r in orders.select(
            "o_orderkey",
            (
                (F.col("o_totalprice") - F.mean("o_totalprice").over(w))
                / F.stddev_pop("o_totalprice").over(w)
            ).alias("z"),
        ).collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], rel=1e-9)


def test_group_zscore_degenerate_group(spark):
    df = spark.createDataFrame([("a", 1, 5.0), ("b", 2, 1.0), ("b", 3, 1.0)], "g string, id int, v double")
    got = {r["id"]: r["zscore"] for r in group_zscore(df, "g", "v", "id").collect()}
    assert got[1] == 0.0  # singleton group
    assert got[2] == 0.0 and got[3] == 0.0  # zero variance
