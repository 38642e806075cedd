"""LCC projection: round-trip closure, Column/numpy agreement, and
placement of real NTA-zone planar coordinates into NYC lat/lng."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.projection import (
    EPSG_2263,
    lcc_forward,
    lcc_forward_np,
    lcc_inverse_np,
)

# planar US-survey-feet points spanning the NYC extent of the zones
# parquet (observed x ~ 913k..1067k, y ~ 120k..272k)
PLANAR = np.array(
    [[913_000.0, 120_000.0], [971_013.5, 190_124.6], [1_067_000.0, 272_000.0], [984_250.0, 0.0]]
)


def test_inverse_lands_in_nyc_and_round_trips():
    lat, lon = lcc_inverse_np(PLANAR[:, 0], PLANAR[:, 1], EPSG_2263)
    assert np.all((lat > 39.5) & (lat < 41.5))
    assert np.all((lon > -75.0) & (lon < -73.0))
    x2, y2 = lcc_forward_np(lat, lon, EPSG_2263)
    # closure well under a millimeter (units are survey feet)
    assert np.max(np.abs(x2 - PLANAR[:, 0])) < 1e-3
    assert np.max(np.abs(y2 - PLANAR[:, 1])) < 1e-3


def test_column_and_numpy_forward_agree(spark):
    lat, lon = lcc_inverse_np(PLANAR[:, 0], PLANAR[:, 1], EPSG_2263)
    df = spark.createDataFrame(
        [(float(la), float(lo)) for la, lo in zip(lat, lon)], "lat double, lon double"
    )
    x_col, y_col = lcc_forward("lat", "lon")
    rows = df.select(x_col.alias("x"), y_col.alias("y")).collect()
    x_np, y_np = lcc_forward_np(lat, lon)
    for r, xe, ye in zip(rows, x_np, y_np):
        assert r["x"] == pytest.approx(xe, abs=1e-6)
        assert r["y"] == pytest.approx(ye, abs=1e-6)


def test_forward_stays_jvm_side(spark):
    # plan must be pure expressions — no python UDF / Arrow eval node
    df = spark.range(1).select(
        F.lit(40.7).alias("lat"), F.lit(-74.0).alias("lon")
    )
    x_col, y_col = lcc_forward("lat", "lon")
    plan = df.select(x_col.alias("x"), y_col.alias("y"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
