"""Citibike staging model (FIXTURES.md §4 schema)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.models.citibike import (
    stage_citibike_trips,
    trips_by_member_rideable,
)

SCHEMA = (
    "ride_id string, rideable_type string, started_at timestamp, ended_at timestamp,"
    " start_station_name string, end_station_name string, start_station_id string,"
    " end_station_id string, start_lat double, start_lng double, end_lat double,"
    " end_lng double, member_casual string"
)


def _trips(spark):
    t0 = dt.datetime(2024, 6, 1, 8, 0, 0)
    rows = [
        ("a", "classic_bike", t0, t0 + dt.timedelta(minutes=15), "A", "B", "s1", "s2",
         40.758, -73.9855, 40.7484, -73.9857, "member"),
        ("b", "electric_bike", t0, t0 + dt.timedelta(minutes=30, seconds=30), "A", "A",
         "s1", "s1", 40.70, -74.00, 40.70, -74.00, "casual"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_staged_measures(spark):
    staged = {r["ride_id"]: r for r in stage_citibike_trips(_trips(spark)).collect()}
    assert staged["a"]["duration_min"] == pytest.approx(15.0)
    assert staged["a"]["distance_km"] == pytest.approx(1.067, abs=0.01)
    assert staged["a"]["is_roundtrip"] is False
    assert staged["b"]["duration_min"] == pytest.approx(30.5)
    assert staged["b"]["is_roundtrip"] is True
    assert staged["b"]["distance_km"] == pytest.approx(0.0, abs=1e-3)


def test_mart_rollup(spark):
    mart = trips_by_member_rideable(stage_citibike_trips(_trips(spark)))
    rows = {(r["member_casual"], r["rideable_type"]): r for r in mart.collect()}
    assert rows[("member", "classic_bike")]["n_trips"] == 1
    assert rows[("casual", "electric_bike")]["n_roundtrips"] == 1
    assert rows[("member", "classic_bike")]["avg_duration_min"] == pytest.approx(15.0)
