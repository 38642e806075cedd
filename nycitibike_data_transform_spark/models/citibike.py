"""Citibike trips staging — the reference's primary-lake table.

The reference declares TRIPS as an autodetected external parquet table
and never models it (reference ``terraform/terraform.tfvars:64-69``;
SURVEY.md §1.4); the standard public feed schema is in FIXTURES.md §4.
This model is the staging layer the reference's README promises:
typed pass-through + the derived measures its Haversine macro was
written for (reference ``macros/dist_lat_lng.sql`` — used nowhere in
checked-in models; its intended call site is exactly this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.geo import haversine

RIDEABLE_TYPES = ("classic_bike", "electric_bike", "docked_bike")
MEMBER_TYPES = ("member", "casual")


def stage_citibike_trips(trips: DataFrame) -> DataFrame:
    """Pass-through + derived measures: trip minutes, straight-line
    km/mi (Haversine), round-trip flag. Narrow (no shuffle)."""
    dur_min = (
        (F.unix_micros(F.col("ended_at")) - F.unix_micros(F.col("started_at")))
        / F.lit(60_000_000.0)
    )
    dist_km = haversine("start_lat", "start_lng", "end_lat", "end_lng", "km")
    return trips.select(
        "*",
        F.round(dur_min, 4).alias("duration_min"),
        F.round(dist_km, 6).alias("distance_km"),
        F.round(haversine("start_lat", "start_lng", "end_lat", "end_lng", "mi"), 6).alias(
            "distance_mi"
        ),
        (F.col("start_station_id") == F.col("end_station_id")).alias("is_roundtrip"),
    )


def trips_by_member_rideable(staged: DataFrame) -> DataFrame:
    """MART: ride counts + distance/duration stats per member/rideable
    type (the 'retail analysis table' layer, reference ``README.md:29``)."""
    return (
        staged.groupBy("member_casual", "rideable_type")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.sum(F.col("distance_km").cast("decimal(18,6)")).cast("double").alias("total_km"),
            F.round(
                F.sum(F.col("duration_min").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_duration_min"),
            F.count(F.when(F.col("is_roundtrip"), 1)).alias("n_roundtrips"),
        )
    )
