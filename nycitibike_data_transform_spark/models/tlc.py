"""The reference pipeline itself, re-expressed 1:1 — real schemas.

``models/rides.py`` proves the *pattern* on the driver's testdata;
this module is the drop-in replacement for the reference's dbt models
with the actual TLC columns, so a user of
``juicero-chief-juice-officer/nycitibike-data-transform`` can run the same pipeline here:

- ``location_id_to_neighborhood``  ≙ reference
  ``models/2_DIM___AUX_TLC/LOCATION_ID_TO_NEIGHBORHOOD.sql:4-9``
- ``aux_tlc_rides``  ≙ reference
  ``models/2_STG___AUX_TLC/AUX_TLC_RIDES.sql`` (the 4-feed mapping
  dict at ``:3-8``, NULL/'' padding ``:16-24``, vendor cast ``:18-19``,
  dim filter ``:35-39``, double left join ``:72-75``, payment decode
  ``macros/tlc_payment_type.sql:5-16``)

Feed schemas per FIXTURES.md §2 (yellow/green/fhv/fhvhv). The fhvhv
feed is referenced by the model but missing from the reference's infra
(``terraform.tfvars`` lists only 3 feeds — SURVEY.md §1.4); we support
it as the model intends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.decode import payment_type_description
from nycitibike_data_transform_spark.operators.conform import ConformSpec, conform_union

#: canonical 24-column staged schema (reference ``AUX_TLC_RIDES.sql:3-8``
#: mapping keys, projected at ``:41-69``; FIXTURES.md §3).
TLC_RIDE_SPEC = ConformSpec(
    columns={
        "pickup_datetime": "timestamp",
        "dropoff_datetime": "timestamp",
        "pickup_location_id": "bigint",
        "dropoff_location_id": "bigint",
        "passenger_count": "bigint",
        "trip_distance": "double",
        "trip_type": "bigint",
        "rate_code_id": "bigint",
        "fare_amount": "double",
        "tip_amount": "double",
        "tolls_amount": "double",
        "airport_fee": "double",
        "ehail_fee": "double",
        "congestion_surcharge": "double",
        "improvement_surcharge": "double",
        "mta_tax": "double",
        "extra": "double",
        "total_amount": "double",
        "payment_type": "bigint",
        "store_and_fwd_flag": "string",
        "sr_flag": "string",
        "vendor_id": "string",
        "dispatching_base_num": "string",
        "affiliated_base_number": "string",
    },
    # '' not NULL for missing vendor ids (reference ``AUX_TLC_RIDES.sql:16-17``)
    defaults={"vendor_id": ""},
)

def feed_mappings() -> dict[str, dict[str, object]]:
    """Per-feed physical→canonical mappings (reference
    ``AUX_TLC_RIDES.sql:3-8``; FIXTURES.md §2a-2d). Built lazily —
    Column objects require an active SparkContext. Columns absent from
    a mapping are padded by the spec."""
    yellow: dict[str, object] = {
    "pickup_datetime": "tpep_pickup_datetime",
    "dropoff_datetime": "tpep_dropoff_datetime",
    "pickup_location_id": "PULocationID",
    "dropoff_location_id": "DOLocationID",
    "passenger_count": "passenger_count",
    "trip_distance": "trip_distance",
    "rate_code_id": "RatecodeID",
    "fare_amount": "fare_amount",
    "tip_amount": "tip_amount",
    "tolls_amount": "tolls_amount",
    "airport_fee": "Airport_fee",
    "congestion_surcharge": "congestion_surcharge",
    "improvement_surcharge": "improvement_surcharge",
    "mta_tax": "mta_tax",
    "extra": "extra",
    "total_amount": "total_amount",
    "payment_type": "payment_type",
    "store_and_fwd_flag": "store_and_fwd_flag",
    # int vendor id in yellow/green → canonical string (``:18-19``)
    "vendor_id": F.col("VendorID").cast("string"),
}

    green: dict[str, object] = {
        **{k: v for k, v in yellow.items() if k not in ("pickup_datetime", "dropoff_datetime", "airport_fee")},
    "pickup_datetime": "lpep_pickup_datetime",
    "dropoff_datetime": "lpep_dropoff_datetime",
    "trip_type": "trip_type",
    "ehail_fee": "ehail_fee",
}

    fhv: dict[str, object] = {
    "pickup_datetime": "pickup_datetime",
    "dropoff_datetime": "dropOff_datetime",
    "pickup_location_id": "PUlocationID",
    "dropoff_location_id": "DOlocationID",
    "sr_flag": F.col("SR_Flag").cast("string"),
    "dispatching_base_num": "dispatching_base_num",
    "affiliated_base_number": "Affiliated_base_number",
}

    fhvhv: dict[str, object] = {
    "pickup_datetime": "Pickup_datetime",
    "dropoff_datetime": "DropOff_datetime",
    "pickup_location_id": "PULocationID",
    "dropoff_location_id": "DOLocationID",
    "trip_distance": "trip_miles",
    "fare_amount": "base_passenger_fare",
    "tip_amount": "tips",
    "tolls_amount": "tolls",
    "airport_fee": "airport_fee",
    "congestion_surcharge": "congestion_surcharge",
    # string license num — the column forcing the string unification
    "vendor_id": "Hvfhs_license_num",
    "dispatching_base_num": "Dispatching_base_num",
    "affiliated_base_number": "originating_base_num",
}

    return {"yellow": yellow, "green": green, "fhv": fhv, "fhvhv": fhvhv}


def location_id_to_neighborhood(seed: DataFrame) -> DataFrame:
    """Dim model: rename + service-zone replace (reference
    ``LOCATION_ID_TO_NEIGHBORHOOD.sql:4-9``)."""
    return seed.select(
        F.col("locationid").alias("location_id"),
        F.col("borough"),
        F.col("zone").alias("neighborhood"),
        F.replace(F.col("service_zone"), F.lit("Boro"), F.lit("Green")).alias("service_zone"),
    )


def aux_tlc_rides(feeds: dict[str, DataFrame], zone_dim: DataFrame) -> DataFrame:
    """Staged rides: conform-union all present feeds, filter the dim
    (*before* the joins — 'Unknown' locations keep the ride row with
    NULL enrichment), double broadcast left join, decode payment type.
    """
    mappings = feed_mappings()
    unknown_feeds = set(feeds) - set(mappings)
    if unknown_feeds:
        raise ValueError(f"unknown TLC feeds: {sorted(unknown_feeds)}")
    rides = conform_union(
        {name: (df, mappings[name]) for name, df in feeds.items()},
        TLC_RIDE_SPEC,
        source_column="source",
    )
    dim = zone_dim.filter(F.col("borough") != "Unknown")  # ``:35-39``
    pickup = F.broadcast(dim.alias("pu"))
    dropoff = F.broadcast(dim.alias("do"))
    return (
        rides.join(pickup, rides.pickup_location_id == F.col("pu.location_id"), "left")
        .join(dropoff, rides.dropoff_location_id == F.col("do.location_id"), "left")
        .select(
            *[F.col(c) for c in [*TLC_RIDE_SPEC.columns, "source"]],
            F.col("pu.borough").alias("pickup_borough"),
            F.col("pu.neighborhood").alias("pickup_neighborhood"),
            F.col("do.borough").alias("dropoff_borough"),
            F.col("do.neighborhood").alias("dropoff_neighborhood"),
            payment_type_description(F.col("payment_type")).alias("payment_type_desc"),
        )
    )
