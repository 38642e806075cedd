"""End-to-end model tests (SURVEY.md §5.2 layer 2) on sf0.001 +
inline fixtures pinning filter-before-join NULL-enrichment."""

from __future__ import annotations

from pyspark.sql import functions as F

from nycitibike_data_transform_spark.models.rides import stage_rides
from nycitibike_data_transform_spark.models.zones import (
    UNKNOWN_BOROUGH,
    known_locations,
    location_dim,
)


def _tables(spark, sf_dir):
    return {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in ("lineitem", "nation", "region")
    }


def test_location_dim_unique_key(spark, sf_dir):
    t = _tables(spark, sf_dir)
    dim = location_dim(t["nation"], t["region"])
    assert dim.count() == 25
    # the invariant the reference never tested: dim key is unique, so
    # the left joins never duplicate fact rows
    assert dim.select("location_id").distinct().count() == 25


def test_stage_rides_row_count_preserved(spark, sf_dir):
    t = _tables(spark, sf_dir)
    staged = stage_rides(t["lineitem"], t["nation"], t["region"])
    assert staged.count() == t["lineitem"].count()


def test_unknown_borough_rows_keep_row_get_null_enrichment(spark, sf_dir):
    """Facts pointing at filtered dim rows survive with NULL enrichment
    (filter-before-left-join, AUX_TLC_RIDES.sql:35-39 then :72-75)."""
    t = _tables(spark, sf_dir)
    dim = location_dim(t["nation"], t["region"])
    unknown_ids = {
        r["location_id"] for r in dim.filter(F.col("borough") == UNKNOWN_BOROUGH).collect()
    }
    assert unknown_ids, "fixture should contain 'unknown' locations"
    staged = stage_rides(t["lineitem"], t["nation"], t["region"])
    hits = staged.filter(F.col("pickup_location_id").isin(unknown_ids))
    assert hits.count() > 0
    assert hits.filter(F.col("pickup_borough").isNotNull()).count() == 0
    # rows with known pickup ids are enriched
    known = known_locations(dim).select("location_id")
    enriched = staged.join(known, staged.pickup_location_id == known.location_id, "left_semi")
    assert enriched.filter(F.col("pickup_borough").isNull()).count() == 0


def test_feed_specific_padding(spark, sf_dir):
    t = _tables(spark, sf_dir)
    staged = stage_rides(t["lineitem"], t["nation"], t["region"])
    fhv = staged.filter(F.col("source") == "fhv")
    assert fhv.filter(F.col("fare_amount").isNotNull()).count() == 0  # NULL pad
    assert fhv.filter(F.col("vendor_id") != "").count() == 0  # '' pad
    yellow = staged.filter(F.col("source") == "yellow")
    assert yellow.filter(F.col("vendor_id") == "").count() == 0  # real (cast) vendor ids
    assert dict(staged.dtypes)["vendor_id"] == "string"


def test_payment_decode_in_stage(spark, sf_dir):
    t = _tables(spark, sf_dir)
    staged = stage_rides(t["lineitem"], t["nation"], t["region"])
    domain = {
        "Credit card", "Cash", "No charge", "Dispute", "Unknown", "Voided trip",
    }
    got = {r["payment_type_desc"] for r in staged.select("payment_type_desc").distinct().collect()}
    assert got - domain == {None}  # line numbers 7 and fhv NULLs decode to NULL
