"""Staged rides model — the reference's flagship query re-expressed.

Mirrors ``models/2_STG___AUX_TLC/AUX_TLC_RIDES.sql`` end to end:

1. conform N heterogeneous feeds onto one canonical schema (mapping
   dict ``:3-8``; NULL padding ``:22-24``; ``''`` for absent vendor_id
   ``:16-17``; string cast unification ``:18-19``),
2. UNION ALL (``:28-30``),
3. filter the dimension (``:35-39``),
4. double left equi-join against the same dim under two role aliases
   (pickup/dropoff, ``:72-75``),
5. CASE-decode payment_type (``macros/tlc_payment_type.sql:5-16``).

On the driver's testdata the isomorphic feeds derive from ``lineitem``
split by ``l_returnflag`` (three "TLC feeds" with heterogeneous column
sets), and the dimension is nation×region (``zones.location_dim``).

Physical shape (100 TB posture): conform+union is narrow; the dim is
broadcast (≤25 rows here, 265 in the reference — broadcast at any
realistic dim size), so the whole stage is a single shuffle-free
pipeline over the fact scan: scan → project → union → 2× broadcast
hash join → project. ``.explain`` shows one WholeStageCodegen span per
feed branch and zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nycitibike_data_transform_spark.functions.decode import payment_type_description
from nycitibike_data_transform_spark.models.zones import known_locations, location_dim
from nycitibike_data_transform_spark.operators.conform import ConformSpec, conform_union

#: canonical staged-ride schema (the testdata analogue of the 24-col
#: canonical TLC schema, ``AUX_TLC_RIDES.sql:3-8``).
RIDE_SPEC = ConformSpec(
    columns={
        "order_key": "bigint",
        "line_number": "int",
        "pickup_ts": "timestamp",
        "pickup_location_id": "bigint",
        "dropoff_location_id": "bigint",
        "quantity": "double",
        "fare_amount": "double",
        "discount": "double",
        "tax": "double",
        "payment_type": "int",
        "vendor_id": "string",
        "sr_flag": "string",
    },
    # vendor_id pads '' not NULL (reference ``AUX_TLC_RIDES.sql:16-17``)
    defaults={"vendor_id": ""},
)

_BASE_MAPPING: dict[str, str] = {
    "order_key": "l_orderkey",
    "line_number": "l_linenumber",
    "pickup_ts": "l_shipdate",
    "quantity": "l_quantity",
    "fare_amount": "l_extendedprice",
    "discount": "l_discount",
}


def testdata_feeds(lineitem: DataFrame) -> dict[str, tuple[DataFrame, dict]]:
    """Split lineitem into three heterogeneous 'feeds' by returnflag.

    - ``yellow`` (N): full column set, integer-ish vendor id that must
      be cast to string (the VendorID bigint case).
    - ``green`` (R): no ``tax`` column (NULL pad), no vendor id (``''``).
    - ``fhv`` (A): timestamps + locations + sr_flag only; fares,
      payment type and quantity all absent (NULL pads).
    """
    loc = {
        "pickup_location_id": F.col("l_suppkey") % 25,
        "dropoff_location_id": F.col("l_partkey") % 25,
    }
    yellow = {
        **_BASE_MAPPING,
        **loc,
        "tax": "l_tax",
        "payment_type": "l_linenumber",
        "vendor_id": F.col("l_suppkey").cast("string"),
    }
    green = {**_BASE_MAPPING, **loc, "payment_type": "l_linenumber"}
    fhv = {
        "order_key": "l_orderkey",
        "line_number": "l_linenumber",
        "pickup_ts": "l_shipdate",
        **loc,
        "sr_flag": "l_linestatus",
    }
    return {
        "yellow": (lineitem.filter(F.col("l_returnflag") == "N"), yellow),
        "green": (lineitem.filter(F.col("l_returnflag") == "R"), green),
        "fhv": (lineitem.filter(F.col("l_returnflag") == "A"), fhv),
    }


def stage_rides(lineitem: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """The flagship staged-rides query (see module docstring)."""
    rides = conform_union(testdata_feeds(lineitem), RIDE_SPEC, source_column="source")
    dim = known_locations(location_dim(nation, region))

    pickup = F.broadcast(dim.alias("pu"))
    dropoff = F.broadcast(dim.alias("do"))
    return (
        rides.join(pickup, rides.pickup_location_id == F.col("pu.location_id"), "left")
        .join(dropoff, rides.dropoff_location_id == F.col("do.location_id"), "left")
        .select(
            *[F.col(c) for c in [*RIDE_SPEC.columns, "source"]],
            F.col("pu.borough").alias("pickup_borough"),
            F.col("pu.neighborhood").alias("pickup_neighborhood"),
            F.col("do.borough").alias("dropoff_borough"),
            F.col("do.neighborhood").alias("dropoff_neighborhood"),
            payment_type_description(F.col("payment_type")).alias("payment_type_desc"),
        )
    )
