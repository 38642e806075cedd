"""Location dimension model.

Re-expresses the reference's dim model (reference
``models/2_DIM___AUX_TLC/LOCATION_ID_TO_NEIGHBORHOOD.sql:4-9``):
projection-with-rename (``locationid -> location_id``,
``zone -> neighborhood``) plus a literal string replace on
``service_zone`` (``:8`` — ``replace(service_zone,'Boro','Green')``).

On the driver's testdata the isomorphic dimension is nation × region:
``n_nationkey -> location_id``, ``n_name -> neighborhood``,
``r_name -> borough``, with the same replace pattern applied to build
``service_zone``. region (5 rows) broadcasts into nation (25 rows);
at any scale a dimension this shape stays broadcast-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the borough value treated as the reference's 'Unknown' rows
#: (reference seed rows 264-265, filtered pre-join at
#: ``AUX_TLC_RIDES.sql:35-39``).
UNKNOWN_BOROUGH = "AFRICA"

#: service-zone replace pattern (reference
#: ``LOCATION_ID_TO_NEIGHBORHOOD.sql:8``: 'Boro' -> 'Green').
SERVICE_ZONE_REPLACE = ("AMERICA", "AMERICA ZONE")


def location_dim(nation: DataFrame, region: DataFrame) -> DataFrame:
    """nation ⋈ region -> (location_id, neighborhood, borough, service_zone)."""
    old, new = SERVICE_ZONE_REPLACE
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("n_nationkey").alias("location_id"),
            F.col("n_name").alias("neighborhood"),
            F.col("r_name").alias("borough"),
            F.replace(F.col("r_name"), F.lit(old), F.lit(new)).alias("service_zone"),
        )
    )


def known_locations(dim: DataFrame) -> DataFrame:
    """Drop 'Unknown'-borough rows *before* the enrichment joins so
    facts pointing at them keep their row but get NULL enrichment
    (filter-before-left-join ordering, ``AUX_TLC_RIDES.sql:35-39`` then
    ``:72-75`` — the ordering is semantic and pinned by tests)."""
    return dim.filter(F.col("borough") != UNKNOWN_BOROUGH)
