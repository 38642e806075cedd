"""Pipeline models — the reference's dbt models re-expressed on Spark.

Each model is a plain function ``(inputs...) -> DataFrame`` so it can
be unit-tested on inline fixtures and registered with the pipeline
runner for dependency-ordered materialization.
"""

from nycitibike_data_transform_spark.models.rides import RIDE_SPEC, stage_rides, testdata_feeds
from nycitibike_data_transform_spark.models.zones import location_dim

__all__ = ["location_dim", "stage_rides", "testdata_feeds", "RIDE_SPEC"]
