"""Physical-plan inspection helpers."""

from nycitibike_data_transform_spark.plans.checks import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "count_exchanges",
    "pushed_filters",
    "read_schema_columns",
]
