"""Relational/dataflow operators beyond single-column functions."""

from nycitibike_data_transform_spark.operators.conform import ConformSpec, conform, conform_union

__all__ = ["ConformSpec", "conform", "conform_union"]
