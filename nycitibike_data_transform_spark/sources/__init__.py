"""Source readers (schema-on-read parquet, schema-enforced CSV seeds)."""

from nycitibike_data_transform_spark.sources.readers import read_csv_seed, read_parquet_source

__all__ = ["read_csv_seed", "read_parquet_source"]
