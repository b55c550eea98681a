"""Sources: parquet table loaders and the mock remote-catalog provider."""

from bdc_collection_builder_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
