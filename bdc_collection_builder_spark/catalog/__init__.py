"""Domain catalog: the reference's data model on Spark.

Collections/bands/providers/items/activities as typed DataFrames
(reference models at bdc_collection_builder/models.py:37-193 and the
bdc_catalog Item shape written by publish.py:575-603), with a
parquet-backed store providing idempotent keyed upsert (the Delta
MERGE semantics of publish.py:575-605 without requiring Delta jars).
"""

from bdc_collection_builder_spark.catalog.schemas import SCHEMAS
from bdc_collection_builder_spark.catalog.store import CatalogStore

__all__ = ["SCHEMAS", "CatalogStore"]
