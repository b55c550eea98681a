"""bdc_collection_builder_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the query and data-processing
capabilities of ``brazil-data-cube/bdc-collection-builder`` (a
satellite-imagery collection builder: catalog search, download with
provider failover, atmospheric correction, publish with band-index
expressions, quality post-processing) on the Spark DataFrame / SQL /
Catalyst / Structured Streaming stack.

Layout
------
- ``session``     SparkSession factory tuned for local + cluster use
- ``sources``     table loaders, mock remote-catalog provider source
- ``operators``   the relational operator inventory (SURVEY.md §2)
- ``functions``   scalar functions, the band-expression compiler,
                  pixel kernels (quicklook, nodata-union, resample)
- ``plans``       named query registry: Spark plan + DuckDB oracle SQL
- ``catalog``     domain data model (collections/bands/items/activities)
                  with deterministic fixture generation and upsert
- ``pipeline``    download→correction→publish→post staged dataflow on
                  DataFrames with an activity ledger
- ``streaming``   Structured Streaming incremental ingestion wrappers
- ``extensions``  large-scale training-data pipeline operators: dedup
                  (exact/MinHash-LSH/SimHash/Jaccard/embedding), ANN
                  similarity search, text analysis, multimodal columns
"""

__version__ = "0.1.0"


def __getattr__(name: str):
    """Lazy top-level exports (keep ``import bdc_collection_builder_spark``
    free of a JVM dependency until something Spark-backed is touched)."""
    if name == "CollectionBuilderEngine":
        from bdc_collection_builder_spark.engine import CollectionBuilderEngine
        return CollectionBuilderEngine
    if name == "CatalogStore":
        from bdc_collection_builder_spark.catalog.store import CatalogStore
        return CatalogStore
    if name == "PartitionedCatalogStore":
        from bdc_collection_builder_spark.catalog.store import (
            PartitionedCatalogStore,
        )
        return PartitionedCatalogStore
    if name == "RadcorQuery":
        from bdc_collection_builder_spark.pipeline.radcor import RadcorQuery
        return RadcorQuery
    if name == "get_spark":
        from bdc_collection_builder_spark.session import get_spark
        return get_spark
    raise AttributeError(name)


__all__ = [
    "CatalogStore",
    "CollectionBuilderEngine",
    "PartitionedCatalogStore",
    "RadcorQuery",
    "get_spark",
]
