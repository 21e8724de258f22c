from htm_streamer_spark.sources.table_io import (
    IcebergCatalog,
    ManifestCatalog,
    iceberg_available,
    list_hive_partitions,
)

__all__ = [
    "IcebergCatalog",
    "ManifestCatalog",
    "iceberg_available",
    "list_hive_partitions",
]
