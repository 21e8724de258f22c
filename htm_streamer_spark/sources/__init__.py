from htm_streamer_spark.sources.table_io import ManifestCatalog

__all__ = ["ManifestCatalog"]
