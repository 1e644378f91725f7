from mediachain_indexer_spark.sources.io import (  # noqa: F401
    DRIVER_TABLES,
    SPANS_SCHEMA,
    load_table,
    read_documents,
)
