from deja_view_spark.sources.catalog import (  # noqa: F401
    load_table,
    load_tables,
    TESTDATA_TABLES,
)
