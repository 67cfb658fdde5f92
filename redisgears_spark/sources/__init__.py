from redisgears_spark.sources.keyspace import (  # noqa: F401
    TABLES,
    keyspace_view,
    load_table,
    register_views,
)
