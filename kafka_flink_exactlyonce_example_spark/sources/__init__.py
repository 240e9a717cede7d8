from kafka_flink_exactlyonce_example_spark.sources.catalog import (  # noqa: F401
    TABLES,
    register_views,
    table,
)
