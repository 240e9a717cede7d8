from kafka_flink_exactlyonce_example_spark.sources.catalog import (  # noqa: F401
    TABLES,
    register_views,
    table,
)
from kafka_flink_exactlyonce_example_spark.sources.io import (  # noqa: F401
    read_any,
    write_compacted,
    write_bucketed,
    write_partitioned,
)
