from kafka_flink_exactlyonce_example_spark.streaming.exactly_once import (  # noqa: F401
    ContinuousAggregateSink,
    IdempotentBatchSink,
    derive_coarser,
)
from kafka_flink_exactlyonce_example_spark.streaming.jobs import (  # noqa: F401
    custom_sessionize,
    keyed_running_count,
    keyed_running_count_tws,
    stream_stream_interval_join,
    streaming_sessions,
    streaming_window_join,
    streaming_wordcount,
    streaming_windowed_counts,
)
from kafka_flink_exactlyonce_example_spark.streaming.sources import (  # noqa: F401
    file_stream,
    kafka_stream,
    rate_stream,
)
