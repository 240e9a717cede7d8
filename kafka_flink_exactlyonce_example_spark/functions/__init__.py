from kafka_flink_exactlyonce_example_spark.functions.money import cents, CENTS_SQL  # noqa: F401
from kafka_flink_exactlyonce_example_spark.functions.similarity import (  # noqa: F401
    cosine,
    dot,
    l2_norm,
    COSINE_SQL,
)
