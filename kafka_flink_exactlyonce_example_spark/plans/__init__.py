from kafka_flink_exactlyonce_example_spark.plans.explain import (  # noqa: F401
    assert_in_plan,
    assert_not_in_plan,
    plan_string,
)
