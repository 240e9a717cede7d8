"""Property test for the histogram-CDF percentile identity used by the
[histogram-cdf-percentile] family (q_session_stats, q_interarrival,
q_skew_diag, …): picking the smallest bin whose cumulative count
reaches the rank via the INTEGER thresholds ``cum·2 ≥ n`` / ``cum·10 ≥
9n`` must equal the textbook discrete percentile (smallest x with
CDF(x) ≥ p, i.e. rank ⌈p·n⌉) for ANY integer multiset — ties, gaps,
single values, adjacent duplicates. Hypothesis drives the multisets;
the Spark side runs the same plan fragment the operators use."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def _reference_discrete_percentile(values: list[int], p: float) -> int:
    """Smallest value whose cumulative count reaches ⌈p·n⌉."""
    s = sorted(values)
    rank = math.ceil(p * len(s))
    return s[max(rank, 1) - 1]


def _spark_cdf_picks(spark, values: list[int]) -> tuple[int, int]:
    df = spark.createDataFrame([(v,) for v in values], "v long")
    hist = df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cdf = hist.select(
        "v",
        F.sum("cnt").over(wb).alias("cum"),
        F.sum("cnt").over(wt).alias("n"),
    )
    row = cdf.agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("v"))).alias("p50"),
        F.min(
            F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("v"))
        ).alias("p90"),
    ).collect()[0]
    return row["p50"], row["p90"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(st.integers(min_value=-3600, max_value=3600), min_size=1, max_size=60)
)
def test_integer_threshold_equals_discrete_percentile(spark, values):
    p50, p90 = _spark_cdf_picks(spark, values)
    assert p50 == _reference_discrete_percentile(values, 0.5)
    assert p90 == _reference_discrete_percentile(values, 0.9)
