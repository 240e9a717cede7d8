"""Custom connector via the PySpark 4 Python DataSource API.

The reference consumes Kafka through a built-in connector; the general
capability behind that is "plug a new source into the engine". Spark 4
exposes that extension point to Python (`pyspark.sql.datasource`), and
this module implements it end-to-end: a deterministic synthetic-events
source with

- a **batch reader** with explicit input partitions (the unit of scan
  parallelism — at 100 TB this is where a real connector maps splits /
  topic-partitions / file ranges to tasks), and
- a **micro-batch stream reader** with monotonically increasing offsets
  (`initialOffset` / `latestOffset` / `read(start, end)`), the same
  replayable-offset contract Kafka gives Structured Streaming — which is
  exactly what the checkpoint WAL + idempotent sink need for end-to-end
  exactly-once (streaming/exactly_once.py).

Rows are generated with a hash-based PRNG (xorshift on the row id) so
every partition is reproducible independently of scheduling order —
re-reading an offset range yields identical rows, which is the property
a replayable source must guarantee.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_TYPES = ("view", "click", "purchase", "signup", "error")
_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _mix(x: int) -> int:
    """Deterministic 64-bit mix (splitmix64 finalizer, public domain)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row(event_id: int) -> tuple[int, int, str, float]:
    h = _mix(event_id)
    return (
        event_id,
        h % 100,
        _TYPES[(h >> 8) % len(_TYPES)],
        round(((h >> 16) % 10_000) / 100.0, 2),
    )


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events")` after registration.

    Options: ``rows`` (total, default 1000), ``partitions`` (default 4),
    streaming: ``rowsPerBatch`` (default 100).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> list[InputPartition]:
        # contiguous row ranges — a real connector returns splits here
        step = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _row(i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset contract: {"id": N} means N rows emitted so far; a batch
    is the id range [start, end) — re-reading any range is reproducible,
    so checkpoint replay after a crash re-creates the exact batch."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["id"]
        hi = lo + self.rows_per_batch
        return iter([_row(i) for i in range(lo, hi)]), {"id": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay path after restart — must equal the original emission
        return iter([_row(i) for i in range(start["id"], end["id"])])
