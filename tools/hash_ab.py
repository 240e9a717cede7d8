"""A/B probe: md5-lane vs xxhash64-lane MinHash signature builds.

VERDICT r04 item 8 asked for a measured evaluation of xxhash64 on the
hot hashing paths (MinHash lanes, winnowing grams). The engine keeps
md5 wherever the hash VALUE surfaces in an oracle-checked result,
because DuckDB has no xxhash64 and the correctness gate hashes values
cross-engine — that covers the MinHash estimator/calibration family,
SimHash, shard assignment, and winnowing, i.e. every current consumer.
This probe quantifies what that engine-parity constraint costs at the
signature-build stage, so a production deployment (no DuckDB oracle in
the loop) knows the win available from flipping the hash family.

Both variants build 16 32-bit MinHash lanes per doc over the same
distinct (doc, shingle) relation:

- md5 form (production code, dedup.py:_signatures): 4 md5 calls per
  shingle, each 128-bit digest sliced into 4 × 8-hex-char lanes
  (conv hex→long), min per lane.
- xxhash64 form: 8 xxhash64(seed=i) calls per shingle, each 64-bit
  value split into 2 × 32-bit lanes (shift/mask — no string conv at
  all), min per lane.

Run:  python tools/hash_ab.py [sf_dir] [n_runs]
Prints one JSON line with per-variant medians and the ratio.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def _shingles(spark, sf_dir: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arr = F.filter(F.split("text", " "), lambda w: w != "")
    grams = F.expr(
        "transform(sequence(1, greatest(size(arr) - 1, 1)),"
        " i -> concat_ws(' ', slice(arr, i, 2)))"
    )
    return (
        d.select("doc_id", arr.alias("arr"))
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


def md5_lanes(sh):
    cols = []
    for i in range(16):
        digest = F.md5(F.concat(F.lit(f"{i // 4}:"), F.col("shingle")))
        lane = F.conv(
            F.substring(digest, (i % 4) * 8 + 1, 8), 16, 10
        ).cast("long")
        cols.append(F.min(lane).alias(f"h{i}"))
    return sh.groupBy("doc_id").agg(*cols)


def xxh_lanes(sh):
    cols = []
    for i in range(16):
        h64 = F.xxhash64(F.col("shingle"), F.lit(i // 2))
        half = F.shiftrightunsigned(h64, 32) if i % 2 == 0 else h64
        lane = half.bitwiseAND(F.lit(0xFFFFFFFF))
        cols.append(F.min(lane).alias(f"h{i}"))
    return sh.groupBy("doc_id").agg(*cols)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from kafka_flink_exactlyonce_example_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    sh = _shingles(spark, sf_dir).localCheckpoint()  # isolate hash cost
    sh.count()

    out: dict[str, float] = {}
    for name, builder in (("md5", md5_lanes), ("xxhash64", xxh_lanes)):
        times = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            builder(sh).agg(F.sum("h0"), F.sum("h15")).collect()
            times.append(time.monotonic() - t0)
        out[name] = round(statistics.median(times), 4)
    out["md5_over_xxh"] = round(out["md5"] / out["xxhash64"], 3)
    print(json.dumps({"sf_dir": sf_dir, "n_runs": n_runs, **out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
