"""Local oracle cross-check harness — mirrors the driver's t2 gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given sf dir, then compares row count, column names/dtypes, and exact
(order-insensitive) values. Exit code 0 = all match.

Usage:  python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd


def compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame, name: str) -> list[str]:
    problems: list[str] = []
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return [f"{name}: column mismatch spark={scols} oracle={ocols}"]
    sdf = sdf[scols].sort_values(scols, kind="mergesort").reset_index(drop=True)
    odf = odf[ocols].sort_values(ocols, kind="mergesort").reset_index(drop=True)
    if len(sdf) != len(odf):
        return [f"{name}: row count spark={len(sdf)} oracle={len(odf)}"]
    for c in scols:
        s, o = sdf[c], odf[c]
        try:
            o_cast = o.astype(s.dtype) if s.dtype != o.dtype else o
        except (TypeError, ValueError):
            problems.append(f"{name}.{c}: dtype spark={s.dtype} oracle={o.dtype}")
            continue
        if s.dtype.kind == "f":
            eq = (s.values == o_cast.values) | (s.isna().values & o_cast.isna().values)
            if not eq.all():
                idx = np.where(~eq)[0][:3]
                diffs = [(s.iloc[i], o_cast.iloc[i]) for i in idx]
                problems.append(
                    f"{name}.{c}: {int((~eq).sum())}/{len(s)} float diffs, e.g. {diffs}"
                )
        else:
            eq = (s.values == o_cast.values) | (s.isna().values & o_cast.isna().values)
            if not eq.all():
                idx = np.where(~eq)[0][:3]
                diffs = [(s.iloc[i], o_cast.iloc[i]) for i in idx]
                problems.append(
                    f"{name}.{c}: {int((~eq).sum())}/{len(s)} diffs, e.g. {diffs}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from kafka_flink_exactlyonce_example_spark import ORACLES, QUERIES, registry
    from kafka_flink_exactlyonce_example_spark.session import get_spark
    from kafka_flink_exactlyonce_example_spark.sources import TABLES

    registry.load_all()
    spark = get_spark(shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    names = [n for n in QUERIES if not only or n in only]
    for qname in names:
        t0 = time.time()
        try:
            sdf = QUERIES[qname](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {qname}: spark error: {e}")
            failures += 1
            continue
        if qname not in ORACLES:
            status = "rows-only"
            print(f"OK   {qname}: {len(sdf)} rows ({status}) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(ORACLES[qname]).df()
        except Exception as e:
            print(f"FAIL {qname}: oracle error: {e}")
            failures += 1
            continue
        problems = compare_frames(sdf, odf, qname)
        if problems:
            failures += 1
            for p in problems:
                print(f"FAIL {p}")
        else:
            print(f"OK   {qname}: {len(sdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} queries pass at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
