#!/usr/bin/env python
"""Benchmark harness for the transcript engine.

Runs every registered driver query (``__spark_entry__.queries()``) at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...,
     "turns_per_sec": ..., "cpus": ...}

Each query is forced end-to-end with the ``noop`` sink (full physical
execution — scan, shuffle, UDFs — without driver-side collect skew).
Scaling-efficiency evidence (local[8] vs local[32], BASELINE.md §3) is
produced by running this script twice with SPARK_GRAFT_CPUS=8 / 32.

Per-query time is the MEDIAN of ``$SPARK_GRAFT_REPS`` (default 3)
timed repetitions, interleaved round-robin (rep 0 of every query, then
rep 1, ...) so a host-noise burst degrades one rep of many queries
instead of all reps of one — this sandbox is a bursty shared box and
single-shot numbers proved untrustworthy (round-2 verdict §perf). The
JSON carries the medians plus per-query min/max spread.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"stellar-etl-spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import __spark_entry__ as entry_mod

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + Python worker pool outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda x: x * 1.0, "double")
    spark.range(100_000).select(_warm("id")).write.format("noop").mode("overwrite").save()

    n_turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    qs = entry_mod.queries()
    raw: dict[str, list[float]] = {name: [] for name in qs}
    for _rep in range(reps):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw[name].append(time.perf_counter() - t0)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    timings = {name: round(median(xs), 3) for name, xs in raw.items()}
    spread = {
        name: [round(min(xs), 3), round(max(xs), 3)] for name, xs in raw.items()
    }
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_spread_min_max": spread,
                "reps_per_query": reps,
                "sf": sf_dir,
                "n_input_turns": n_turns,
                "turns_per_sec": round(n_turns * len(timings) / total, 1) if total else None,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
