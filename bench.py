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

Round-over-round comparability (round-3 verdict §wrong-3): the summed
total conflates suite growth with speed, so the JSON also carries a
``headline_30`` block — the FIXED round-1 query set, whose total and
turns/sec are comparable across every round regardless of how many
queries the registry gains — and a ``families`` batch/streamed split
(streamed drains pay per-trigger state-store commits; mixing them into
one number hides batch regressions). All per-rep raw times are included
(``query_reps``) so a noisy-median claim is auditable, and the complete
JSON is also written to ``BENCH_LOCAL.json`` next to this script so the
record doesn't depend on the driver's truncated stdout tail capture.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The round-1 query set: the fixed headline basket every round reports,
# immune to suite growth (round-3's summed total fell 40% across rounds
# while the engine got faster, purely because the suite grew).
HEADLINE_30 = [
    "ann_topk_brute", "ann_topk_lsh", "asof_last_tool",
    "compact_last_state", "dedup_embedding", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "derived_events", "dim_tools", "doc_fingerprint", "doc_lang_id",
    "doc_stats", "explode_tokens", "fact_tool_events", "initiating_user",
    "multimodal_frames", "multimodal_meta", "role_rate_1m",
    "salted_tool_rate", "sessions", "tool_rate_1m",
    "tool_rate_5m_sliding", "tool_sequences", "top_convs",
    "transform_stats", "turn_pairs", "turn_range_from_times",
    "turns_enriched",
]


def _tws_status() -> str:
    try:
        import google.protobuf  # noqa: F401

        return "available"
    except ImportError:
        return (
            "SKIPPED(env): transformWithState needs the protobuf runtime "
            "(TWS state-server protocol); this environment does not ship "
            "it — tests/test_streaming.py::test_tws_matcher_parity "
            "importorskips and runs on any real Spark 4 cluster"
        )


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

    headline = {n: timings[n] for n in HEADLINE_30 if n in timings}
    headline_total = round(sum(headline.values()), 3)
    streamed = {n: t for n, t in timings.items() if n.endswith("_streamed")}
    batch = {n: t for n, t in timings.items() if not n.endswith("_streamed")}
    result = {
        # headline: the fixed 30-query basket, round-over-round comparable
        "metric": "headline_30_wall_sec",
        "value": headline_total,
        "unit": "sec",
        "headline_30": {
            "total_sec": headline_total,
            "n_queries": len(headline),
            "turns_per_sec": round(n_turns * len(headline) / headline_total, 1)
            if headline_total
            else None,
        },
        "families": {
            "batch": {"n": len(batch), "total_sec": round(sum(batch.values()), 3)},
            "streamed": {
                "n": len(streamed),
                "total_sec": round(sum(streamed.values()), 3),
            },
        },
        "total_wall_sec_all_queries": total,
        "queries": timings,
        "query_spread_min_max": spread,
        "query_reps": {n: [round(x, 3) for x in xs] for n, xs in raw.items()},
        "reps_per_query": reps,
        "sf": sf_dir,
        "n_input_turns": n_turns,
        "turns_per_sec": round(n_turns * len(timings) / total, 1) if total else None,
        "cpus": cpus,
        # self-describing gate split (VERDICT r04 "Next round" #9): the
        # driver's CORRECTNESS artifact gates the first 50 registry
        # positions, so record which queries were driver-gated this
        # round without needing GATING.md
        "gate_window": {
            "window_size": 50,
            "driver_gated": list(qs)[:50],
            "tail": list(qs)[50:],
        },
        # machine-readable env-skip record: the transformWithState form
        # of the J1 matcher (streaming/matcher_tws.py) needs the
        # protobuf runtime for the TWS state-server protocol; where
        # absent, its parity test importorskips rather than fails
        "tws_matcher": _tws_status(),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
