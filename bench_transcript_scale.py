#!/usr/bin/env python
"""Empirical 10x data-scale evidence for the TRANSCRIPT-family operators.

`bench_dedup_scale.py` measures the document/embedding family; this
harness does the same for the engine's CEP/windowing core — the
operators the north rule actually names (session windows, tumbling and
sliding rollups, the stateful pair match, funnels, the interval join,
graph centrality). It runs each query at 1x (sf0.1's events as-is,
100k turns / 1.5k conversations) and at a deterministic 10x replication
(1M turns / 15k conversations) and reports the wall ratio. Linear-ish
growth shows as ratio <= ~10 (usually well under — fixed Spark overhead
dominates at this scale); a quadratic blowup would show as ratio -> 100.

Scaling regime: 10x CONCURRENT conversations in the SAME time span —
the regime a 10^12-turn production stream actually grows in (more
simultaneous users, not a longer history). Replica r in 0..9 gets

    user_id  + r * 10_000      (conversations are replica-disjoint;
                                per-conversation turn count, ordering
                                and session shape are unchanged)
    event_id + r * 1_000_000   (uniqueness; divisible by 8, so the
                                event_id % 8 tool vocabulary and every
                                text column are replica-consistent)
    ts, event_type, value      unchanged

Consequence to read the numbers with: per-conversation operators
(sessions, pairs, funnel, state compaction) see 10x more GROUPS of the
same size — the embarrassingly-parallel regime. Time-keyed rollups see
the same window keyspace with 10x the rows per window (map-side combine
absorbs it). The one operator whose SEMANTIC output grows faster than
the input is `burst_concurrency`: with 10x sessions open in the same
hour, each error burst genuinely overlaps ~10x more foreign sessions,
so the overlap-pair count (the join's intermediate AND the content of
its n_concurrent/total_overlap answer) grows ~100x by definition, not
by plan defect. The harness therefore also reports the pair count at
both scales so wall growth is attributable to output growth.

Prints ONE JSON line; artifact recorded in BASELINE.md §4d.

Usage: python bench_transcript_scale.py     (~8 min at local[32])
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get(
    "SPARK_GRAFT_TRANSCRIPT_SCALE_DIR", "/tmp/spark_graft_transcript_scale"
)
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# one query per execution shape in the transcript family
QUERIES = (
    "turns_enriched",        # codegen projection + validator
    "sessions",              # gap-based session windows
    "closed_sessions",       # watermark-bounded session export
    "turn_pairs",            # 1:1 user->responder pair match
    "tool_rate_1m",          # tumbling window rollup
    "tool_rate_5m_sliding",  # sliding window rollup
    "tool_rate_peak",        # chained window-on-window rollup
    "salted_tool_rate",      # skew-salted two-phase rollup
    "latency_quantiles",     # exact per-tool quantiles over pairs
    "latency_outliers",      # z-score gate, stats-agg broadcast-back
    "compact_last_state",    # per-key last-state compaction (max_by)
    "asof_last_tool",        # as-of join (reverse scan frame)
    "initiating_user",       # backward-scan window frame
    "exchanges",             # composed TOID-packed pair table
    "conv_funnel",           # CEP ordered funnel (sorted fold)
    "tool_transitions",      # first-order bigram digraph
    "tool_pagerank",         # iterative BIGINT PageRank (5 rounds)
    "tool_lift",             # market-basket co-occurrence
    "error_bursts",          # quantified CEP (gaps-and-islands)
    "dq_violations",         # five integrity checks, one window pass
    "burst_concurrency",     # binned interval-overlap join
)

# optional comma-list override, e.g. a 100x spot-check on a subset:
#   SPARK_GRAFT_SCALE_REPLICAS=100 SPARK_GRAFT_SCALE_QUERIES=sessions,turn_pairs ...
_q_env = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
if _q_env:
    QUERIES = tuple(q.strip() for q in _q_env.split(",") if q.strip())

MARKER_TAG = f"{REPLICAS}-events-v1"


def ensure_scaled_input(spark) -> str:
    """Write the 10x events dir once (deterministic; reused across runs)."""
    out = os.path.join(WORK, f"x{REPLICAS}")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == MARKER_TAG:
                return out
    if os.path.isdir(out):
        shutil.rmtree(out)
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    r = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("r")
    # r as BIGINT: at REPLICAS >= 2148 the int32 product r * 1_000_000
    # crosses 2^31 and ANSI mode (Spark 4 default) raises rather than
    # wraps; the id columns are int64, so widen before multiplying
    rl = F.col("r").cast("long")
    scaled = ev.select("event_id", "ts", "user_id", "event_type", "value", "props", r).select(
        (F.col("event_id") + rl * 1_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + rl * 10_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    scaled.repartition(32).write.parquet(os.path.join(out, "events.parquet"))
    with open(marker, "w") as f:
        f.write(MARKER_TAG)
    return out


def main() -> None:
    import __spark_entry__ as entry_mod
    from bench import build_spark

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled_input(spark)
    qs = {k: v for k, v in entry_mod.queries().items() if k in QUERIES}
    assert len(qs) == len(QUERIES), sorted(set(QUERIES) - set(qs))

    def run(sf_dir: str) -> dict[str, float]:
        raw: dict[str, list[float]] = {n: [] for n in qs}
        for _ in range(REPS):
            for name, fn in qs.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                raw[name].append(time.perf_counter() - t0)
        return {n: round(sorted(xs)[len(xs) // 2], 3) for n, xs in raw.items()}

    # warmup (JIT/codegen/python pool), then timed 1x, timed 10x
    for name, fn in qs.items():
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    base = run(SF_DIR)
    big = run(scaled)

    # observable semantic sizes at both scales: group counts for the
    # per-conversation family, and the interval join's overlap-pair
    # count (SUM n_concurrent) — the quantity that by definition grows
    # ~(replicas^2) in the same-time-span regime.
    from pyspark.sql import functions as F

    def observables(sf_dir: str) -> dict[str, int]:
        out: dict[str, int] = {}
        if "sessions" in qs:
            out["sessions_rows"] = qs["sessions"](spark, sf_dir).count()
        if "turn_pairs" in qs:
            out["turn_pairs_rows"] = qs["turn_pairs"](spark, sf_dir).count()
        if "burst_concurrency" in qs:
            out["burst_overlap_pairs"] = (
                qs["burst_concurrency"](spark, sf_dir)
                .agg(F.sum("n_concurrent"))
                .collect()[0][0]
            )
        return out

    obs = {"x1": observables(SF_DIR), f"x{REPLICAS}": observables(scaled)}

    out = {
        "metric": f"transcript_wall_ratio_{REPLICAS}x_over_1x",
        "unit": f"ratio ({REPLICAS} = linear, {REPLICAS * REPLICAS} = quadratic)",
        "replicas": REPLICAS,
        "reps_per_query": REPS,
        "queries": {
            n: {
                "x1_sec": base[n],
                f"x{REPLICAS}_sec": big[n],
                "ratio": round(big[n] / base[n], 2) if base[n] else None,
            }
            for n in qs
        },
        "observables": obs,
        "sf": SF_DIR,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
