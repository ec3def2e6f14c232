"""Interval-overlap join (operators/intervals.py): the binned
equi-join + greatest-start anchor must equal the naive theta join
row-for-row, and the physical plan must contain no nested-loop join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stellar_etl_spark.operators.intervals import (
    BUCKET_US,
    _burst_intervals,
    burst_concurrency,
)
from stellar_etl_spark.operators.sessions import sessionize_islands

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

BASE = dt.datetime(2025, 1, 1, 12, 0, 0)


def _mk(spark):
    """Three convs: b1 has a 3-long error burst spanning a bucket
    boundary; s1/s2 have sessions overlapping it (s2's two sessions —
    only one overlaps); s3's session ends long before the burst."""
    e = "x |error| y"

    def rows(conv, specs):
        return [
            (conv, i, "assistant", txt, None, BASE + dt.timedelta(seconds=off))
            for i, (txt, off) in enumerate(specs)
        ]

    data = (
        # burst: turns 1-3 errors, straddling the 13:00 bucket edge
        rows("b1", [("ok", 3400), (e, 3500), (e, 3650), (e, 3700), ("ok", 3800)])
        # s1: one session fully covering the burst window
        + rows("s1", [("ok", 0), ("ok", 5000)])
        # s2: session A ends 8h+1s before the burst (no overlap after
        # gap-extension), session B overlaps
        + rows("s2", [("ok", -32400), ("ok", 3600)])
        # s3: ends >8h before the burst -> session_end < burst start
        + rows("s3", [("ok", -40000)])
    )
    return spark.createDataFrame(data, SCHEMA)


def test_burst_concurrency_equals_theta_join(spark):
    df = _mk(spark)
    got = burst_concurrency(df)

    b = _burst_intervals(df)
    s = sessionize_islands(df).select(
        F.col("conv_id").alias("s_conv"),
        F.unix_micros("session_start").alias("s_start_us"),
        F.unix_micros("session_end").alias("s_end_us"),
    )
    naive = (
        b.crossJoin(s)
        .filter(
            (F.col("s_conv") != F.col("conv_id"))
            & (F.col("s_start_us") <= F.col("b_end_us"))
            & (F.col("b_start_us") <= F.col("s_end_us"))
        )
        .groupBy("conv_id", "start_idx", "end_idx")
        .agg(
            F.countDistinct("s_conv").cast("long").alias("n_concurrent"),
            F.sum(
                F.least("b_end_us", "s_end_us")
                - F.greatest("b_start_us", "s_start_us")
            )
            .cast("long")
            .alias("total_overlap_us"),
        )
    )
    cols = ["conv_id", "start_idx", "end_idx", "n_concurrent", "total_overlap_us"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, naive.select(cols).collect())
    )
    # the planted shape: one burst, overlapped by s1 + s2's second
    # session only (s2's first and s3's are gap-extended but too early)
    [(conv, s_idx, e_idx, n, _)] = got.select(cols).collect()
    assert (conv, s_idx, e_idx, n) == ("b1", 1, 3, 2)


def test_burst_spans_bucket_boundary_counted_once(spark):
    """The burst straddles an hour-bucket edge, so burst x session
    share TWO buckets; the greatest-start anchor must emit the pair
    exactly once (countDistinct would mask dup pairs in n_concurrent,
    but the overlap SUM would double — assert via the sum)."""
    df = _mk(spark)
    got = burst_concurrency(df).collect()[0]
    b = _burst_intervals(df).collect()[0]
    assert b["b_start_us"] // BUCKET_US != b["b_end_us"] // BUCKET_US
    # s1 covers the whole burst span (200 s); s2's second session
    # starts at 13:00, clipping its overlap to the last 100 s — an
    # anchor bug that double-counted shared buckets would inflate this
    span = b["b_end_us"] - b["b_start_us"]
    assert got["total_overlap_us"] == span + 100 * 1_000_000


def test_no_nested_loop_in_plan(spark):
    plan = burst_concurrency(_mk(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
