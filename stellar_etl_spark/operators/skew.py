"""Explicit skew handling: salted two-phase aggregation.

The reference never faces skew (sequential per-ledger loop); at
10^12-turn scale, hot conv_ids (1% of conversations carry 10-100x
turns, FIXTURES.md §1) would make a single-shuffle groupBy(conv_id)
straggle. The standard fix, demanded by the north_star:

  phase 1: repartition on (key, salt) where salt = crc32(stable cols)
           % S -> partial aggregate per (key, salt);
  phase 2: final aggregate on the unsalted key.

The salt must be deterministic (a pure function of row content, not
F.rand()) so retried tasks re-produce identical partitions — the same
determinism rule as turn ids (ids.py). Spark's hash aggregate already
does map-side partial aggregation, which removes *aggregation* skew for
algebraic aggs; the salted form matters when (a) the agg is
non-algebraic per key (collect/median) or (b) the downstream op is a
per-key applyInPandas whose single partition would OOM. We provide it
as a reusable wrapper and prove result-equality with the plain agg.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from row content."""
    return F.pmod(F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])), F.lit(buckets)).cast("int")


def salted_turn_counts(df: DataFrame, buckets: int = 16) -> DataFrame:
    """groupBy(conv_id).count() as a salted two-phase agg.

    Equivalent plan shape to what you'd hand-build for a skewed
    per-key heavy aggregate: shuffle on (conv_id, salt), partial agg,
    shuffle on conv_id, final sum."""
    salt = salt_column(["turn_idx", "role"], buckets)
    partial = (
        df.withColumn("_salt", salt)
        .repartition("conv_id", "_salt")
        .groupBy("conv_id", "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return partial.groupBy("conv_id").agg(F.sum("c").cast("long").alias("turn_count"))


def salted_windowed_tool_counts(
    df: DataFrame, window_dur: str = "1 minute", buckets: int = 16
) -> DataFrame:
    """Two-phase windowed hash-aggregate with salted repartition — the
    north_star's skew-handled rollup. Output == tool_rate without the
    convs column."""
    salt = salt_column(["turn_idx", "conv_id"], buckets)
    partial = (
        df.filter(F.col("tool").isNotNull())
        .withColumn("_salt", salt)
        .groupBy(F.window("ts", window_dur).alias("w"), "tool", "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        partial.groupBy("w", "tool")
        .agg(F.sum("c").cast("long").alias("turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tool",
            "turns",
        )
    )
