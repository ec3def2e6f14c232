"""Interval-overlap (range) join — burst/session concurrency.

The query: for each error burst (operators/journeys.error_bursts — a
maximal run of >= MIN_BURST consecutive error turns), which OTHER
conversations had a session window concurrently open, and for how
long? There is no equi-key between the two interval sets, so a naive
plan is a broadcast-nested-loop theta join — O(|bursts| x |sessions|)
comparisons, the classic range-join trap that Catalyst cannot
equi-join away on its own.

Scale design (the standard binned interval join, dedupe-free):

  1. Both interval sets explode into fixed 1-hour epoch buckets
     (``sequence(start div 3600s, end div 3600s)`` — array sizes are
     span-bounded: bursts span seconds, sessions span activity + the
     8h close gap, so ~9-35 buckets/session).
  2. The join becomes an EQUI-join on the bucket plus the residual
     overlap predicate — a plain shuffled hash join, partitioned by
     time bucket, no nested loop anywhere.
  3. A pair that overlaps would match in EVERY shared bucket; instead
     of a distinct, the pair is anchored to the single bucket holding
     ``greatest(start_a, start_b)`` — which always lies inside the
     overlap, so each overlapping pair is produced EXACTLY once and
     the plan needs no dedup shuffle.

Skew: the bucket key's hotness is bounded by sessions-open-per-hour,
the natural concurrency of the platform — at 100 TB one salts the
bucket with a low-cardinality suffix on the session side (the
salted_tool_rate pattern) if one wall-clock hour dominates. All
arithmetic is epoch-microsecond BIGINTs (unix_micros / epoch_us):
counts and overlap sums are integer-exact in both engines.

Reference analog: the reference's time/ledger-range bounding joins
(internal/utils/main.go:827-846 resolves time ranges to ledger ranges
before scanning) — here generalized to arbitrary interval-interval
overlap with a shuffle-friendly physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stellar_etl_spark.config import DEFAULT, EngineConfig
from stellar_etl_spark.operators.journeys import MIN_BURST
from stellar_etl_spark.operators.sessions import sessionize_islands

BUCKET_US = 3600 * 1_000_000  # 1-hour bins


def _burst_intervals(df: DataFrame) -> DataFrame:
    """Error-burst time intervals: journeys.error_bursts' island agg
    keeping the absolute [min ts, max ts] bounds in epoch-µs."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    errs = df.filter(F.col("text").like("%|error|%")).select(
        "conv_id",
        "turn_idx",
        "ts",
        (F.col("turn_idx") - F.row_number().over(w)).alias("island"),
    )
    return (
        errs.groupBy("conv_id", "island")
        .agg(
            F.min("turn_idx").cast("int").alias("start_idx"),
            F.max("turn_idx").cast("int").alias("end_idx"),
            F.count(F.lit(1)).alias("n_errors"),
            F.unix_micros(F.min("ts")).alias("b_start_us"),
            F.unix_micros(F.max("ts")).alias("b_end_us"),
        )
        .filter(F.col("n_errors") >= MIN_BURST)
        .select("conv_id", "start_idx", "end_idx", "b_start_us", "b_end_us")
    )


def burst_concurrency(df: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """For each error burst: how many OTHER conversations had a session
    window open during it (n_concurrent), and the summed overlap in µs
    across all such sessions (total_overlap_us). Bursts overlapping no
    foreign session drop out (inner-join semantics, mirrored in the
    oracle)."""
    bursts = _burst_intervals(df).withColumn(
        "bucket",
        F.explode(
            F.expr(f"sequence(b_start_us div {BUCKET_US}, b_end_us div {BUCKET_US})")
        ),
    )
    sess = (
        sessionize_islands(df, cfg)
        .select(
            F.col("conv_id").alias("s_conv"),
            F.unix_micros("session_start").alias("s_start_us"),
            F.unix_micros("session_end").alias("s_end_us"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.expr(
                    f"sequence(s_start_us div {BUCKET_US}, s_end_us div {BUCKET_US})"
                )
            ),
        )
    )
    joined = bursts.join(
        sess,
        on=[
            bursts["bucket"] == sess["bucket"],
            F.col("s_conv") != F.col("conv_id"),
            F.col("s_start_us") <= F.col("b_end_us"),
            F.col("b_start_us") <= F.col("s_end_us"),
            # anchor: count the pair only in greatest(starts)'s bucket
            bursts["bucket"]
            == F.expr(f"greatest(b_start_us, s_start_us) div {BUCKET_US}"),
        ],
    )
    return joined.groupBy("conv_id", "start_idx", "end_idx").agg(
        F.countDistinct("s_conv").cast("long").alias("n_concurrent"),
        F.sum(
            F.least("b_end_us", "s_end_us") - F.greatest("b_start_us", "s_start_us")
        )
        .cast("long")
        .alias("total_overlap_us"),
    )


BURST_CONCURRENCY_ORACLE_SQL = f"""
    , sflag AS (
      SELECT conv_id, ts, turn_idx,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY conv_id
                                          ORDER BY ts, turn_idx)
                       > INTERVAL 8 HOUR THEN 1 ELSE 0 END AS new_session
      FROM transcripts
    ), sisl AS (
      SELECT conv_id, ts,
             SUM(new_session) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_ord
      FROM sflag
    ), sess AS (
      SELECT conv_id,
             epoch_us(MIN(ts)) AS s_start_us,
             epoch_us(MAX(ts) + INTERVAL 8 HOUR) AS s_end_us
      FROM sisl GROUP BY conv_id, session_ord
    ), berrs AS (
      SELECT conv_id, turn_idx, ts,
             turn_idx - ROW_NUMBER() OVER (PARTITION BY conv_id
                                           ORDER BY turn_idx) AS island
      FROM transcripts WHERE text LIKE '%|error|%'
    ), bursts AS (
      SELECT conv_id,
             CAST(MIN(turn_idx) AS INT) AS start_idx,
             CAST(MAX(turn_idx) AS INT) AS end_idx,
             epoch_us(MIN(ts)) AS b_start_us,
             epoch_us(MAX(ts)) AS b_end_us
      FROM berrs GROUP BY conv_id, island
      HAVING COUNT(*) >= {MIN_BURST}
    )
    SELECT b.conv_id, b.start_idx, b.end_idx,
           CAST(COUNT(DISTINCT s.conv_id) AS BIGINT) AS n_concurrent,
           CAST(SUM(LEAST(b.b_end_us, s.s_end_us)
                    - GREATEST(b.b_start_us, s.s_start_us)) AS BIGINT)
             AS total_overlap_us
    FROM bursts b
    JOIN sess s
      ON s.conv_id <> b.conv_id
     AND s.s_start_us <= b.b_end_us
     AND b.b_start_us <= s.s_end_us
    GROUP BY b.conv_id, b.start_idx, b.end_idx
"""
