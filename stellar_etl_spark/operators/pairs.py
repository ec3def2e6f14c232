"""User-turn ↔ response matching — the tx↔result alignment analog (J1).

The reference zips transactions[i] with results[i] inside one ledger
(/root/reference/internal/transform/ledger.go:133-166) — a positional
1:1 join that exists only because its input is pre-aligned. In a
transcript stream nothing is pre-aligned: a user turn's response is
*the next turn in the same conversation with role != 'user'*, which at
scale is a stateful stream-stream join.

Batch form (this module): a window-function match — no join at all,
one shuffle on conv_id, then lead()/first() within the partition.
Streaming form: stellar_etl_spark/streaming/matcher.py
(applyInPandasWithState with watermark-driven eviction) — proven equal
to this batch form on the same input in tests.

Output (FIXTURES.md §2.4): one row per user turn with its response
turn (or nulls + evicted_unmatched=true when no response exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stellar_etl_spark.config import DEFAULT, EngineConfig


def match_pairs(df: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """For each user turn, the first following non-user turn before the
    next user turn (responses don't leak across user turns).

    Implementation note (scale): "first following X" is computed as
    ``last(X) ignorenulls`` over a DESCENDING order with a *growing*
    frame (unboundedPreceding, -1). Spark evaluates growing frames
    incrementally (O(rows) per partition); the naive ascending
    (1, unboundedFollowing) frame is a shrinking frame that Spark
    recomputes per row — O(rows x frame) on hot conversations, which
    measurably flattens multi-core scaling on skewed data."""
    wdesc = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    resp = F.last(
        F.when(
            F.col("role") != "user",
            F.struct("turn_idx", "role", "tool", "ts"),
        ),
        ignorenulls=True,
    ).over(wdesc)
    next_user = F.last(
        F.when(F.col("role") == "user", F.col("turn_idx")), ignorenulls=True
    ).over(wdesc)

    annotated = (
        df.withColumn("resp", resp)
        .withColumn("next_user_idx", next_user)
        .filter(F.col("role") == "user")
    )
    valid = F.col("resp").isNotNull() & (
        F.col("next_user_idx").isNull()
        | (F.col("resp.turn_idx") < F.col("next_user_idx"))
    )
    return annotated.select(
        "conv_id",
        F.col("turn_idx").alias("user_turn_idx"),
        F.when(valid, F.col("resp.turn_idx")).alias("response_turn_idx"),
        F.when(valid, F.col("resp.role")).alias("response_role"),
        F.when(valid, F.col("resp.tool")).alias("response_tool"),
        F.when(valid, F.col("resp.ts").cast("double") - F.col("ts").cast("double")).alias(
            "latency_s"
        ),
        (~valid).alias("evicted_unmatched"),
    )


_PAIRS_CTES = """
    , marked AS (
      SELECT conv_id, turn_idx, role, tool, ts,
        MIN(CASE WHEN role <> 'user' THEN turn_idx END)
          OVER (PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS resp_idx,
        MIN(CASE WHEN role = 'user' THEN turn_idx END)
          OVER (PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_user_idx
      FROM transcripts
    ), users AS (
      SELECT m.conv_id, m.turn_idx AS user_turn_idx, m.ts AS user_ts,
             CASE WHEN m.resp_idx IS NOT NULL
                   AND (m.next_user_idx IS NULL OR m.resp_idx < m.next_user_idx)
                  THEN m.resp_idx END AS response_turn_idx
      FROM marked m WHERE m.role = 'user'
    )
"""

_PAIRS_SELECT = """
    SELECT u.conv_id,
           u.user_turn_idx,
           u.response_turn_idx,
           r.role AS response_role,
           r.tool AS response_tool,
           CASE WHEN u.response_turn_idx IS NOT NULL
                THEN epoch(r.ts) - epoch(u.user_ts) END AS latency_s,
           u.response_turn_idx IS NULL AS evicted_unmatched
    FROM users u
    LEFT JOIN transcripts r
      ON r.conv_id = u.conv_id AND r.turn_idx = u.response_turn_idx
"""

PAIRS_ORACLE_SQL = _PAIRS_CTES + _PAIRS_SELECT

# --- exact latency quantiles ------------------------------------------------
# Percentiles in permille so interpolation positions stay in integer
# arithmetic until ONE final double division on both engines (p*(n-1)
# splits into k = DIV 1000 and rem = MOD 1000; q = lo + rem/1000*(hi-lo)
# is then the same IEEE op sequence in Spark and DuckDB -> bit-exact,
# no dependence on either engine's built-in quantile interpolation).
QUANTILES_PERMILLE = (500, 900, 990)


def latency_quantiles(pairs: DataFrame) -> DataFrame:
    """Exact p50/p90/p99 response latency per responder (tool, or role
    when the response used no tool), from matched pairs only.

    Linear-interpolated exact quantiles (the Hive/`percentile`
    definition: position p*(n-1) on the sorted values) computed with
    explicit rank arithmetic — one shuffle on the responder key, one
    window sort per group, conditional aggregation picks the two
    straddling ranks. At 100 TB the group count is vocabulary-sized
    (tools), so the window sort is per-responder and parallel; for
    sketch-based approximations at higher cardinality swap in
    approx_percentile — this operator is the exact driver-checked
    form."""
    matched = pairs.filter(~F.col("evicted_unmatched")).select(
        F.coalesce("response_tool", "response_role").alias("responder"),
        "latency_s",
    )
    w = Window.partitionBy("responder").orderBy("latency_s")
    ranked = matched.select(
        "responder",
        "latency_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("responder")).alias("n"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_pairs")]
    for pm in QUANTILES_PERMILLE:
        k = F.expr(f"({pm} * (n - 1)) div 1000")
        rem = (F.lit(pm) * (F.col("n") - 1)) % 1000
        lo = F.max(F.when(F.col("rn") == k + 1, F.col("latency_s")))
        hi = F.max(
            F.when(F.col("rn") == F.least(k + 2, F.col("n")), F.col("latency_s"))
        )
        d = rem.cast("double") / 1000.0
        # rem is constant per group; max() carries it through the agg
        q = lo + F.max(d) * (hi - lo)
        # unrounded: ROUND can tie at the 7th decimal when d*(hi-lo)
        # lands on an exact half-ulp decimal (hashing.py hazard note)
        aggs.append(q.alias(f"p{pm}"))
    return (
        ranked.groupBy("responder")
        .agg(*aggs)
        .select("responder", "n_pairs", *[f"p{pm}" for pm in QUANTILES_PERMILLE])
    )


def latency_quantiles_oracle_sql() -> str:
    cols = []
    for pm in QUANTILES_PERMILLE:
        cols.append(
            f"MAX(CASE WHEN rn = ({pm} * (n - 1)) // 1000 + 1 THEN latency_s END)"
            f" + MAX(CAST(({pm} * (n - 1)) % 1000 AS DOUBLE) / 1000.0)"
            f" * (MAX(CASE WHEN rn = LEAST(({pm} * (n - 1)) // 1000 + 2, n)"
            f"              THEN latency_s END)"
            f"    - MAX(CASE WHEN rn = ({pm} * (n - 1)) // 1000 + 1 THEN latency_s END))"
            f" AS p{pm}"
        )
    qcols = ",\n         ".join(cols)
    return (
        _PAIRS_CTES
        + ", pairs AS ("
        + _PAIRS_SELECT
        + """), matched AS (
      SELECT COALESCE(response_tool, response_role) AS responder, latency_s
      FROM pairs WHERE NOT evicted_unmatched
    ), ranked AS (
      SELECT responder, latency_s,
             ROW_NUMBER() OVER (PARTITION BY responder ORDER BY latency_s) AS rn,
             COUNT(*) OVER (PARTITION BY responder) AS n
      FROM matched
    )
  SELECT responder, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         """
        + qcols
        + "\n  FROM ranked GROUP BY responder"
    )


# --- latency outliers (anomaly detection) ------------------------------------
# Two-sided population z-score gate. The double pipeline is pinned to
# an identical op sequence on both engines over EXACT integer inputs
# (x = floor(latency_s) BIGINT; S, Q exact BIGINT sums < 2^53 at bench
# scales), so mu/var/sd/z are bit-identical and the > threshold can
# never disagree cross-engine. sqrt and / are IEEE-754
# correctly-rounded in both engines.
OUTLIER_Z = 3.0


def latency_outliers(pairs: DataFrame) -> DataFrame:
    """Matched pairs whose latency is a per-responder outlier
    (|z| > OUTLIER_Z, population stats).

    Scale notes (100 TB): group stats come from ONE groupBy agg
    (map-side combined) on the vocabulary-sized responder key and are
    broadcast back — the probe side needs NO shuffle and NO window
    sort, so the operator is a narrow map over the pairs table plus a
    dimension-sized join. At petabyte group counts the BIGINT
    Q = sum(x^2) moves to DECIMAL(38,0) — a type swap, not a formula
    change."""
    matched = pairs.filter(~F.col("evicted_unmatched")).select(
        F.coalesce("response_tool", "response_role").alias("responder"),
        "conv_id",
        "user_turn_idx",
        F.floor("latency_s").cast("long").alias("lat_s"),
    )
    stats = matched.groupBy("responder").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("lat_s").cast("long").alias("s1"),
        F.sum(F.col("lat_s") * F.col("lat_s")).cast("long").alias("s2"),
    )
    mu = F.expr("CAST(s1 AS DOUBLE) / CAST(n_pairs AS DOUBLE)")
    var = F.expr(
        "CAST(s2 AS DOUBLE) / CAST(n_pairs AS DOUBLE)"
        " - (CAST(s1 AS DOUBLE) / CAST(n_pairs AS DOUBLE))"
        " * (CAST(s1 AS DOUBLE) / CAST(n_pairs AS DOUBLE))"
    )
    z = F.expr(
        "(CAST(lat_s AS DOUBLE) - mu) / sqrt(var)"
    )
    return (
        matched.join(F.broadcast(stats), "responder")
        .withColumn("mu", mu)
        .withColumn("var", var)
        .filter(F.col("var") > 0)
        .withColumn("zscore", z)
        .filter(F.abs("zscore") > OUTLIER_Z)
        .select(
            "responder",
            "conv_id",
            "user_turn_idx",
            F.col("lat_s").alias("latency_floor_s"),
            "n_pairs",
            # mean is an unrounded integer ratio (floored-seconds sum
            # over count — hashing.py hazard note); zscore keeps its
            # round (sqrt-based, repr-long, tie-free)
            F.col("mu").alias("mean_s"),
            F.round("zscore", 6).alias("zscore"),
        )
    )


def latency_outliers_oracle_sql() -> str:
    return (
        _PAIRS_CTES
        + ", pairs AS ("
        + _PAIRS_SELECT
        + f"""), matched AS (
      SELECT COALESCE(response_tool, response_role) AS responder,
             conv_id, user_turn_idx,
             CAST(FLOOR(latency_s) AS BIGINT) AS lat_s
      FROM pairs WHERE NOT evicted_unmatched
    ), stats AS (
      SELECT responder, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(lat_s) AS BIGINT) AS s1,
             CAST(SUM(lat_s * lat_s) AS BIGINT) AS s2
      FROM matched GROUP BY responder
    ), scored AS (
      SELECT m.responder, m.conv_id, m.user_turn_idx, m.lat_s, s.n_pairs,
             CAST(s.s1 AS DOUBLE) / CAST(s.n_pairs AS DOUBLE) AS mu,
             CAST(s.s2 AS DOUBLE) / CAST(s.n_pairs AS DOUBLE)
               - (CAST(s.s1 AS DOUBLE) / CAST(s.n_pairs AS DOUBLE))
               * (CAST(s.s1 AS DOUBLE) / CAST(s.n_pairs AS DOUBLE)) AS var
      FROM matched m JOIN stats s USING (responder)
    )
    SELECT responder, conv_id, user_turn_idx,
           lat_s AS latency_floor_s, n_pairs,
           mu AS mean_s,
           ROUND((CAST(lat_s AS DOUBLE) - mu) / sqrt(var), 6) AS zscore
    FROM scored
    WHERE var > 0
      AND ABS((CAST(lat_s AS DOUBLE) - mu) / sqrt(var)) > {OUTLIER_Z}
"""
    )
