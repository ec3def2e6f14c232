"""Last-state compaction, as-of lookup, backward match — the
change-stream operators.

Reference analogs:
  * ChangeCompactor: N changes per ledger key -> one net change per
    batch (/root/reference/internal/input/changes.go:102-136). Batch
    form: arg-max by order key (max_by). Streaming form: per-key state
    in applyInPandasWithState (streaming/matcher.py).
  * findLatestOperationChange: reverse scan for latest change <= op —
    an as-of lookup (/root/reference/internal/transform/trade.go:281-304).
    Spark form: last(value, ignorenulls) over rowsBetween(unboundedPreceding,
    currentRow) — no join, one shuffle on the key.
  * findInitatingBeginSponsoringOp: backward scan through earlier ops
    for a matching initiator
    (/root/reference/internal/transform/operation.go:533-553). Spark
    form: the same last() frame ending at -1 (strictly earlier rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def compact_last_state(df: DataFrame) -> DataFrame:
    """Per (conv_id, role): the latest turn wins — net-change semantics.

    One shuffle; map-side partial max_by keeps per-key traffic at one
    struct regardless of input size (the property the reference's
    compactor hand-rolls per batch)."""
    latest = F.max_by(
        F.struct("turn_idx", "text", "tool", "ts"), F.col("turn_idx")
    ).alias("latest")
    return (
        df.groupBy("conv_id", "role")
        .agg(latest, F.count(F.lit(1)).cast("long").alias("n_changes"))
        .select(
            "conv_id",
            "role",
            F.col("latest.turn_idx").alias("last_turn_idx"),
            F.col("latest.text").alias("last_text"),
            F.col("latest.tool").alias("last_tool"),
            F.col("latest.ts").alias("last_ts"),
            "n_changes",
        )
    )


COMPACT_ORACLE_SQL = """
    SELECT conv_id, role,
           MAX_BY(turn_idx, turn_idx) AS last_turn_idx,
           MAX_BY(text, turn_idx)     AS last_text,
           MAX_BY(tool, turn_idx)     AS last_tool,
           MAX_BY(ts, turn_idx)       AS last_ts,
           COUNT(*)                   AS n_changes
    FROM transcripts
    GROUP BY conv_id, role
"""


def compact_last_state_by(df: DataFrame, *keys: str) -> DataFrame:
    """Generic per-key last-state compaction — the per-entry-type
    projection family (P7-P9): the reference runs one ChangeCompactor +
    Transform per entry type, each keyed differently (accounts by
    address, trustlines by (account, asset) `trustline.go:18-107`,
    offers by (seller, offer_id) `offer.go:13-103`...). One generic
    operator parameterized by the key columns replaces the ~10
    hand-written Go loops; the projection downstream picks the typed
    columns."""
    latest = F.max_by(
        F.struct("turn_idx", "role", "text", "tool", "ts"), F.col("turn_idx")
    ).alias("latest")
    return (
        df.groupBy(*keys)
        .agg(latest, F.count(F.lit(1)).cast("long").alias("n_changes"))
        .select(
            *keys,
            F.col("latest.turn_idx").alias("last_turn_idx"),
            F.col("latest.ts").alias("last_ts"),
            "n_changes",
        )
    )


def state_conv_tools(df: DataFrame) -> DataFrame:
    """Per-(conversation, tool) usage state — the trustline-table
    analog (two-level key (account, asset),
    /root/reference/internal/transform/trustline.go:18-107): for each
    conv x tool, the latest invocation and use count."""
    return compact_last_state_by(
        df.filter(F.col("tool").isNotNull()), "conv_id", "tool"
    )


STATE_CONV_TOOLS_ORACLE_SQL = """
    SELECT conv_id, tool,
           MAX_BY(turn_idx, turn_idx) AS last_turn_idx,
           MAX_BY(ts, turn_idx)       AS last_ts,
           COUNT(*)                   AS n_changes
    FROM transcripts
    WHERE tool IS NOT NULL
    GROUP BY conv_id, tool
"""


def state_intervals(df: DataFrame) -> DataFrame:
    """SCD2 validity intervals over the per-(conv_id, role) change
    stream: each turn's state is effective from its own ts until the
    next change of the same key (NULL effective_to = current row).

    The history-table side of compaction — where ``compact_last_state``
    keeps only the net row (the reference's ChangeCompactor,
    /root/reference/internal/input/changes.go:102-136), this keeps
    every version with its validity window, the standard warehouse
    slowly-changing-dimension type-2 layout the reference approximates
    by exporting one row per ledger change with closed_at stamps
    (/root/reference/internal/transform/trustline.go:18-107 exports
    deleted/updated flags per change for the same reason).

    Scale: one shuffle on the key, one window pass per key — history
    row count equals input row count (narrow projection), and the
    partition key (conv_id, role) distributes evenly because hot
    conversations split across roles."""
    w = Window.partitionBy("conv_id", "role").orderBy("turn_idx")
    return df.select(
        "conv_id",
        "role",
        "turn_idx",
        "tool",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w).alias("effective_to"),
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


STATE_INTERVALS_ORACLE_SQL = """
    SELECT conv_id, role, turn_idx, tool,
           ts AS effective_from,
           LEAD(ts) OVER w AS effective_to,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id, role ORDER BY turn_idx)
"""


def asof_last_tool(df: DataFrame) -> DataFrame:
    """For every turn: the most recent tool used at or before it in the
    conversation (as-of join via window frame, W5 in SURVEY §2.5)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        F.last("tool", ignorenulls=True).over(w).alias("asof_tool"),
    )


ASOF_ORACLE_SQL = """
    SELECT conv_id, turn_idx, role,
           LAST_VALUE(tool IGNORE NULLS) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_tool
    FROM transcripts
"""


def initiating_user_turn(df: DataFrame) -> DataFrame:
    """For every tool turn: the most recent strictly-earlier user turn —
    the sponsorship-sandwich backward match (J4/W4)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn(
            "initiating_user_idx",
            F.last(
                F.when(F.col("role") == "user", F.col("turn_idx")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("role") == "tool")
        .select("conv_id", "turn_idx", "tool", "initiating_user_idx")
    )


INITIATOR_ORACLE_SQL = """
    , t AS (
      SELECT conv_id, turn_idx, role, tool,
             MAX(CASE WHEN role='user' THEN turn_idx END) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS initiating_user_idx
      FROM transcripts
    )
    SELECT conv_id, turn_idx, tool, initiating_user_idx
    FROM t WHERE role = 'tool'
"""
