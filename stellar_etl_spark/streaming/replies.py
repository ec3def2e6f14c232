"""Native stream-stream time-range join (ST family): user turns joined
to the assistant turns that follow within the reply window.

The engine already has TWO join machineries for turn pairing: the
custom stateful matcher (streaming/matcher.py — applyInPandasWithState,
1:1 first-match semantics with eviction) and the batch join
(operators/pairs.py). This operator exercises the THIRD: Spark's
built-in symmetric hash join for stream-stream equi+range conditions —
both legs of one watermarked stream self-joined on conv_id with an
event-time range (`a.ts ∈ [u.ts, u.ts + REPLY_WINDOW]`), many-to-many
semantics (every qualifying assistant turn pairs with every open user
turn — the fan-out form the 1:1 matcher deliberately collapses).

Why this matters at scale: the range condition is what lets Spark
BOUND the join state — each side's buffered rows are dropped as soon
as the watermark passes `ts + REPLY_WINDOW` (state cleanup is derived
from the condition, Spark's watermark-state reasoning; the custom
matcher does the same job manually with EventTimeTimeout). Inner-join
rows emit as soon as both sides have arrived — correctness does not
wait for the watermark, so the drained output equals the batch theta
join for ANY slicing, with no closer-sentinel dependence.

Reference analog: the tx↔result / op↔result joins
(internal/transform/operation.go pairing) — the reference walks both
arrays in one process; here the two sides are unbounded streams and
the pairing is the join operator's state machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.config import DEFAULT, EngineConfig

REPLY_WINDOW = "2 hours"
REPLY_WINDOW_SQL = "INTERVAL 2 HOUR"


def reply_join_stream(df: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Self-join of the watermarked turn stream: every (user turn,
    assistant turn) pair of the same conversation with the assistant
    turn inside (turn order AND) the reply window. reply_delay_s uses
    the divide-each-term double arithmetic shared with the batch/
    matcher forms (bit-identical to DuckDB epoch() subtraction)."""
    wm = df.withWatermark("ts", cfg.watermark_delay)
    u = wm.filter(F.col("role") == "user").select(
        F.col("conv_id").alias("u_conv"),
        F.col("turn_idx").alias("user_idx"),
        F.col("ts").alias("u_ts"),
    )
    a = wm.filter(F.col("role") == "assistant").select(
        F.col("conv_id").alias("a_conv"),
        F.col("turn_idx").alias("reply_idx"),
        F.col("ts").alias("a_ts"),
    )
    # The join CONDITION carries ONLY the equi key + the event-time
    # range: Spark's StreamingJoinHelper derives the state-cleanup
    # watermark constraint from exactly this shape, and any non-time
    # predicate mixed into the conjunction makes the whole extraction
    # bail (WARN "Error trying to extract state constraint" ->
    # unbounded join state). A post-join .filter() does NOT work
    # either: PushPredicateThroughJoin folds it straight back into the
    # condition. The turn-order predicate (reply_idx > user_idx) is
    # therefore applied by reply_pairs() on the DRAINED output — a
    # row-local batch filter at serve time, the epoch-sink fold
    # discipline. The streamed operator itself computes the well-formed
    # superset "same-conv turn pairs within the reply time window".
    j = u.join(
        a,
        F.expr(
            f"a_conv = u_conv AND a_ts >= u_ts"
            f" AND a_ts <= u_ts + {REPLY_WINDOW_SQL}"
        ),
    )
    return j.select(
        F.col("u_conv").alias("conv_id"),
        "user_idx",
        "reply_idx",
        (F.col("a_ts").cast("double") - F.col("u_ts").cast("double")).alias(
            "reply_delay_s"
        ),
    )


def reply_pairs(drained: DataFrame) -> DataFrame:
    """Serve-time tail over the drained join output: keep the pairs
    where the assistant turn FOLLOWS the user turn in conversation
    order (row-local filter — no shuffle, no state)."""
    return drained.filter(F.col("reply_idx") > F.col("user_idx"))


TURN_REPLIES_ORACLE_SQL = f"""
    SELECT u.conv_id, u.turn_idx AS user_idx, a.turn_idx AS reply_idx,
           epoch(a.ts) - epoch(u.ts) AS reply_delay_s
    FROM transcripts u
    JOIN transcripts a
      ON a.conv_id = u.conv_id
     AND u.role = 'user' AND a.role = 'assistant'
     AND a.turn_idx > u.turn_idx
     AND a.ts >= u.ts AND a.ts <= u.ts + {REPLY_WINDOW_SQL}
"""


def reply_join_outer_stream(df: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """LEFT OUTER form of the reply join: every user turn, paired with
    each assistant turn of its conversation in the following
    REPLY_WINDOW — or with NULLs if none exists. The outer semantics
    is the native feature under test: Spark may emit a null-padded row
    only once the watermark proves no matching right-side row can
    still arrive (matched rows emit immediately; the null rows ride
    the state-eviction pass — the matcher's evicted_unmatched rows,
    produced by the built-in join operator instead of custom timeout
    code).

    The condition is the PURE equi+time-range shape (no turn-order
    predicate, and none applied later either: for the outer form a
    serve-time filter would be unsound — dropping a matched row cannot
    conjure the null row the batch LEFT JOIN would have produced). The
    operator's meaning is exactly 'assistant activity within the
    window after each user turn'."""
    wm = df.withWatermark("ts", cfg.watermark_delay)
    u = wm.filter(F.col("role") == "user").select(
        F.col("conv_id").alias("u_conv"),
        F.col("turn_idx").alias("user_idx"),
        F.col("ts").alias("u_ts"),
    )
    a = wm.filter(F.col("role") == "assistant").select(
        F.col("conv_id").alias("a_conv"),
        F.col("turn_idx").alias("reply_idx"),
        F.col("ts").alias("a_ts"),
    )
    j = u.join(
        a,
        F.expr(
            f"a_conv = u_conv AND a_ts >= u_ts"
            f" AND a_ts <= u_ts + {REPLY_WINDOW_SQL}"
        ),
        "leftOuter",
    )
    return j.select(
        F.col("u_conv").alias("conv_id"),
        "user_idx",
        "reply_idx",
        (F.col("a_ts").cast("double") - F.col("u_ts").cast("double")).alias(
            "reply_delay_s"
        ),
    )


TURN_REPLIES_OUTER_ORACLE_SQL = f"""
    SELECT u.conv_id, u.turn_idx AS user_idx, a.turn_idx AS reply_idx,
           epoch(a.ts) - epoch(u.ts) AS reply_delay_s
    FROM transcripts u
    LEFT JOIN transcripts a
      ON a.conv_id = u.conv_id
     AND a.role = 'assistant'
     AND a.ts >= u.ts AND a.ts <= u.ts + {REPLY_WINDOW_SQL}
    WHERE u.role = 'user'
"""
