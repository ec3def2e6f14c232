"""Data-quality validation: transcript integrity checks as a table.

The dbt-tests / great-expectations analog every ingest pipeline runs
before trusting a drop: structural invariants of the transcript schema
checked in one pass, violations emitted as queryable rows
(check_name, conv_id, turn_idx, detail). Reference analog: the
reference validates row shape inline per transform and hard-fails
(strict mode, internal/transform/*), with a lenient mode that counts
failures — this operator is the lenient mode's output as a TABLE, so
violations can be aggregated, sampled, and joined like any other data.

Checks:
  * dup_turn_idx  — (conv_id, turn_idx) appears more than once
  * turn_gap      — turn_idx != previous turn_idx + 1 within the
                    conversation (ordered by turn_idx, ts)
  * ts_regression — event time goes backwards within the conversation
  * bad_role      — role outside the {user, assistant, tool, system}
                    vocabulary
  * empty_text    — NULL or empty text payload

The production checker (``dq_violations``) is PURE — it flags exactly
the input it is given (the redact_pii injection-split discipline). The
driver query composes it with ``inject_dq_violations``, a deterministic
mutation fixture (victims picked by the portable conv-id hash, one
violation family per hash class — the corpus-mutation pattern,
functions/corpus.py), because the synthetic transcripts are violation-
free and an always-empty result would gate nothing. The oracle mirrors
the same mutation CTE verbatim.

Scale notes (100 TB): dup detection is one (conv, turn) groupBy with
map-side combine; every other check is a lag() over the (conv_id)
partitioning every per-conversation operator here shares (shuffle-free
on the bucketed store, sources/bucketed.py); the union of violation
branches reuses ONE window pass (same partitioning/order), and output
is violation-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stellar_etl_spark.functions import hashing as H

ROLE_VOCAB = ("user", "assistant", "tool", "system")

# deterministic victim classes: char_hash('<conv_id>:dq') % 100
_DQ_GATE_SPARK = H.char_hash("concat(conv_id, ':dq')", spark=True) + " % 100"
_DQ_GATE_DUCK = H.char_hash("conv_id || ':dq'", spark=False) + " % 100"


def inject_dq_violations(df: DataFrame) -> DataFrame:
    """Plant one violation family per hash class (test fixture — the
    production path feeds ``dq_violations`` the raw input):

      class 0: exact copy of turn 1          -> dup_turn_idx (+ gap)
      class 1: copy of turn 0 at idx+1000    -> turn_gap
      class 2: copy of turn 0 at idx+2000, ts - 1h -> ts_regression (+ gap)
      class 3: copy of turn 0 at idx+3000, role 'robot' -> bad_role (+ gap)
      class 4: copy of turn 0 at idx+4000, text ''      -> empty_text (+ gap)
    """
    g = F.expr(_DQ_GATE_SPARK)
    base = df.withColumn("g", g)

    def pick(cls: int, turn: int) -> DataFrame:
        return base.filter((F.col("g") == cls) & (F.col("turn_idx") == turn))

    dup = pick(0, 1).drop("g")
    gap = pick(1, 0).withColumn("turn_idx", F.col("turn_idx") + 1000).drop("g")
    tsr = (
        pick(2, 0)
        .withColumn("turn_idx", F.col("turn_idx") + 2000)
        .withColumn("ts", F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        .drop("g")
    )
    rol = (
        pick(3, 0)
        .withColumn("turn_idx", F.col("turn_idx") + 3000)
        .withColumn("role", F.lit("robot"))
        .drop("g")
    )
    emp = (
        pick(4, 0)
        .withColumn("turn_idx", F.col("turn_idx") + 4000)
        .withColumn("text", F.lit(""))
        .drop("g")
    )
    return df.unionByName(dup).unionByName(gap).unionByName(tsr) \
             .unionByName(rol).unionByName(emp)


DQ_INPUT_CTE = f"""
    , gated AS (
      SELECT t.*, ({_DQ_GATE_DUCK}) AS g FROM transcripts t
    ), dq_input AS (
      SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts
      UNION ALL
      SELECT conv_id, turn_idx, role, text, tool, ts
      FROM gated WHERE g = 0 AND turn_idx = 1
      UNION ALL
      SELECT conv_id, turn_idx + 1000, role, text, tool, ts
      FROM gated WHERE g = 1 AND turn_idx = 0
      UNION ALL
      SELECT conv_id, turn_idx + 2000, role, text, tool,
             ts - INTERVAL 1 HOUR
      FROM gated WHERE g = 2 AND turn_idx = 0
      UNION ALL
      SELECT conv_id, turn_idx + 3000, 'robot', text, tool, ts
      FROM gated WHERE g = 3 AND turn_idx = 0
      UNION ALL
      SELECT conv_id, turn_idx + 4000, role, '', tool, ts
      FROM gated WHERE g = 4 AND turn_idx = 0
    )
"""


def dq_violations(df: DataFrame) -> DataFrame:
    """One row per integrity violation in the given transcript table:
    (check_name, conv_id, turn_idx, detail)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    ann = df.select(
        "conv_id", "turn_idx", "role", "text", "ts",
        F.lag("turn_idx").over(w).alias("prev_idx"),
        F.lag("ts").over(w).alias("prev_ts"),
    )

    dup = (
        df.groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(
            F.lit("dup_turn_idx").alias("check_name"),
            "conv_id",
            "turn_idx",
            F.col("n").cast("string").alias("detail"),
        )
    )
    gap = ann.filter(
        F.col("prev_idx").isNotNull() & (F.col("turn_idx") != F.col("prev_idx") + 1)
    ).select(
        F.lit("turn_gap").alias("check_name"),
        "conv_id",
        "turn_idx",
        F.col("prev_idx").cast("string").alias("detail"),
    )
    tsr = ann.filter(
        F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts"))
    ).select(
        F.lit("ts_regression").alias("check_name"),
        "conv_id",
        "turn_idx",
        F.lit("").alias("detail"),
    )
    rol = df.filter(~F.col("role").isin(*ROLE_VOCAB)).select(
        F.lit("bad_role").alias("check_name"),
        "conv_id",
        "turn_idx",
        F.col("role").alias("detail"),
    )
    emp = df.filter(
        F.col("text").isNull() | (F.col("text") == "")
    ).select(
        F.lit("empty_text").alias("check_name"),
        "conv_id",
        "turn_idx",
        F.lit("").alias("detail"),
    )
    return dup.unionByName(gap).unionByName(tsr).unionByName(rol).unionByName(emp)


ROLE_VOCAB_SQL = ", ".join(f"'{r}'" for r in ROLE_VOCAB)

# appended after the transcripts CTE prefix (_W in __spark_entry__)
DQ_ORACLE_SQL = DQ_INPUT_CTE + f"""
    , ann AS (
      SELECT conv_id, turn_idx, role, text, ts,
             LAG(turn_idx) OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx, ts) AS prev_idx,
             LAG(ts) OVER (PARTITION BY conv_id
                           ORDER BY turn_idx, ts) AS prev_ts
      FROM dq_input
    )
    SELECT 'dup_turn_idx' AS check_name, conv_id, turn_idx,
           CAST(COUNT(*) AS VARCHAR) AS detail
    FROM dq_input GROUP BY conv_id, turn_idx HAVING COUNT(*) > 1
    UNION ALL
    SELECT 'turn_gap', conv_id, turn_idx, CAST(prev_idx AS VARCHAR)
    FROM ann WHERE prev_idx IS NOT NULL AND turn_idx != prev_idx + 1
    UNION ALL
    SELECT 'ts_regression', conv_id, turn_idx, ''
    FROM ann WHERE prev_ts IS NOT NULL AND ts < prev_ts
    UNION ALL
    SELECT 'bad_role', conv_id, turn_idx, role
    FROM dq_input WHERE role NOT IN ({ROLE_VOCAB_SQL})
    UNION ALL
    SELECT 'empty_text', conv_id, turn_idx, ''
    FROM dq_input WHERE text IS NULL OR text = ''
"""
