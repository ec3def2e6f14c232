"""The transcripts input table.

The engine's only required input is a table of multi-turn
conversation/agent transcripts::

    conv_id: string, turn_idx: int, role: string,
    text: string, tool: string, ts: timestamp

Two ways to obtain one:

1. ``load_transcripts(spark, sf_dir)`` — a *deterministic, pure-SQL*
   derivation from the driver-provided ``events`` table. Because the
   mapping is expressible in ANSI SQL, every engine query gets an exact
   DuckDB oracle (``TRANSCRIPTS_CTE`` is the shared CTE both sides use).
   This mirrors how the reference's tests rebuild inputs from committed
   fixtures rather than live data
   (/root/reference/internal/transform/test_variables_test.go).

2. ``stellar_etl_spark.sources.generator`` — a seeded synthetic
   generator (skew, sessions, late data) for streaming/bench runs.

Derivation (all deterministic; ties broken by the unique event_id):

    conv_id  = 'c' || user_id               (conversation per user)
    turn_idx = row_number() over (partition by user_id
                                  order by ts, event_id) - 1
    role     = view->user, click->assistant, purchase|error->tool,
               signup->system                (5 event types observed)
    tool     = 'tool_' || (event_id % 8) on tool turns else NULL
               (fixed 8-name vocabulary)
    text     = role|tool|conv_id|turn_idx|event_type|round(value*100)
               (pure function of the row — the golden text-equality
                gate never depends on float formatting)
    ts       = ts
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# DuckDB-side mirror of the derivation below. Every oracle query in
# __spark_entry__.oracle_sql() starts WITH this CTE so Spark and DuckDB
# compute over byte-identical transcript rows.
TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT
    'c' || CAST(user_id AS VARCHAR)                       AS conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
    CASE event_type
      WHEN 'view' THEN 'user'
      WHEN 'click' THEN 'assistant'
      WHEN 'purchase' THEN 'tool'
      WHEN 'error' THEN 'tool'
      ELSE 'system' END                                   AS role,
    CASE event_type
      WHEN 'view' THEN 'user'
      WHEN 'click' THEN 'assistant'
      WHEN 'purchase' THEN 'tool'
      WHEN 'error' THEN 'tool'
      ELSE 'system' END
      || '|' || CASE WHEN event_type IN ('purchase','error')
                     THEN 'tool_' || CAST(event_id % 8 AS VARCHAR)
                     ELSE '' END
      || '|c' || CAST(user_id AS VARCHAR)
      || '|' || CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) - 1 AS VARCHAR)
      || '|' || event_type
      || '|' || CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)
                                                          AS text,
    CASE WHEN event_type IN ('purchase','error')
         THEN 'tool_' || CAST(event_id % 8 AS VARCHAR)
         ELSE NULL END                                    AS tool,
    ts                                                    AS ts
  FROM events
)
"""


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> transcripts DataFrame (see module docstring).

    Scale notes: the row_number() is per-user — at 100 TB this is one
    shuffle on a high-cardinality key (user_id), no global sort. On a
    real deployment the transcripts table is the stored input (Iceberg,
    partitioned by days(ts), bucketed by conv_id) and this derivation
    disappears; it exists so correctness oracles share the input.
    """
    # normalize NTZ parquet timestamps to TimestampType (session TZ is
    # UTC, so instants are unchanged); watermarks/windows need it
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    role = (
        F.when(F.col("event_type") == "view", "user")
        .when(F.col("event_type") == "click", "assistant")
        .when(F.col("event_type").isin("purchase", "error"), "tool")
        .otherwise("system")
    )
    is_tool = F.col("event_type").isin("purchase", "error")
    tool = F.when(is_tool, F.concat(F.lit("tool_"), (F.col("event_id") % 8).cast("string")))
    conv_id = F.concat(F.lit("c"), F.col("user_id").cast("string"))
    turn_idx = (F.row_number().over(w) - 1).cast("int")

    df = ev.select(
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        F.col("event_type"),
        F.col("event_id"),
        F.col("value"),
        tool.alias("tool"),
        F.col("ts"),
    )
    text = F.concat_ws(
        "|",
        F.col("role"),
        F.coalesce(F.col("tool"), F.lit("")),
        F.col("conv_id"),
        F.col("turn_idx").cast("string"),
        F.col("event_type"),
        F.round(F.col("value") * 100).cast("long").cast("string"),
    )
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        text.alias("text"),
        "tool",
        "ts",
    )
