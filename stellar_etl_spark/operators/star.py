"""Star-schema normalization, ordered sequences, one-to-many derived
events — the remaining export-family analogs.

Reference analogs:
  * offer_normalized.go:16-183 — one offer row normalized into
    (DimMarket, DimAccount, DimOffer, FactOfferEvent) with FNV-1a
    surrogate keys (:108-178). Here: `normalize_star` mints the fact
    table with deterministic polynomial-hash surrogate keys
    (`functions/hashing.py` — same determinism contract as FNV, but
    portable, so the DuckDB oracle checks exact key values).
  * account_signer.go:14-55 — one account -> N signer rows sorted by
    weight (A6/L2). Here: `tool_sequences` aggregates each
    conversation's tool invocations into a turn-ordered array.
  * effects.go:23-51,161-166 — one tx -> N effect rows with the effect
    index assigned after collection (W3). Here: `derived_events`
    expands each turn into its typed event rows with posexplode.

Scale notes: normalize_star and derived_events are narrow maps (zero
shuffle — dims at 100 TB are dedup'd downstream by `dropDuplicates` on
the surrogate key, a separate small-output shuffle); tool_sequences is
one shuffle on conv_id with map-side partial collect_list. Surrogate
keys are pure functions of the natural key — never sequence generators
(the TOID lesson, SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions import hashing as H


def normalize_star(df: DataFrame) -> DataFrame:
    """Tool-turn fact table with surrogate keys (FactOfferEvent analog).

    conv_key/tool_key are ~60-bit wide polynomial hashes of the natural
    keys — deterministic across engines and runs, and wide enough that
    birthday collisions don't merge distinct conversations
    (offer_normalized.go's 64-bit FNV pattern, :108-147)."""
    return df.filter(F.col("tool").isNotNull()).select(
        F.expr(H.char_hash_wide("conv_id", spark=True)).alias("conv_key"),
        "conv_id",
        F.expr(H.char_hash_wide("tool", spark=True)).alias("tool_key"),
        "tool",
        "turn_idx",
        "ts",
    )


NORMALIZE_ORACLE_SQL_TEMPLATE = """
    SELECT {conv_hash} AS conv_key,
           conv_id,
           {tool_hash} AS tool_key,
           tool,
           turn_idx,
           ts
    FROM transcripts WHERE tool IS NOT NULL
"""


def normalize_oracle_sql() -> str:
    return NORMALIZE_ORACLE_SQL_TEMPLATE.format(
        conv_hash=H.char_hash_wide("conv_id", spark=False),
        tool_hash=H.char_hash_wide("tool", spark=False),
    )


def tool_sequences(df: DataFrame) -> DataFrame:
    """Per-conversation turn-ordered tool sequence (signer-sort analog).

    collect_list gives no ordering guarantee, so the struct is sorted
    explicitly (sort_array on (turn_idx, tool)) before projection —
    the same discipline as the reference's explicit sort
    (account_signer.go:53)."""
    seq = F.transform(
        F.sort_array(F.collect_list(F.struct("turn_idx", "tool"))),
        lambda s: s["tool"],
    )
    return (
        df.filter(F.col("tool").isNotNull())
        .groupBy("conv_id")
        .agg(
            # serialized scalar, not ARRAY<STRING>: the driver's pandas
            # canonicalizer sorts/hashes every column and list cells are
            # unhashable; '|' never occurs in tool names
            F.concat_ws("|", seq).alias("tools"),
            F.count(F.lit(1)).cast("long").alias("n_tool_turns"),
            F.min("turn_idx").alias("first_tool_turn"),
            F.max("turn_idx").alias("last_tool_turn"),
        )
    )


def tool_sequences_array(df: DataFrame) -> DataFrame:
    """API variant keeping the sequence as ARRAY<STRING> (the driver
    query serializes it because the harness hashes every column; array
    consumers — n-gram models, sequence mining — use this form)."""
    seq = F.transform(
        F.sort_array(F.collect_list(F.struct("turn_idx", "tool"))),
        lambda s: s["tool"],
    )
    return (
        df.filter(F.col("tool").isNotNull())
        .groupBy("conv_id")
        .agg(
            seq.alias("tools"),
            F.count(F.lit(1)).cast("long").alias("n_tool_turns"),
        )
    )


TOOL_SEQUENCES_ORACLE_SQL = """
    SELECT conv_id,
           array_to_string(list(tool ORDER BY turn_idx, tool), '|') AS tools,
           COUNT(*) AS n_tool_turns,
           MIN(turn_idx) AS first_tool_turn,
           MAX(turn_idx) AS last_tool_turn
    FROM transcripts WHERE tool IS NOT NULL
    GROUP BY conv_id
"""


def tool_event_details(df: DataFrame) -> DataFrame:
    """Per-turn semi-structured ``details`` column — the
    OperationOutput.OperationDetails analog (reference's largest
    transform: the 27-type dispatch building map[string]interface{},
    /root/reference/internal/transform/operation.go:584-1173, schema at
    schema.go:142; EffectOutput.Details likewise schema.go:365).

    Per-role dispatch builds a MAP<STRING,STRING> with role-specific
    keys (F.create_map), serialized with F.to_json; `detail_kind` is
    read back out of the JSON with F.from_json — the full map/json
    scalar family (SURVEY §2.8) in one narrow codegen map. `status`
    mirrors the reference's success-conditioned op handling: the source
    event type rides inside `text` field 5, purchase -> ok /
    error -> failed (mapOperationTrace's result-code mapping,
    operation.go:168-231). All map values are strings so the JSON
    rendering is engine-portable; the DuckDB oracle builds the exact
    same compact JSON text."""
    # F.get (not getItem): NULL-tolerant like DuckDB list indexing —
    # transcripts from other sources may embed fewer text fields
    evt = F.get(F.split(F.col("text"), r"\|"), 4)
    status = F.when(evt == "error", "failed").otherwise("ok")
    tool_map = F.create_map(
        F.lit("kind"), F.lit("tool_call"),
        F.lit("tool"), F.coalesce(F.col("tool"), F.lit("")),
        F.lit("status"), status,
        # coalesce: NULL text (declared nullable for external JSONL)
        # must yield "text_len":"0", matching the oracle's COALESCE —
        # to_json would emit null while DuckDB '||' nulls the whole row
        F.lit("text_len"), F.length(F.coalesce(F.col("text"), F.lit(""))).cast("string"),
    )
    sys_map = F.create_map(F.lit("kind"), F.lit("system"))
    msg_map = F.create_map(
        F.lit("kind"), F.lit("message"),
        F.lit("role"), F.col("role"),
        F.lit("words"), F.size(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
        ).cast("string"),
    )
    dm = (
        F.when(F.col("role") == "tool", tool_map)
        .when(F.col("role") == "system", sys_map)
        .otherwise(msg_map)
    )
    return df.select(
        "conv_id", "turn_idx", "role", "tool", "ts", F.to_json(dm).alias("details")
    ).withColumn(
        "detail_kind",
        F.from_json(F.col("details"), "map<string,string>").getItem("kind"),
    )


# Both dialects must render byte-identical compact JSON: Spark's
# to_json(map) emits {"k":"v","k2":"v2"} (no spaces, insertion order),
# which manual concatenation reproduces exactly — values here are
# tool names / digits, so no JSON escaping can occur.
_DETAILS_CASE_SQL = """CASE
      WHEN role = 'tool' THEN
        '{"kind":"tool_call","tool":"' || COALESCE(tool, '')
        || '","status":"'
        || CASE WHEN string_split(text, '|')[5] = 'error' THEN 'failed' ELSE 'ok' END
        || '","text_len":"' || CAST(LENGTH(COALESCE(text, '')) AS VARCHAR) || '"}'
      WHEN role = 'system' THEN '{"kind":"system"}'
      ELSE
        '{"kind":"message","role":"' || role || '","words":"'
        || CAST(LEN(string_split_regex(TRIM(COALESCE(text, '')), '\\s+')) AS VARCHAR) || '"}'
    END"""

TOOL_EVENT_DETAILS_ORACLE_SQL = f"""
    , d AS (
      SELECT conv_id, turn_idx, role, tool, ts,
             {_DETAILS_CASE_SQL} AS details
      FROM transcripts
    )
    SELECT conv_id, turn_idx, role, tool, ts, details,
           json_extract_string(details, '$.kind') AS detail_kind
    FROM d
"""


def successful_tool_calls(df: DataFrame) -> DataFrame:
    """Success-conditioned event filter (F6 analog — filterEvents keeps
    events of successful contract calls only,
    /root/reference/internal/transform/operation.go:1886-1895): tool
    turns whose source event succeeded (status ok)."""
    evt = F.get(F.split(F.col("text"), r"\|"), 4)
    return (
        df.filter((F.col("role") == "tool") & (evt == "purchase"))
        .select("conv_id", "turn_idx", "tool", "ts")
    )


SUCCESSFUL_TOOL_CALLS_ORACLE_SQL = """
    SELECT conv_id, turn_idx, tool, ts
    FROM transcripts
    WHERE role = 'tool' AND string_split(text, '|')[5] = 'purchase'
"""


def derived_events(df: DataFrame) -> DataFrame:
    """One turn -> N typed event rows with post-assigned event index
    (TransformEffect's collect-then-index pattern, effects.go:161-166).

    tool turns emit (tool_invoke, tool_result); other roles emit one
    `message`/`system` event."""
    kinds = (
        F.when(
            F.col("role") == "tool", F.array(F.lit("tool_invoke"), F.lit("tool_result"))
        )
        .when(F.col("role") == "system", F.array(F.lit("system")))
        .otherwise(F.array(F.lit("message")))
    )
    return df.select(
        "conv_id", "turn_idx", "tool", "ts", F.posexplode(kinds).alias("event_idx", "event_type")
    ).select("conv_id", "turn_idx", "event_idx", "event_type", "tool", "ts")


DERIVED_EVENTS_ORACLE_SQL = """
    , kinds AS (
        SELECT conv_id, turn_idx, tool, ts,
               CASE WHEN role = 'tool' THEN ['tool_invoke', 'tool_result']
                    WHEN role = 'system' THEN ['system']
                    ELSE ['message'] END AS ks
        FROM transcripts
    )
    SELECT conv_id, turn_idx,
           CAST(u.i - 1 AS INT) AS event_idx,
           u.ev AS event_type,
           tool, ts
    FROM kinds,
         LATERAL (SELECT UNNEST(ks) AS ev,
                         generate_subscripts(ks, 1) AS i) u
"""
