"""Dimension dedup + one-to-many expansion — star-schema analogs.

Reference analogs:
  * asset/orderbook dedup via seen-hash maps
    (/root/reference/cmd/export_assets.go:40-58,
    internal/input/orderbooks.go:72-118) -> groupBy/dropDuplicates;
    surrogate keys were FNV/FarmHash
    (internal/transform/offer_normalized.go:108-178, asset.go:72-77)
    -> xxhash64 (or a portable rank where cross-engine parity matters).
  * TransformSigners one-account->N-signers explode + weight sort
    (internal/transform/account_signer.go:14-55) -> explode + array_sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dim_tools(df: DataFrame, surrogate: str = "hash") -> DataFrame:
    """Dedup'd tool dimension: first-seen timestamp + usage count.

    surrogate="hash" (default): tool_id = xxhash64(tool) — shuffle-free
    per-row, safe for unbounded vocabularies at 100 TB. surrogate="rank"
    keeps the dense rank over a single-partition Window.orderBy — only
    sound when the post-aggregation key cardinality is tiny (it is here:
    8 tools), used where cross-engine oracle parity matters (DuckDB has
    no xxhash64). Both are deterministic pure functions of the key,
    never sequence generators."""
    agg = (
        df.filter(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.min("ts").alias("first_seen_ts"),
            F.count(F.lit(1)).cast("long").alias("uses"),
        )
    )
    if surrogate == "hash":
        tool_id = F.xxhash64("tool")
    else:
        tool_id = F.row_number().over(Window.orderBy("tool")).cast("long")
    return agg.select(
        tool_id.alias("tool_id"),
        "tool",
        "first_seen_ts",
        "uses",
    )


DIM_TOOLS_ORACLE_SQL = """
    SELECT ROW_NUMBER() OVER (ORDER BY tool) AS tool_id,
           tool,
           MIN(ts) AS first_seen_ts,
           COUNT(*) AS uses
    FROM transcripts WHERE tool IS NOT NULL
    GROUP BY tool
"""


def explode_tokens(df: DataFrame) -> DataFrame:
    """One turn -> N token rows (UDTF analog); token position preserved
    (the claimOrder/effect-index pattern, SURVEY §2.5 W2/W3)."""
    return df.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split("text", r"\|")).alias("token_pos", "token"),
    ).filter(F.col("token") != "")


EXPLODE_ORACLE_SQL = """
    SELECT conv_id, turn_idx,
           CAST(u.pos - 1 AS INT) AS token_pos,
           u.tok AS token
    FROM transcripts,
         LATERAL (SELECT UNNEST(string_split(text, '|')) AS tok,
                         generate_subscripts(string_split(text, '|'), 1) AS pos) u
    WHERE u.tok <> ''
"""


def conv_participants(df: DataFrame) -> DataFrame:
    """Distinct participants (tools) per conversation, canonically
    sorted and serialized — the dedupeParticipants analog
    (/root/reference/internal/transform/operation.go:2235-2245:
    distinct account ids per operation via a seen-map; here
    array_distinct/collect_set + sort_array, A5 in SURVEY §2.4).

    Serialized to a '|'-joined scalar for the same reason as
    tool_sequences: the driver canonicalizer hashes every column."""
    return (
        df.filter(F.col("tool").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_set("tool"))).alias("participants"),
            F.count_distinct("tool").cast("long").alias("n_participants"),
        )
    )


CONV_PARTICIPANTS_ORACLE_SQL = """
    SELECT conv_id,
           array_to_string(list_sort(list(DISTINCT tool)), '|') AS participants,
           COUNT(DISTINCT tool) AS n_participants
    FROM transcripts WHERE tool IS NOT NULL
    GROUP BY conv_id
"""


def top_convs(df: DataFrame, k: int = 10) -> DataFrame:
    """Top-k conversations by turn count (limit/early-exit analog, L1;
    deterministic tie-break on conv_id)."""
    return (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).cast("long").alias("turn_count"))
        .orderBy(F.desc("turn_count"), "conv_id")
        .limit(k)
    )


TOP_CONVS_ORACLE_SQL = """
    SELECT conv_id, COUNT(*) AS turn_count
    FROM transcripts
    GROUP BY conv_id
    ORDER BY turn_count DESC, conv_id
    LIMIT 10
"""
