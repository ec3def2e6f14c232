"""Conversation-journey analytics: retention cohorts and tool
transition matrices.

Reference analog: the reference's per-ledger aggregation surface stops
at counts-per-close (`transform_ledger`'s successful/failed tallies,
/root/reference/internal/transform/ledger.go:20-96); an analytics
engine over the same event stream also answers longitudinal questions —
"of the conversations that started on day X, how many were active on
day Y?" (retention) and "which tool follows which?" (transition
matrix, the operation-ordering analog of the TOID's within-ledger
sequencing, /root/reference/internal/toid/main.go:32-56).

Scale notes (100 TB):
* ``conv_retention``: cohort assignment is one groupBy(conv_id) min —
  map-side combined; the activity matrix aggregates (conv_id, day)
  pairs that were already deduped in the same shuffle. Output is
  days x days, metadata-sized.
* ``tool_transitions``: lag() needs (conv_id) partitioning — the same
  partitioning every per-conversation operator here uses, so on a
  bucketed store (sources/bucketed.py) the window sort is shuffle-free;
  output is |tools|^2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def conv_retention(df: DataFrame) -> DataFrame:
    """Cohort retention matrix: conversations grouped by their first
    active day; one row per (cohort_day, activity_day) with the number
    of cohort conversations active that day and the day offset."""
    days = df.select("conv_id", F.to_date("ts").alias("activity_day")).distinct()
    cohort = days.groupBy("conv_id").agg(F.min("activity_day").alias("cohort_day"))
    return (
        days.join(cohort, "conv_id")
        .groupBy("cohort_day", "activity_day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_convs"))
        .select(
            "cohort_day",
            "activity_day",
            F.datediff("activity_day", "cohort_day").cast("long").alias("day_offset"),
            "n_convs",
        )
    )


RETENTION_ORACLE_SQL = """
    , days AS (
      SELECT DISTINCT conv_id, CAST(ts AS DATE) AS activity_day FROM transcripts
    ), cohort AS (
      SELECT conv_id, MIN(activity_day) AS cohort_day FROM days GROUP BY conv_id
    )
    SELECT c.cohort_day, d.activity_day,
           CAST(d.activity_day - c.cohort_day AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_convs
    FROM days d JOIN cohort c USING (conv_id)
    GROUP BY c.cohort_day, d.activity_day
"""


def tool_transitions(df: DataFrame) -> DataFrame:
    """First-order tool transition counts: for each conversation's
    tool-bearing turns in turn order, count (previous tool -> tool)
    bigrams across the corpus; '__start__' marks a conversation's
    first tool use."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tools = df.filter(F.col("tool").isNotNull()).select(
        "conv_id",
        "turn_idx",
        "tool",
        F.lag("tool").over(w).alias("prev_tool"),
    )
    return (
        tools.groupBy(
            F.coalesce("prev_tool", F.lit("__start__")).alias("prev_tool"),
            "tool",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


TRANSITIONS_ORACLE_SQL = """
    , tools AS (
      SELECT conv_id, turn_idx, tool,
             LAG(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
      FROM transcripts WHERE tool IS NOT NULL
    )
    SELECT COALESCE(prev_tool, '__start__') AS prev_tool, tool,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM tools GROUP BY COALESCE(prev_tool, '__start__'), tool
"""


MIN_BURST = 3  # quantified CEP pattern: error{3,} on consecutive turns


def error_bursts(df: DataFrame) -> DataFrame:
    """Error bursts: maximal runs of >= MIN_BURST consecutive
    error-event turns per conversation — the quantified CEP pattern
    (A{3,}) over the transcript stream's error-typed turns, batch form.

    The transcript text contract embeds the source event type as a
    pipe-delimited field (sources/transcripts.py derivation), so
    '%|error|%' identifies error turns in both engines. Consecutive
    turn_idx runs reduce to the classic gaps-and-islands trick:
    turn_idx - row_number() is constant exactly on a consecutive run.
    span_s uses cast-to-double epoch seconds (identical operands to
    DuckDB's epoch(), and to the streamed form's us/1e6 arithmetic).

    Scale: one shuffle (the per-conv window), island agg map-side
    combinable; the error filter is pushed to the scan."""
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
            F.count(F.lit(1)).cast("long").alias("n_errors"),
            (
                F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))
            ).alias("span_s"),
        )
        .filter(F.col("n_errors") >= MIN_BURST)
        .select("conv_id", "start_idx", "end_idx", "n_errors", "span_s")
    )


ERROR_BURSTS_ORACLE_SQL = f"""
    , errs AS (
      SELECT conv_id, turn_idx, ts,
             turn_idx - ROW_NUMBER() OVER (PARTITION BY conv_id
                                           ORDER BY turn_idx) AS island
      FROM transcripts WHERE text LIKE '%|error|%'
    )
    SELECT conv_id,
           CAST(MIN(turn_idx) AS INT) AS start_idx,
           CAST(MAX(turn_idx) AS INT) AS end_idx,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           MAX(epoch(ts)) - MIN(epoch(ts)) AS span_s
    FROM errs GROUP BY conv_id, island
    HAVING COUNT(*) >= {MIN_BURST}
"""


def conv_documents(df: DataFrame) -> DataFrame:
    """Reconstruct each conversation as one document: turn texts joined
    in (turn_idx) order — the bridge from the transcript side to the
    document-curation side (T1-T20 run unchanged on the result).

    Ordering discipline: collect_list guarantees nothing, so the struct
    is sorted explicitly before projection (the tool_sequences /
    account_signer.go:53 pattern). One shuffle on conv_id; the join
    separator is a newline, which the transcript text contract
    (single-line pipe-delimited fields) can never contain."""
    body = F.concat_ws(
        "\n",
        F.transform(
            F.sort_array(F.collect_list(F.struct("turn_idx", "text"))),
            lambda s: s["text"],
        ),
    )
    return df.groupBy("conv_id").agg(
        body.alias("text"),
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


CONV_DOCUMENTS_ORACLE_SQL = """
    SELECT conv_id,
           string_agg(text, chr(10) ORDER BY turn_idx) AS text,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM transcripts GROUP BY conv_id
"""


def conv_doc_dedup(df: DataFrame) -> DataFrame:
    """Exact dedup over the reconstructed conversation documents:
    transcript -> conv_documents -> identity fingerprint -> per-group
    canonical (min conv_id). The end-to-end composition a training
    pipeline runs to drop conversations whose full text repeats."""
    from stellar_etl_spark.functions.dedup import exact_fingerprint

    docs = conv_documents(df).select(
        "conv_id", exact_fingerprint().alias("fp64")
    )
    w = Window.partitionBy("fp64")
    return docs.select(
        "conv_id",
        "fp64",
        F.min("conv_id").over(w).alias("keep_conv_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_copies"),
    )


def conv_doc_dedup_oracle_sql() -> str:
    from stellar_etl_spark.functions import hashing as H
    from stellar_etl_spark.functions.dedup import _norm_expr

    fp = H.char_hash_wide(_norm_expr(False), spark=False)
    return (
        """
    , convdocs AS (
      SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS text
      FROM transcripts GROUP BY conv_id
    ), fps AS (SELECT conv_id, """
        + fp
        + """ AS fp64 FROM convdocs)
    SELECT conv_id, fp64,
           MIN(conv_id) OVER (PARTITION BY fp64) AS keep_conv_id,
           COUNT(*) OVER (PARTITION BY fp64) AS n_copies
    FROM fps
"""
    )


# --- tool co-occurrence lift (association mining) -----------------------------

def tool_lift(df: DataFrame) -> DataFrame:
    """Conversation-level tool association: for every tool pair
    (a < b), the number of conversations using both, each tool's
    conversation count, and the lift N*n_both/(n_a*n_b) — >1 means the
    tools co-occur more than independence predicts (market-basket
    affinity over the tool vocabulary; the transition matrix's
    order-free complement). Integer arithmetic until ONE double
    division.

    Scale notes (100 TB): the (conv, tool) distinct is the only
    corpus-sized shuffle; per-conversation pair generation is
    ROW-LOCAL (sorted collect_set + nested transform — bounded by the
    tool vocabulary, not the conversation length), and the pair
    counts / per-tool counts / N are all vocabulary-sized or scalar,
    joined by broadcast."""
    ct = (
        df.filter(F.col("tool").isNotNull())
        .select("conv_id", "tool")
        .distinct()
    )
    n_convs = df.select("conv_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_convs")
    )
    per_tool = ct.groupBy("tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_tool")
    )
    pairs = (
        ct.groupBy("conv_id")
        .agg(F.sort_array(F.collect_set("tool")).alias("ts"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ts, (x, i) -> "
                    "transform(slice(ts, i + 2, size(ts)), y -> "
                    "struct(x as tool_a, y as tool_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.tool_a", "p.tool_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    ca = per_tool.select(
        F.col("tool").alias("tool_a"), F.col("n_tool").alias("n_a")
    )
    cb = per_tool.select(
        F.col("tool").alias("tool_b"), F.col("n_tool").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ca), "tool_a")
        .join(F.broadcast(cb), "tool_b")
        .crossJoin(F.broadcast(n_convs))
        .select(
            "tool_a",
            "tool_b",
            "n_both",
            "n_a",
            "n_b",
            "n_convs",
            # unrounded integer ratio: see the rounding-hazard note in
            # functions/hashing.py (raw IEEE division is bit-identical)
            F.expr(
                "CAST(n_convs * n_both AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)"
            ).alias("lift"),
        )
    )


TOOL_LIFT_ORACLE_SQL = """
    , ct AS (
      SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool IS NOT NULL
    ), n AS (
      SELECT CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs FROM transcripts
    ), per_tool AS (
      SELECT tool, CAST(COUNT(*) AS BIGINT) AS n_tool FROM ct GROUP BY tool
    ), pr AS (
      SELECT a.tool AS tool_a, b.tool AS tool_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
      GROUP BY a.tool, b.tool
    )
    SELECT pr.tool_a, pr.tool_b, pr.n_both,
           ca.n_tool AS n_a, cb.n_tool AS n_b, n.n_convs,
           CAST(n.n_convs * pr.n_both AS DOUBLE)
                 / CAST(ca.n_tool * cb.n_tool AS DOUBLE) AS lift
    FROM pr
    JOIN per_tool ca ON ca.tool = pr.tool_a
    JOIN per_tool cb ON cb.tool = pr.tool_b
    CROSS JOIN n
"""


def tool_pagerank(df: DataFrame) -> DataFrame:
    """Tool-centrality ranking: integer-exact weighted PageRank
    (functions/graph.pagerank — BIGINT floor arithmetic, fixed 5
    iterations, bit-identical cross-engine) over the tool-transition
    digraph (tool_transitions edges, '__start__' included as the
    entry node). The 'which tools sit at the center of agent
    workflows' curation signal; the transition matrix the streamed CEP
    detector maintains incrementally, read as a graph."""
    from stellar_etl_spark.functions.graph import pagerank

    edges = tool_transitions(df).select(
        F.col("prev_tool").alias("src"),
        F.col("tool").alias("dst"),
        F.col("n_transitions").alias("w"),
    )
    return pagerank(edges).select(
        F.col("node").alias("tool"), F.col("rank").alias("pagerank_micro")
    )


def tool_pagerank_oracle_sql() -> str:
    from stellar_etl_spark.functions.graph import pagerank_oracle_ctes

    return (
        """
    , prtools AS (
      SELECT conv_id, turn_idx, tool,
             LAG(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
      FROM transcripts WHERE tool IS NOT NULL
    ), predges AS (
      SELECT COALESCE(prev_tool, '__start__') AS src, tool AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM prtools GROUP BY COALESCE(prev_tool, '__start__'), tool
    )"""
        + pagerank_oracle_ctes("predges")
        + """
    SELECT node AS tool, CAST(r AS BIGINT) AS pagerank_micro FROM prfinal
"""
    )


# --- ordered conversion funnel (CEP: user -> assistant -> tool) -------------
# Per-stage time horizon. First-touch semantics: each stage matches the
# EARLIEST qualifying turn; later user turns never re-arm the funnel.
FUNNEL_HORIZON = "INTERVAL 1 HOUR"

# Tie-order at equal ts: the stage-k event sorts before any stage-k+1
# candidate at the same instant, so the fold's "first qualifying turn in
# scan order" equals SQL's "MIN(ts) >= previous stage ts".
_ROLE_PRI = "CASE role WHEN 'user' THEN 0 WHEN 'assistant' THEN 1 WHEN 'tool' THEN 2 ELSE 3 END"


def conv_funnel(df: DataFrame) -> DataFrame:
    """Ordered conversion funnel over each conversation: the classic
    CEP / MATCH_RECOGNIZE pattern `user -> assistant -> tool` where
    each stage must occur within FUNNEL_HORIZON of the previous one.
    One row per conversation: the stage reached (0-3) and the event
    time of each matched stage.

    Reference analog: the reference sequences operations within a
    ledger close via the TOID's (ledger, tx, op) ordering
    (/root/reference/internal/toid/main.go:32-56); a funnel asks the
    longitudinal version — did the ordered pattern complete, and when.

    Execution shape: ONE shuffle (groupBy conv_id), then a row-local
    sorted-fold state machine — `sort_array(collect_list(struct))`
    followed by an `aggregate()` higher-order fold whose accumulator
    is (stage, s1, s2, s3). Entirely JVM-side (no Python, no window
    sort over the corpus); per-conversation memory is the turn list,
    the same bound every per-conv operator here has. On the bucketed
    store (sources/bucketed.py) the shuffle disappears.

    Cross-engine determinism: the fold scans turns in (ts, role_pri,
    turn_idx) order; at equal ts a user turn sorts before the
    assistant turn it could arm (see _ROLE_PRI), which makes the
    fold's first-match equal to the oracle's MIN(ts)-chaining CTEs —
    no float arithmetic anywhere, timestamps compare exactly.
    """
    turns = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("ts"),
                F.expr(_ROLE_PRI).cast("int").alias("pri"),
                F.col("turn_idx"),
                F.col("role"),
            )
        )
    )
    fold = f"""aggregate(
      turns,
      named_struct('stage', 0, 's1', CAST(NULL AS TIMESTAMP),
                   's2', CAST(NULL AS TIMESTAMP), 's3', CAST(NULL AS TIMESTAMP)),
      (acc, t) -> CASE
        WHEN acc.stage = 0 AND t.role = 'user'
          THEN named_struct('stage', 1, 's1', t.ts, 's2', acc.s2, 's3', acc.s3)
        WHEN acc.stage = 1 AND t.role = 'assistant'
             AND t.ts <= acc.s1 + {FUNNEL_HORIZON}
          THEN named_struct('stage', 2, 's1', acc.s1, 's2', t.ts, 's3', acc.s3)
        WHEN acc.stage = 2 AND t.role = 'tool'
             AND t.ts <= acc.s2 + {FUNNEL_HORIZON}
          THEN named_struct('stage', 3, 's1', acc.s1, 's2', acc.s2, 's3', t.ts)
        ELSE acc END)"""
    return (
        df.groupBy("conv_id")
        .agg(turns.alias("turns"))
        .select("conv_id", F.expr(fold).alias("f"))
        .select(
            "conv_id",
            F.col("f.stage").cast("int").alias("stage_reached"),
            F.col("f.s1").alias("s1_ts"),
            F.col("f.s2").alias("s2_ts"),
            F.col("f.s3").alias("s3_ts"),
        )
    )


# MIN(ts)-chaining oracle: stage k+1 = earliest qualifying turn at or
# after stage k's instant and within the horizon. Equal to the fold by
# the tie-order argument in conv_funnel's docstring.
FUNNEL_ORACLE_SQL = f"""
    , f1 AS (
      SELECT conv_id, MIN(ts) AS s1 FROM transcripts
      WHERE role = 'user' GROUP BY conv_id
    ), f2 AS (
      SELECT t.conv_id, MIN(t.ts) AS s2
      FROM transcripts t JOIN f1 ON t.conv_id = f1.conv_id
      WHERE t.role = 'assistant' AND t.ts >= f1.s1
        AND t.ts <= f1.s1 + {FUNNEL_HORIZON}
      GROUP BY t.conv_id
    ), f3 AS (
      SELECT t.conv_id, MIN(t.ts) AS s3
      FROM transcripts t JOIN f2 ON t.conv_id = f2.conv_id
      WHERE t.role = 'tool' AND t.ts >= f2.s2
        AND t.ts <= f2.s2 + {FUNNEL_HORIZON}
      GROUP BY t.conv_id
    ), fconvs AS (
      SELECT DISTINCT conv_id FROM transcripts
    )
    SELECT c.conv_id,
           CAST(CASE WHEN f3.s3 IS NOT NULL THEN 3
                     WHEN f2.s2 IS NOT NULL THEN 2
                     WHEN f1.s1 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS stage_reached,
           f1.s1 AS s1_ts, f2.s2 AS s2_ts, f3.s3 AS s3_ts
    FROM fconvs c
    LEFT JOIN f1 ON c.conv_id = f1.conv_id
    LEFT JOIN f2 ON c.conv_id = f2.conv_id
    LEFT JOIN f3 ON c.conv_id = f3.conv_id
"""
