"""Per-window snapshot stream — the live-orderbook analog (A7/ST7).

Reference analog: ``exportOrderbookBatch`` / ``UpdateOrderbook``
(/root/reference/internal/input/orderbooks.go:160-237) maintain a
materialized graph of all live offers, advance it ledger by ledger,
and emit the current state every ledger. Here: a non-windowed stateful
streaming aggregation keyed by (conv_id, role) holding the latest turn
per key, run in **update** output mode — every micro-batch emits the
keys whose state changed, i.e. the per-window snapshot delta.

State design: one (turn_idx, text, tool, ts, count) struct per live
key — the state IS the materialized table, bounded by key cardinality
(exactly like the reference's orderbook graph, and unlike its unbounded
seen-maps, orderbooks.go:26-33). No watermark-driven eviction applies
to a non-windowed aggregation; key retirement at 100 TB is a TTL
compaction of the snapshot table downstream (or per-session keys that
expire with the session window).

The epoch-stamped deltas land in the EpochCommitSink exactly-once;
``read_final_snapshot`` folds them back (latest epoch wins per key),
and tests prove the folded result equals the batch operator
``operators/state.compact_last_state`` on the drained input — the
snapshot==compaction determinism gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from stellar_etl_spark.config import DEFAULT, EngineConfig
from stellar_etl_spark.streaming.sink import EpochCommitSink

SNAPSHOT_TABLE = "snapshot"


def snapshot_agg(df: DataFrame) -> DataFrame:
    """Latest-turn-per-(conv_id, role) aggregation — identical ordering
    key (turn_idx) and output schema as the batch compactor
    (operators/state.compact_last_state), so stream==batch is testable.
    Works on batch and streaming inputs."""
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


def start_snapshot_stream(
    stream: DataFrame,
    sink_root: str,
    checkpoint: str,
    cfg: EngineConfig = DEFAULT,
    available_now: bool = True,
    query_name: str = "snapshot",
) -> StreamingQuery:
    """Start the update-mode snapshot query: each micro-batch commits
    the changed-key snapshot rows (stamped with their epoch) through
    the exactly-once epoch protocol."""
    sink = EpochCommitSink(sink_root)
    snap = snapshot_agg(stream.drop("_source_file"))

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        sink.write_epoch(
            epoch_id,
            {SNAPSHOT_TABLE: batch_df.withColumn("epoch_id", F.lit(epoch_id))},
        )

    w = (
        snap.writeStream.queryName(query_name)
        .outputMode("update")
        .foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    else:
        w = w.trigger(processingTime="2 seconds")
    return w.start()


def read_final_snapshot(spark: SparkSession, sink_root: str) -> DataFrame:
    """Fold the committed snapshot deltas: per key, the row from the
    latest epoch that touched it — the current materialized state."""
    deltas = EpochCommitSink(sink_root).read_table(spark, SNAPSHOT_TABLE)
    cols = [c for c in deltas.columns if c != "epoch_id"]
    latest = F.max_by(F.struct(*cols), F.col("epoch_id")).alias("s")
    return (
        deltas.groupBy("conv_id", "role")
        .agg(latest)
        .select(*[F.col(f"s.{c}").alias(c) for c in cols])
    )
