"""Driver-gated stream==batch parity: run the REAL streaming stack over
the driver's own input and return a batch DataFrame whose values the
DuckDB oracle of the equivalent batch operator must hash-match.

Round-2 verdict: the streaming operators' evidence lived only in
pytest. These wrappers put the streaming stack itself behind the
driver's exact value-oracle gate (__spark_entry__.queries()):

  * ``streamed_turn_pairs``  — the stateful user->response matcher
    (streaming/matcher.py, applyInPandasWithState + EventTimeTimeout),
    oracle = the batch matcher's SQL (operators/pairs.py).
  * ``streamed_snapshot``    — the update-mode snapshot stream
    (streaming/snapshot.py) folded back from the exactly-once epoch
    sink, oracle = the batch compactor's SQL (operators/state.py).

Exact-equality construction (no flake window, unlike a timing-tuned
test):

  1. The derived transcripts are materialized once per sf_dir as
     time-range-sliced parquet files with strictly increasing mtimes
     (Spark's file source orders pickup by mtime), so per-conversation
     turn order is preserved across micro-batches.
  2. The matcher runs with a watermark delay far larger than the corpus
     time span — **zero mid-stream eviction is guaranteed by
     construction**, so every matched pair equals the batch join.
  3. Two sentinel rows (a dedicated ``__closer__`` conversation, event
     time past max_ts + delay) are appended as the two last files with
     ``maxFilesPerTrigger=1``: the first sentinel batch pushes the
     final watermark past every real event; the second batch then fires
     the EventTimeTimeout for every still-pending user turn, emitting
     exactly the ``evicted_unmatched`` rows the batch operator produces
     for response-less user turns. One pass, documented semantics only
     (watermark monotonicity + event-time timeout), no state peeking.
  4. The snapshot stream needs no watermark: update-mode deltas land in
     the EpochCommitSink and ``read_final_snapshot`` folds
     latest-epoch-per-key — equal to batch compaction for ANY slicing.

Scale note: the slicing/materialization exists only to drive the file
stream deterministically in-sandbox; a real deployment streams the
Iceberg table directly. Nothing here collects corpus data to the
driver (the only .collect() is the 1-row max_ts aggregate).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stellar_etl_spark.config import DEFAULT, EngineConfig
from stellar_etl_spark.sources.transcripts import load_transcripts
from stellar_etl_spark.streaming.sink import EpochCommitSink
from stellar_etl_spark.streaming.source import read_transcript_stream

CLOSER_CONV = "__closer__"
# watermark delay >> any test corpus time span (driver sf data spans
# days; the generator spans ~1 day): mid-stream eviction is impossible
PARITY_DELAY = "3650 days"
_DELAY_US = 3650 * 86400 * 1_000_000
# sentinel slack above max_ts + delay: the final watermark lands at
# max_ts + slack, so it must clear every emittable boundary — session
# ends reach max_ts + session_gap (8h default), tumbling/sliding window
# ends max_ts + minutes. 30 days covers any sane cfg.
_SLACK_US = 30 * 86400 * 1_000_000
N_SLICES = 6

# Streaming state-store partition count for the parity drains: each
# micro-batch schedules one task per state partition, so at bench scale
# (32-core session => 200/32 shuffle partitions) most tasks carry zero
# state and the drain pays pure scheduling overhead. 8 partitions keeps
# the evidence identical (results are partition-count independent;
# tests already run at 8) and cuts per-trigger cost ~4x. A real 100 TB
# deployment sizes this to executor count x cores as usual — it is a
# drain-local override, not an engine default.
DRAIN_PARTITIONS = "8"

# Python-stateful drains (applyInPandasWithState) are bottlenecked by
# per-GROUP Python overhead (~0.6-1.8 ms/group/batch: Arrow transfer +
# state row codec per key), not by per-trigger scheduling, so they want
# MORE state partitions than the JVM-agg drains. Measured at sf0.1
# (best-of-2 per setting, isolated session): snapshot_ttl 18.4 s @ 8 ->
# 12.0 s @ 16; error_bursts 11.4 -> 6.9; turn_pairs 8.9 -> 8.1. 32
# partitions regresses (19.0 s for snapshot_ttl: state-store commit
# files + worker-pool fork cost outgrow the parallelism win), and the
# drains whose state fits a few hot groups (tool_transitions: 7.4 @ 8
# vs 8.9 @ 16, dq: flat) keep the default. Results are partition-count
# independent either way — this is wall-clock only.
DRAIN_PARTITIONS_STATEFUL = "16"

from contextlib import contextmanager


@contextmanager
def _drain_conf(spark: SparkSession, partitions: str = DRAIN_PARTITIONS):
    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key)
    spark.conf.set(key, partitions)
    try:
        yield
    finally:
        spark.conf.set(key, prior)


def _slice_dir(spark: SparkSession, sf_dir: str, n_files: int = N_SLICES) -> str:
    """Materialize the derived transcripts as n_files time-range slices
    plus two closer-sentinel files, mtime-ordered. Cached per sf_dir
    (the driver's parquet inputs are immutable)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_parity", f"slices-v3-{key}-{n_files}"
    )
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    import shutil

    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)

    t = load_transcripts(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    max_ts = t.agg(F.max("ts")).collect()[0][0]  # 1-row scalar, not corpus

    stage = out + ".stage"
    (
        t.repartitionByRange(n_files, "ts")
        .write.mode("overwrite")
        .parquet(stage)
    )
    # range partition i holds the i-th ascending ts range and task i
    # writes part-{i:05d}-*; sorted names == time order. Assign strictly
    # increasing mtimes so the file stream's pickup order is pinned
    # (ties at ms granularity scramble it — the round-2 flake).
    parts = sorted(
        f for f in os.listdir(stage) if f.startswith("part-") and f.endswith(".parquet")
    )
    import time as _time

    t0 = _time.time() - 2.0 * (len(parts) + 3)
    for i, f in enumerate(parts):
        dst = os.path.join(out, f"slice-{i:05d}.parquet")
        shutil.move(os.path.join(stage, f), dst)
        os.utime(dst, (t0 + 2.0 * i, t0 + 2.0 * i))
    shutil.rmtree(stage)

    # two sentinels, two files, event time past max_ts + delay: batch A
    # advances the final watermark, batch B fires every pending timeout
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    from datetime import timezone

    # max_ts is a naive (NTZ/UTC-wall) datetime; pin UTC explicitly so
    # the host TZ can never shift the sentinel event time
    base_us = int(max_ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    for k in range(2):
        tbl = pa.table(
            {
                "conv_id": [CLOSER_CONV],
                "turn_idx": [k],
                "role": ["assistant"],
                "text": ["closer"],
                # non-null tool, and a reserved one: Catalyst pushes
                # dimension filters (e.g. tool IS NOT NULL) BELOW the
                # EventTimeWatermark node into the scan, so a sentinel a
                # downstream filter can drop would never reach the
                # watermark collector and the stream would never close
                "tool": [CLOSER_CONV],
                "ts": [base_us + _DELAY_US + _SLACK_US + k * 1_000_000],
            },
            schema=schema,
        )
        path = os.path.join(out, f"zz-closer-{k}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (t0 + 2.0 * (len(parts) + k), t0 + 2.0 * (len(parts) + k)))

    with open(marker, "w") as f:
        f.write(str(len(parts)))
    return out


def disorder_dir(
    spark: SparkSession, sf_dir: str, mode: str = "reverse"
) -> str:
    """Permuted-delivery copy of the parity slices (VERDICT r04 "Next
    round" #5): same parquet files, but the DATA slices are renamed and
    re-mtimed so the file stream delivers them in reversed (or seeded-
    shuffled) event-time order — every micro-batch boundary now crosses
    state that was built from FUTURE events. The closer sentinels keep
    their terminal delivery slots: they carry the watermark push that
    finalizes every pending timeout, and delivering them first would
    advance the watermark past the real events and late-drop the whole
    input (which is the disorder bound the parity delay is sized
    against — see PARITY_DELAY). Cached per (sf_dir, mode)."""
    src = _slice_dir(spark, sf_dir)
    key = hashlib.md5(f"{sf_dir}|{mode}".encode()).hexdigest()[:12]
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_parity", f"disorder-v1-{key}"
    )
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    import random
    import shutil
    import time as _time

    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    data = sorted(
        f for f in os.listdir(src)
        if f.startswith("slice-") and f.endswith(".parquet")
    )
    closers = sorted(
        f for f in os.listdir(src)
        if f.startswith("zz-closer-") and f.endswith(".parquet")
    )
    order = list(data)
    if mode == "reverse":
        order.reverse()
    elif mode == "shuffle":
        random.Random(7).shuffle(order)
    else:  # pragma: no cover - guard against typo'd modes
        raise ValueError(f"unknown disorder mode: {mode}")
    t0 = _time.time() - 2.0 * (len(order) + len(closers) + 1)
    for i, f in enumerate(order):
        # delivery position i now carries the i-th PERMUTED slice; the
        # new name keeps name order == delivery order (the stream picks
        # up by mtime, with the name as tiebreak)
        dst = os.path.join(out, f"slice-{i:05d}.parquet")
        shutil.copyfile(os.path.join(src, f), dst)
        os.utime(dst, (t0 + 2.0 * i, t0 + 2.0 * i))
    for k, f in enumerate(closers):
        dst = os.path.join(out, f)
        shutil.copyfile(os.path.join(src, f), dst)
        mt = t0 + 2.0 * (len(order) + k)
        os.utime(dst, (mt, mt))
    with open(marker, "w") as fh:
        fh.write(mode)
    return out


def disorder_doc_dir(
    spark: SparkSession, sf_dir: str, mode: str = "reverse"
) -> str:
    """disorder_dir for the doc-corpus slices (_doc_slice_dir): full
    permutation, no sentinels to protect."""
    src = _doc_slice_dir(spark, sf_dir)
    key = hashlib.md5(f"docs|{sf_dir}|{mode}".encode()).hexdigest()[:12]
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_parity", f"disorder-docs-v1-{key}"
    )
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    import random
    import shutil
    import time as _time

    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    data = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    order = list(data)
    if mode == "reverse":
        order.reverse()
    elif mode == "shuffle":
        random.Random(7).shuffle(order)
    else:  # pragma: no cover
        raise ValueError(f"unknown disorder mode: {mode}")
    t0 = _time.time() - 2.0 * (len(order) + 1)
    for i, f in enumerate(order):
        dst = os.path.join(out, f"slice-{i:05d}.parquet")
        shutil.copyfile(os.path.join(src, f), dst)
        os.utime(dst, (t0 + 2.0 * i, t0 + 2.0 * i))
    with open(marker, "w") as fh:
        fh.write(mode)
    return out


def streamed_turn_pairs(
    spark: SparkSession,
    sf_dir: str,
    cfg: EngineConfig = DEFAULT,
    src_dir: str | None = None,
    max_files_per_trigger: int = 2,
    ooo: bool = False,
) -> DataFrame:
    """Drain the stateful matcher over the sliced driver input; result
    equals operators/pairs.match_pairs row-for-row (same oracle)."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.streaming.matcher import match_pairs_stream
    from stellar_etl_spark.streaming.ooo import match_pairs_stream_ooo

    ship_package(spark)
    matcher = match_pairs_stream_ooo if ooo else match_pairs_stream
    src_dir = src_dir or _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_pairs_")
    parity_cfg = EngineConfig(
        session_gap=cfg.session_gap, watermark_delay=PARITY_DELAY
    )
    # 2 files/trigger: state still hands off across 3 data batches; the
    # final evictions ride Spark's no-data micro-batch (the watermark
    # advance from the closer batch fires every pending EventTimeTimeout
    # in an extra empty batch - documented noDataMicroBatches behavior),
    # so the two closer files no longer need separate triggers.
    stream = read_transcript_stream(
        spark, src_dir,
        max_files_per_trigger=max_files_per_trigger, with_lineage=False
    )
    with _drain_conf(spark, DRAIN_PARTITIONS_STATEFUL):
        q = (
            matcher(stream, parity_cfg)
            .writeStream.queryName("parity_pairs")
            .outputMode("append")
            .format("parquet")
            .option("path", os.path.join(work, "out"))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(os.path.join(work, "out")).filter(
        F.col("conv_id") != CLOSER_CONV
    )


def _drain_append(df: DataFrame, name: str) -> str:
    """Run an append-mode streaming DataFrame to completion into a fresh
    parquet dir (availableNow drain); return the output path."""
    work = tempfile.mkdtemp(prefix=f"parity_{name}_")
    out = os.path.join(work, "out")
    with _drain_conf(df.sparkSession):
        q = (
            df.writeStream.queryName(f"parity_{name}")
            .outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return out


def streamed_sessions(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Run the REAL streaming session-window aggregation (ST5: the
    ledger-close boundary analog) over the sliced driver input and
    return the finalized sessions; values hash-match the batch
    gaps-and-islands oracle (session_oracle_sql).

    Why equality is exact by construction: the parity watermark delay
    dwarfs the corpus time span, so no session can close mid-stream
    with late data still owed; the closer sentinel then pushes the
    final watermark to max_ts + 30d, past every real session's end
    (max_ts + gap), finalizing all of them in one availableNow drain.
    distinct_tools streams as size(collect_set(...)) — exact values,
    streaming-legal (sessionize distinct="set" default under
    watermark)."""
    from stellar_etl_spark.operators.sessions import sessionize

    src_dir = _slice_dir(spark, sf_dir)
    parity_cfg = EngineConfig(
        session_gap=cfg.session_gap, watermark_delay=PARITY_DELAY
    )
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )
    out = _drain_append(sessionize(stream, parity_cfg, watermark=True), "sessions")
    return spark.read.parquet(out).filter(F.col("conv_id") != CLOSER_CONV)


def streamed_tool_rate(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Run the tumbling-window per-tool rollup (A1/W-family analog) as a
    REAL watermarked streaming aggregation; values hash-match the batch
    rate_oracle_sql. Exact distinct conv counts stream via
    size(collect_set(conv_id)) (oracle-parity mode; the 100 TB default
    is HLL — see operators/rollups._distinct_convs).

    Sentinel subtlety (measured, not theoretical): the rollup's
    ``tool IS NOT NULL`` filter is pushed below EventTimeWatermark into
    the scan, so a null-tool sentinel never reaches the watermark
    collector and the final windows never close (0 rows out). The
    sentinels therefore carry a reserved non-null tool; their own
    window can never finalize (its end sits delay-past the final
    watermark), and the defensive filter below guards the invariant."""
    from stellar_etl_spark.operators.rollups import tool_rate

    src_dir = _slice_dir(spark, sf_dir)
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    ).withWatermark("ts", PARITY_DELAY)
    out = _drain_append(tool_rate(stream, cfg, exact="set"), "tool_rate")
    return spark.read.parquet(out).filter(F.col("tool") != CLOSER_CONV)


def _doc_slice_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Materialize the dedup corpus as doc_id-range parquet slices with
    strictly increasing mtimes (same pickup-order pinning as
    _slice_dir). Cached per sf_dir."""
    from stellar_etl_spark.functions.corpus import load_corpus

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_parity", f"docs-v1-{key}-{n_files}"
    )
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    import shutil
    import time as _time

    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    stage = out + ".stage"
    (
        load_corpus(spark, sf_dir)
        .repartitionByRange(n_files, "doc_id")
        .write.mode("overwrite")
        .parquet(stage)
    )
    parts = sorted(
        f for f in os.listdir(stage) if f.startswith("part-") and f.endswith(".parquet")
    )
    t0 = _time.time() - 2.0 * (len(parts) + 1)
    for i, f in enumerate(parts):
        dst = os.path.join(out, f"slice-{i:05d}.parquet")
        shutil.move(os.path.join(stage, f), dst)
        os.utime(dst, (t0 + 2.0 * i, t0 + 2.0 * i))
    shutil.rmtree(stage)
    with open(marker, "w") as f:
        f.write(str(len(parts)))
    return out


DEDUP_TABLE = "dedup"
DOC_STREAM_SCHEMA = "doc_id bigint, text string, lang string, source string"


def dedup_stream_agg(stream: DataFrame) -> DataFrame:
    """Update-mode per-fingerprint dedup state: (min doc_id, count)."""
    from stellar_etl_spark.functions.dedup import exact_fingerprint

    return (
        stream.select(F.col("doc_id"), exact_fingerprint().alias("fp64"))
        .groupBy("fp64")
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def dedup_epoch_writer(sink: EpochCommitSink):
    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        sink.write_epoch(
            epoch_id,
            {DEDUP_TABLE: batch_df.withColumn("epoch_id", F.lit(epoch_id))},
        )

    return _write


def fold_dedup_sink(spark: SparkSession, sink_root: str, sf_dir: str) -> DataFrame:
    """Fold the committed dedup deltas (latest epoch per fingerprint —
    cumulative aggregates make the fold order-safe) and join back to
    the narrow per-doc fingerprint map."""
    from stellar_etl_spark.functions.corpus import load_corpus
    from stellar_etl_spark.functions.dedup import exact_fingerprint

    deltas = EpochCommitSink(sink_root).read_table(spark, DEDUP_TABLE)
    latest = F.max_by(
        F.struct("keep_doc_id", "n_copies"), F.col("epoch_id")
    ).alias("s")
    folded = (
        deltas.groupBy("fp64")
        .agg(latest)
        .select("fp64", F.col("s.keep_doc_id").alias("keep_doc_id"),
                F.col("s.n_copies").alias("n_copies"))
    )
    docs = load_corpus(spark, sf_dir).select(
        "doc_id", exact_fingerprint().alias("fp64")
    )
    return docs.join(folded, "fp64").select(
        "doc_id", "fp64", "keep_doc_id", "n_copies"
    )


def streamed_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run exact dedup as a REAL streaming stateful aggregation: the
    corpus streamed in doc_id-range slices, per-fingerprint
    (min doc_id, count) state maintained by an update-mode aggregation,
    deltas committed exactly-once through the epoch sink, folded back
    (latest epoch per fingerprint wins — cumulative aggregates make the
    fold order-safe), then joined to the narrow per-doc fingerprint map
    to emit the same per-doc table as the batch operator. Oracle: the
    batch exact_dedup SQL.

    This is the streaming shape of T1 at 100 TB: dedup state keyed by
    the ~60-bit fingerprint lives in the state store (RocksDB at real
    state sizes), new documents join the stream, and the group-state
    aggregation IS the seen-map — distributed, checkpointed, and
    exactly-once, vs the reference's in-process seen-hash map
    (/root/reference/cmd/export_assets.go:40-58)."""
    src_dir = _doc_slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_dedup_")
    sink_root = os.path.join(work, "sink")
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    with _drain_conf(spark):
        q = (
            dedup_stream_agg(stream)
            .writeStream.queryName("parity_dedup")
            .outputMode("update")
            .foreachBatch(dedup_epoch_writer(EpochCommitSink(sink_root)))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return fold_dedup_sink(spark, sink_root, sf_dir)


def streamed_tool_rate_sliding(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """The sliding-window rollup (overlapping windows — each event
    lands in length/slide windows) as a REAL watermarked streaming
    aggregation; values hash-match the batch sliding oracle. Same
    sentinel construction as streamed_tool_rate; the sentinel's own
    windows can never finalize, and its reserved tool filters out."""
    from stellar_etl_spark.operators.rollups import tool_rate_sliding

    src_dir = _slice_dir(spark, sf_dir)
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    ).withWatermark("ts", PARITY_DELAY)
    out = _drain_append(
        tool_rate_sliding(stream, cfg, exact="set"), "tool_rate_sliding"
    )
    return spark.read.parquet(out).filter(F.col("tool") != CLOSER_CONV)


def streamed_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the update-mode snapshot stream through the exactly-once
    epoch sink and fold it; result equals operators/state.
    compact_last_state row-for-row (same oracle)."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.streaming.snapshot import (
        read_final_snapshot,
        start_snapshot_stream,
    )

    ship_package(spark)
    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_snap_")
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    ).filter(F.col("conv_id") != CLOSER_CONV)
    with _drain_conf(spark):
        q = start_snapshot_stream(
            stream,
            os.path.join(work, "sink"),
            os.path.join(work, "ckpt"),
            available_now=True,
            query_name="parity_snapshot",
        )
        q.awaitTermination()
    return read_final_snapshot(spark, os.path.join(work, "sink"))


# TTL for the key-retiring snapshot drain: chosen so the final watermark
# (max_ts + _SLACK_US + 1s from the closer sentinels, ms-truncated) retires
# exactly the keys idle for more than 48h of event time before max_ts.
# All arithmetic is in ms (Spark's watermark/timeout unit), so the
# survive/retire boundary is exact and SQL-expressible:
#   survive  <=>  timeout_ms >= final_wm_ms
#            <=>  floor(last_ts_us/1000) + ttl_s*1000
#                   >= floor(max_ts_us/1000) + SLACK_ms + 1000
#            <=>  floor(last_ts_us/1000) >= floor(max_ts_us/1000) - 48h_ms
SNAPSHOT_TTL_ACTIVE_H = 48
SNAPSHOT_TTL_S = _SLACK_US // 1_000_000 + SNAPSHOT_TTL_ACTIVE_H * 3600 + 1


def streamed_snapshot_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the TTL-retiring snapshot stream (snapshot.snapshot_ttl:
    applyInPandasWithState + EventTimeTimeout — A7 with session-scoped
    key eviction, closing the reference's unbounded-seen-map
    anti-pattern, orderbooks.go:26-33) through the exactly-once epoch
    sink and fold it. The parity watermark delay guarantees zero
    mid-stream retirement; the closer sentinels push the final
    watermark to max_ts + slack, firing the EventTimeTimeout tombstone
    for every key idle > 48h before max_ts. Oracle: the batch
    compaction restricted to keys active within the 48h window
    (ms-exact boundary, see SNAPSHOT_TTL_S)."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.streaming.snapshot import (
        read_final_snapshot,
        start_snapshot_stream,
    )

    ship_package(spark)
    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_snap_ttl_")
    # no pre-filter: the sentinels must reach the watermark collector
    # (a conv_id filter would be pushed below EventTimeWatermark and the
    # timers would never fire); the closer key itself never retires and
    # is dropped at fold time.
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )
    parity_cfg = EngineConfig(watermark_delay=PARITY_DELAY)
    with _drain_conf(spark, DRAIN_PARTITIONS_STATEFUL):
        q = start_snapshot_stream(
            stream,
            os.path.join(work, "sink"),
            os.path.join(work, "ckpt"),
            cfg=parity_cfg,
            available_now=True,
            query_name="parity_snapshot_ttl",
            ttl_s=SNAPSHOT_TTL_S,
        )
        q.awaitTermination()
    return read_final_snapshot(spark, os.path.join(work, "sink")).filter(
        F.col("conv_id") != CLOSER_CONV
    )


def snapshot_ttl_oracle_having() -> str:
    """HAVING clause mirroring the ms-exact retirement boundary."""
    ms = SNAPSHOT_TTL_ACTIVE_H * 3600 * 1000
    return (
        f" HAVING epoch_us(MAX(ts)) // 1000 >= "
        f"(SELECT epoch_us(MAX(ts)) // 1000 FROM transcripts) - {ms}"
    )


# --- streamed HLL sketch -----------------------------------------------------

HLL_TABLE = "hll_regs"


def streamed_tool_conv_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL distinct-conversations sketch (functions/sketch.py) as a
    REAL update-mode streaming aggregation: per-(tool, register) MAX-rho
    state maintained over the transcript stream (MAX is the sketch's
    merge operator, so the state IS the sketch), per-micro-batch deltas
    committed exactly-once through the epoch sink, folded back
    (latest epoch per register wins — registers are monotone
    nondecreasing, so the fold is order-safe), then estimated with the
    same order-pinned register fold as the batch operator and joined to
    the batch exact counts. Oracle: the batch tool_conv_hll SQL —
    streamed sketch == batch sketch == DuckDB, value-exact.

    This is the 100 TB shape of approximate distinct counting on a
    stream: bounded O(groups x m) state regardless of key cardinality,
    no watermark needed (registers never expire), RocksDB-able."""
    from stellar_etl_spark.functions.sketch import (
        hll_estimate,
        hll_join_exact,
        hll_registers,
    )

    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_hll_")
    sink = EpochCommitSink(os.path.join(work, "sink"))
    stream = (
        read_transcript_stream(
            spark, src_dir, max_files_per_trigger=2, with_lineage=False
        )
        .filter(F.col("conv_id") != CLOSER_CONV)
        .filter(F.col("tool").isNotNull())
    )

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        sink.write_epoch(
            epoch_id,
            {HLL_TABLE: batch_df.withColumn("epoch_id", F.lit(epoch_id))},
        )

    with _drain_conf(spark):
        q = (
            hll_registers(stream, "conv_id", "tool")
            .writeStream.queryName("parity_hll")
            .outputMode("update")
            .foreachBatch(_write)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    deltas = sink.read_table(spark, HLL_TABLE)
    regs = (
        deltas.groupBy("tool", "bucket")
        .agg(F.max_by("rho", F.col("epoch_id")).alias("rho"))
    )
    batch = load_transcripts(spark, sf_dir).filter(F.col("tool").isNotNull())
    return hll_join_exact(
        hll_estimate(regs, "tool"), batch, "conv_id", "tool", "tool"
    )


LAT_HIST_TABLE = "lat_hist"


def streamed_latency_quantiles(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Exact latency quantiles from a STREAMED MERGEABLE HISTOGRAM:
    the stateful matcher's matched pairs are reduced per micro-batch to
    a (responder, latency, count) partial histogram, appended through
    the exactly-once epoch sink, and merged at read time by SUM — the
    mergeable-sketch shape (merge = +, commutative/associative), with
    the exact rank-interpolation quantile computed from the merged
    histogram. Values hash-match the batch latency_quantiles oracle
    because a histogram loses nothing the rank arithmetic needs: the
    value at sorted rank r is the bin whose cumulative count first
    reaches r, and interpolation reads only those bin values.

    At 100 TB this is the production shape for streaming latency SLOs:
    per-micro-batch partials are bounded by the distinct (responder,
    latency) pairs seen in that batch; quantize latency to ms (here µs
    latencies keep the oracle exact) to bound the merged histogram at
    responder_count x latency_range/resolution regardless of pair
    count. The matcher (stateful) and the histogram (per-batch batch
    aggregation inside foreachBatch) never chain two stateful streaming
    operators, so the plan stays within documented semantics."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.operators.pairs import QUANTILES_PERMILLE
    from stellar_etl_spark.streaming.matcher import match_pairs_stream

    ship_package(spark)
    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_latq_")
    sink = EpochCommitSink(os.path.join(work, "sink"))
    parity_cfg = EngineConfig(
        session_gap=cfg.session_gap, watermark_delay=PARITY_DELAY
    )
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )

    def _hist_writer(batch_df: DataFrame, epoch_id: int) -> None:
        hist = (
            batch_df.filter(~F.col("evicted_unmatched"))
            .filter(F.col("conv_id") != CLOSER_CONV)
            .groupBy(
                F.coalesce("response_tool", "response_role").alias("responder"),
                "latency_s",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .withColumn("epoch_id", F.lit(epoch_id))
        )
        sink.write_epoch(epoch_id, {LAT_HIST_TABLE: hist})

    with _drain_conf(spark):
        q = (
            match_pairs_stream(stream, parity_cfg)
            .writeStream.queryName("parity_latq")
            .outputMode("append")
            .foreachBatch(_hist_writer)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    merged = (
        sink.read_table(spark, LAT_HIST_TABLE)
        .groupBy("responder", "latency_s")
        .agg(F.sum("n").cast("long").alias("c"))
    )
    wcum = (
        Window.partitionBy("responder")
        .orderBy("latency_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = merged.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("responder"))
    )
    prev = F.col("cum") - F.col("c")
    aggs = [F.sum("c").cast("long").alias("n_pairs")]
    for pm in QUANTILES_PERMILLE:
        k = F.expr(f"({pm} * (n - 1)) div 1000")
        rem = (F.lit(pm) * (F.col("n") - 1)) % 1000
        r_lo = k + 1
        r_hi = F.least(k + 2, F.col("n"))
        lo = F.max(
            F.when((prev < r_lo) & (r_lo <= F.col("cum")), F.col("latency_s"))
        )
        hi = F.max(
            F.when((prev < r_hi) & (r_hi <= F.col("cum")), F.col("latency_s"))
        )
        d = rem.cast("double") / 1000.0
        # rem is constant per responder; max() carries it through (the
        # same trick as the batch form, keeping the arithmetic identical)
        qv = lo + F.max(d) * (hi - lo)
        aggs.append(qv.alias(f"p{pm}"))  # unrounded (hazard note)
    return (
        h.groupBy("responder")
        .agg(*aggs)
        .select("responder", "n_pairs", *[f"p{pm}" for pm in QUANTILES_PERMILLE])
    )


def streamed_turn_pairs_tws(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Drain the transformWithState matcher (streaming/matcher_tws.py)
    over the sliced driver input — the SAME oracle as turn_pairs /
    turn_pairs_streamed, proving the two stateful APIs are semantically
    interchangeable. RocksDB provider is set for the drain (Spark
    requires it for transformWithState) and restored after."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.streaming.matcher_tws import (
        ROCKSDB_PROVIDER,
        match_pairs_stream_tws,
    )

    ship_package(spark)
    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_pairs_tws_")
    parity_cfg = EngineConfig(
        session_gap=cfg.session_gap, watermark_delay=PARITY_DELAY
    )
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=1, with_lineage=False
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        with _drain_conf(spark):
            q = (
                match_pairs_stream_tws(stream, parity_cfg)
                .writeStream.queryName("parity_pairs_tws")
                .outputMode("append")
                .format("parquet")
                .option("path", os.path.join(work, "out"))
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    return spark.read.parquet(os.path.join(work, "out")).filter(
        F.col("conv_id") != CLOSER_CONV
    )


CMS_TABLE = "cms_counters"


def streamed_conv_turns_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min frequency sketch (functions/sketch.py) as a REAL
    update-mode streaming aggregation: the (d, bucket) -> SUM counter
    grid maintained as streaming state (SUM is the sketch's merge
    operator, so the state IS the sketch — bounded at D*W counters
    regardless of key cardinality, no watermark needed), per-micro-batch
    deltas committed exactly-once through the epoch sink, folded back
    (latest epoch per counter wins — counts are cumulative), then the
    per-key MIN-probe estimate joins against the batch key table.
    Oracle: the batch conv_turns_cms SQL — streamed sketch == batch
    sketch == DuckDB, value-exact."""
    from stellar_etl_spark.functions.sketch import (
        CMS_D,
        _cms_bucket,
        _cms_hmod,
        cms_counters,
    )

    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_cms_")
    sink = EpochCommitSink(os.path.join(work, "sink"))
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    ).filter(F.col("conv_id") != CLOSER_CONV)

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        sink.write_epoch(
            epoch_id,
            {CMS_TABLE: batch_df.withColumn("epoch_id", F.lit(epoch_id))},
        )

    with _drain_conf(spark):
        q = (
            cms_counters(stream, "conv_id")
            .writeStream.queryName("parity_cms")
            .outputMode("update")
            .foreachBatch(_write)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    deltas = sink.read_table(spark, CMS_TABLE)
    counters = deltas.groupBy("d", "bucket").agg(
        F.max_by("c", F.col("epoch_id")).alias("c")
    )
    hmod = _cms_hmod("conv_id", spark=True)
    keys = (
        load_transcripts(spark, sf_dir)
        .select(F.col("conv_id"), F.expr(hmod).alias("hmod"))
        .groupBy("conv_id", "hmod")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    probes = keys.select(
        "conv_id",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(_cms_bucket(d, "hmod")).cast("int").alias("bucket"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("r"),
    ).select("conv_id", "exact_count", "r.d", "r.bucket")
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("conv_id", "exact_count")
        .agg(F.min("c").cast("long").alias("est_count"))
        .select(
            "conv_id",
            "est_count",
            "exact_count",
            # unrounded integer ratio (hashing.py rounding-hazard note)
            (
                (F.col("est_count") - F.col("exact_count")).cast("double")
                / F.col("exact_count")
            ).alias("rel_overcount"),
        )
    )


def streamed_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel with its stage-4 seen-map STREAMED: the
    exact-dedup canonical map is maintained as update-mode streaming
    state (the same drain as streamed_dedup_exact — per-fingerprint
    (min doc_id, count) state through the exactly-once epoch sink),
    folded back, and the funnel assembled from the folded canonical
    map plus the row-local stage gates. Oracle: the batch
    quality_funnel SQL — the streamed seen-map must yield the identical
    per-stage drop accounting."""
    from stellar_etl_spark.functions.corpus import load_corpus
    from stellar_etl_spark.functions.curation import funnel_from_keep

    folded = streamed_dedup_exact(spark, sf_dir)
    docs = load_corpus(spark, sf_dir)
    return funnel_from_keep(docs, folded.select("doc_id", "keep_doc_id"))


RET_TABLE = "retention_days"


def streamed_conv_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention with its (conv, active-day) distinct set as
    REAL streaming state: an update-mode groupBy(conv_id, activity_day)
    aggregation is the distributed seen-set (state bounded at convs x
    active-days — in production the retention window caps it), deltas
    committed exactly-once through the epoch sink, folded to the
    distinct pair set, then the cohort assignment and matrix reshape —
    pure functions of the fold — run batch-side. Oracle: the batch
    conv_retention SQL."""
    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_ret_")
    sink = EpochCommitSink(os.path.join(work, "sink"))
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    ).filter(F.col("conv_id") != CLOSER_CONV)
    days_stream = (
        stream.select("conv_id", F.to_date("ts").alias("activity_day"))
        .groupBy("conv_id", "activity_day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        sink.write_epoch(
            epoch_id,
            {RET_TABLE: batch_df.withColumn("epoch_id", F.lit(epoch_id))},
        )

    with _drain_conf(spark):
        q = (
            days_stream.writeStream.queryName("parity_retention")
            .outputMode("update")
            .foreachBatch(_write)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    days = (
        sink.read_table(spark, RET_TABLE)
        .select("conv_id", "activity_day")
        .distinct()
    )
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


def streamed_turn_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC JOIN evidence: the transcript stream inner-joined
    to the static (batch-computed, broadcast) tool dimension per
    micro-batch — the standard streaming-enrichment pattern (fact
    stream x dimension table), which none of the other drains exercise.
    Row-local + inner stream-static join needs no watermark; append
    mode; oracle = the batch join of the same two inputs."""
    from stellar_etl_spark.operators.dims import dim_tools

    src_dir = _slice_dir(spark, sf_dir)
    dim = dim_tools(load_transcripts(spark, sf_dir), surrogate="rank")
    stream = (
        read_transcript_stream(
            spark, src_dir, max_files_per_trigger=2, with_lineage=False
        )
        .filter(F.col("tool").isNotNull())
        .filter(F.col("conv_id") != CLOSER_CONV)
    )
    joined = stream.join(F.broadcast(dim), "tool").select(
        "conv_id",
        "turn_idx",
        "tool",
        "tool_id",
        "first_seen_ts",
        "uses",
    )
    out = _drain_append(joined, "turn_tools")
    return spark.read.parquet(out)


TURN_TOOLS_ORACLE_SQL = """
    SELECT t.conv_id, t.turn_idx, t.tool, d.tool_id, d.first_seen_ts, d.uses
    FROM transcripts t
    JOIN (
      SELECT ROW_NUMBER() OVER (ORDER BY tool) AS tool_id,
             tool,
             MIN(ts) AS first_seen_ts,
             COUNT(*) AS uses
      FROM transcripts WHERE tool IS NOT NULL
      GROUP BY tool
    ) d USING (tool)
    WHERE t.tool IS NOT NULL
"""


TRANS_TABLE = "transitions"


def streamed_tool_transitions(
    spark: SparkSession,
    sf_dir: str,
    src_dir: str | None = None,
    ooo: bool = False,
) -> DataFrame:
    """The CEP transition detector (streaming/transitions.py) drained
    over the sliced driver input: per-conversation last-tool state
    emits each (prev -> tool) bigram as it arrives; bigrams reduce per
    micro-batch to mergeable SUM partials through the epoch sink.
    Oracle: the batch tool_transitions SQL — the cross-batch pattern
    context (a bigram whose two turns land in different micro-batches)
    must reconstruct exactly."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.streaming.transitions import (
        START,
        tool_transitions_stream,
    )

    ship_package(spark)
    src_dir = src_dir or _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_trans_")
    sink = EpochCommitSink(os.path.join(work, "sink"))
    raw = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )
    if ooo:
        # the watermark-ordered form is timer-driven: closers must
        # reach the watermark node, and null-tool rows are skipped
        # inside the fold — no pre-filters (the snapshot_ttl lesson);
        # closer bigrams drop in the per-batch partial instead
        from stellar_etl_spark.streaming.ooo import tool_transitions_stream_ooo

        detected = tool_transitions_stream_ooo(
            raw, EngineConfig(watermark_delay=PARITY_DELAY)
        ).filter(F.col("conv_id") != CLOSER_CONV)
    else:
        detected = tool_transitions_stream(
            raw.filter(F.col("conv_id") != CLOSER_CONV)
            .filter(F.col("tool").isNotNull())
        )

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        partial = (
            batch_df.groupBy("prev_tool", "tool")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .withColumn("epoch_id", F.lit(epoch_id))
        )
        sink.write_epoch(epoch_id, {TRANS_TABLE: partial})

    with _drain_conf(spark):
        q = (
            detected
            .writeStream.queryName("parity_trans")
            .outputMode("append")
            .foreachBatch(_write)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    return (
        sink.read_table(spark, TRANS_TABLE)
        .groupBy("prev_tool", "tool")
        .agg(F.sum("n").cast("long").alias("n_transitions"))
    )


# --- streamed error bursts ---------------------------------------------------

def streamed_error_bursts(
    spark: SparkSession,
    sf_dir: str,
    cfg: EngineConfig = DEFAULT,
    src_dir: str | None = None,
    ooo: bool = False,
) -> DataFrame:
    """The quantified-CEP burst detector (streaming/bursts.py) drained
    over the sliced driver input: a run of >= MIN_BURST consecutive
    error turns emits when a non-error turn closes it mid-stream, and
    a run still open at end-of-input is finalized by EventTimeTimeout
    when the closer sentinels push the final watermark (the matcher's
    eviction machinery as pattern finalization). No pre-filter on the
    stream: non-error turns are the closing events, and a filter would
    anyway be pushed below EventTimeWatermark and starve the timers
    (the snapshot_ttl lesson). Oracle: the batch gaps-and-islands SQL
    (operators/journeys.ERROR_BURSTS_ORACLE_SQL)."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.streaming.bursts import error_bursts_stream
    from stellar_etl_spark.streaming.ooo import error_bursts_stream_ooo

    ship_package(spark)
    detector = error_bursts_stream_ooo if ooo else error_bursts_stream
    src_dir = src_dir or _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_bursts_")
    parity_cfg = EngineConfig(watermark_delay=PARITY_DELAY)
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )
    with _drain_conf(spark, DRAIN_PARTITIONS_STATEFUL):
        q = (
            detector(stream, parity_cfg)
            .writeStream.queryName("parity_bursts")
            .outputMode("append")
            .format("parquet")
            .option("path", os.path.join(work, "out"))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(os.path.join(work, "out")).filter(
        F.col("conv_id") != CLOSER_CONV
    )


# --- streamed minhash-LSH dedup ----------------------------------------------

MINHASH_BUCKET_TABLE = "minhash_buckets"


def streamed_dedup_minhash(
    spark: SparkSession, sf_dir: str, src_dir: str | None = None
) -> DataFrame:
    """MinHash-LSH near-dup detection with bucket membership as REAL
    streaming state (streaming/lshstate.py): the corpus streamed in
    doc_id-range slices, per-(band_idx, band_key) membership maintained
    by a hard-bounded applyInPandasWithState processor (BAND_CAP docs +
    counter per key, poisoned past the cap — the batch hot-band rule
    enforced in state), update-mode snapshots committed exactly-once
    through the epoch sink, folded to the final bucket table (latest
    epoch per key), pairs generated row-locally and Jaccard-verified
    against the batch signature map. Oracle: the batch minhash SQL."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.streaming.lshstate import minhash_bucket_stream

    ship_package(spark)
    src_dir = src_dir or _doc_slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_minhash_")
    sink_root = os.path.join(work, "sink")
    sink = EpochCommitSink(sink_root)

    def writer(batch_df: DataFrame, epoch_id: int) -> None:
        sink.write_epoch(
            epoch_id,
            {MINHASH_BUCKET_TABLE: batch_df.withColumn("epoch_id", F.lit(epoch_id))},
        )

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        # 2 files/trigger: halves the state-store commits and the
        # duplicate bucket invocations vs 1-file triggers (the matcher
        # drain's cadence rationale); the kill/resume test keeps its
        # own 1-file stream so the restart still lands mid-corpus
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    with _drain_conf(spark):
        q = (
            minhash_bucket_stream(stream)
            .writeStream.queryName("parity_minhash")
            .outputMode("update")
            .foreachBatch(writer)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return fold_minhash_sink(spark, sink_root, sf_dir)


def fold_minhash_sink(spark: SparkSession, sink_root: str, sf_dir: str) -> DataFrame:
    """Latest epoch per bucket (n is cumulative, so the fold is
    order-safe), then the shared candidate/verify tail."""
    from stellar_etl_spark.functions.corpus import load_corpus
    from stellar_etl_spark.functions.dedup import _hashes_df
    from stellar_etl_spark.streaming.lshstate import pairs_from_bucket_table

    deltas = EpochCommitSink(sink_root).read_table(spark, MINHASH_BUCKET_TABLE)
    latest = F.max_by(F.struct("n", "members"), F.col("epoch_id")).alias("s")
    buckets = (
        deltas.groupBy("band_idx", "band_key")
        .agg(latest)
        .select("band_idx", "band_key", F.col("s.n").alias("n"),
                F.col("s.members").alias("members"))
    )
    sigs = _hashes_df(load_corpus(spark, sf_dir))
    return pairs_from_bucket_table(buckets, sigs)


# --- streamed BM25: incremental inverted-index maintenance -------------------

BM25_TF_TABLE = "bm25_tf"
BM25_DL_TABLE = "bm25_dl"


def streamed_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25's index tables maintained by a STATELESS stream, scored at
    serve time — the production retrieval shape (ingest updates the
    index incrementally; queries are answered from the index, not by
    rescanning the corpus).

    Per arriving document the stream derives, row-locally (no state, no
    shuffle, no watermark):
      * (doc_id, dl) — the corpus-statistics row, and
      * (query_id, token, doc_id, dl, tf) for each matched query term —
        tf computed INSIDE the row via size(filter(toks, x -> x = tok))
        over an inline-literal query-term explode (the query set is
        dimension-sized, embedded in the plan — no join at all),
    and commits both tables per epoch through the exactly-once sink
    (multi-table fanout). The serve-time fold is the batch operator's
    own scoring tail (functions/retrieval.score_topk) over the
    accumulated index — df/N/L are computed from the index tables, so
    scores are exactly the batch operator's and the DuckDB oracle is
    shared verbatim.

    Append-mode stateless streaming: exactly-once comes from the sink's
    idempotent epoch commit alone (replayed epochs are skipped), which
    the kill/resume suite proves for this sink; there is no operator
    state to reconstruct."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.functions import hashing as H
    from stellar_etl_spark.functions import retrieval as fret

    ship_package(spark)
    src_dir = _doc_slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_bm25_")
    sink_root = os.path.join(work, "sink")
    sink = EpochCommitSink(sink_root)

    qstructs = ", ".join(
        f"named_struct('query_id', CAST({qid} AS BIGINT), 'token', '{t}')"
        for qid, q in fret.BM25_QUERIES
        for t in sorted(set(q.lower().split()))
    )
    tok = H.tokens("text", spark=True)

    def index_rows(stream: DataFrame) -> DataFrame:
        toks = stream.select(
            "doc_id",
            F.expr(tok).alias("toks"),
        ).withColumn("dl", F.size("toks").cast("long"))
        return (
            toks.select(
                "doc_id", "dl", "toks",
                F.explode(F.expr(f"array({qstructs})")).alias("q"),
            )
            .withColumn(
                "tf",
                F.expr("CAST(size(filter(toks, x -> x = q.token)) AS LONG)"),
            )
            .select(
                "doc_id", "dl",
                F.col("q.query_id").alias("query_id"),
                F.col("q.token").alias("token"),
                "tf",
            )
        )

    def writer(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            sink.write_epoch(
                epoch_id,
                {
                    BM25_DL_TABLE: batch_df.select("doc_id", "dl")
                    .distinct()
                    .withColumn("epoch_id", F.lit(epoch_id)),
                    BM25_TF_TABLE: batch_df.filter(F.col("tf") > 0)
                    .select("query_id", "token", "doc_id", "dl", "tf")
                    .withColumn("epoch_id", F.lit(epoch_id)),
                },
            )
        finally:
            batch_df.unpersist()

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    with _drain_conf(spark):
        q = (
            index_rows(stream)
            .writeStream.queryName("parity_bm25")
            .outputMode("append")
            .foreachBatch(writer)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return fold_bm25_sink(spark, sink_root)


def fold_bm25_sink(spark: SparkSession, sink_root: str) -> DataFrame:
    """Serve-time scoring over the accumulated index tables: the batch
    operator's own tail (df/N/L derived from the index, sorted-fold
    score, two-phase top-k)."""
    from stellar_etl_spark.functions import retrieval as fret

    sink = EpochCommitSink(sink_root)
    dls = sink.read_table(spark, BM25_DL_TABLE).select("doc_id", "dl")
    tf = sink.read_table(spark, BM25_TF_TABLE).select(
        "query_id", "token", "doc_id", "dl", "tf"
    )
    return fret.score_topk(tf, dls)


LM_DOCS_TABLE = "lm_docs"
LM_OCC_TABLE = "lm_occ"
LM_UNI_TABLE = "lm_uni"
LM_BIG_TABLE = "lm_big"


def streamed_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bigram LM's count tables maintained by a STATELESS stream,
    scored at serve time — the same incremental ingest-then-serve shape
    as streamed_bm25, instantiated for the T61 fluency filter.

    Per micro-batch the stream derives the LM index deltas (functions/
    scoring.lm_parts over just the batch's documents): the doc roster,
    the per-bigram occurrence rows (row-local), and PARTIAL unigram /
    bigram counts (per-batch groupBy — the map-side-combine analog,
    so each epoch commits vocabulary-bounded partials rather than raw
    token explosions). All four tables commit per epoch through the
    exactly-once sink; the serve-time fold SUM-merges the partials
    (counts are additive, so merged partials equal the batch totals
    exactly) and runs the batch operator's own scoring tail
    (scoring.lm_score_tail). Oracle: shared verbatim with the batch
    query.

    Stateless append streaming: exactly-once comes from the sink's
    idempotent epoch commit alone (replayed epochs are skipped) — no
    operator state, no watermark."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.functions import scoring as fscore

    ship_package(spark)
    src_dir = _doc_slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_lm_")
    sink_root = os.path.join(work, "sink")
    sink = EpochCommitSink(sink_root)

    def writer(batch_df: DataFrame, epoch_id: int) -> None:
        parts = fscore.lm_parts(batch_df)
        sink.write_epoch(
            epoch_id,
            {
                LM_DOCS_TABLE: parts["docs"].withColumn("epoch_id", F.lit(epoch_id)),
                LM_OCC_TABLE: parts["occ"].withColumn("epoch_id", F.lit(epoch_id)),
                LM_UNI_TABLE: parts["uni"].withColumn("epoch_id", F.lit(epoch_id)),
                LM_BIG_TABLE: parts["big"].withColumn("epoch_id", F.lit(epoch_id)),
            },
        )

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    with _drain_conf(spark):
        q = (
            stream.writeStream.queryName("parity_ngram_lm")
            .outputMode("append")
            .foreachBatch(writer)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return fold_lm_sink(spark, sink_root)


def fold_lm_sink(spark: SparkSession, sink_root: str) -> DataFrame:
    """Serve-time LM scoring over the accumulated index: SUM-merge the
    per-epoch partial counts, then the batch scoring tail."""
    from stellar_etl_spark.functions import scoring as fscore

    sink = EpochCommitSink(sink_root)
    doc_ids = sink.read_table(spark, LM_DOCS_TABLE).select("doc_id")
    occ = sink.read_table(spark, LM_OCC_TABLE).select("doc_id", "w1h", "bh")
    uni = (
        sink.read_table(spark, LM_UNI_TABLE)
        .groupBy("w1h")
        .agg(F.sum("c1").cast("long").alias("c1"))
    )
    big = (
        sink.read_table(spark, LM_BIG_TABLE)
        .groupBy("bh")
        .agg(F.sum("c2").cast("long").alias("c2"))
    )
    return fscore.lm_score_tail(doc_ids, occ, uni, big)


# --- streamed data-quality monitor -------------------------------------------

def streamed_dq_violations(
    spark: SparkSession,
    sf_dir: str,
    cfg: EngineConfig = DEFAULT,
    src_dir: str | None = None,
) -> DataFrame:
    """The streaming integrity monitor (streaming/dq.py) drained over
    the sliced driver input with the SAME deterministic violation
    injection the batch query composes (operators/dq.py
    inject_dq_violations — all narrow ops + self-union, streaming-
    legal): row-local checks emit per micro-batch through the stateless
    branch, order checks finalize per conversation when the closer
    sentinels push the final watermark past every real event. Oracle:
    the batch checker's SQL (operators/dq.DQ_ORACLE_SQL), value-exact."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.operators.dq import inject_dq_violations
    from stellar_etl_spark.streaming.dq import dq_violations_stream

    ship_package(spark)
    src_dir = src_dir or _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_dq_")
    parity_cfg = EngineConfig(watermark_delay=PARITY_DELAY)
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )
    with _drain_conf(spark):
        q = (
            dq_violations_stream(inject_dq_violations(stream), parity_cfg)
            .writeStream.queryName("parity_dq")
            .outputMode("append")
            .format("parquet")
            .option("path", os.path.join(work, "out"))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(os.path.join(work, "out")).filter(
        F.col("conv_id") != CLOSER_CONV
    )


# --- native stream-stream range join -----------------------------------------

def streamed_turn_replies(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """Spark's BUILT-IN symmetric-hash stream-stream join (equi on
    conv_id + event-time range) drained over the sliced driver input.
    Inner-join rows emit when both sides have arrived — no sentinel /
    watermark dependence for correctness (the watermark only bounds
    state), so the drained rows equal the batch theta join
    (streaming/replies.TURN_REPLIES_ORACLE_SQL) for any slicing."""
    from stellar_etl_spark.streaming.replies import reply_join_stream, reply_pairs

    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_replies_")
    parity_cfg = EngineConfig(watermark_delay=PARITY_DELAY)
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )
    with _drain_conf(spark):
        q = (
            reply_join_stream(stream, parity_cfg)
            .writeStream.queryName("parity_replies")
            .outputMode("append")
            .format("parquet")
            .option("path", os.path.join(work, "out"))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return reply_pairs(
        spark.read.parquet(os.path.join(work, "out")).filter(
            F.col("conv_id") != CLOSER_CONV
        )
    )


# --- chained window aggregation + native streaming dedup ---------------------

def streamed_tool_rate_peak(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """The window-on-window rollup (operators/rollups.tool_rate_peak)
    running as Spark's native CHAINED time-window aggregation — two
    stateful aggs in one streaming query, both finalized by the same
    watermark (3.4+ feature; the closer sentinels push the final
    watermark past every real 10-minute window). Oracle: the batch
    two-level SQL (PEAK_ORACLE_SQL), value-exact."""
    from stellar_etl_spark.operators.rollups import tool_rate_peak

    src_dir = _slice_dir(spark, sf_dir)
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    ).withWatermark("ts", PARITY_DELAY)
    out = _drain_append(tool_rate_peak(stream, cfg), "tool_rate_peak")
    return spark.read.parquet(out).filter(F.col("tool") != CLOSER_CONV)


def streamed_turn_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming dedup: exact duplicate turns are injected by
    self-union (every turn_idx % 7 == 3 arrives twice — the DQ
    injection discipline) and dropped by Spark's
    dropDuplicatesWithinWatermark on (conv_id, turn_idx) — first
    arrival emits immediately, the suppression state is retired when
    the watermark passes the key (bounded state, unlike plain
    dropDuplicates whose state never expires on a stream). With the
    parity delay no suppression window expires mid-stream, so the
    drained rows equal the batch DISTINCT — i.e. exactly the original
    transcript table."""
    src_dir = _slice_dir(spark, sf_dir)
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )
    dup = stream.filter(F.col("turn_idx") % 7 == 3)
    injected = stream.unionByName(dup).withWatermark("ts", PARITY_DELAY)
    deduped = injected.dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    out = _drain_append(deduped, "turn_dedup")
    return spark.read.parquet(out).filter(F.col("conv_id") != CLOSER_CONV)


def streamed_turn_replies_outer(
    spark: SparkSession, sf_dir: str, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """The LEFT OUTER stream-stream range join drained over the sliced
    driver input: matched rows emit inline; reply-less user turns emit
    null-padded ONLY when the closer sentinels push the final
    watermark past their window (the built-in operator's state
    eviction — the native analog of the matcher's evicted_unmatched).
    Oracle: the batch LEFT JOIN (TURN_REPLIES_OUTER_ORACLE_SQL)."""
    from stellar_etl_spark.streaming.replies import reply_join_outer_stream

    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_replies_outer_")
    parity_cfg = EngineConfig(watermark_delay=PARITY_DELAY)
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2, with_lineage=False
    )
    with _drain_conf(spark):
        q = (
            reply_join_outer_stream(stream, parity_cfg)
            .writeStream.queryName("parity_replies_outer")
            .outputMode("append")
            .format("parquet")
            .option("path", os.path.join(work, "out"))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(os.path.join(work, "out")).filter(
        F.col("conv_id") != CLOSER_CONV
    )


FANOUT_TURNS = "fanout_turns"
FANOUT_RATE = "fanout_rate"
FANOUT_CONVS = "fanout_convs"


def streamed_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed multi-output streaming DAG under ONE checkpoint
    (VERDICT r04 "Next round" #3): one transcript stream fans out to
    THREE tables inside a single foreachBatch — a row-local projection
    (fanout_turns), a tumbling-window rate partial (fanout_rate, fold =
    SUM), and a per-(tool, conv) count partial (fanout_convs, fold =
    SUM) — committed all-or-nothing per epoch through
    streaming/pipeline.start_fanout, the engine's analog of the
    reference's one-consumer-loop/many-tables demux
    (cmd/export_ledger_entry_changes.go:129-271) with the atomicity it
    lacks. The serve-time fold joins all three tables into one per-tool
    report, so the driver's value hash gates every table AND the
    single-checkpoint exactly-once property at once: an epoch
    duplicated or dropped in ANY of the three tables skews its columns
    (n_turns / rate_total / n_windows / n_convs / conv_turns_total)
    away from the batch oracle."""
    from stellar_etl_spark.streaming.pipeline import start_fanout

    src_dir = _slice_dir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="parity_fanout_")
    sink_root = os.path.join(work, "sink")
    stream = read_transcript_stream(
        spark, src_dir, max_files_per_trigger=2
    ).filter(F.col("conv_id") != CLOSER_CONV)

    def _tooled(df: DataFrame) -> DataFrame:
        return df.filter(F.col("tool").isNotNull())

    transforms = {
        FANOUT_TURNS: lambda df: _tooled(df).select(
            "conv_id", "turn_idx", "tool", "ts"
        ),
        FANOUT_RATE: lambda df: (
            _tooled(df)
            .groupBy(F.window("ts", "1 minute").alias("w"), "tool")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.col("w.start").alias("window_start"), "tool", "n")
        ),
        FANOUT_CONVS: lambda df: (
            _tooled(df)
            .groupBy("tool", "conv_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        ),
    }
    with _drain_conf(spark):
        q = start_fanout(
            stream,
            sink_root,
            os.path.join(work, "ckpt"),
            transforms,
            available_now=True,
            query_name="parity_fanout",
        )
        q.awaitTermination()

    sink = EpochCommitSink(sink_root)
    a = (
        sink.read_table(spark, FANOUT_TURNS)
        .groupBy("tool")
        .agg(F.count(F.lit(1)).cast("long").alias("n_turns"))
    )
    b = (
        sink.read_table(spark, FANOUT_RATE)
        .groupBy("tool")
        .agg(
            F.sum("n").cast("long").alias("rate_total"),
            F.countDistinct("window_start").cast("long").alias("n_windows"),
        )
    )
    c = (
        sink.read_table(spark, FANOUT_CONVS)
        .groupBy("tool", "conv_id")
        .agg(F.sum("n").cast("long").alias("cn"))
        .groupBy("tool")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum("cn").cast("long").alias("conv_turns_total"),
        )
    )
    return a.join(b, "tool").join(c, "tool")


FANOUT_ORACLE_SQL = """
    SELECT tool,
           COUNT(*) AS n_turns,
           CAST(COUNT(*) AS BIGINT) AS rate_total,
           CAST(COUNT(DISTINCT CAST(floor(epoch(ts)/60) AS BIGINT)) AS BIGINT)
               AS n_windows,
           CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
           CAST(COUNT(*) AS BIGINT) AS conv_turns_total
    FROM transcripts
    WHERE tool IS NOT NULL
    GROUP BY tool
"""
