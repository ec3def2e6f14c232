#!/usr/bin/env python
"""Streaming bench: sustained turns/sec + per-micro-batch p50/p95
latency — the BASELINE.json headline metric, measured end-to-end
through the engine's own streaming stack (file source with bounded
per-trigger intake -> watermark -> stateful ops -> exactly-once
epoch-commit sink) rather than through batch shortcuts.

Two concurrent queries drive it, mirroring production fan-out:
  * windowed per-tool rollup (tumbling, watermark, append), and
  * the stateful user->assistant pair matcher (applyInPandasWithState).

Prints ONE JSON line:
    {"metric": "streaming_turns_per_sec", "value": ..., "unit": "rows/sec",
     "p95_batch_ms": ..., "p50_batch_ms": ..., "batches": ..., ...}

Input: the deterministic generated transcript set (seed=42), written as
64 files; maxFilesPerTrigger=4 yields ~16 micro-batches per query — the
64-ledger batch cadence analog (reference --batch-size,
/root/reference/internal/utils/main.go:271).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

INPUT_DIR = os.environ.get("SPARK_GRAFT_STREAM_INPUT", "/tmp/spark_graft_stream_input")
N_CONVS = int(os.environ.get("SPARK_GRAFT_STREAM_CONVS", "100000"))
# scale the FILE count with the conv count so micro-batch SIZE stays
# constant across stream lengths: a 10x-convs run then measures 10x
# MORE same-sized batches (sustained throughput, comparable p50/p95),
# not 10x-bigger batches (which would conflate batch sizing with rate)
N_FILES = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", str(max(64, 64 * N_CONVS // 100000))))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FILES_PER_TRIGGER = 4
# "hdfs" (default in-memory HDFS-backed provider) or "rocksdb" — the
# provider BASELINE.md §4 names for real 100 TB state; both built into
# Spark, so the claim is runnable here, not prose
STATE_STORE = os.environ.get("SPARK_GRAFT_STATE_STORE", "hdfs")


def ensure_input() -> int:
    marker = os.path.join(INPUT_DIR, f".complete-{N_CONVS}-{N_FILES}")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read())
    import glob

    for p in glob.glob(os.path.join(INPUT_DIR, "*")):
        os.remove(p)
    from stellar_etl_spark.sources.generator import write_transcripts

    n = write_transcripts(INPUT_DIR, n_convs=N_CONVS, n_files=N_FILES)
    with open(marker, "w") as f:
        f.write(str(n))
    return n


def _steal_cs() -> int | None:
    """Cumulative hypervisor steal time (centiseconds, summed over all
    cpus): field 8 of the aggregate 'cpu ' line in /proc/stat. The delta
    across the run measures how much host time the VM simply did not get
    — the SCALING_r0x protocol's contamination telemetry, applied here."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])
    except (OSError, IndexError, ValueError):
        return None


def _io_stall_us() -> int | None:
    """Cumulative host IO-stall exposure (us): /proc/pressure/io 'full total'.
    The delta across the run attributes tail batches to hypervisor disk
    stalls (documented on this VM) vs engine cost."""
    try:
        with open("/proc/pressure/io") as f:
            for line in f:
                if line.startswith("full"):
                    return int(line.rsplit("total=", 1)[1])
    except OSError:
        return None
    return None


def main() -> None:
    n = ensure_input()

    from pyspark.sql import SparkSession

    from stellar_etl_spark.config import EngineConfig
    from stellar_etl_spark.operators import rollups
    from stellar_etl_spark.streaming.matcher import match_pairs_stream
    from stellar_etl_spark.streaming.metrics import EngineQueryListener
    from stellar_etl_spark.streaming.pipeline import start_windowed
    from stellar_etl_spark.streaming.source import read_transcript_stream

    cfg = EngineConfig(session_gap="30 minutes")
    builder_extra = {}
    if STATE_STORE == "rocksdb":
        builder_extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )
        # changelog checkpointing: upload per-batch deltas instead of
        # full snapshots — the production setting for large state
        builder_extra[
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        ] = "true"
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stream-bench")
        # streaming: shuffle.partitions also fixes the state-store
        # partition count — every micro-batch commits that many store
        # deltas, so fewer, fuller partitions beat 2*cores here
        # (measured: 64 -> 16 partitions cuts p50 batch latency ~3x);
        # at real 100 TB state sizes this goes back UP to bound
        # per-partition state, and RocksDB replaces the HDFS provider
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "false")  # streaming plans
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # e.g. -Xlog:gc*:file=/tmp/gc.log for pause attribution
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", ""))
        .config(map=builder_extra)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stellar_etl_spark.deploy import ship_package

    ship_package(spark)

    listener = EngineQueryListener()
    spark.streams.addListener(listener)
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        io0 = _io_stall_us()
        st0 = _steal_cs()
        t0 = time.perf_counter()
        queries = []
        for name, build in [
            ("tool_rate", lambda s: rollups.tool_rate(
                s.withWatermark("ts", cfg.watermark_delay), cfg, exact=False)),
            ("turn_pairs", lambda s: match_pairs_stream(s, cfg)),
        ]:
            stream = read_transcript_stream(
                spark, INPUT_DIR, max_files_per_trigger=FILES_PER_TRIGGER,
                with_lineage=False,
            )
            queries.append(start_windowed(
                build(stream), f"{work}/sink_{name}", f"{work}/ckpt_{name}",
                name, query_name=name, output_mode="append",
            ))
        ok = all(q.awaitTermination(1800) for q in queries)
        wall = time.perf_counter() - t0
        io1 = _io_stall_us()
        st1 = _steal_cs()
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(work, ignore_errors=True)

    batches = [b for b in listener.collector.batches if b.num_input_rows > 0]
    durs = sorted(b.duration_ms for b in batches)
    p50 = statistics.median(durs) if durs else None
    p95 = durs[max(0, -(-len(durs) * 95 // 100) - 1)] if durs else None
    print(json.dumps({
        "metric": "streaming_turns_per_sec_sustained",
        "value": round(2 * n / wall, 1),  # 2 queries each drain n rows
        "unit": "rows/sec",
        "wall_sec": round(wall, 2),
        "input_rows": n,
        "batches": len(batches),
        "p50_batch_ms": p50,
        "p95_batch_ms": p95,
        "max_state_rows": max((b.state_rows for b in batches), default=0),
        "files_per_trigger": FILES_PER_TRIGGER,
        "n_files": N_FILES,
        "cpus": CPUS,
        "state_store": STATE_STORE,
        "steal_core_sec_during_run": (
            round((st1 - st0) / 100.0, 1) if st0 is not None and st1 is not None else None
        ),
        "io_stall_sec_during_run": (
            round((io1 - io0) / 1e6, 1) if io0 is not None and io1 is not None else None
        ),
        # chronological per-batch trigger durations (ms), both queries
        # interleaved — lets a fat tail be located in time, not just sized
        "batch_durations_ms": [b.duration_ms for b in listener.collector.batches
                               if b.num_input_rows > 0],
        "completed": ok,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
