"""Adversarial out-of-order ingestion for the stateful drains
(VERDICT r04 "Next round" #5): the same inputs delivered in REVERSED or
seeded-SHUFFLED file order (one slice per trigger) must produce
byte-identical results — for the sequential CEP processors via the
watermark-ordered replay forms (streaming/ooo.py), and for the
DQ monitor and the LSH bucket state because their state designs are
delivery-order invariant by construction. The matcher's disorder drain
is also a driver query (``turn_pairs_disorder_streamed``,
__spark_entry__.py) gated by the DuckDB value oracle; these tests pin
the other drains against their batch Spark operators, plus one
kill/resume mid-disorder.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from stellar_etl_spark.config import EngineConfig
from stellar_etl_spark.streaming import parity

from tests.conftest import SF_UNIT
from tests.test_streaming import _hard_kill, _rows


def test_matcher_disorder_reversed_equals_batch(spark):
    """Reversed delivery through the watermark-ordered matcher equals
    the batch matcher row-for-row (including evictions: with the
    parity delay nothing evicts mid-stream, so the single terminal
    replay must reproduce every unmatched row too)."""
    from stellar_etl_spark.operators.pairs import match_pairs
    from stellar_etl_spark.sources.transcripts import load_transcripts

    got = parity.streamed_turn_pairs(
        spark,
        SF_UNIT,
        src_dir=parity.disorder_dir(spark, SF_UNIT, "reverse"),
        max_files_per_trigger=1,
        ooo=True,
    )
    exp = match_pairs(load_transcripts(spark, SF_UNIT), EngineConfig())
    cols = [
        "conv_id", "user_turn_idx", "response_turn_idx",
        "response_role", "response_tool", "evicted_unmatched",
    ]
    assert _rows(got, cols) == _rows(exp, cols)
    lat = ["conv_id", "user_turn_idx", "latency_s"]
    assert _rows(got.filter(~F.col("evicted_unmatched")), lat) == _rows(
        exp.filter(~F.col("evicted_unmatched")), lat
    )


def test_transitions_disorder_shuffled_equals_batch(spark):
    from stellar_etl_spark.operators.journeys import tool_transitions
    from stellar_etl_spark.sources.transcripts import load_transcripts

    got = parity.streamed_tool_transitions(
        spark,
        SF_UNIT,
        src_dir=parity.disorder_dir(spark, SF_UNIT, "shuffle"),
        ooo=True,
    )
    exp = tool_transitions(load_transcripts(spark, SF_UNIT))
    assert _rows(got) == _rows(exp.select(*got.columns))


def test_bursts_disorder_reversed_equals_batch(spark):
    from stellar_etl_spark.operators.journeys import error_bursts
    from stellar_etl_spark.sources.transcripts import load_transcripts

    got = parity.streamed_error_bursts(
        spark,
        SF_UNIT,
        src_dir=parity.disorder_dir(spark, SF_UNIT, "reverse"),
        ooo=True,
    )
    exp = error_bursts(load_transcripts(spark, SF_UNIT))
    assert _rows(got) == _rows(exp.select(*got.columns))


def test_dq_disorder_reversed_equals_batch(spark):
    """The DQ monitor's group-stats state is order-invariant by
    construction (idx-keyed count/min/max merge + terminal
    adjudication) — no replay wrapper needed."""
    from stellar_etl_spark.operators.dq import dq_violations, inject_dq_violations
    from stellar_etl_spark.sources.transcripts import load_transcripts

    got = parity.streamed_dq_violations(
        spark,
        SF_UNIT,
        src_dir=parity.disorder_dir(spark, SF_UNIT, "reverse"),
    )
    exp = dq_violations(inject_dq_violations(load_transcripts(spark, SF_UNIT)))
    assert _rows(got) == _rows(exp.select(*got.columns))


def test_minhash_disorder_reversed_equals_batch(spark):
    """LSH bucket-membership state is order-invariant: membership sets
    and the BAND_CAP poisoning rule depend on WHICH docs hit a bucket,
    not on arrival order."""
    from stellar_etl_spark.functions.corpus import load_corpus
    from stellar_etl_spark.functions.dedup import minhash_lsh_dedup

    got = parity.streamed_dedup_minhash(
        spark,
        SF_UNIT,
        src_dir=parity.disorder_doc_dir(spark, SF_UNIT, "reverse"),
    )
    exp = minhash_lsh_dedup(load_corpus(spark, SF_UNIT))
    assert _rows(got) == _rows(exp.select(*got.columns))


def test_matcher_disorder_kill_resume(spark, tmp_path):
    """Kill the watermark-ordered matcher mid-disorder (reversed
    delivery, one file per trigger), resume from the same checkpoint:
    the buffered per-conversation replay state survives the restart and
    the terminal replay still equals the batch matcher."""
    from stellar_etl_spark.deploy import ship_package
    from stellar_etl_spark.operators.pairs import match_pairs
    from stellar_etl_spark.sources.transcripts import load_transcripts
    from stellar_etl_spark.streaming.ooo import match_pairs_stream_ooo
    from stellar_etl_spark.streaming.source import read_transcript_stream

    ship_package(spark)
    src_dir = parity.disorder_dir(spark, SF_UNIT, "reverse")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cfg = EngineConfig(watermark_delay=parity.PARITY_DELAY)

    def start(available_now):
        stream = read_transcript_stream(
            spark, src_dir, max_files_per_trigger=1, with_lineage=False
        )
        w = (
            match_pairs_stream_ooo(stream, cfg)
            .writeStream.queryName("ooo_resume")
            .outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
        )
        w = (
            w.trigger(availableNow=True)
            if available_now
            else w.trigger(processingTime="1 second")
        )
        return w.start()

    commits = os.path.join(ckpt, "commits")
    q1 = start(available_now=False)
    while (
        not os.path.isdir(commits)
        or len([f for f in os.listdir(commits) if not f.startswith(".")]) < 2
    ):
        time.sleep(0.2)
    _hard_kill(q1)

    q2 = start(available_now=True)
    assert q2.awaitTermination(540), "resumed disorder matcher did not finish"

    got = spark.read.parquet(out).filter(F.col("conv_id") != parity.CLOSER_CONV)
    exp = match_pairs(load_transcripts(spark, SF_UNIT), EngineConfig())
    cols = [
        "conv_id", "user_turn_idx", "response_turn_idx",
        "response_role", "response_tool", "evicted_unmatched",
    ]
    assert _rows(got, cols) == _rows(exp, cols)
