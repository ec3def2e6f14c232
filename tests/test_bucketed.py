"""Bucketed co-location: joins/aggs on the bucket key must run with
ZERO Exchange in the physical plan — the 100 TB shuffle-elimination
strategy, proven on the actual plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stellar_etl_spark.sources.bucketed import (
    read_bucketed,
    save_bucketed_transcripts,
)
from stellar_etl_spark.sources.generator import write_transcripts
from stellar_etl_spark.streaming.source import read_transcript_batch


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bucket_src"))
    write_transcripts(d, n_convs=200, n_files=2, seed=7)
    df = read_transcript_batch(spark, d)
    save_bucketed_transcripts(
        df, table="t_bucketed",
        path=str(tmp_path_factory.mktemp("bucket_tbl")),
    )
    yield "t_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_agg_no_shuffle(spark, bucketed):
    t = read_bucketed(spark, bucketed)
    agg = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    # and it still computes the right thing
    src = spark.table(bucketed)
    assert agg.count() == src.select("conv_id").distinct().count()


def test_bucketed_self_join_no_shuffle(spark, bucketed):
    """With broadcast off (the 100 TB case — neither side fits), the
    join must be bucket-to-bucket: SortMergeJoin with no shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = read_bucketed(spark, bucketed)
        a = t.select("conv_id", "turn_idx", "role")
        b = t.select(F.col("conv_id").alias("conv_id"), F.col("turn_idx").alias("t2"))
        j = a.join(b, "conv_id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_equals_unbucketed(spark, bucketed, tmp_path_factory):
    """Bucketing is a physical property only — same rows, same results."""
    t = read_bucketed(spark, bucketed)
    from stellar_etl_spark.operators.state import compact_last_state

    got = sorted(map(tuple, compact_last_state(t).collect()))
    want = sorted(map(tuple, compact_last_state(
        t.repartition(8)  # break the bucketing info
    ).collect()))
    assert got == want
