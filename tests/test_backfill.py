"""tools/backfill.py: epoch-stamped column patch over the bucketed
store — the runnable form of docs/backfill.md (reference analog:
stellar-etl docs/backfill.md JS-UDF column patches)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from stellar_etl_spark.sources.generator import write_transcripts
from stellar_etl_spark.streaming.source import read_transcript_batch
from tools.backfill import (
    backfill_column,
    current_epoch,
    init_store,
    list_epochs,
    read_current,
    rollback,
    vacuum,
)

TABLE = "bf_transcripts"


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bf_src"))
    write_transcripts(d, n_convs=150, n_files=2, seed=11)
    init_store(spark, read_transcript_batch(spark, d), TABLE)
    yield TABLE
    for e in list_epochs(spark, TABLE):
        spark.sql(f"DROP TABLE IF EXISTS {TABLE}__e{e}")
    spark.sql(f"DROP VIEW IF EXISTS {TABLE}_current")


def _rows(df):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_backfill_patches_only_targeted_rows(spark, store):
    before = _rows(read_current(spark, store))
    e = backfill_column(
        spark, store, "text", "upper(text)", where_sql="role = 'user'"
    )
    assert e == 1 and current_epoch(spark, store) == 1
    after = read_current(spark, store)
    # targeted rows rewritten, untouched rows byte-identical
    got = _rows(after)
    want = sorted(
        (c, i, r, t.upper() if r == "user" else t, tl, ts)
        for (c, i, r, t, tl, ts) in before
    )
    assert got == want


def test_backfill_preserves_bucketing(spark, store):
    """The patched epoch keeps bucket co-location: a conv_id agg over
    the serving view plans with ZERO Exchange."""
    agg = read_current(spark, store).groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_backfill_idempotent_content_and_rollback(spark, store):
    """Re-running the same patch yields identical content in a new
    epoch (pure-function rewrite); rollback repoints the view; vacuum
    retains the newest epochs."""
    first = _rows(read_current(spark, store))
    e = backfill_column(
        spark, store, "text", "upper(text)", where_sql="role = 'user'"
    )
    assert _rows(read_current(spark, store)) == first  # idempotent values
    rollback(spark, store, 0)
    orig = _rows(read_current(spark, store))
    assert any(r == "user" and t != t.upper() for (_, _, r, t, _, _) in orig)
    rollback(spark, store, e)
    dropped = vacuum(spark, store, keep_last=2)
    assert 0 in dropped and e in list_epochs(spark, store)


def test_backfill_guards(spark, store):
    with pytest.raises(ValueError):
        backfill_column(spark, "no_such_table", "text", "upper(text)")
    with pytest.raises(ValueError):
        backfill_column(spark, store, "nope", "1")
