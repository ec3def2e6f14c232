"""Driver-gated streaming parity (streaming/parity.py): the REAL
streaming stack must equal the batch operators row-for-row on the
driver's own derived input — the same gate the driver's oracle harness
applies at sf0.01, exercised here at sf0.001 plus the DuckDB oracle."""

from __future__ import annotations

import duckdb

from tests.conftest import (
    SF_UNIT,
    assert_oracle_match,
    register_views,
    spark_rows,
    value_hash,
)


def _same_rows(a_df, b_df, name):
    a, b = spark_rows(a_df), spark_rows(b_df)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    assert value_hash(a) == value_hash(b), f"{name}: value hash mismatch"


def test_streamed_turn_pairs_equals_batch_and_oracle(spark):
    from stellar_etl_spark.operators import pairs
    from stellar_etl_spark.sources.transcripts import (
        TRANSCRIPTS_CTE,
        load_transcripts,
    )
    from stellar_etl_spark.streaming import parity

    got = parity.streamed_turn_pairs(spark, SF_UNIT)
    want = pairs.match_pairs(load_transcripts(spark, SF_UNIT))
    _same_rows(got, want, "turn_pairs_streamed==batch")

    con = duckdb.connect()
    register_views(con, SF_UNIT)
    assert_oracle_match(
        got,
        con,
        f"WITH {TRANSCRIPTS_CTE}" + pairs.PAIRS_ORACLE_SQL,
        "turn_pairs_streamed oracle",
    )


def test_streamed_snapshot_equals_batch_and_oracle(spark):
    from stellar_etl_spark.operators import state
    from stellar_etl_spark.sources.transcripts import (
        TRANSCRIPTS_CTE,
        load_transcripts,
    )
    from stellar_etl_spark.streaming import parity

    got = parity.streamed_snapshot(spark, SF_UNIT)
    want = state.compact_last_state(load_transcripts(spark, SF_UNIT))
    _same_rows(got, want, "snapshot_streamed==batch")

    con = duckdb.connect()
    register_views(con, SF_UNIT)
    assert_oracle_match(
        got,
        con,
        f"WITH {TRANSCRIPTS_CTE}" + state.COMPACT_ORACLE_SQL,
        "snapshot_streamed oracle",
    )
