"""Driver-gated streaming parity for the windowed aggregations:
the REAL streaming session_window (ST5 — ledger-close boundary analog)
and the watermarked tumbling rollup must equal the batch operators
row-for-row on the driver's own derived input, plus the DuckDB oracle —
the same gate the driver applies at sf0.01, exercised at sf0.001."""

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


def test_streamed_sessions_equals_batch_and_oracle(spark):
    from stellar_etl_spark.operators import sessions
    from stellar_etl_spark.sources.transcripts import (
        TRANSCRIPTS_CTE,
        load_transcripts,
    )
    from stellar_etl_spark.streaming import parity

    got = parity.streamed_sessions(spark, SF_UNIT)
    want = sessions.sessionize(load_transcripts(spark, SF_UNIT))
    _same_rows(got, want, "sessions_streamed==batch")

    con = duckdb.connect()
    register_views(con, SF_UNIT)
    assert_oracle_match(
        got,
        con,
        f"WITH {TRANSCRIPTS_CTE}" + sessions.session_oracle_sql("INTERVAL 8 HOUR"),
        "sessions_streamed oracle",
    )


def test_streamed_tool_rate_equals_batch_and_oracle(spark):
    from stellar_etl_spark.operators import rollups
    from stellar_etl_spark.sources.transcripts import (
        TRANSCRIPTS_CTE,
        load_transcripts,
    )
    from stellar_etl_spark.streaming import parity

    got = parity.streamed_tool_rate(spark, SF_UNIT)
    want = rollups.tool_rate(load_transcripts(spark, SF_UNIT))
    _same_rows(got, want, "tool_rate_streamed==batch")

    con = duckdb.connect()
    register_views(con, SF_UNIT)
    assert_oracle_match(
        got,
        con,
        f"WITH {TRANSCRIPTS_CTE}"
        + rollups.rate_oracle_sql("tool", where="WHERE tool IS NOT NULL"),
        "tool_rate_streamed oracle",
    )
