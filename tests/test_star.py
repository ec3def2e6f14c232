"""Star-schema normalization, ordered sequences, derived events —
oracle parity + structural checks (J6 / A6 / W3 analogs)."""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_SMALL, assert_oracle_match, register_views

from stellar_etl_spark.operators import star
from stellar_etl_spark.sources.transcripts import TRANSCRIPTS_CTE, load_transcripts

_W = f"WITH {TRANSCRIPTS_CTE}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_views(con, SF_SMALL)
    return con


@pytest.fixture(scope="module")
def tx(spark):
    return load_transcripts(spark, SF_SMALL)


def test_normalize_star_oracle(spark, duck, tx):
    assert_oracle_match(
        star.normalize_star(tx), duck, _W + star.normalize_oracle_sql(), "fact_tool_events"
    )


def test_tool_sequences_oracle(spark, duck, tx):
    assert_oracle_match(
        star.tool_sequences(tx), duck, _W + star.TOOL_SEQUENCES_ORACLE_SQL, "tool_sequences"
    )


def test_derived_events_oracle(spark, duck, tx):
    assert_oracle_match(
        star.derived_events(tx), duck, _W + star.DERIVED_EVENTS_ORACLE_SQL, "derived_events"
    )


def test_surrogate_keys_deterministic(spark, tx):
    """Same natural key -> same surrogate key, across separate plans
    (the FNV/TOID determinism contract — no sequence generators)."""
    a = {(r.tool, r.tool_key) for r in star.normalize_star(tx).select("tool", "tool_key").distinct().collect()}
    b = {(r.tool, r.tool_key) for r in star.normalize_star(tx).select("tool", "tool_key").distinct().collect()}
    assert a == b
    assert len({k for _, k in a}) == len({t for t, _ in a}), "surrogate key collision"


def test_derived_events_fanout(spark, tx):
    """Tool turns emit exactly 2 events; others exactly 1."""
    ev = star.derived_events(tx)
    n_tool_turns = tx.filter("role = 'tool'").count()
    n_other = tx.count() - n_tool_turns
    assert ev.count() == 2 * n_tool_turns + n_other
    assert ev.filter("event_idx = 1").count() == n_tool_turns
