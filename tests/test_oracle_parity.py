"""Run every queries() entry against its oracle_sql() at sf0.001 —
the local mirror of the driver's correctness gate."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_UNIT, assert_oracle_match, register_views

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck_unit():
    con = duckdb.connect()
    register_views(con, SF_UNIT)
    return con


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, duck_unit, name):
    df = QUERIES[name](spark, SF_UNIT)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    assert_oracle_match(df, duck_unit, ORACLES[name], name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "conv_id" in df.columns
