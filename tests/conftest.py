"""Shared pytest fixtures: one SparkSession per test session, DuckDB
oracle harness mirroring the driver's correctness gate (row count +
schema + order-insensitive value hash)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_UNIT = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from stellar_etl_spark.config import EngineConfig
    from stellar_etl_spark.session import get_spark

    cfg = EngineConfig(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                       shuffle_partitions=8)
    s = get_spark(cfg, app_name="pytest")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf in (SF_UNIT, SF_SMALL):
        pass
    return con


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")


def value_hash(rows) -> int:
    """Order-insensitive content hash over stringified rows, columns
    sorted by name — mirrors the driver's compare."""
    acc = 0
    for r in rows:
        items = tuple(str(r[k]) for k in sorted(r.keys()))
        acc ^= hash(items)
    return acc


def spark_rows(df):
    cols = sorted(df.columns)
    out = []
    for row in df.collect():
        d = row.asDict(recursive=True)
        out.append({c: _norm(d[c]) for c in cols})
    return out


def duck_rows(con, sql):
    cur = con.sql(sql)
    cols = cur.columns
    out = []
    for tup in cur.fetchall():
        out.append({c: _norm(v) for c, v in zip(cols, tup)})
    return out


def _norm(v):
    import datetime
    import decimal

    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def assert_oracle_match(spark_df, con, sql, name=""):
    s = spark_rows(spark_df)
    d = duck_rows(con, sql)
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duckdb={len(d)}"
    assert sorted(s[0].keys()) == sorted(d[0].keys()) if s else True, (
        f"{name}: columns differ {sorted(s[0].keys())} vs {sorted(d[0].keys())}"
    )
    sh, dh = value_hash(s), value_hash(d)
    if sh != dh:
        sset = {tuple(sorted(r.items())) for r in s}
        dset = {tuple(sorted(r.items())) for r in d}
        only_s = list(sset - dset)[:3]
        only_d = list(dset - sset)[:3]
        raise AssertionError(
            f"{name}: value hash mismatch\n only-spark={only_s}\n only-duck={only_d}"
        )
