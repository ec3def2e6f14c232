"""Transcript derivation parity (Spark vs DuckDB CTE) and generator
determinism — the input-level golden gate everything else rests on."""

import duckdb

from tests.conftest import SF_SMALL, SF_UNIT, assert_oracle_match, register_views

from stellar_etl_spark.sources.generator import generate_transcripts
from stellar_etl_spark.sources.transcripts import TRANSCRIPTS_CTE, load_transcripts


def test_derivation_matches_oracle(spark):
    con = duckdb.connect()
    register_views(con, SF_UNIT)
    df = load_transcripts(spark, SF_UNIT)
    sql = f"WITH {TRANSCRIPTS_CTE} SELECT * FROM transcripts"
    assert_oracle_match(df, con, sql, "transcripts")


def test_turn_idx_dense_and_monotone(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = load_transcripts(spark, SF_UNIT)
    w = Window.partitionBy("conv_id").orderBy("ts")
    bad = (
        df.withColumn("rn", F.row_number().over(w) - 1)
        .filter(F.col("rn") != F.col("turn_idx"))
        .count()
    )
    assert bad == 0


def test_generator_deterministic():
    a = generate_transcripts(50, seed=42)
    b = generate_transcripts(50, seed=42)
    assert a.equals(b)
    c = generate_transcripts(50, seed=7)
    assert not a.equals(c)


def test_generator_shape():
    t = generate_transcripts(200, seed=42).to_pandas()
    assert set(t.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert t.groupby("conv_id")["turn_idx"].apply(
        lambda s: (sorted(s) == list(range(len(s))))
    ).all()
    assert set(t["role"].unique()) <= {"user", "assistant", "tool"}
    # every user turn in a conversation is followed by a non-user turn
    assert (t[t.turn_idx % 4 == 2]["role"] == "tool").all()
    # ts non-decreasing within conversation
    assert t.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"].apply(
        lambda s: s.is_monotonic_increasing
    ).all()
