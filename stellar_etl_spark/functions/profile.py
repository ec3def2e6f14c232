"""Corpus data profiling: per-column statistics in one pass.

The ANALYZE / stats-collection analog every ingest pipeline runs before
trusting a new drop of data: row count, null count, exact distinct
count, and min/max per column, emitted as one row per column.
Reference analog: the reference asserts per-table field shapes in its
golden transform tests (/root/reference/internal/transform/*_test.go);
a profiling operator turns those expectations into queryable data.

Exact-oracle discipline: min/max are computed on the NATIVE type and
cast to string afterwards (string-ordering min of a bigint column is a
different, wrong answer), bigint→varchar rendering is identical across
engines, and string comparisons are binary/UTF-8 in both Spark
(UTF8_BINARY) and DuckDB (binary collation) — no doubles anywhere in
the profiled schema, so no float-formatting divergence.

Scale notes (100 TB): ONE aggregation pass, map-side combined; the
multiple exact COUNT(DISTINCT) aggregates make Catalyst plan an Expand
(rows x #distinct-aggs) before the shuffle — the honest exact form. At
petabyte row counts swap each countDistinct for approx_count_distinct
(HLL, already shipped in functions/sketch.py) — a one-line change per
column; exact is kept here because it is the value the DuckDB oracle
can check. The final unpivot is row-local (explode over a 4-element
literal array on a 1-row frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_COLUMNS = ("doc_id", "text", "lang", "source")


def corpus_profile(docs: DataFrame) -> DataFrame:
    """One row per corpus column: (column_name, n_rows, n_null,
    n_distinct, min_value, max_value)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in PROFILE_COLUMNS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__n_null"),
            F.countDistinct(c).cast("long").alias(f"{c}__n_distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = docs.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in PROFILE_COLUMNS
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def corpus_profile_oracle(corpus_cte: str) -> str:
    arms = []
    for c in PROFILE_COLUMNS:
        arms.append(
            f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM corpus"""
        )
    body = "\nUNION ALL\n".join(arms)
    return f"WITH {corpus_cte}\n{body}\n"
