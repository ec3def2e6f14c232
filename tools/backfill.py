"""Column backfill over the bucketed store: an epoch-stamped rewrite.

Reference analog: stellar-etl's ``docs/backfill.md`` patches exported
BigQuery tables with JS UDF column rewrites after a re-export. Here the
same operation is a Spark-native staged rewrite over the bucketed
transcripts store (sources/bucketed.py):

  1. read the CURRENT epoch of the table,
  2. recompute ONE column with a SQL expression (optionally gated by a
     row predicate — untouched rows pass through byte-identical),
  3. write the full table to a NEW epoch-stamped bucketed table
     ``<table>__e<N>`` with the SAME bucketing/sort spec (bucket
     co-location — and therefore every downstream shuffle-free plan —
     survives the patch),
  4. atomically repoint the serving view ``<table>_current`` at the new
     epoch (CREATE OR REPLACE VIEW is the catalog commit point; a crash
     before it leaves the old epoch serving, exactly like the epoch
     sink's manifest rename, streaming/sink.py).

Prior epochs are retained for audit/rollback (``rollback`` repoints the
view); ``list_epochs`` enumerates them. Re-running the same patch over
the same epoch is deterministic: every derived value is a pure function
of the input row, so the rewrite is idempotent in content.

On an Iceberg deployment this whole module collapses to
``MERGE INTO ... WHEN MATCHED THEN UPDATE SET col = expr`` with
snapshot-based rollback; the staged-view protocol here keeps the same
semantics self-contained in the sandbox catalog.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellar_etl_spark.sources.bucketed import DEFAULT_BUCKETS

_EPOCH_RE = re.compile(r"__e(\d+)$")


def _epoch_table(table: str, epoch: int) -> str:
    return f"{table}__e{epoch}"


def list_epochs(spark: SparkSession, table: str) -> list[int]:
    """Epoch numbers that exist for `table`, ascending."""
    rows = spark.sql(f"SHOW TABLES LIKE '{table}__e*'").collect()
    out = []
    for r in rows:
        m = _EPOCH_RE.search(r.tableName)
        if m and r.tableName == _epoch_table(table, int(m.group(1))):
            out.append(int(m.group(1)))
    return sorted(out)


def current_epoch(spark: SparkSession, table: str) -> int | None:
    eps = list_epochs(spark, table)
    return eps[-1] if eps else None


def _serving_view(table: str) -> str:
    return f"{table}_current"


def _repoint(spark: SparkSession, table: str, epoch: int) -> None:
    spark.sql(
        f"CREATE OR REPLACE VIEW {_serving_view(table)} AS "
        f"SELECT * FROM {_epoch_table(table, epoch)}"
    )


def init_store(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    n_buckets: int = DEFAULT_BUCKETS,
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    bucket_col: str = "conv_id",
) -> None:
    """Seed epoch 0 of a bucketed store and point the serving view at
    it."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(_epoch_table(table, 0))
    )
    _repoint(spark, table, 0)


def read_current(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(_serving_view(table))


def backfill_column(
    spark: SparkSession,
    table: str,
    column: str,
    expr_sql: str,
    where_sql: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    bucket_col: str = "conv_id",
) -> int:
    """Patch `column` of the bucketed store with `expr_sql` (a SQL
    expression over the row's existing columns), restricted to rows
    matching `where_sql` (all rows if None). Returns the new epoch id.

    The rewrite reads the CURRENT epoch (never partial state), writes
    the patched table as the next epoch with identical bucketing, and
    commits by repointing the serving view — readers see either the
    whole old epoch or the whole new one.
    """
    cur = current_epoch(spark, table)
    if cur is None:
        raise ValueError(f"no epochs found for table {table!r}; init_store first")
    src = spark.table(_epoch_table(table, cur))
    if column not in src.columns:
        raise ValueError(f"column {column!r} not in {src.columns}")
    patched_val = F.expr(expr_sql)
    if where_sql is not None:
        patched_val = F.when(F.expr(where_sql), patched_val).otherwise(
            F.col(column)
        )
    patched = src.withColumn(column, patched_val.cast(src.schema[column].dataType))
    new_epoch = cur + 1
    (
        patched.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(_epoch_table(table, new_epoch))
    )
    # sanity gate before the commit point: a patch never changes row count
    n_src = src.count()
    n_new = spark.table(_epoch_table(table, new_epoch)).count()
    if n_new != n_src:
        raise RuntimeError(
            f"backfill row-count mismatch ({n_src} -> {n_new}); "
            f"epoch {new_epoch} left UNCOMMITTED (view still serves {cur})"
        )
    _repoint(spark, table, new_epoch)
    return new_epoch


def rollback(spark: SparkSession, table: str, epoch: int) -> None:
    """Repoint the serving view at a prior retained epoch."""
    if epoch not in list_epochs(spark, table):
        raise ValueError(f"epoch {epoch} does not exist for {table!r}")
    _repoint(spark, table, epoch)


def vacuum(spark: SparkSession, table: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest `keep_last` epochs (never the serving
    one). Returns the dropped epoch ids."""
    eps = list_epochs(spark, table)
    drop = eps[:-keep_last] if keep_last > 0 else eps
    for e in drop:
        spark.sql(f"DROP TABLE IF EXISTS {_epoch_table(table, e)}")
    return drop
