"""Bucketed storage for shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of every per-conversation operator (session
windows, pair matching, sequences, exchanges) is the shuffle on
conv_id. Storing the transcripts table bucketed by conv_id removes it:
Spark records the bucketing in the catalog, and any join or aggregation
clustered on conv_id reads the buckets as its partitioning — zero
Exchange in the plan (verified by test_bucketed.py, which asserts the
physical plan of a bucketed self-join and a bucketed aggregation
contains no Exchange node).

Reference analog: the datastore layout `LedgersPerFile:1,
FilesPerPartition:64000` (/root/reference/internal/utils/main.go:999-1002)
is the reference's hand-rolled co-location — files grouped so one
worker streams one contiguous ledger range. Bucketing is the
catalog-integrated form: co-location the optimizer can *prove* and
exploit.

Production shape: an Iceberg table with `bucket(N, conv_id)` partition
transform + local sort on (conv_id, turn_idx); this module is the
sandbox stand-in using the session catalog (saveAsTable + bucketBy,
which Spark's FileSourceScanExec honors without any Hive metastore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 16


def save_bucketed_transcripts(
    df: DataFrame,
    table: str = "transcripts_bucketed",
    n_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
) -> None:
    """Persist transcripts bucketed by conv_id, sorted within buckets
    by (conv_id, turn_idx) — the stable turn order pre-materialized, so
    order-sensitive windows start from sorted buckets."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str = "transcripts_bucketed") -> DataFrame:
    return spark.table(table)
