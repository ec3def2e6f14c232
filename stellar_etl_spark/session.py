"""SparkSession factory.

One place for every scale-relevant config:
  * AQE on (runtime re-plan, skew-join splitting, partition coalescing)
  * Arrow on (vectorized pandas UDFs; the engine never runs per-row Python)
  * UTC session timezone (parity with the reference's UTC timestamps,
    /root/reference/internal/utils/main.go:41-47 TimePointToUTCTimeStamp)
  * shuffle partitions sized to cores locally; on a real cluster this is
    superseded by AQE's coalescing + advisory partition size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from stellar_etl_spark.config import DEFAULT, EngineConfig


def get_spark(cfg: EngineConfig = DEFAULT, app_name: str = "stellar_etl_spark") -> SparkSession:
    builder = (
        SparkSession.builder.master(cfg.master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # at 100 TB: bound per-task input so scan tasks stay ~128 MB
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # streaming state store: RocksDB would be the cluster choice; the
        # bundled HDFS-backed store is fine for local correctness runs.
        .config("spark.sql.streaming.stateStore.stateSchemaCheck", "true")
    )
    for k, v in cfg.extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from stellar_etl_spark.deploy import ship_package

    ship_package(spark)  # --py-files equivalent: workers can import us
    return spark
