"""stellar_etl_spark — a PySpark-native structured-streaming / CEP engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``chowbao/stellar-etl`` (reference at /root/reference,
a Go batch/streaming export pipeline) as an idiomatic PySpark engine
over transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``.

Conceptual graft (SURVEY.md):
  ledger close            -> session-window close (gap-based per conv_id)
  transaction within ledger -> conversation turn
  TOID total order        -> packed ``turn_id`` (ids.py)
  export_X commands       -> one rollup query per output table (operators/)
  change stream + compactor -> Structured Streaming + per-key state
  JSONL/parquet + GCS upload -> exactly-once table sink, commit-per-epoch
"""

__version__ = "0.1.0"

from stellar_etl_spark.config import EngineConfig
from stellar_etl_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark", "__version__"]
