"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing.

These extend the transcript engine with the operations a large-scale
(100 TB) training-data pipeline needs. Every operator is expressed
twice from one source of truth (`hashing.py` dialect builders):

* a Spark plan (DataFrame ops + ``F.expr`` over Spark-SQL higher-order
  functions — JVM-side, whole-stage codegen, no per-row Python), and
* a DuckDB oracle SQL string computing bit-identical values, so the
  driver's value-hash comparison is exact (integer hashes are modular
  arithmetic; doubles are sequential left folds, identical in IEEE754).
"""
