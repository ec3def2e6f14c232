"""Document corpus for the training-data operators.

``load_documents`` reads the driver's ``documents`` table as-is.
``load_corpus`` augments it with deterministic mutations so the dedup
operators have real work to do (the raw synthetic table has no
duplicates): every doc_id % 10 == 0 gains an exact copy (id+10000) and
every doc_id % 10 == 1 gains a near-duplicate (id+20000) with every
7th word dropped. The mutation is pure SQL, shared verbatim with the
DuckDB oracle via ``CORPUS_CTE`` — the same pattern as
``sources/transcripts.TRANSCRIPTS_CTE`` (reference analog: tests
rebuild inputs from committed fixtures, /root/reference/internal/
transform/test_variables_test.go).

Scale notes: the union is two narrow maps over the scan — no shuffle.
At 100 TB the "mutation" branch disappears and the operators run on
the raw corpus; partition layout (files) carries straight through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import hashing as H

# Spark-side word-drop: 0-based lambda index i -> keep positions where
# (i+1) % 7 != 0. DuckDB list_filter index is 1-based -> i % 7 != 0.
_SPARK_DROP7 = (
    "concat_ws(' ', filter({tok}, (t, i) -> (i + 1) % 7 != 0))"
)
_DUCK_DROP7 = "array_to_string(list_filter({tok}, (t, i) -> i % 7 != 0), ' ')"


def corpus_cte() -> str:
    tok = H.tokens("text", spark=False)
    drop7 = _DUCK_DROP7.format(tok=tok)
    return f"""
corpus AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text, lang, source
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 20000 AS doc_id,
         COALESCE({drop7}, '') AS text,
         lang, source
  FROM documents WHERE doc_id % 10 = 1
)
"""


CORPUS_CTE = corpus_cte()


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_documents(spark, sf_dir).select("doc_id", "text", "lang", "source")
    tok = H.tokens("text", spark=True)
    exact = (
        base.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 10000)
    )
    near = (
        base.filter(F.col("doc_id") % 10 == 1)
        .withColumn("doc_id", F.col("doc_id") + 20000)
        .withColumn("text", F.expr(_SPARK_DROP7.format(tok=tok)))
    )
    return base.unionByName(exact).unionByName(near)


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the vector cast to array<double> (exact widening
    from float; keeps all downstream folds bit-comparable)."""
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label")
    )


# DuckDB mirror: vectors widened to DOUBLE[] the same way.
EMB_CTE = """
emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
)
"""
