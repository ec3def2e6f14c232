"""Corpus curation operators: deterministic stratified sampling and
per-document salient-term extraction (tf-idf top-k).

Reference analog: the reference curates its export surface with
row-local predicates and flag-gated subsets (e.g. the export-type
flags in /root/reference/cmd/export_ledger_entry_changes.go:23-48 and
the asset sizing assumptions in cmd/export_assets.go:98-101); a
training-data pipeline needs the same idea as *statistical* gates:
reproducible per-stratum sampling quotas and per-document keyword
signals. Both are pure DataFrame ops with exact DuckDB value oracles
(the sampling gate is a portable polynomial hash, the tf-idf score is
integer arithmetic until one final double division).

Scale notes (100 TB):
* ``stratified_sample`` is a narrow per-row map + filter — no shuffle,
  no RNG state, no driver coordination. The gate hashes (doc_id, lang)
  so the SAME doc set is sampled on any cluster size, any partitioning,
  any re-run — reproducibility is what separates a curation pipeline
  from `TABLESAMPLE`. Changing a stratum's rate only grows/shrinks that
  stratum monotonically (hash-threshold property), so quota tuning
  never resamples the corpus.
* ``doc_top_terms`` shuffles once on (doc_id, token) for tf (map-side
  combine), once on token for df (vocabulary-sized — orders of
  magnitude smaller than the corpus), and once on doc_id for the
  per-doc top-k; the df side of the join is dimension-like and
  AQE-broadcastable. No all-pairs anything; idf is linear (tf * N / df)
  rather than log(N/df) because ln() is libm-dependent and would break
  the cross-engine value oracle — rank order per doc is preserved for
  any monotone idf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import hashing as H

# Per-language sampling quota in permille of the stratum. Deterministic
# hash-threshold gate: doc sampled iff gate(doc_id, lang) < permille.
SAMPLE_PERMILLE = {"en": 150, "de": 400, "es": 400, "fr": 500, "zh": 300}
SAMPLE_DEFAULT_PERMILLE = 100
TOP_TERMS_K = 3


def _gate_expr(spark: bool) -> str:
    """Sampling gate in [0, 1000): polynomial hash of 'doc_id:lang'.

    Hashing the (id, stratum) pair — not the row position or an RNG —
    makes the sample a pure function of the data: stable across
    partitionings, cluster sizes and re-runs, and join-consistent
    (any table keyed by doc_id can reconstruct membership)."""
    cast = "STRING" if spark else "VARCHAR"
    key = f"concat(CAST(doc_id AS {cast}), ':', lang)"
    return f"({H.char_hash(key, spark)}) % 1000"


def _rate_case(spark: bool) -> str:
    arms = " ".join(
        f"WHEN '{lang}' THEN {pm}" for lang, pm in sorted(SAMPLE_PERMILLE.items())
    )
    return f"CASE lang {arms} ELSE {SAMPLE_DEFAULT_PERMILLE} END"


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic per-language quota sample of the corpus.

    Emits the sampled rows with their gate value and the stratum rate
    that admitted them — the audit columns a curation pipeline keeps so
    downstream consumers can verify membership without re-hashing."""
    gate = F.expr(_gate_expr(spark=True))
    rate = F.expr(_rate_case(spark=True))
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            gate.cast("long").alias("sample_gate"),
            rate.cast("long").alias("rate_permille"),
        )
        .filter(F.col("sample_gate") < F.col("rate_permille"))
    )


def stratified_sample_oracle(corpus_cte: str) -> str:
    gate = _gate_expr(spark=False)
    rate = _rate_case(spark=False)
    return f"""WITH {corpus_cte},
gated AS (
  SELECT doc_id, lang, source,
         CAST({gate} AS BIGINT) AS sample_gate,
         CAST({rate} AS BIGINT) AS rate_permille
  FROM corpus
)
SELECT doc_id, lang, source, sample_gate, rate_permille
FROM gated WHERE sample_gate < rate_permille
"""


def doc_top_terms(docs: DataFrame, k: int = TOP_TERMS_K) -> DataFrame:
    """Per-document top-k tokens by tf-idf (linear idf: tf * N / df).

    tf = token occurrences in the doc, df = number of docs containing
    the token, N = corpus size. Score arithmetic stays in BIGINT until
    one final double division, so the oracle matches bit-for-bit; ties
    broken by token ascending."""
    tok = H.tokens("text", spark=True)
    exploded = docs.select(
        "doc_id", F.explode(F.expr(tok)).alias("token")
    )
    tf = exploded.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_tbl = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    scored = (
        tf.join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "token", "tf", "df", "tfidf", "term_rank")
    )


def doc_top_terms_oracle(corpus_cte: str, k: int = TOP_TERMS_K) -> str:
    tok = H.tokens("text", spark=False)
    return f"""WITH {corpus_cte},
exploded AS (
  SELECT doc_id, unnest({tok}) AS token FROM corpus
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM exploded GROUP BY doc_id, token
),
dfs AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM corpus),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfs.df,
         ROUND(CAST(tf.tf * n.n_docs AS DOUBLE) / dfs.df, 6) AS tfidf
  FROM tf JOIN dfs USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tf, df, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, token) AS BIGINT) AS term_rank
  FROM scored
)
SELECT doc_id, token, tf, df, tfidf, term_rank
FROM ranked WHERE term_rank <= {k}
"""
