"""Sparse lexical retrieval: BM25 top-k over the document corpus.

The dense side of the retrieval family (ann_topk_*) ranks by embedding
cosine; a training-data pipeline equally needs the sparse side — score
a fixed query set against the corpus with BM25 and keep the top-k
documents per query (contamination auditing, eval-set mining, targeted
corpus slicing). Reference analog: the reference's export surface
filters rows by literal predicates (flag-gated subsets,
/root/reference/cmd/export_ledger_entry_changes.go:23-48); retrieval is
the ranked generalization a text corpus needs.

Exact-oracle discipline: textbook BM25 is ``idf_ln * tf*(k1+1) /
(tf + k1*(1-b+b*dl/avgdl))`` with ``idf_ln = ln((N-df+.5)/(df+.5)+1)``
— ``ln`` is libm-dependent and would break the cross-engine value
oracle (the doc_top_terms linear-idf rationale). With the linear idf
``N/df`` and the standard constants k1 = 6/5, b = 3/4, the whole term
score clears to ONE exact integer ratio::

    score_t = 22*N*tf*L / (df * (10*tf*L + 3*L + 9*dl*N))

(N docs, L total corpus tokens, dl doc length; avgdl = L/N stays a
rational, never a rounded double). Numerator and denominator are
BIGINT-exact at bench scales (~1e12 ≪ 2^63; ANSI mode would error, not
wrap, if violated) — at petabyte N*L magnitudes the same expressions
move to DECIMAL(38,0)/HUGEINT, a type swap, not a formula change. The
per-document score is a sum of such term ratios; double addition is
order-dependent, so both engines fold the SORTED term-score list
sequentially (array_sort + aggregate vs list_sort + list_reduce) — the
kmeans/sq8 deterministic-fold discipline.

Scale notes (100 TB):
* The query set is dimension-sized and broadcast: the corpus explode is
  pruned map-side to query terms BEFORE any shuffle — posting lists are
  built only for terms someone asked about.
* Shuffles: (query, token, doc) tf agg (map-side combine), token df agg
  (vocabulary-sized), (query, doc) fold. No all-pairs anything.
* Top-k is TWO-PHASE: a per-(query, hash-bucket) local top-k bounds the
  rows entering the final per-query window at FANOUT*k, so one hot
  query (a term contained in every doc) cannot funnel the whole corpus
  through a single window partition. Both phases use the same total
  order (score desc, doc_id asc), so the result is identical to the
  single-window oracle for any fanout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import hashing as H

# The fixed query workload: literal, versioned input — like the
# sampling quotas (curation.SAMPLE_PERMILLE), an external configuration
# the operator is a pure function of. Terms drawn from the synthetic
# corpus vocabulary so every query has real candidates, including one
# stopword-heavy query ('the'/'a' have df ~ N, so linear idf ~ 1 — the
# informative terms still dominate the ranking).
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "fast hash join"),
    (2, "window agg stream"),
    (3, "customer order query"),
    (4, "vector scan filter"),
    (5, "the big table sort"),
    (6, "merge batch group a"),
)
BM25_K = 10
# phase-1 local-top-k fanout: candidates are bucketed by hash(doc_id)
# into this many groups per query before the global window
BM25_FANOUT = 64


def query_terms(spark) -> DataFrame:
    """The fixed query workload as a (query_id, token) dimension."""
    tok = H.tokens("text", spark=True)
    queries = spark.createDataFrame(
        list(BM25_QUERIES), "query_id long, qtext string"
    )
    return queries.select(
        "query_id", F.explode(F.expr(tok.replace("text", "qtext"))).alias("token")
    ).distinct()


def bm25_topk(docs: DataFrame, k: int = BM25_K) -> DataFrame:
    """Top-k documents per query by exact-rational BM25.

    Emits (query_id, doc_id, n_terms, bm25, rank): matched query-term
    count, the folded score rounded to 6dp, and the 1-based rank
    (score desc, doc_id asc — fully deterministic)."""
    spark = docs.sparkSession
    tok = H.tokens("text", spark=True)
    qterms = query_terms(spark)

    toks = docs.select("doc_id", F.expr(tok).alias("toks"))
    dls = toks.select(
        "doc_id", F.size("toks").cast("long").alias("dl"), "toks"
    )
    exploded = dls.select("doc_id", "dl", F.explode("toks").alias("token"))
    # broadcast semi-prune: only query terms survive the map side
    tf = (
        exploded.join(F.broadcast(qterms), "token")
        .groupBy("query_id", "token", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # tf feeds both df and the scored fold (the doc_top_terms
    # materialization rationale)
    tf = tf.localCheckpoint(eager=True)
    return score_topk(tf, dls.select("doc_id", "dl"), k)


def score_topk(tf: DataFrame, dls: DataFrame, k: int = BM25_K) -> DataFrame:
    """The scoring/ranking tail over the index tables — shared by the
    batch operator and the streaming fold (streaming/parity.
    streamed_bm25 maintains `tf` and `dls` incrementally and calls this
    at serve time).

    `tf`: (query_id, token, doc_id, dl, tf); `dls`: (doc_id, dl) for
    EVERY corpus doc (N and L are whole-corpus statistics)."""
    # 1-row corpus statistics: N docs, L total tokens (avgdl = L/N kept
    # rational — never a rounded intermediate)
    stats = dls.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    df_tbl = (
        tf.select("token", "doc_id").distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "ts",
            F.expr(
                "CAST(22L * n_docs * tf * total_len AS DOUBLE) / "
                "CAST(df * (10L * tf * total_len + 3L * total_len"
                " + 9L * dl * n_docs) AS DOUBLE)"
            ),
        )
    )
    folded = (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.array_sort(F.collect_list("ts")).alias("tss"),
        )
        .withColumn(
            "score",
            F.expr("aggregate(tss, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"),
        )
    )
    order = [F.desc("score"), F.asc("doc_id")]
    local = Window.partitionBy(
        "query_id", F.pmod(F.hash("doc_id"), F.lit(BM25_FANOUT))
    ).orderBy(*order)
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        folded.withColumn("lr", F.row_number().over(local))
        .filter(F.col("lr") <= k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "n_terms",
            F.round("score", 6).alias("bm25"),
            "rank",
        )
    )


def bm25_oracle(corpus_cte: str, k: int = BM25_K) -> str:
    tok = H.tokens("text", spark=False)
    qtok = tok.replace("text", "qtext")
    qvals = ", ".join(f"({qid}, '{qtext}')" for qid, qtext in BM25_QUERIES)
    return f"""WITH {corpus_cte},
q(query_id, qtext) AS (VALUES {qvals}),
qt AS (
  SELECT DISTINCT query_id, unnest({qtok}) AS token FROM q
),
dls AS (
  SELECT doc_id, CAST(len({tok}) AS BIGINT) AS dl, {tok} AS toks FROM corpus
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_len FROM dls
),
exploded AS (
  SELECT doc_id, dl, unnest(toks) AS token FROM dls
),
tf AS (
  SELECT query_id, token, doc_id, dl, CAST(COUNT(*) AS BIGINT) AS tf
  FROM exploded JOIN qt USING (token)
  GROUP BY query_id, token, doc_id, dl
),
dfs AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY token
),
scored AS (
  SELECT tf.query_id, tf.doc_id,
         CAST(22 * s.n_docs * tf.tf * s.total_len AS DOUBLE) /
         CAST(dfs.df * (10 * tf.tf * s.total_len + 3 * s.total_len
                        + 9 * tf.dl * s.n_docs) AS DOUBLE) AS ts
  FROM tf JOIN dfs USING (token) CROSS JOIN stats s
),
folded AS (
  SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list_sort(list(ts))),
                     (a, b) -> a + b) AS score
  FROM scored GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, n_terms, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS BIGINT) AS rank
  FROM folded
)
SELECT query_id, doc_id, n_terms, ROUND(score, 6) AS bm25, rank
FROM ranked WHERE rank <= {k}
"""
