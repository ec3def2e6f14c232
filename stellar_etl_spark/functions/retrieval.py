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


# --- two-stage retrieval: lexical recall -> semantic rerank ------------------

# query-by-document workload: the first N docs are the queries (the
# ann_* convention), candidates recalled lexically, reranked by exact
# embedding cosine. The production RAG/curation funnel shape: a cheap
# high-recall stage bounds the candidate set, the expensive high-
# precision stage runs only on survivors.
RERANK_QUERIES = 8
RERANK_CAND = 50   # stage-1 survivors per query
RERANK_K = 10      # final neighbors per query
RERANK_FANOUT = 64


def retrieve_rerank(
    docs: DataFrame,
    emb: DataFrame,
    n_queries: int = RERANK_QUERIES,
    cand: int = RERANK_CAND,
    k: int = RERANK_K,
) -> DataFrame:
    """Related-document search over the PURE corpus (doc_id == vec_id
    row alignment): stage 1 recalls by distinct 3-gram SHINGLE overlap
    through the df-capped inverted index (dedup._hashes_df — the
    ngram_jaccard signature machinery; single-token overlap is useless
    on a small vocabulary where every token blows past any df cap);
    stage 2 reranks the <= cand survivors per query by exact embedding
    cosine (hashing.dot_fold — the bit-identical sequential fold the
    ann_* family uses).

    Scale notes (100 TB): the index join touches only df-capped
    shingles (per-shingle fan-out bounded by dedup.DF_CAP, stop-
    shingles dropped); stage-1 top-cand is TWO-PHASE (per-(query,
    hash-bucket) local window first, the BM25 machinery) so a hot
    query cannot funnel its whole posting universe through one window
    partition; stage 2 joins a candidate-sized set against the
    embeddings table (broadcast candidates, no corpus scan, no
    all-pairs)."""
    from stellar_etl_spark.functions.dedup import DF_CAP, _hashes_df

    ex = _hashes_df(docs).select("doc_id", F.explode("hs").alias("h"))
    dfh = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    keep = dfh.filter((F.col("df") >= 2) & (F.col("df") <= DF_CAP)).select("h")
    kept = ex.join(keep, "h")
    qsh = F.broadcast(
        kept.filter(F.col("doc_id") < n_queries).select(
            F.col("doc_id").alias("query_id"), "h"
        )
    )
    ov = (
        kept.join(qsh, "h")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    order1 = [F.desc("overlap"), F.asc("doc_id")]
    local = Window.partitionBy(
        "query_id", F.pmod(F.hash("doc_id"), F.lit(RERANK_FANOUT))
    ).orderBy(*order1)
    glob = Window.partitionBy("query_id").orderBy(*order1)
    sel = (
        ov.withColumn("lr", F.row_number().over(local))
        .filter(F.col("lr") <= cand)
        .withColumn("crank", F.row_number().over(glob))
        .filter(F.col("crank") <= cand)
        .select("query_id", "doc_id", "overlap")
    )

    withn = emb.withColumn("nrm", F.expr(H.norm_fold("emb", spark=True)))
    qe = F.broadcast(
        withn.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            F.col("nrm").alias("qn"),
        )
    )
    ce = withn.select(
        F.col("vec_id").alias("doc_id"),
        F.col("emb").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        ce.join(F.broadcast(sel), "doc_id")
        .join(qe, "query_id")
        .withColumn(
            "cos_sim",
            F.expr(f"{H.dot_fold('qe', 'ce', spark=True)} / (sqrt(qn) * sqrt(cn))"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "overlap",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def retrieve_rerank_oracle(
    emb_cte: str,
    n_queries: int = RERANK_QUERIES,
    cand: int = RERANK_CAND,
    k: int = RERANK_K,
) -> str:
    """DuckDB mirror over the raw `documents` view + emb CTE. The
    stage-1 window is single-pass here: the Spark two-phase local/global
    pair shares one total order, so the results are identical."""
    from stellar_etl_spark.functions.dedup import DF_CAP, _hashes_expr

    hs = _hashes_expr(False)
    dot = H.dot_fold("qe.emb", "ce.emb", spark=False)
    nf = H.norm_fold("emb", spark=False)
    return f"""WITH {emb_cte},
hsets AS (SELECT doc_id, {hs} AS hs FROM documents),
ex AS (SELECT doc_id, UNNEST(hs) AS h FROM hsets WHERE len(hs) > 0),
dfh AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {DF_CAP}),
kept AS (SELECT ex.doc_id, ex.h FROM ex JOIN dfh ON ex.h = dfh.h),
ov AS (
  SELECT q.doc_id AS query_id, d.doc_id, COUNT(*) AS overlap
  FROM kept q JOIN kept d ON q.h = d.h AND d.doc_id <> q.doc_id
  WHERE q.doc_id < {n_queries}
  GROUP BY q.doc_id, d.doc_id
),
sel AS (
  SELECT query_id, doc_id, overlap,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY overlap DESC, doc_id) AS crank
  FROM ov
),
nrms AS (SELECT vec_id, emb, {nf} AS nrm FROM emb),
scored AS (
  SELECT s.query_id, s.doc_id, s.overlap,
         {dot} / (sqrt(qe.nrm) * sqrt(ce.nrm)) AS cos_sim
  FROM sel s
  JOIN nrms qe ON qe.vec_id = s.query_id
  JOIN nrms ce ON ce.vec_id = s.doc_id
  WHERE s.crank <= {cand}
),
ranked AS (
  SELECT query_id, doc_id, overlap, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, doc_id, CAST(overlap AS BIGINT) AS overlap,
       ROUND(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
