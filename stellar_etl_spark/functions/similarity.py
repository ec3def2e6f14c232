"""Approximate nearest-neighbor search over the embeddings table.

Two variants over `embeddings(vec_id, embedding float[64], label)`:

* `ann_bruteforce`: exact cosine top-k for a query set — the
  correctness baseline. The query side is tiny and broadcast; the
  candidate side streams — at 100 TB this is one pass over the corpus
  per query batch, no shuffle except the final top-k per query
  (bounded: k rows per query per partition after partial ranking).
* `ann_lsh`: multi-table random-hyperplane LSH (ANN_TABLES tables x
  N_PLANES gaussian planes -> 256 buckets each) — the scale path.
  Candidates are the union of per-table bucket matches (a pair
  collides if ANY table agrees), so recall compounds across tables
  (1-(1-p^8)^4) while corpus-side work stays a hash partition on the
  bucket key instead of a full scan per query; the verifier is the
  same exact cosine ranking. At 100 TB, planes-per-table grows with
  log2(N) and table count with the recall target — the knobs, not the
  algorithm, change.

Cosine values are sequential double folds (`hashing.dot_fold`), so the
DuckDB oracle reproduces them bit-exactly, incl. rank ties broken by
vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import hashing as H

N_QUERIES = 8
TOP_K_BRUTE = 10
TOP_K_LSH = 5
ANN_TABLES = 4


def _bucket_expr(emb: str, spark: bool, table: int = 0) -> str:
    """LSH bucket id of one table: bit p set iff dot(v, plane) > 0,
    planes drawn from the deterministic gaussian family
    (hashing.lsh_plane), disjoint per table."""
    terms = []
    for p in range(H.N_PLANES):
        j = table * H.N_PLANES + p
        dot = H.dot_fold(emb, H.plane_literal(j, spark), spark)
        terms.append(f"CASE WHEN {dot} > 0 THEN {2 ** p} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def ann_bruteforce(emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K_BRUTE) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries (broadcast),
    rank over all other vectors; ties broken by vec_id."""
    withn = emb.withColumn("nrm", F.expr(H.norm_fold("emb", spark=True)))
    q = F.broadcast(
        withn.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"), F.col("nrm").alias("qn")
        )
    )
    c = withn.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("ce"), F.col("nrm").alias("cn")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim", F.expr(f"{H.dot_fold('qe', 'ce', spark=True)} / (sqrt(qn) * sqrt(cn))")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"),
                F.col("rank").cast("long").alias("rank"))
    )


def ann_bruteforce_oracle(emb_cte: str, n_queries: int = N_QUERIES, k: int = TOP_K_BRUTE) -> str:
    dot = H.dot_fold("q.emb", "c.emb", spark=False)
    nf = H.norm_fold("emb", spark=False)
    return f"""WITH {emb_cte},
nrms AS (SELECT vec_id, emb, {nf} AS nrm FROM emb),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {dot} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos_sim
  FROM nrms q JOIN nrms c ON q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def ann_lsh(emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K_LSH) -> DataFrame:
    """Multi-table LSH ANN: a candidate shares the query's sign bucket
    in >= 1 of ANN_TABLES tables; exact cosine rank over the candidate
    union. The tiny bucketed query side broadcasts; the corpus explodes
    to one row per (table, bucket) and equi-joins on the bucket key."""
    bucketed = emb.withColumn("nrm", F.expr(H.norm_fold("emb", spark=True)))
    for t in range(ANN_TABLES):
        bucketed = bucketed.withColumn(
            f"b{t}", F.expr(_bucket_expr("emb", spark=True, table=t))
        )
    tb = F.explode(
        F.array(
            *[
                F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bk"))
                for t in range(ANN_TABLES)
            ]
        )
    ).alias("tb")
    q = F.broadcast(
        bucketed.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            F.col("nrm").alias("qn"),
            tb,
        )
        .select("query_id", "qe", "qn", "tb.t", "tb.bk")
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("ce"),
        F.col("nrm").alias("cn"),
        tb,
    ).select("neighbor_id", "ce", "cn", F.col("tb.t").alias("ct"), F.col("tb.bk").alias("cbk"))
    cand = (
        q.join(c, (F.col("t") == F.col("ct")) & (F.col("bk") == F.col("cbk")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qe", "qn", "neighbor_id", "ce", "cn")
        .distinct()
    )
    scored = cand.withColumn(
        "cos_sim", F.expr(f"{H.dot_fold('qe', 'ce', spark=True)} / (sqrt(qn) * sqrt(cn))")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"),
                F.col("rank").cast("long").alias("rank"))
    )


def ann_lsh_oracle(emb_cte: str, n_queries: int = N_QUERIES, k: int = TOP_K_LSH) -> str:
    dot = H.dot_fold("q.emb", "c.emb", spark=False)
    nf = H.norm_fold("emb", spark=False)
    bucket_cols = ",\n             ".join(
        f"{_bucket_expr('emb', spark=False, table=t)} AS b{t}" for t in range(ANN_TABLES)
    )
    any_match = " OR ".join(f"q.b{t} = c.b{t}" for t in range(ANN_TABLES))
    return f"""WITH {emb_cte},
bucketed AS (SELECT vec_id, emb, {nf} AS nrm,
             {bucket_cols}
             FROM emb),
scored AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {dot} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos_sim
  FROM bucketed q JOIN bucketed c
    ON q.vec_id < {n_queries} AND c.vec_id <> q.vec_id AND ({any_match})
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
