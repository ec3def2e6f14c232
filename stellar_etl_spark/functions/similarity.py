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
# IVF coarse quantizer: centroids = corpus rows with
# vec_id % mod == IVF_CENT_RESIDUE % mod, where mod = floor(sqrt(N))
# (data-adaptive: C ~ sqrt(N) lists, so assignment work is N*sqrt(N)
# dots and per-query probe work is nprobe*sqrt(N) — the classic IVF
# sizing; a corpus-linear C would make assignment quadratic). sqrt is
# IEEE-correctly-rounded in both engines, so the Spark-side Python
# floor(sqrt(count)) and the oracle's FLOOR(SQRT(COUNT(*))) agree
# exactly. Queries probe their IVF_NPROBE nearest lists.
TOP_K_IVF = 5
IVF_NPROBE = 4
IVF_CENT_RESIDUE = 7


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


def ann_ivf(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K_IVF,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path.

    Every vector is assigned to its nearest "centroid" (argmax cosine,
    ties by centroid id); a query probes its ``nprobe`` nearest
    centroid lists and ranks exact cosine over only those lists'
    members. Centroids here are the deterministic subset
    ``vec_id % IVF_CENT_MOD == IVF_CENT_RESIDUE`` — corpus-sampled
    seeds, the zero-iteration special case of k-means (production runs
    Lloyd iterations on the same assignment plan; the plan shape below
    is identical per iteration and the oracle stays exact because
    seeding is data-deterministic, not RNG).

    Scale shape (100 TB): the centroid table is ~sqrt(N) rows and
    broadcast; assignment is a broadcast nested-loop over C centroids
    + ONE hash aggregation on vec_id via min_by (map-side combine, no
    window sort over the corpus) — N*sqrt(N) dots total; the candidate
    join shuffles on the centroid-list id only — per-query work is
    nprobe/C of the corpus instead of all of it (the brute baseline).
    recall knob = nprobe, memory knob = C ~ sqrt(N). The count() for
    the adaptive modulus is a 1-row scalar, not a corpus collect."""
    import math

    mod = max(1, math.floor(math.sqrt(emb.count())))
    withn = emb.withColumn("nrm", F.expr(H.norm_fold("emb", spark=True)))
    cents = F.broadcast(
        withn.filter(
            F.col("vec_id") % mod == IVF_CENT_RESIDUE % mod
        ).select(
            F.col("vec_id").alias("cent_id"),
            F.col("emb").alias("cemb"),
            F.col("nrm").alias("cnrm"),
        )
    )
    cos = F.expr(
        f"{H.dot_fold('emb', 'cemb', spark=True)} / (sqrt(nrm) * sqrt(cnrm))"
    )
    scored_cents = withn.crossJoin(cents).withColumn("ccos", cos)
    # corpus-side assignment: ONE aggregation, no corpus-wide window
    assign = scored_cents.groupBy("vec_id").agg(
        F.min_by(
            F.col("cent_id"), F.struct((-F.col("ccos")).alias("nc"), F.col("cent_id"))
        ).alias("list_id")
    )
    # query-side probes: tiny (n_queries x C), window rank is fine
    wq = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
    probes = (
        scored_cents.filter(F.col("vec_id") < n_queries)
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("list_id"))
    )
    q = F.broadcast(
        withn.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            F.col("nrm").alias("qn"),
        )
    )
    members = withn.join(assign, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("ce"),
        F.col("nrm").alias("cn"),
        "list_id",
    )
    cand = (
        F.broadcast(probes).join(members, "list_id")
        .join(q, "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
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


def ann_ivf_oracle(
    emb_cte: str,
    n_queries: int = N_QUERIES,
    k: int = TOP_K_IVF,
    nprobe: int = IVF_NPROBE,
) -> str:
    dotc = H.dot_fold("v.emb", "c.emb", spark=False)
    dotq = H.dot_fold("q.emb", "m.emb", spark=False)
    nf = H.norm_fold("emb", spark=False)
    return f"""WITH {emb_cte},
nrms AS (SELECT vec_id, emb, {nf} AS nrm FROM emb),
m AS (SELECT GREATEST(1, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS md FROM emb),
cents AS (SELECT vec_id AS cent_id, emb, nrm FROM nrms, m
          WHERE vec_id % m.md = {IVF_CENT_RESIDUE} % m.md),
scored_cents AS (
  SELECT v.vec_id, c.cent_id,
         {dotc} / (sqrt(v.nrm) * sqrt(c.nrm)) AS ccos
  FROM nrms v CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT vec_id, cent_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cent_id) AS rn
    FROM scored_cents
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cent_id AS list_id FROM (
    SELECT vec_id, cent_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cent_id) AS pr
    FROM scored_cents WHERE vec_id < {n_queries}
  ) WHERE pr <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.list_id = p.list_id
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT cd.query_id, cd.neighbor_id,
         {dotq} / (sqrt(q.nrm) * sqrt(m.nrm)) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY cd.query_id
                            ORDER BY {dotq} / (sqrt(q.nrm) * sqrt(m.nrm)) DESC,
                                     cd.neighbor_id) AS rank
  FROM cand cd
  JOIN nrms q ON q.vec_id = cd.query_id
  JOIN nrms m ON m.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


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


# --- int8 scalar-quantized ANN -----------------------------------------------

SQ_SCALE = 127
TOP_K_SQ8 = 10


def _q8_expr(emb: str, spark: bool) -> str:
    """L2-normalize then quantize each dimension to the int8 lattice
    (round(v/||v|| * 127) ∈ [-127, 127]). Per-element IEEE ops only
    (sqrt, one divide, round) — deterministic in both dialects; the
    round() half-away-from-zero agreement is the same contract
    lang_centroids already relies on."""
    nf = H.norm_fold(emb, spark)
    if spark:
        return (
            f"transform({emb}, v -> cast(round(v / sqrt({nf}) * {SQ_SCALE}) as bigint))"
        )
    return (
        f"list_transform({emb}, v -> CAST(ROUND(v / sqrt({nf}) * {SQ_SCALE}) AS BIGINT))"
    )


def _int_dot(a: str, b: str, spark: bool, dim: int = H.EMB_DIM) -> str:
    """Integer dot product of two ARRAY<BIGINT> — products are ≤ 127²
    and the 64-dim sum stays ≪ 2^53, so the value is exact under ANY
    summation order (unlike the double folds, no order pinning needed;
    we pin anyway for uniformity)."""
    if spark:
        return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                f"cast(0 as bigint), (acc, v) -> acc + v)")
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(generate_series(1, {dim}), i -> {a}[i] * {b}[i])), "
            f"(acc, v) -> acc + v)")


def ann_sq8(emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K_SQ8) -> DataFrame:
    """Scalar-quantized (int8) brute-force top-k: the serving-memory
    variant of ann_bruteforce — 4x smaller vectors, integer dot
    products, identical scan shape. At 100 TB this is the standard
    bandwidth trade: the quantized corpus fits in a quarter of the
    memory/IO, the int8 dot is SIMD-friendly, and re-ranking the
    shortlist with full-precision vectors (compose with ann_bruteforce
    on the candidates) recovers exact order when needed. Ranking is by
    integer dot with vec_id tie-break, so the whole operator is exact
    integer arithmetic after the deterministic per-element quantization
    — the oracle matches values, not tolerances."""
    q8 = F.expr(_q8_expr("emb", spark=True))
    quant = emb.select("vec_id", q8.alias("q8"))
    q = F.broadcast(
        quant.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("q8").alias("qe")
        )
    )
    c = quant.select(F.col("vec_id").alias("neighbor_id"), F.col("q8").alias("ce"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("qdot", F.expr(_int_dot("qe", "ce", spark=True)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("qdot").cast("long").alias("qdot"),
                F.col("rank").cast("long").alias("rank"))
    )


def ann_sq8_oracle(emb_cte: str, n_queries: int = N_QUERIES, k: int = TOP_K_SQ8) -> str:
    q8 = _q8_expr("emb", spark=False)
    dot = _int_dot("q.q8", "c.q8", spark=False)
    return f"""WITH {emb_cte},
quant AS (SELECT vec_id, {q8} AS q8 FROM emb),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {dot} AS qdot
  FROM quant q JOIN quant c ON q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, qdot,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY qdot DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(qdot AS BIGINT) AS qdot, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --- hierarchical IVF (two-level coarse quantizer) ---------------------------

IVF2_ROUTE = 2  # coarse cells probed per vector during assignment
IVF2_COARSE_RESIDUE = 3  # deterministic coarse-seed residue


def ann_ivf2(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K_IVF,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Hierarchical IVF — the assignment-scalability fix for ann_ivf
    (VERDICT r04 "Next round" #7).

    ann_ivf's corpus-side assignment scores every vector against all
    C ~ sqrt(N) fine centroids: N^1.5 dots total, which is exactly why
    its 100x wall ratio (23.7, SCALE_EMBED_100X.json) towers over the
    rest of the ANN family — at 100x replicas the assignment dot count
    grows 1000x. This variant routes assignment through a second-level
    COARSE quantizer: C0 ~ sqrt(C) ~ N^(1/4) coarse seeds (the same
    deterministic residue sampling applied to the fine seeds); each
    fine centroid belongs to its nearest coarse seed; a vector scores
    the C0 coarse seeds, takes its IVF2_ROUTE best cells, and scores
    only those cells' fine centroids. Total assignment work is
    N*(C0 + ROUTE*C/C0) ~ N^1.25 dots — the classical IVF train-time
    hierarchy, relationally. Assignment becomes approximate in the
    standard way (the true nearest fine centroid can sit in an
    unrouted coarse cell); the rule stays fully deterministic
    ((-cos, id) ordering on bit-identical fold arithmetic), so the
    DuckDB oracle mirrors it exactly and the gate stays value-exact.
    Query-side probing is unchanged (n_queries x C is negligible), so
    recall behavior differs from ann_ivf only through assignment.

    Scale shape (100 TB): coarse seeds and the fine->coarse map are
    both broadcast (C0 and C rows); routing is one broadcast
    nested-loop + a per-vector top-ROUTE fold over C0-sized collected
    arrays (no corpus-wide window); candidate scoring shuffles on
    nothing new — the only per-vector state is ROUTE routed cells."""
    import math

    n = emb.count()
    mod = max(1, math.floor(math.sqrt(n)))
    withn = emb.withColumn("nrm", F.expr(H.norm_fold("emb", spark=True)))
    cents = withn.filter(
        F.col("vec_id") % mod == IVF_CENT_RESIDUE % mod
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("emb").alias("cemb"),
        F.col("nrm").alias("cnrm"),
    )
    n_fine = cents.count()  # 1-row scalar
    mod2 = max(1, math.floor(math.sqrt(n_fine)))
    coarse = F.broadcast(
        cents.filter(
            F.col("cent_id") % mod2 == IVF2_COARSE_RESIDUE % mod2
        ).select(
            F.col("cent_id").alias("coarse_id"),
            F.col("cemb").alias("oemb"),
            F.col("cnrm").alias("onrm"),
        )
    )

    # fine centroid -> nearest coarse cell (C x C0 dots, broadcast-size)
    cos_fc = F.expr(
        f"{H.dot_fold('cemb', 'oemb', spark=True)} / (sqrt(cnrm) * sqrt(onrm))"
    )
    f2c = F.broadcast(
        cents.crossJoin(coarse)
        .withColumn("fcos", cos_fc)
        .groupBy("cent_id")
        .agg(
            F.min_by(
                F.col("coarse_id"),
                F.struct((-F.col("fcos")).alias("nc"), F.col("coarse_id")),
            ).alias("coarse_id")
        )
        .join(cents, "cent_id")
    )

    # vector routing: top-ROUTE coarse cells via a per-vector array
    # fold (C0 entries collected per vector — no corpus-wide window)
    cos_vc = F.expr(
        f"{H.dot_fold('emb', 'oemb', spark=True)} / (sqrt(nrm) * sqrt(onrm))"
    )
    routes = (
        withn.crossJoin(coarse)
        .withColumn("rcos", cos_vc)
        .groupBy("vec_id")
        .agg(
            F.expr(
                "transform("
                f"  slice(array_sort(collect_list(struct(-rcos AS nc, coarse_id))), 1, {IVF2_ROUTE}),"
                "  x -> x.coarse_id)"
            ).alias("cells")
        )
        .select("vec_id", F.explode("cells").alias("coarse_id"))
    )

    # assignment: argmax cosine over the routed cells' fine centroids
    cos_a = F.expr(
        f"{H.dot_fold('emb', 'cemb', spark=True)} / (sqrt(nrm) * sqrt(cnrm))"
    )
    assign = (
        withn.join(routes, "vec_id")
        .join(f2c, "coarse_id")
        .withColumn("acos", cos_a)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.col("cent_id"),
                F.struct((-F.col("acos")).alias("nc"), F.col("cent_id")),
            ).alias("list_id")
        )
    )

    # query-side probes + exact rerank: identical to ann_ivf
    cos_q = F.expr(
        f"{H.dot_fold('emb', 'cemb', spark=True)} / (sqrt(nrm) * sqrt(cnrm))"
    )
    scored_cents = withn.filter(F.col("vec_id") < n_queries).crossJoin(
        F.broadcast(cents)
    ).withColumn("ccos", cos_q)
    wq = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
    probes = (
        scored_cents.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("list_id"))
    )
    q = F.broadcast(
        withn.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            F.col("nrm").alias("qn"),
        )
    )
    members = withn.join(assign, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("ce"),
        F.col("nrm").alias("cn"),
        "list_id",
    )
    cand = (
        F.broadcast(probes).join(members, "list_id")
        .join(q, "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = cand.withColumn(
        "cos_sim",
        F.expr(f"{H.dot_fold('qe', 'ce', spark=True)} / (sqrt(qn) * sqrt(cn))"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ann_ivf2_oracle(
    emb_cte: str,
    n_queries: int = N_QUERIES,
    k: int = TOP_K_IVF,
    nprobe: int = IVF_NPROBE,
) -> str:
    dot_fc = H.dot_fold("f.emb", "o.emb", spark=False)
    dot_vc = H.dot_fold("v.emb", "o.emb", spark=False)
    dot_va = H.dot_fold("v.emb", "f.emb", spark=False)
    dotc = H.dot_fold("v.emb", "c.emb", spark=False)
    dotq = H.dot_fold("q.emb", "m.emb", spark=False)
    nf = H.norm_fold("emb", spark=False)
    return f"""WITH {emb_cte},
nrms AS (SELECT vec_id, emb, {nf} AS nrm FROM emb),
m AS (SELECT GREATEST(1, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS md FROM emb),
cents AS (SELECT vec_id AS cent_id, emb, nrm FROM nrms, m
          WHERE vec_id % m.md = {IVF_CENT_RESIDUE} % m.md),
m2 AS (SELECT GREATEST(1, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS md2 FROM cents),
coarse AS (SELECT cent_id AS coarse_id, emb, nrm FROM cents, m2
           WHERE cent_id % m2.md2 = {IVF2_COARSE_RESIDUE} % m2.md2),
f2c AS (
  SELECT cent_id, coarse_id FROM (
    SELECT f.cent_id, o.coarse_id,
           ROW_NUMBER() OVER (PARTITION BY f.cent_id
                              ORDER BY {dot_fc} / (sqrt(f.nrm) * sqrt(o.nrm)) DESC,
                                       o.coarse_id) AS rn
    FROM cents f CROSS JOIN coarse o
  ) WHERE rn = 1
),
routes AS (
  SELECT vec_id, coarse_id FROM (
    SELECT v.vec_id, o.coarse_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {dot_vc} / (sqrt(v.nrm) * sqrt(o.nrm)) DESC,
                                       o.coarse_id) AS rn
    FROM nrms v CROSS JOIN coarse o
  ) WHERE rn <= {IVF2_ROUTE}
),
assign AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT v.vec_id, f.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {dot_va} / (sqrt(v.nrm) * sqrt(f.nrm)) DESC,
                                       f.cent_id) AS rn
    FROM nrms v
    JOIN routes r ON r.vec_id = v.vec_id
    JOIN f2c ON f2c.coarse_id = r.coarse_id
    JOIN cents f ON f.cent_id = f2c.cent_id
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cent_id AS list_id FROM (
    SELECT v.vec_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {dotc} / (sqrt(v.nrm) * sqrt(c.nrm)) DESC,
                                       c.cent_id) AS pr
    FROM nrms v CROSS JOIN cents c WHERE v.vec_id < {n_queries}
  ) WHERE pr <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.list_id = p.list_id
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT cd.query_id, cd.neighbor_id,
         {dotq} / (sqrt(q.nrm) * sqrt(m.nrm)) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY cd.query_id
                            ORDER BY {dotq} / (sqrt(q.nrm) * sqrt(m.nrm)) DESC,
                                     cd.neighbor_id) AS rank
  FROM cand cd
  JOIN nrms q ON q.vec_id = cd.query_id
  JOIN nrms m ON m.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# --- ANN evaluation: recall@k against exact brute force ----------------------

def ann_recall(emb: DataFrame) -> DataFrame:
    """Recall@k of every approximate ANN method against the exact
    brute-force top-k — the evaluation metric an ANN deployment tracks
    before trusting an index (the standard companion to T6/T7/T14/T32/
    T68: approximation quality as a QUERYABLE table, not a code
    comment). For each method, truth = ann_bruteforce at the METHOD'S
    OWN k ((cos desc, neighbor_id)-deterministic, so truth sets are
    unique); n_hits counts truth pairs the method returned; recall is
    the one raw IEEE division (dialect-exact by the no-ROUND rule).
    Everything is DataFrame composition over the already-audited
    method plans — no driver-side collection; the per-method aggregates
    are 1-row and union to a 4-row table."""
    methods = [
        ("lsh", ann_lsh(emb), TOP_K_LSH),
        ("ivf", ann_ivf(emb), TOP_K_IVF),
        ("ivf2", ann_ivf2(emb), TOP_K_IVF),
        ("sq8", ann_sq8(emb), TOP_K_SQ8),
    ]
    out = None
    for name, res, k in methods:
        truth = ann_bruteforce(emb, k=k).select("query_id", "neighbor_id")
        hit = res.select(
            "query_id", "neighbor_id", F.lit(1).alias("hit")
        )
        row = (
            truth.join(hit, ["query_id", "neighbor_id"], "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_expected"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .cast("long")
                .alias("n_hits"),
            )
            .select(
                F.lit(name).alias("method"),
                "n_expected",
                "n_hits",
                (F.col("n_hits").cast("double") / F.col("n_expected")).alias(
                    "recall"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def ann_recall_oracle(emb_cte: str) -> str:
    def pairs(sql: str) -> str:
        return f"(SELECT query_id, neighbor_id FROM ({sql}))"

    def block(method: str, method_sql: str, truth_sql: str) -> str:
        return f"""SELECT '{method}' AS method,
       CAST(COUNT(*) AS BIGINT) AS n_expected,
       CAST(SUM(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN m.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS recall
FROM {pairs(truth_sql)} t
LEFT JOIN {pairs(method_sql)} m
  ON m.query_id = t.query_id AND m.neighbor_id = t.neighbor_id"""

    b_lsh = ann_bruteforce_oracle(emb_cte, k=TOP_K_LSH)
    b_ivf = ann_bruteforce_oracle(emb_cte, k=TOP_K_IVF)
    b_sq8 = ann_bruteforce_oracle(emb_cte, k=TOP_K_SQ8)
    return "\nUNION ALL\n".join(
        [
            block("lsh", ann_lsh_oracle(emb_cte), b_lsh),
            block("ivf", ann_ivf_oracle(emb_cte), b_ivf),
            block("ivf2", ann_ivf2_oracle(emb_cte), b_ivf),
            block("sq8", ann_sq8_oracle(emb_cte), b_sq8),
        ]
    )
