"""SemDeDup-style semantic deduplication — cluster-scoped, exact recall.

The public method (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication"): k-means-cluster the
embedding space, call two documents semantic duplicates when their
cosine similarity exceeds a threshold WITHIN a cluster, and keep, per
duplicate relation, the example with the LOWEST similarity to its
cluster centroid (the most "prototypical" copies go, the outlier stays).
The paper's within-cluster step is a GPU pairwise matrix; this is the
relational re-expression, with one addition that makes it exact-recall
at scale instead of quadratic:

**Lossless angle-band pruning.** For the angle to any fixed reference
vector c, the spherical triangle inequality gives
|theta(a,c) - theta(b,c)| <= theta(a,b). A duplicate pair has
cos(a,b) >= SEM_COS_T, i.e. theta(a,b) <= theta0 = arccos(SEM_COS_T),
so its two members' angles to their shared cluster centroid differ by
at most theta0 — banding each cluster by fixed-width-theta0 angle
intervals, every duplicate pair lands in the same or adjacent band.
Candidates = same-cluster same-or-adjacent-band pairs: zero recall
loss (unlike the hyperplane-LSH form in functions/dedup.py, which is
probabilistic), candidate volume bounded by per-(cluster, band)
occupancy instead of cluster size squared.

Band ids never evaluate arccos at query time (last-ulp acos divergence
between engines could flip a band boundary): the band boundaries
cos(k * theta0) are computed once in Python and embedded as repr()
double literals in BOTH dialects, and band = count of boundaries
strictly above the vector's centroid-cosine — a monotone step function
of theta evaluated with bit-identical inputs against identical
constants.

Determinism chain (every comparison is on bit-identical doubles):
centroids are integer micro-unit sums with one final division
(trainprep.lang_centroids), assignment is the argmin of the fixed-order
sqdist fold with MIN(label) tie-break (trainprep.kmeans_assign
semantics), centroid-cosine and pair-cosine are the sequential
left-fold dot/norm expressions (hashing.dot_fold) both engines evaluate
in the same order.

Scale notes (100 TB): the paper's regime sizes K proportional to N
(constant expected cluster size — LAION runs used ~50k clusters), which
bounds per-cluster work; the label-seeded K=10 here is the test
configuration, exactly like kmeans_assign. Centroids broadcast (K x 64
doubles); assignment is a narrow map + one vec_id-keyed argmin shuffle;
banding is row-local; the candidate self-join shuffles on
(cluster, band) only; SEM_CELL_CAP bounds the worst-case quadratic cell
the way EMB_BUCKET_CAP does for the LSH form (a no-op at bench scale,
the documented ceiling for deployment). Reference analog: the
asset-dedup keep-one-per-key discipline (internal/transform/asset.go),
lifted from exact keys to semantic neighborhoods.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions import hashing as H
from stellar_etl_spark.functions import trainprep as ftp
from stellar_etl_spark.functions.trainprep import EMB_SCALE

SEM_COS_T = 0.98  # same duplicate gate as the LSH near-dup form
_THETA0 = math.acos(SEM_COS_T)
# band boundaries cos(k*theta0), k = 1..floor(pi/theta0); theta in
# [0, pi] so later multiples are unreachable. repr() round-trips the
# exact double; both engines parse the same decimal to the same bits.
SEM_BAND_BOUNDS = [
    math.cos(k * _THETA0) for k in range(1, int(math.pi / _THETA0) + 1)
]
SEM_CELL_CAP = 4096  # (cluster, band) occupancy ceiling — see module doc


def _band_expr(cos_col: str) -> str:
    """band = #{k : cos_col < cos(k*theta0)} — fixed-width theta bands,
    identical SQL in both dialects (literal constants, CASE WHEN)."""
    terms = [
        f"(CASE WHEN {cos_col} < {b!r} THEN 1 ELSE 0 END)"
        for b in SEM_BAND_BOUNDS
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


def semdedup(emb_labeled: DataFrame, corpus: DataFrame) -> DataFrame:
    """Per-vector semantic-dedup verdicts over `corpus`
    (vec_id, emb array<double>), clustered against the label-seeded
    centroids of `emb_labeled` (vec_id, emb, label).

    Returns (vec_id, cluster, cent_cos, n_near, keep): the assigned
    cluster, the (6dp-rounded) cosine to its centroid, the number of
    verified within-cluster duplicates, and the SemDeDup keep flag —
    a vector is dropped iff some verified neighbor has strictly lower
    (cent_cos, vec_id); i.e. per duplicate relation the lowest
    centroid-similarity member survives."""
    # K centroid arrays, integer-exact then one division (kmeans path)
    carr = (
        ftp.lang_centroids(emb_labeled)
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim_idx", "centroid"))
            ).alias("s")
        )
        .select("label", F.expr("transform(s, x -> x.centroid)").alias("cvec"))
    )

    # nearest-centroid assignment (sqdist argmin, MIN(label) tie-break)
    sq = H.sqdist_fold("emb", "cvec", spark=True)
    dists = (
        corpus.select("vec_id", "emb")
        .crossJoin(F.broadcast(carr))
        .select("vec_id", "label", F.expr(sq).alias("dist"))
    )
    mind = dists.groupBy("vec_id").agg(F.min("dist").alias("min_dist"))
    asg = (
        dists.join(mind, "vec_id")
        .filter(F.col("dist") == F.col("min_dist"))
        .groupBy("vec_id")
        .agg(F.min("label").alias("cluster"))
    )

    # centroid-cosine + theta band (row-local once cvec is re-joined)
    dot_c = H.dot_fold("emb", "cvec", spark=True)
    nrm_e = H.norm_fold("emb", spark=True)
    nrm_c = H.norm_fold("cvec", spark=True)
    banded = (
        asg.join(corpus.select("vec_id", "emb"), "vec_id")
        .join(F.broadcast(carr.withColumnRenamed("label", "cluster")), "cluster")
        .withColumn(
            "cent_cos", F.expr(f"{dot_c} / (sqrt({nrm_e}) * sqrt({nrm_c}))")
        )
        .select("vec_id", "cluster", "emb", "cent_cos")
        .withColumn("band", F.expr(_band_expr("cent_cos")))
    )
    # worst-case cell ceiling, mirrored verbatim in the oracle; the
    # occupancy window shares the (cluster, band) shuffle the join needs
    from pyspark.sql.window import Window

    wocc = Window.partitionBy("cluster", "band")
    banded = (
        banded.withColumn("_occ", F.count(F.lit(1)).over(wocc))
        .filter(F.col("_occ") <= SEM_CELL_CAP)
        .drop("_occ")
        .localCheckpoint(eager=True)
    )

    # lossless candidates: same cluster, same or adjacent band
    a, b = banded.alias("a"), banded.alias("b")
    same = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    adj = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.band") + 1 == F.col("b.band")),
        )
        .select(
            F.least("a.vec_id", "b.vec_id").alias("vec_a"),
            F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
        )
    )
    cand = same.unionByName(adj).distinct()

    # exact-cosine verify + the keep rule's loser per pair
    ea = banded.select(
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("emb_a"),
        F.col("cent_cos").alias("cc_a"),
    )
    eb = banded.select(
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("emb_b"),
        F.col("cent_cos").alias("cc_b"),
    )
    dot = H.dot_fold("emb_a", "emb_b", spark=True)
    na = H.norm_fold("emb_a", spark=True)
    nb = H.norm_fold("emb_b", spark=True)
    ver = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .filter(F.expr(f"{dot} / (sqrt({na}) * sqrt({nb})) >= {SEM_COS_T!r}"))
        .select("vec_a", "vec_b", "cc_a", "cc_b")
    )
    loser = F.when(
        (F.col("cc_a") < F.col("cc_b"))
        | ((F.col("cc_a") == F.col("cc_b")) & (F.col("vec_a") < F.col("vec_b"))),
        F.col("vec_b"),
    ).otherwise(F.col("vec_a"))
    dropped = ver.select(loser.alias("vec_id")).distinct()
    nn = (
        ver.select(F.col("vec_a").alias("vec_id"))
        .unionByName(ver.select(F.col("vec_b").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_near"))
    )
    return (
        banded.join(nn, "vec_id", "left")
        .join(dropped.withColumn("_drop", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.round("cent_cos", 6).alias("cent_cos"),
            F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near"),
            F.col("_drop").isNull().alias("keep"),
        )
    )


def semdedup_oracle(emb_cte: str, corpus_cte: str) -> str:
    """DuckDB mirror: same centroid CTEs as kmeans_assign_oracle, same
    literal band boundaries, same candidate join, same keep rule."""
    sq = H.sqdist_fold("c.emb", "r.cvec", spark=False)
    dot_c = H.dot_fold("emb", "cvec", spark=False)
    nrm_e = H.norm_fold("emb", spark=False)
    nrm_c = H.norm_fold("cvec", spark=False)
    dot_p = H.dot_fold("A.emb", "B.emb", spark=False)
    band = _band_expr("cent_cos")
    return f"""WITH {emb_cte},
{corpus_cte},
ex AS (
  SELECT label, i AS dim_idx,
         CAST(ROUND(emb[CAST(i AS INT)] * {EMB_SCALE}) AS BIGINT) AS qv
  FROM emb, LATERAL (SELECT unnest(generate_series(1, len(emb))) AS i)
),
cent AS (
  SELECT label, dim_idx,
         CAST(SUM(qv) AS DOUBLE) / COUNT(*) / {EMB_SCALE} AS centroid
  FROM ex GROUP BY label, dim_idx
),
carr AS (
  SELECT label, list(centroid ORDER BY dim_idx) AS cvec
  FROM cent GROUP BY label
),
dists AS (
  SELECT c.vec_id, r.label, {sq} AS dist
  FROM embc c CROSS JOIN carr r
),
mind AS (SELECT vec_id, MIN(dist) AS min_dist FROM dists GROUP BY vec_id),
asg AS (
  SELECT d.vec_id, MIN(d.label) AS cluster
  FROM dists d JOIN mind m ON m.vec_id = d.vec_id AND d.dist = m.min_dist
  GROUP BY d.vec_id
),
withc AS (
  SELECT a.vec_id, a.cluster, c.emb, r.cvec
  FROM asg a
  JOIN embc c ON c.vec_id = a.vec_id
  JOIN carr r ON r.label = a.cluster
),
cc AS (
  SELECT vec_id, cluster, emb,
         {dot_c} / (sqrt({nrm_e}) * sqrt({nrm_c})) AS cent_cos
  FROM withc
),
banded0 AS (SELECT vec_id, cluster, emb, cent_cos, {band} AS band FROM cc),
occ AS (SELECT cluster, band FROM banded0 GROUP BY cluster, band
        HAVING COUNT(*) <= {SEM_CELL_CAP}),
banded AS (SELECT b.* FROM banded0 b JOIN occ USING (cluster, band)),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b
    ON b.cluster = a.cluster AND b.band = a.band AND a.vec_id < b.vec_id
  UNION
  SELECT LEAST(a.vec_id, b.vec_id), GREATEST(a.vec_id, b.vec_id)
  FROM banded a JOIN banded b
    ON b.cluster = a.cluster AND b.band = a.band + 1
),
ver AS (
  SELECT c.vec_a, c.vec_b, A.cent_cos AS cc_a, B.cent_cos AS cc_b
  FROM cand c
  JOIN banded A ON A.vec_id = c.vec_a
  JOIN banded B ON B.vec_id = c.vec_b
  WHERE {dot_p} / (sqrt({nrm_e.replace("emb", "A.emb")})
                   * sqrt({nrm_e.replace("emb", "B.emb")})) >= {SEM_COS_T!r}
),
dropped AS (
  SELECT DISTINCT CASE WHEN cc_a < cc_b OR (cc_a = cc_b AND vec_a < vec_b)
                       THEN vec_b ELSE vec_a END AS vec_id
  FROM ver
),
nn AS (
  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_near
  FROM (SELECT vec_a AS vec_id FROM ver
        UNION ALL SELECT vec_b AS vec_id FROM ver)
  GROUP BY vec_id
)
SELECT b.vec_id,
       CAST(b.cluster AS BIGINT) AS cluster,
       ROUND(b.cent_cos, 6) AS cent_cos,
       CAST(COALESCE(nn.n_near, 0) AS BIGINT) AS n_near,
       d.vec_id IS NULL AS keep
FROM banded b
LEFT JOIN nn ON nn.vec_id = b.vec_id
LEFT JOIN dropped d ON d.vec_id = b.vec_id
"""
