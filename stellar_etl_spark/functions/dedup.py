"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Reference analog: the seen-hash dedup maps (/root/reference/cmd/
export_assets.go:40-58, internal/input/orderbooks.go:72-118) scale to
a single process; these are their distributed counterparts. All
signatures are deterministic portable hashes (`hashing.py`), so each
operator has an exact DuckDB value oracle.

Scale notes (100 TB):
* signature computation is a narrow map (no shuffle, codegen);
* candidate generation shuffles ONLY on (band/bucket key) — pairs are
  generated per bucket, never all-pairs; hot buckets are bounded by a
  document-frequency cap (`DF_CAP`) exactly where a naive inverted
  index would quadratically explode on stop-shingles;
* verification joins are equi-joins on doc_id — sort-merge/AQE territory,
  and the per-doc signature side is orders of magnitude smaller than
  the corpus (column-pruned to (doc_id, hashes)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import hashing as H

MINHASH_JACCARD_T = 0.35
NGRAM_JACCARD_T = 0.3
SIMHASH_MAX_HAMMING = 3
COSINE_DUP_T = 0.98
DF_CAP = 50  # drop shingles present in more docs (stop-shingles)
# Hot-band guard for the LSH self-joins: a band bucket holding k docs
# emits k*(k-1)/2 candidate pairs, so one giant cluster of exact
# near-dups (the common case in a dedup-heavy corpus) turns the join
# quadratic. Buckets above the cap are dropped from candidate
# generation — their members are still caught by exact dedup and by
# their other (rarer) bands. Mirrored verbatim in the oracles.
BAND_CAP = 100


def _norm_expr(spark: bool) -> str:
    tok = H.tokens("text", spark)
    join = "concat_ws(' ', " + tok + ")" if spark else f"array_to_string({tok}, ' ')"
    return join


def _hashes_expr(spark: bool) -> str:
    """Distinct 3-gram shingle hashes of `text` -> ARRAY<BIGINT>,
    via word-hash composition (each word char-hashed once, shingles
    combined arithmetically — hashing.shingle_hashes_from_words)."""
    tok = H.tokens("text", spark)
    wh = H.hash_array(tok, spark)
    sh = H.shingle_hashes_from_words(f"({wh})" if not spark else wh, 3, spark)
    return f"array_distinct({sh})" if spark else f"list_distinct({sh})"


def _hashes_df(corpus: DataFrame) -> DataFrame:
    """(doc_id, hs) signature table, built stagewise and repartitioned.

    Two deliberate physical choices (measured 3-4x on the bench):
    * tokens/shingles become real columns between selects — inlining
      the whole tree makes codegen re-evaluate the token split once per
      shingle element (no CSE inside lambda bodies);
    * the final repartition(doc_id) puts an Exchange on top of the
      expensive projection, so every self-join branch downstream reuses
      ONE computation (ReusedExchange) instead of re-hashing the corpus
      per branch. At 100 TB this exchange is replaced by materializing
      the signature table once (it is ~100x smaller than the corpus).
    """
    tok = H.tokens("text", spark=True)
    return (
        corpus.select("doc_id", F.expr(tok).alias("toks"))
        # filter HERE, on the cheap token count (hs empty <=> <3 tokens):
        # a later filter(size(hs) > 0) gets alias-substituted by Catalyst
        # into the predicate, re-evaluating the whole hash pipeline per
        # row in interpreted mode (measured 8x the projection cost)
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.expr(H.hash_array("toks", spark=True)).alias("wh"))
        .select(
            "doc_id",
            F.expr(
                f"array_distinct({H.shingle_hashes_from_words('wh', 3, spark=True)})"
            ).alias("hs"),
        )
        .repartition("doc_id")
        # materialize + truncate lineage: downstream consumers explode hs,
        # and InferFiltersFromGenerate re-infers size(hs)>0, pushes it
        # through the exchange, and alias-substitutes the whole hash
        # pipeline into an interpreted filter predicate (measured 30x on
        # the inverted-index path). The local checkpoint is the
        # bench-scale stand-in for materializing the signature table,
        # which is the correct 100 TB design anyway.
        .localCheckpoint(eager=True)
    )


# --- 1. exact dedup --------------------------------------------------------

def exact_fingerprint() -> Column:
    """The exact-dedup identity fingerprint of `text` as a Column —
    shared by the batch operator and the streaming variant
    (streaming/parity.streamed_dedup_exact)."""
    return F.expr(H.char_hash_wide(_norm_expr(True), spark=True))


def exact_dedup(corpus: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup on the normalized-text fingerprint:
    every doc mapped to its group's canonical (min) doc_id.

    The fingerprint is the ~60-bit wide identity hash
    (hashing.char_hash_wide) — a 30-bit space would expect birthday
    collisions from ~50k docs, silently merging distinct documents."""
    fp = F.expr(H.char_hash_wide(_norm_expr(True), spark=True))
    df = corpus.select("doc_id", fp.alias("fp64"))
    w = Window.partitionBy("fp64")
    return df.select(
        "doc_id",
        "fp64",
        F.min("doc_id").over(w).cast("long").alias("keep_doc_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_copies"),
    )


def exact_dedup_oracle(corpus_cte: str) -> str:
    fp = H.char_hash_wide(_norm_expr(False), spark=False)
    return f"""WITH {corpus_cte},
fps AS (SELECT doc_id, {fp} AS fp64 FROM corpus)
SELECT doc_id, fp64,
       MIN(doc_id) OVER (PARTITION BY fp64) AS keep_doc_id,
       COUNT(*) OVER (PARTITION BY fp64) AS n_copies
FROM fps
"""


# --- 2. MinHash + LSH ------------------------------------------------------

def minhash_lsh_dedup(corpus: DataFrame) -> DataFrame:
    """MinHash (k=hashing.MINHASH_K=32) + banded LSH
    (hashing.MINHASH_BANDS=16 bands x MINHASH_ROWS=2 rows) candidate
    generation, then exact Jaccard verification on distinct shingle
    sets; emits pairs with jaccard >= 0.35. Band buckets are capped at
    BAND_CAP docs (hot-band guard, same rationale as DF_CAP): a cluster
    of k identical docs otherwise emits k^2 candidate pairs per band."""
    sig_exprs = ", ".join(H.minhash_sig("hs", i, spark=True) for i in range(H.MINHASH_K))
    docs = _hashes_df(corpus).withColumn("sig", F.expr(f"array({sig_exprs})"))
    band_structs = [
        F.struct(
            F.lit(j).alias("band_idx"),
            F.concat_ws(
                ":",
                *[
                    F.element_at("sig", j * H.MINHASH_ROWS + r + 1).cast("string")
                    for r in range(H.MINHASH_ROWS)
                ],
            ).alias("band_key"),
        )
        for j in range(H.MINHASH_BANDS)
    ]
    bands = docs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band_idx", "b.band_key")
    # hot-band cap (see BAND_CAP): singleton buckets produce no pairs,
    # over-cap buckets would produce quadratically many. Windowed count
    # instead of groupBy+join: one exchange on the band key, whose
    # output partitioning the self-join below reuses (measured ~30%
    # faster than the two-shuffle agg+join form at sf0.1)
    wb = Window.partitionBy("band_idx", "band_key")
    bk = (
        bands.withColumn("n", F.count(F.lit(1)).over(wb))
        .filter((F.col("n") >= 2) & (F.col("n") <= BAND_CAP))
        .drop("n")
    )

    a, b = bk.alias("a"), bk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = docs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    hb = docs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    return (
        pairs.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")).cast("long"))
        .withColumn(
            "jaccard",
            F.expr("cast(inter as double) / (size(hs_a) + size(hs_b) - inter)"),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_pair_ctes(corpus_cte: str) -> str:
    """The shared DuckDB CTE chain from `corpus` through `verified`
    (doc_a, doc_b, jaccard) — reused by `minhash_lsh_oracle` and
    `dup_clusters_oracle` so both compare against the identical
    candidate/verify pipeline."""
    hs = _hashes_expr(False)
    sig = "[" + ", ".join(H.minhash_sig("hs", i, spark=False) for i in range(H.MINHASH_K)) + "]"
    band_keys = " UNION ALL ".join(
        f"""SELECT doc_id, {j} AS band_idx, """
        + " || ':' || ".join(
            f"CAST(sig[{j * H.MINHASH_ROWS + r + 1}] AS VARCHAR)"
            for r in range(H.MINHASH_ROWS)
        )
        + " AS band_key FROM sigs"
        for j in range(H.MINHASH_BANDS)
    )
    return f"""{corpus_cte},
hsets AS (SELECT doc_id, {hs} AS hs FROM corpus),
hnon AS MATERIALIZED (SELECT * FROM hsets WHERE len(hs) > 0),
sigs AS (SELECT doc_id, hs, {sig} AS sig FROM hnon),
bands AS ({band_keys}),
bkeep AS (
  SELECT band_idx, band_key FROM bands
  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND {BAND_CAP}
),
bk AS (
  SELECT b.* FROM bands b JOIN bkeep k
    ON b.band_idx = k.band_idx AND b.band_key = k.band_key
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk a JOIN bk b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
verified AS (
  SELECT p.doc_a, p.doc_b,
         CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
         / (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) AS jaccard
  FROM pairs p
  JOIN hnon ha ON ha.doc_id = p.doc_a
  JOIN hnon hb ON hb.doc_id = p.doc_b
)"""


def minhash_lsh_oracle(corpus_cte: str) -> str:
    return f"""WITH {_minhash_pair_ctes(corpus_cte)}
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {MINHASH_JACCARD_T}
"""


# --- 3. SimHash ------------------------------------------------------------

def simhash_dedup(corpus: DataFrame) -> DataFrame:
    """60-bit SimHash over widened word hashes (frequency-weighted),
    4x15-bit band LSH with a hot-band cap, pairs at Hamming <= 3.

    Pigeonhole: 3 bit errors cannot touch all 4 bands, so every true
    pair shares at least one band exactly. Bit sums use the round-1
    proven shape — explode the widened word hashes and run 60 partial
    SUM aggregates (map-side combine keeps shuffle traffic at one
    60-long row per doc per partition). A nested
    aggregate/zip_with/transform array fold was tried as a
    shuffle-free alternative and measured ~40x slower: higher-order
    lambdas evaluate interpreted, allocating two 60-element arrays per
    word."""
    nb = H.SIMHASH_BITS
    tok = H.tokens("text", spark=True)
    # stagewise columns + early cheap filter + localCheckpoint before
    # the explode consumer: same InferFiltersFromGenerate guard as
    # _hashes_df (the alternative re-runs the whole signature pipeline
    # inside an interpreted explode-size predicate)
    toks = (
        corpus.select("doc_id", F.expr(tok).alias("toks"))
        .filter(F.size("toks") >= 1)
        .select("doc_id", F.expr(H.hash_array("toks", spark=True)).alias("wh"))
        .select(
            "doc_id",
            F.expr(f"transform(wh, h -> {H.widen_hash('h', True)})").alias("wh2"),
        )
        .localCheckpoint(eager=True)
        .select("doc_id", F.explode("wh2").alias("h"))
    )
    bit_sums = [
        F.sum(F.expr(f"2L * (shiftright(h, {j}) % 2L) - 1L")).alias(f"s{j}")
        for j in range(nb)
    ]
    sim = toks.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for j in range(nb):
        term = (
            F.when(F.col(f"s{j}") > 0, F.lit(2 ** j).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        simhash = term if simhash is None else simhash + term
    sims = (
        sim.select("doc_id", simhash.alias("simhash"))
        .repartition("doc_id")
        .localCheckpoint(eager=True)
    )

    shift = 2 ** H.SIMHASH_BAND_BITS
    n_bands = H.SIMHASH_BITS // H.SIMHASH_BAND_BITS
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.expr(f"(simhash div {shift ** j}L) % {shift}L").alias("band_val"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band_idx", "b.band_val")
    # windowed band-bucket cap: single exchange, reused by the self-join
    # (see minhash_lsh_dedup)
    wb = Window.partitionBy("band_idx", "band_val")
    bk = (
        bands.withColumn("n", F.count(F.lit(1)).over(wb))
        .filter((F.col("n") >= 2) & (F.col("n") <= BAND_CAP))
        .drop("n")
    )

    a, b = bk.alias("a"), bk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


def simhash_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    harr = H.hash_array(tok, spark=False)
    wide_harr = f"list_transform({harr}, h -> {H.widen_hash('h', False)})"
    bit_sums = ",\n         ".join(
        f"SUM(2 * ((h >> {j}) & 1) - 1) AS s{j}" for j in range(H.SIMHASH_BITS)
    )
    simhash = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(H.SIMHASH_BITS)
    )
    shift = 2 ** H.SIMHASH_BAND_BITS
    n_bands = H.SIMHASH_BITS // H.SIMHASH_BAND_BITS
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band_idx, (simhash // {shift ** j}) % {shift} AS band_val FROM sims"
        for j in range(n_bands)
    )
    return f"""WITH {corpus_cte},
toks AS (SELECT doc_id, UNNEST({wide_harr}) AS h FROM corpus),
sums AS (SELECT doc_id, {bit_sums} FROM toks GROUP BY doc_id),
sims AS (SELECT doc_id, CAST({simhash} AS BIGINT) AS simhash FROM sums),
bands AS ({bands}),
bkeep AS (
  SELECT band_idx, band_val FROM bands
  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND {BAND_CAP}
),
bk AS (
  SELECT b.* FROM bands b JOIN bkeep k
    ON b.band_idx = k.band_idx AND b.band_val = k.band_val
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM bk a JOIN bk b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""


# --- 4. n-gram Jaccard (inverted index) ------------------------------------

def ngram_jaccard_dedup(corpus: DataFrame) -> DataFrame:
    """All-pairs Jaccard >= 0.3 via shingle inverted index with a
    document-frequency cap: shingles present in >DF_CAP docs (or only
    one doc) are dropped before pair generation — the standard guard
    against quadratic blowup on stop-shingles at scale."""
    docs = _hashes_df(corpus)
    ex = docs.select("doc_id", F.explode("hs").alias("h"))
    dfh = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    keep = dfh.filter((F.col("df") >= 2) & (F.col("df") <= DF_CAP)).select("h")
    exk = ex.join(keep, "h")

    a, b = exk.alias("a"), exk.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.size("hs").alias("sz_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.size("hs").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.expr("cast(inter as double) / (sz_a + sz_b - inter)"))
        .filter(F.col("jaccard") >= NGRAM_JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_oracle(corpus_cte: str) -> str:
    hs = _hashes_expr(False)
    return f"""WITH {corpus_cte},
hsets AS (SELECT doc_id, {hs} AS hs FROM corpus),
hnon AS (SELECT * FROM hsets WHERE len(hs) > 0),
ex AS (SELECT doc_id, UNNEST(hs) AS h FROM hnon),
dfh AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {DF_CAP}),
exk AS (SELECT ex.doc_id, ex.h FROM ex JOIN dfh ON ex.h = dfh.h),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM exk a JOIN exk b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.inter AS DOUBLE) / (len(ha.hs) + len(hb.hs) - i.inter) AS jaccard
FROM inter i
JOIN hnon ha ON ha.doc_id = i.doc_a
JOIN hnon hb ON hb.doc_id = i.doc_b
WHERE CAST(i.inter AS DOUBLE) / (len(ha.hs) + len(hb.hs) - i.inter) >= {NGRAM_JACCARD_T}
"""


# --- 4b. n-gram containment (near-superset detection) -----------------------

# Directed containment c(A in B) = |S(A) n S(B)| / |S(A)|: the measure
# Jaccard misses — a short doc fully embedded in a long one has low
# Jaccard (union is big) but containment ~1. Standard pretraining op
# for dropping quote-reposts / boilerplate-wrapped copies.
CONTAINMENT_T = 0.5


def doc_containment(corpus: DataFrame) -> DataFrame:
    """Directed near-superset pairs: (doc_a, doc_b, shared, sz_a,
    containment) where containment = |S(a) n S(b)| / |S(a)| >= 0.5,
    S(d) = distinct 3-gram shingle hashes (df-capped: shingles in
    > DF_CAP docs are dropped before pair generation, mirrored in the
    oracle — the same stop-shingle guard as ngram_jaccard_dedup).
    Emits BOTH directions when both clear the gate (a contained-in b
    and b contained-in a are different facts).

    Reference analog: none (the reference has no similarity ops); this
    extends SURVEY §2.11 T4 with the asymmetric measure.

    Scale notes: same inverted-index shape as T4 — one exchange for the
    signature table, df-cap bounds per-shingle fan-out, pair agg is a
    map-side-combinable count. The denominator uses the doc's FULL
    distinct-shingle count (not the df-capped one), so the score is
    interpretable; the cap only affects candidate recall, identically
    in both engines."""
    docs = _hashes_df(corpus)
    ex = docs.select("doc_id", F.explode("hs").alias("h"))
    dfh = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    keep = dfh.filter((F.col("df") >= 2) & (F.col("df") <= DF_CAP)).select("h")
    exk = ex.join(keep, "h")

    a, b = exk.alias("a"), exk.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.size("hs").cast("long").alias("sz_a"))
    # no rounding: both engines filter the identical raw double (same
    # operands -> same IEEE result), and the compare hashes at 6dp
    return (
        inter.join(sa, "doc_a")
        .withColumn("containment", F.expr("cast(shared as double) / sz_a"))
        .filter(F.col("containment") >= CONTAINMENT_T)
        .select("doc_a", "doc_b", "shared", "sz_a", "containment")
    )


def doc_containment_oracle(corpus_cte: str) -> str:
    hs = _hashes_expr(False)
    return f"""WITH {corpus_cte},
hsets AS (SELECT doc_id, {hs} AS hs FROM corpus),
hnon AS (SELECT * FROM hsets WHERE len(hs) > 0),
ex AS (SELECT doc_id, UNNEST(hs) AS h FROM hnon),
dfh AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {DF_CAP}),
exk AS (SELECT ex.doc_id, ex.h FROM ex JOIN dfh ON ex.h = dfh.h),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared
  FROM exk a JOIN exk b ON a.h = b.h AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.shared,
       CAST(len(ha.hs) AS BIGINT) AS sz_a,
       CAST(i.shared AS DOUBLE) / len(ha.hs) AS containment
FROM inter i
JOIN hnon ha ON ha.doc_id = i.doc_a
WHERE CAST(i.shared AS DOUBLE) / len(ha.hs) >= {CONTAINMENT_T}
"""


# --- 5. embedding cosine near-dup ------------------------------------------

# Deterministic perturbed variants so near-dup pairs exist in the
# synthetic table: vec_id%10==0 gains vec_id+10000 with a small
# per-coordinate shift (exact same arithmetic in the oracle CTE).
EMB_CORPUS_CTE = """
embc AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id,
         list_transform(generate_series(1, 64),
                        i -> CAST(embedding AS DOUBLE[])[i] + 0.01 * ((i % 5) - 2)) AS emb
  FROM embeddings WHERE vec_id % 10 = 0
)
"""

_SPARK_PERTURB = (
    "transform(sequence(1, 64), i -> element_at(emb, i) + 0.01D * cast((i % 5) - 2 as double))"
)


def load_emb_corpus(spark, sf_dir: str) -> DataFrame:
    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    pert = (
        base.filter(F.col("vec_id") % 10 == 0)
        .select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.expr(_SPARK_PERTURB).alias("emb"),
        )
    )
    return base.unionByName(pert)


# Multi-table random-hyperplane LSH for candidate generation:
# EMB_LSH_TABLES independent tables of EMB_LSH_PLANES sign bits each.
# A pair is a candidate iff it collides in >= 1 table. At the 0.98
# threshold (theta ~ 0.20 rad, per-plane agreement ~ 0.936) per-table
# collision prob is 0.936^16 ~ 0.35, so 12 tables give per-pair miss
# probability (1 - 0.35)^12 ~ 6e-3 for a borderline pair; empirically
# the planted pairs (cos ~ 0.995, well above the gate) stay at exactly
# 200/200 at sf0.1 and 2000/2000 at its 10x replication. The whole
# scheme is deterministic, so the oracle (which mirrors the bucketing
# verbatim) agrees exactly.
#
# Planes-per-table is the candidate-volume knob: random-pair collisions
# scale as N^2 * 2^-planes per table, so planes grows as ~log2(N).
# Round-3 measured a 5.3x wall ratio at 10x data with 12 planes —
# profiled to candidate growth (11k -> 1.07M distinct candidates, 96x:
# uniform occupancy growth at 4096 buckets/table, avg 5.8/bucket at
# 10x, NOT a hot-bucket skew — max occupancy was only 44). 16 planes
# (65536 buckets/table) cuts the 10x candidate set 11.6x (92.6k) with
# recall pinned (planted pairs exactly 10x); 20 planes was measured to
# drop one planted pair at 10x and is rejected. EMB_BUCKET_CAP bounds
# the worst case on top: buckets whose occupancy exceeds the cap are
# excluded from candidate generation in BOTH engines (the same
# hot-band treatment minhash/simhash use), making intra-bucket work
# <= tables * 2^planes * cap^2/2 regardless of corpus size. At bench
# scales the cap drops nothing (max occupancy 44 << 128) — it is the
# documented ceiling for the 100 TB case, where planes and cap are
# sized per corpus at deployment.
EMB_LSH_TABLES = 12
EMB_LSH_PLANES = 16
EMB_BUCKET_CAP = 128


def _emb_bucket_expr(emb: str, t: int, spark: bool) -> str:
    """Sign-bucket id of table `t`: bit p set iff dot(v, plane) > 0,
    planes drawn from the deterministic lattice (hashing.lsh_plane)."""
    terms = []
    for p in range(EMB_LSH_PLANES):
        j = t * EMB_LSH_PLANES + p
        dot = H.dot_fold(emb, H.plane_literal(j, spark), spark)
        terms.append(f"CASE WHEN {dot} > 0 THEN {2 ** p} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def embedding_dup_pairs(embc: DataFrame) -> DataFrame:
    """Cosine near-dup pairs (cos >= 0.98): multi-table hyperplane-LSH
    candidate generation + exact cosine verify, fully distributed.

    No driver-side collect and no all-pairs kernel: the corpus is
    bucketed per LSH table (narrow map), candidates come from per-table
    bucket self-joins (shuffle on the bucket key only), and the verify
    stage is two equi-joins on vec_id computing the cosine as the same
    sequential JVM fold the oracle uses — bit-identical doubles, no
    rounding-mode mismatch (the previous GEMM kernel summed in a
    different order and leaned on 6-dp rounding).

    Bucket bits are computed vectorized-numpy per Arrow batch inside
    mapInPandas (the plane matrix is 144x64 — shipped with the
    closure, constant memory, nothing driver-side): 144 sign dots per
    vector as interpreted SQL fold lambdas measured ~20x slower. The
    accumulation loops over the 64 dims in element order (vectorized
    across rows x planes), so every dot is the SAME left-to-right
    float64 fold the oracle's list_reduce evaluates — bit-identical
    signs by construction, not epsilon-identical (a BLAS GEMM sums in
    a different order and could flip a sign on a dot within reorder
    epsilon of 0, nondeterministically diverging the candidate sets)."""
    import numpy as np
    import pandas as pd

    t_, p_ = EMB_LSH_TABLES, EMB_LSH_PLANES
    planes = np.array([H.lsh_plane(j) for j in range(t_ * p_)])
    pow2 = 2 ** np.arange(p_, dtype="int64")

    def bucketize(batches):
        for batch in batches:
            if not len(batch):
                continue
            E = np.stack(batch["emb"].to_numpy()).astype("float64")
            # sequential-fold dots: acc_d = acc_{d-1} + e[d]*p[d], d=0..63
            # (same order as H.dot_fold / DuckDB list_reduce)
            acc = np.zeros((len(E), planes.shape[0]))
            for d in range(planes.shape[1]):
                acc += E[:, d, None] * planes[None, :, d]
            S = (acc > 0).reshape(len(E), t_, p_)
            bks = (S * pow2).sum(axis=2)
            out = pd.DataFrame({"vec_id": batch["vec_id"], "emb": batch["emb"]})
            for t in range(t_):
                out[f"b{t}"] = bks[:, t]
            yield out

    schema = "vec_id long, emb array<double>, " + ", ".join(
        f"b{t} long" for t in range(t_)
    )
    withb = (
        embc.select("vec_id", "emb")
        .mapInPandas(bucketize, schema=schema)
        .repartition("vec_id")
        .localCheckpoint(eager=True)
    )

    buckets = withb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bk"))
                    for t in range(EMB_LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.t", "tb.bk")
    # hot-bucket cap (quadratic ceiling guard, see EMB_BUCKET_CAP): the
    # occupancy window shares the (t, bk) shuffle the self-join needs
    wocc = Window.partitionBy("t", "bk")
    buckets = (
        buckets.withColumn("_occ", F.count(F.lit(1)).over(wocc))
        .filter(F.col("_occ") <= EMB_BUCKET_CAP)
        .drop("_occ")
    )

    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = withb.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"))
    eb = withb.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"))
    dot = H.dot_fold("emb_a", "emb_b", spark=True)
    nrm_a = H.norm_fold("emb_a", spark=True)
    nrm_b = H.norm_fold("emb_b", spark=True)
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_raw", F.expr(f"{dot} / (sqrt({nrm_a}) * sqrt({nrm_b}))"))
        .filter(F.col("cos_raw") >= COSINE_DUP_T)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


def embedding_dup_oracle() -> str:
    dot = H.dot_fold("a.emb", "b.emb", spark=False)
    nf = H.norm_fold("emb", spark=False)
    bucket_cols = ",\n           ".join(
        f"{_emb_bucket_expr('emb', t, spark=False)} AS b{t}" for t in range(EMB_LSH_TABLES)
    )
    unpivot = "\n    UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, b{t} AS bk FROM wb"
        for t in range(EMB_LSH_TABLES)
    )
    return f"""WITH {EMB_CORPUS_CTE},
wb AS (SELECT vec_id, emb, {nf} AS nrm,
           {bucket_cols}
       FROM embc),
bkt AS ({unpivot}),
ok AS (SELECT t, bk FROM bkt GROUP BY t, bk
       HAVING COUNT(*) <= {EMB_BUCKET_CAP}),
bkt_ok AS (SELECT bkt.* FROM bkt JOIN ok USING (t, bk)),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bkt_ok a JOIN bkt_ok b
    ON b.t = a.t AND b.bk = a.bk AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       ROUND({dot} / (sqrt(a.nrm) * sqrt(b.nrm)), 6) AS cos_sim
FROM cand c
JOIN wb a ON a.vec_id = c.vec_a
JOIN wb b ON b.vec_id = c.vec_b
WHERE {dot} / (sqrt(a.nrm) * sqrt(b.nrm)) >= {COSINE_DUP_T}
"""


# --- 6. duplicate clusters (pairs -> transitive closure) --------------------

def dup_clusters(corpus: DataFrame) -> DataFrame:
    """Transitive duplicate clusters over the union of exact-dedup
    groups and verified MinHash near-dup pairs: every corpus doc
    labeled with its cluster's canonical (minimum) doc_id, the
    cluster size, and a 0/1 keep flag (keep exactly the canonical
    doc per cluster). This is the operation that makes pairwise
    dedup *usable* — a~b and b~c collapse to one kept doc even when
    the a~c pair was never generated.

    Reference analog: the first-seen fold of cmd/export_assets.go:40-58,
    distributed as a hash-min label-propagation fixpoint
    (functions/graph.connected_components).

    Scale notes: the edge list is pairs-only (orders of magnitude
    smaller than the corpus); exact groups contribute star edges
    (member -> group min), already diameter-2. The CC fixpoint runs
    2-3 rounds of two bounded shuffles each; the final labeling joins
    back to the corpus on doc_id (sort-merge, corpus-partitioned)."""
    from .graph import connected_components

    mh = minhash_lsh_dedup(corpus).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    ex = (
        exact_dedup(corpus)
        .select(F.col("doc_id").alias("src"), F.col("keep_doc_id").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    reps = connected_components(mh.union(ex)).withColumnRenamed("node", "doc_id")
    labeled = (
        corpus.select("doc_id")
        .join(reps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("rep", F.col("doc_id")).cast("long").alias("cluster_rep"),
        )
    )
    w = Window.partitionBy("cluster_rep")
    return labeled.select(
        "doc_id",
        "cluster_rep",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_rep")).cast("long").alias("keep"),
    )


def _dup_cluster_ctes(corpus_cte: str) -> str:
    """Shared WITH-body (through `labeled`) for the cluster oracles."""
    from .graph import cc_reach_oracle_cte

    fp = H.char_hash_wide(_norm_expr(False), spark=False)
    return f"""{_minhash_pair_ctes(corpus_cte)},
fps AS (SELECT doc_id, {fp} AS fp64 FROM corpus),
exact_edges AS (
  SELECT doc_id AS src,
         MIN(doc_id) OVER (PARTITION BY fp64) AS dst
  FROM fps
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  WHERE jaccard >= {MINHASH_JACCARD_T}
  UNION
  SELECT src, dst FROM exact_edges WHERE src <> dst
),
{cc_reach_oracle_cte('edges')},
labeled AS (
  SELECT c.doc_id, COALESCE(r.rep, c.doc_id) AS cluster_rep
  FROM corpus c LEFT JOIN cc_reps r ON r.node = c.doc_id
)"""


def dup_clusters_oracle(corpus_cte: str) -> str:
    return f"""WITH RECURSIVE {_dup_cluster_ctes(corpus_cte)}
SELECT doc_id, cluster_rep,
       COUNT(*) OVER (PARTITION BY cluster_rep) AS cluster_size,
       CAST(doc_id = cluster_rep AS BIGINT) AS keep
FROM labeled
"""


def dedup_resolve(corpus: DataFrame) -> DataFrame:
    """Canonical-document selection per duplicate cluster by QUALITY
    rather than first-seen: within each transitive dup cluster keep the
    longest text (tie -> lowest doc_id). This is the policy step after
    clustering — first-seen (dup_clusters' min-id keep) matches the
    reference's fold (cmd/export_assets.go:40-58), but a training
    pipeline usually keeps the best-quality copy instead; any scoring
    column slots into the same argmax.

    Scale: reuses the dup_clusters labeling (pairs-only edges + CC
    fixpoint); the argmax is one window pass partitioned by
    cluster_rep — cluster sizes are dedup-bounded (band caps upstream),
    so no partition skews."""
    clusters = dup_clusters(corpus).select("doc_id", "cluster_rep", "cluster_size")
    lens = corpus.select(
        "doc_id", F.length("text").cast("long").alias("text_len")
    )
    sized = clusters.join(lens, "doc_id")
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("text_len").desc(), F.col("doc_id").asc()
    )
    best = F.first("doc_id").over(w)
    return sized.select(
        "doc_id",
        "cluster_rep",
        "cluster_size",
        "text_len",
        best.cast("long").alias("keep_doc_id"),
        (F.col("doc_id") == best).cast("long").alias("keep"),
    )


def dedup_resolve_oracle(corpus_cte: str) -> str:
    return f"""WITH RECURSIVE {_dup_cluster_ctes(corpus_cte)},
clusters AS (
  SELECT doc_id, cluster_rep,
         COUNT(*) OVER (PARTITION BY cluster_rep) AS cluster_size
  FROM labeled
),
sized AS (
  SELECT cl.doc_id, cl.cluster_rep, cl.cluster_size,
         CAST(LENGTH(c.text) AS BIGINT) AS text_len
  FROM clusters cl JOIN corpus c ON c.doc_id = cl.doc_id
)
SELECT doc_id, cluster_rep, cluster_size, text_len,
       FIRST_VALUE(doc_id) OVER w AS keep_doc_id,
       CAST(doc_id = FIRST_VALUE(doc_id) OVER w AS BIGINT) AS keep
FROM sized
WINDOW w AS (PARTITION BY cluster_rep ORDER BY text_len DESC, doc_id ASC)
"""
