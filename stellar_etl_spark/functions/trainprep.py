"""Training-set preparation operators: benchmark decontamination,
token-budget sequence packing, cross-document boilerplate-span
removal, and exact per-label embedding centroids.

These extend the curation family (functions/curation.py) with the
remaining steps a pre-training data pipeline runs between "deduped
corpus" and "training batches". Reference analog: the reference stops
at per-table export (/root/reference/internal/transform/), so these
have no Go counterpart — they follow the same engine rules instead
(portable arithmetic hashing for exact DuckDB oracles, narrow
map-side-combinable plans, no driver collects on corpus-sized data).

Scale notes (100 TB):
* ``decontaminate``: the eval/benchmark side is tiny by definition
  (benchmark suites are MBs, the corpus is TBs) — its distinct n-gram
  set is broadcast, so the corpus side never shuffles for the join;
  the only corpus shuffle is the per-doc hit aggregation, which
  combines map-side. The shingle signature table is the SAME
  checkpointed table the dedup family builds (dedup._hashes_df), so a
  pipeline running dedup + decontamination hashes the corpus once.
* ``pack_sequences``: packing needs a sequential scan per bucket; the
  bucket key (doc_id % N_BUCKETS) distributes that scan — each bucket
  is an independent windowed cumulative sum, so parallelism = bucket
  count and no global sort exists. At 100 TB raise N_BUCKETS to
  O(executors); the within-bucket order stays deterministic (doc_id).
* ``boilerplate_spans``: the boilerplate dictionary (spans with
  df >= BP_DF) is the high-df tail of the span distribution — small by
  construction (a span repeated across many docs appears once in the
  dictionary), so it broadcasts; the corpus side is explode + one
  keyed aggregation.
* ``lang_centroids``: embeddings are quantized to integer micro-units
  before summing, so the partial aggregation is exact integer math —
  order-independent, map-side combinable, and bit-identical to the
  oracle regardless of partitioning (a double sum would be
  order-dependent and flake under AQE re-partitioning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import hashing as H
from .dedup import _hashes_df, _hashes_expr

# Every 17th doc plays the held-out benchmark; the rest are the corpus.
EVAL_MOD = 17
# A doc is flagged when at least half its shingles appear in the eval set.
CONTAM_T = 0.5

PACK_BUDGET = 512  # tokens per training sequence
N_BUCKETS = 16     # independent packing streams (O(executors) at scale)

SPAN_WORDS = 5  # pseudo-sentence width for boilerplate detection
BP_DF = 2       # spans seen in >= BP_DF distinct docs are boilerplate

EMB_SCALE = 1_000_000  # micro-unit quantization for exact centroid sums


# --- benchmark decontamination ----------------------------------------------

def decontaminate(corpus: DataFrame) -> DataFrame:
    """Flag corpus documents that share word-3-gram shingles with a
    held-out eval set (doc_id % EVAL_MOD == 0): per doc, the distinct
    shingle count, the number of those shingles that occur anywhere in
    the eval set, the overlap fraction, and the contaminated flag
    (overlap >= CONTAM_T).

    The industry-standard n-gram decontamination step (eval-set overlap
    removal before training). Engine shape: eval distinct shingles are
    broadcast; the corpus side reuses the dedup signature table."""
    hs = _hashes_df(corpus)
    ev = (
        hs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("hs").alias("g"))
        .distinct()
    )
    body = hs.filter(F.col("doc_id") % EVAL_MOD != 0)
    hits = (
        body.select("doc_id", F.explode("hs").alias("g"))
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return _decontam_assemble(body, hits)


def decontaminate_oracle(corpus_cte: str) -> str:
    hs = _hashes_expr(False)
    return f"""WITH {corpus_cte},
hsets AS (SELECT doc_id, {hs} AS hs FROM corpus WHERE len({H.tokens('text', False)}) >= 3),
ev AS (SELECT DISTINCT unnest(hs) AS g FROM hsets WHERE doc_id % {EVAL_MOD} = 0),
body AS (SELECT * FROM hsets WHERE doc_id % {EVAL_MOD} != 0),
cg AS (SELECT doc_id, unnest(hs) AS g FROM body),
hits AS (
  SELECT cg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM cg JOIN ev USING (g) GROUP BY cg.doc_id
)
SELECT b.doc_id,
       CAST(len(b.hs) AS BIGINT) AS n_grams,
       COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / len(b.hs) AS overlap_frac,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / len(b.hs) >= {CONTAM_T}
         AS contaminated
FROM body b LEFT JOIN hits h ON h.doc_id = b.doc_id
"""


# --- bloom-prefiltered decontamination ---------------------------------------

# 2^20-bit (128 KiB) bitset, 4 probes. For ~5e4 distinct eval grams the
# FP rate is (1 - e^(-kn/m))^k ~ 1e-5; at 100 TB size m at ~16 bits per
# eval gram (benchmark suites are MBs, so the bitset stays driver- and
# broadcast-safe — the same size class as Spark's own runtime bloom
# filters, which also materialize on the driver).
BLOOM_BITS = 1 << 20
BLOOM_K = 4
# Affine probe family over the gram space: grams are < P (~2^30,
# hashing.shingle_hashes_from_words), A,B < P, so A*g + B < 2^60 —
# exact in int64 under ANSI Spark, DuckDB and numpy alike. Build
# (JVM expression) and probe (vectorized numpy) agree bit-for-bit.
BLOOM_A = [(j * 2654435761 + 97911) % (H.P - 1) + 1 for j in range(BLOOM_K)]
BLOOM_B = [(j * 998244353 + 31337) % H.P for j in range(BLOOM_K)]


def _bloom_pos_sql(j: int) -> str:
    return f"pmod(({BLOOM_A[j]}L * g + {BLOOM_B[j]}L) % {H.P}L, {BLOOM_BITS}L)"


def decontaminate_bloom(corpus: DataFrame) -> DataFrame:
    """``decontaminate`` with a distributed Bloom prefilter on the
    corpus gram stream — output is IDENTICAL (same oracle): the bloom
    has no false negatives, so every eval-overlapping gram survives to
    the exact verify join, and false positives are removed by that same
    join. What changes is the physical plan: at 100 TB the corpus side
    explodes O(tokens) gram probes, and the bloom drops the ~non-
    overlapping tail map-side BEFORE the join/shuffle, so the exact
    join sees only candidate grams (the Spark runtime-filter /
    injected-bloom pattern, built explicitly because
    ``bloom_filter_agg``/``might_contain`` are not public SQL API).

    Build: set-bit positions are computed as a JVM expression over the
    distinct eval grams and collected — bounded by min(K*|eval|,
    BLOOM_BITS) ints, metadata-sized by the benchmark-suite contract
    (eval sets are MBs). No corpus-sized data touches the driver.
    Probe: one Arrow-batched pandas UDF testing K bit positions per
    gram against the broadcast 128 KiB bitset (numpy vectorized)."""
    from pyspark.sql.functions import pandas_udf

    hs = _hashes_df(corpus)
    ev = (
        hs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("hs").alias("g"))
        .distinct()
    )
    pos_rows = (
        ev.select(
            F.explode(F.array(*[F.expr(_bloom_pos_sql(j)) for j in range(BLOOM_K)]))
            .alias("p")
        )
        .distinct()
        .collect()
    )
    bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    pos = np.array([r["p"] for r in pos_rows], dtype=np.int64)
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(bits.tobytes())
    a = np.array(BLOOM_A, dtype=np.int64)
    b = np.array(BLOOM_B, dtype=np.int64)

    @pandas_udf("boolean")
    def might_contain(g: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        gv = g.to_numpy(dtype=np.int64)[:, None]
        p = ((a[None, :] * gv + b[None, :]) % H.P) % BLOOM_BITS
        hit = (arr[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    body = hs.filter(F.col("doc_id") % EVAL_MOD != 0)
    hits = (
        body.select("doc_id", F.explode("hs").alias("g"))
        .filter(might_contain("g"))
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return _decontam_assemble(body, hits)


def _decontam_assemble(body: DataFrame, hits: DataFrame) -> DataFrame:
    """Shared final projection of the decontamination family."""
    return (
        body.select("doc_id", F.size("hs").cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            # unrounded integer ratio (hashing.py rounding-hazard note)
            (F.coalesce("n_hits", F.lit(0)).cast("double") / F.col("n_grams"))
            .alias("overlap_frac"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double") / F.col("n_grams")
                >= CONTAM_T
            ).alias("contaminated"),
        )
    )


# --- token-budget sequence packing -------------------------------------------

def pack_sequences(corpus: DataFrame) -> DataFrame:
    """Assign each document a training-sequence pack: docs are streamed
    in deterministic (doc_id) order within N_BUCKETS independent
    buckets; a doc whose tokens start at cumulative offset `o` lands in
    pack floor(o / PACK_BUDGET) of its bucket (offset chunking — a doc
    may straddle a pack boundary, the standard concat-then-chunk
    pre-training layout rather than first-fit bin packing, which is
    inherently sequential and not window-expressible)."""
    tok = H.tokens("text", spark=True)
    w = (
        Window.partitionBy("bucket_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        corpus.select(
            "doc_id",
            (F.col("doc_id") % N_BUCKETS).cast("long").alias("bucket_id"),
            F.size(F.expr(tok)).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
        )
        .withColumn(
            "pack_id", F.floor(F.col("start_off") / PACK_BUDGET).cast("long")
        )
    )


def pack_sequences_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    return f"""WITH {corpus_cte},
toks AS (
  SELECT doc_id, doc_id % {N_BUCKETS} AS bucket_id,
         CAST(len({tok}) AS BIGINT) AS n_tokens
  FROM corpus
),
offs AS (
  SELECT doc_id, bucket_id, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY bucket_id ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_off
  FROM toks
)
SELECT doc_id, bucket_id, n_tokens, start_off,
       CAST(FLOOR(start_off / {PACK_BUDGET}) AS BIGINT) AS pack_id
FROM offs
"""


# --- cross-document boilerplate-span removal ---------------------------------

def boilerplate_spans(corpus: DataFrame) -> DataFrame:
    """Per-document boilerplate accounting over SPAN_WORDS-word
    pseudo-sentences: a span whose hash occurs in >= BP_DF distinct
    documents is boilerplate (the CCNet repeated-paragraph rule, with
    fixed-width spans standing in for paragraphs — the synthetic corpus
    is single-line). Emits span counts, the boilerplate ratio, and the
    cleaned text (non-boilerplate spans rejoined in order)."""
    tok = H.tokens("text", spark=True)
    spans_expr = (
        f"transform(sequence(0, cast(ceil(size(toks) / {SPAN_WORDS}.0) as int) - 1), "
        f"i -> concat_ws(' ', slice(toks, i * {SPAN_WORDS} + 1, {SPAN_WORDS})))"
    )
    staged = (
        corpus.select("doc_id", F.expr(tok).alias("toks"))
        .filter(F.size("toks") >= 1)
        .select("doc_id", F.expr(spans_expr).alias("spans"))
        .select(
            "doc_id",
            F.expr(f"transform(spans, s -> {H.char_hash('s', True)})").alias("shs"),
            "spans",
        )
        # same two Catalyst traps as dedup._hashes_df: explode consumers
        # re-derive the span pipeline under InferFiltersFromGenerate
        .localCheckpoint(eager=True)
    )
    ex = staged.select(
        "doc_id", F.posexplode(F.arrays_zip("shs", "spans")).alias("pos", "z")
    ).select("doc_id", "pos", F.col("z.shs").alias("h"), F.col("z.spans").alias("span"))
    bp = (
        ex.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= BP_DF)
        .select("h")
    )
    flagged = ex.join(F.broadcast(bp.withColumn("is_bp", F.lit(True))), "h", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("is_bp"), 1).otherwise(0)).cast("long").alias("n_bp"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("is_bp").isNull(), F.struct("pos", "span")
                            )
                        )
                    ),
                    lambda s: s["span"],
                ),
            ).alias("cleaned_text"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_bp",
            # unrounded integer ratio (hashing.py rounding-hazard note)
            (F.col("n_bp").cast("double") / F.col("n_spans")).alias("bp_ratio"),
            "cleaned_text",
        )
    )


def boilerplate_spans_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    span_h = H.char_hash("span", False)
    return f"""WITH {corpus_cte},
toks AS (SELECT doc_id, {tok} AS toks FROM corpus WHERE len({tok}) >= 1),
ex AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(toks[(i - 1) * {SPAN_WORDS} + 1 : i * {SPAN_WORDS}], ' ')
           AS span
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1,
           CAST(CEIL(len(toks) / {SPAN_WORDS}.0) AS BIGINT))) AS i)
),
hashed AS (SELECT doc_id, pos, span, {span_h} AS h FROM ex),
bp AS (SELECT h FROM hashed GROUP BY h HAVING COUNT(DISTINCT doc_id) >= {BP_DF})
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(*) FILTER (WHERE h IN (SELECT h FROM bp)) AS BIGINT) AS n_bp,
       CAST(COUNT(*) FILTER (WHERE h IN (SELECT h FROM bp)) AS DOUBLE)
             / COUNT(*) AS bp_ratio,
       COALESCE(string_agg(span, ' ' ORDER BY pos)
                FILTER (WHERE h NOT IN (SELECT h FROM bp)), '') AS cleaned_text
FROM hashed GROUP BY doc_id
"""


# --- exact per-label embedding centroids -------------------------------------

def lang_centroids(emb: DataFrame) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension):
    vectors are quantized to integer micro-units (round(v * 1e6)), so
    the sum is exact integer arithmetic (partitioning-independent) and
    the centroid double is one final division — bit-identical across
    engines. The domain-mixing / cluster-prototype primitive."""
    q = F.expr(
        f"transform(emb, v -> cast(round(v * {EMB_SCALE}) as bigint))"
    )
    ex = emb.select("label", F.posexplode(q).alias("pos", "qv"))
    return (
        ex.groupBy("label", (F.col("pos") + 1).cast("long").alias("dim_idx"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("qv").cast("long").alias("sum_micro"),
        )
        .select(
            "label",
            "dim_idx",
            "n_vecs",
            "sum_micro",
            (F.col("sum_micro").cast("double") / F.col("n_vecs") / EMB_SCALE).alias(
                "centroid"
            ),
        )
    )


def lang_centroids_oracle(emb_cte: str) -> str:
    return f"""WITH {emb_cte},
ex AS (
  SELECT label, i AS dim_idx,
         CAST(ROUND(emb[CAST(i AS INT)] * {EMB_SCALE}) AS BIGINT) AS qv
  FROM emb, LATERAL (SELECT unnest(generate_series(1, len(emb))) AS i)
)
SELECT label, CAST(dim_idx AS BIGINT) AS dim_idx,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(qv) AS BIGINT) AS sum_micro,
       CAST(SUM(qv) AS DOUBLE) / COUNT(*) / {EMB_SCALE} AS centroid
FROM ex GROUP BY label, dim_idx
"""


# --- k-means assignment step --------------------------------------------------

def kmeans_assign(emb: DataFrame) -> DataFrame:
    """One Lloyd's-algorithm assignment step: every vector assigned to
    its nearest centroid (squared L2), seeded from the per-label
    centroids of `lang_centroids`. Iterating this operator (reassign ->
    re-average) is distributed k-means; one step is exactly
    oracle-checkable because every float op is order-pinned:
    centroids come from integer micro-unit sums (one final division),
    distances from the fixed-order `hashing.sqdist_fold`, and ties
    break on MIN(label) under bit-identical doubles.

    Scale notes: K centroids (bounded by label cardinality) broadcast
    to every executor — the N x K distance evaluation is a narrow map
    over the vectors (no shuffle); the argmin is a per-vec_id
    aggregation (one shuffle on vec_id, map-side combined). At 100 TB
    this is the textbook broadcast-kmeans layout."""
    cents = lang_centroids(emb)
    carr = (
        cents.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim_idx", "centroid"))
            ).alias("s")
        )
        .select("label", F.expr("transform(s, x -> x.centroid)").alias("cvec"))
    )
    d = H.sqdist_fold("emb", "cvec", spark=True)
    dists = (
        emb.select("vec_id", "emb")
        .crossJoin(F.broadcast(carr))
        .select("vec_id", "label", F.expr(d).alias("dist"))
    )
    mind = dists.groupBy("vec_id").agg(F.min("dist").alias("min_dist"))
    return (
        dists.join(mind, "vec_id")
        .filter(F.col("dist") == F.col("min_dist"))
        .groupBy("vec_id")
        .agg(F.min("label").alias("cluster"), F.min("dist").alias("d"))
        .select("vec_id", "cluster", F.round("d", 6).alias("dist"))
    )


def kmeans_assign_oracle(emb_cte: str) -> str:
    sq = H.sqdist_fold("e.emb", "c.cvec", spark=False)
    return f"""WITH {emb_cte},
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
  SELECT e.vec_id, c.label, {sq} AS dist
  FROM emb e CROSS JOIN carr c
),
mind AS (SELECT vec_id, MIN(dist) AS min_dist FROM dists GROUP BY vec_id)
SELECT d.vec_id, MIN(d.label) AS cluster, ROUND(MIN(d.dist), 6) AS dist
FROM dists d JOIN mind m ON m.vec_id = d.vec_id AND d.dist = m.min_dist
GROUP BY d.vec_id
"""
