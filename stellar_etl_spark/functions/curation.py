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


# --- quality-filter funnel ---------------------------------------------------
# Ordered curation gates; a doc is dropped at its FIRST failed stage.
# Thresholds compare values computed with the identical expression on
# both engines (counts, or raw IEEE ratios — bit-identical), so stage
# membership is deterministic cross-engine.
FUNNEL_MIN_TOKENS = 20
FUNNEL_MAX_PUNCT = 0.2


def _funnel_first_fail(spark: bool) -> str:
    """1-based index of the first failed gate, 99 if the doc survives.
    Gates: (1) >= FUNNEL_MIN_TOKENS whitespace tokens, (2) punct ratio
    <= FUNNEL_MAX_PUNCT, (3) has at least one English stopword
    (language-evidence gate), (4) is its exact-dedup group's canonical
    doc (keep_doc_id = doc_id)."""
    tok = H.tokens("text", spark)
    size = "size" if spark else "len"
    repl = (
        "regexp_replace(text, '[^.,;:!?]', '')"
        if spark
        else "regexp_replace(text, '[^.,;:!?]', '', 'g')"
    )
    # unrounded: the raw IEEE ratio is bit-identical cross-engine, so
    # the threshold comparison is deterministic; ROUND would add a
    # 7th-decimal tie hazard (hashing.py rounding-hazard note)
    punct = (
        f"CAST(length({repl}) AS DOUBLE)"
        f" / greatest(length(text), 1)"
    )
    stop_list = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with'"
    if spark:
        has_stop = f"size(filter({tok}, t -> t IN ({stop_list}))) > 0"
    else:
        has_stop = f"len(list_filter({tok}, t -> t IN ({stop_list}))) > 0"
    return (
        f"CASE WHEN {size}({tok}) < {FUNNEL_MIN_TOKENS} THEN 1 "
        f"WHEN {punct} > {FUNNEL_MAX_PUNCT} THEN 2 "
        f"WHEN NOT ({has_stop}) THEN 3 "
        f"WHEN keep_doc_id <> doc_id THEN 4 "
        f"ELSE 99 END"
    )


FUNNEL_STAGES = ["min_tokens", "max_punct", "lang_evidence", "exact_dedup"]


def quality_funnel(docs: DataFrame) -> DataFrame:
    """Per-stage curation funnel report: docs_in / docs_dropped /
    docs_out for each ordered gate — the curation-pipeline analog of
    the reference's attempted/successful/failed transform counters
    (/root/reference/cmd/command_utils.go:90-103), as data instead of
    stderr prints.

    Shape: one narrow map computes each doc's first-failed stage (the
    dedup gate reuses the exact-fingerprint window), ONE aggregation
    produces per-stage drop counts, and the cumulative docs_in walk
    happens over the stage-count table (rows = #stages) — corpus gets
    scanned once regardless of stage count."""
    from .dedup import exact_dedup

    return funnel_from_keep(docs, exact_dedup(docs).select("doc_id", "keep_doc_id"))


def funnel_from_keep(docs: DataFrame, keep: DataFrame) -> DataFrame:
    """Funnel assembly given an externally-computed (doc_id,
    keep_doc_id) canonical map — shared by the batch form (exact_dedup)
    and the streamed form (the dedup state stream's fold,
    streaming/parity.streamed_quality_funnel)."""
    staged = docs.join(keep, "doc_id").select(
        "doc_id", F.expr(_funnel_first_fail(spark=True)).alias("first_fail")
    )
    counts = staged.groupBy("first_fail").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # tiny table from here on (<= #stages + 1 rows)
    stage_rows = [
        (i + 1, name) for i, name in enumerate(FUNNEL_STAGES)
    ]
    stages = docs.sparkSession.createDataFrame(
        stage_rows, "stage_idx int, stage string"
    )
    total = docs.count()
    joined = stages.join(
        counts, stages.stage_idx == counts.first_fail, "left"
    ).select(
        "stage_idx", "stage", F.coalesce("n", F.lit(0)).cast("long").alias("docs_dropped")
    )
    w = Window.orderBy("stage_idx").rowsBetween(Window.unboundedPreceding, -1)
    return joined.select(
        F.col("stage_idx").cast("long").alias("stage_idx"),
        "stage",
        (F.lit(total) - F.coalesce(F.sum("docs_dropped").over(w), F.lit(0)))
        .cast("long")
        .alias("docs_in"),
        "docs_dropped",
        (
            F.lit(total)
            - F.coalesce(F.sum("docs_dropped").over(w), F.lit(0))
            - F.col("docs_dropped")
        )
        .cast("long")
        .alias("docs_out"),
    )


def quality_funnel_oracle(corpus_cte: str) -> str:
    ff = _funnel_first_fail(spark=False)
    stage_values = ", ".join(
        f"({i + 1}, '{s}')" for i, s in enumerate(FUNNEL_STAGES)
    )
    return f"""WITH {corpus_cte},
keeps AS (
  SELECT doc_id, text,
         MIN(doc_id) OVER (PARTITION BY fp64) AS keep_doc_id
  FROM (SELECT doc_id, text,
               {_fp64_duck()} AS fp64
        FROM corpus)
),
staged AS (SELECT doc_id, {ff} AS first_fail FROM keeps),
counts AS (SELECT first_fail, CAST(COUNT(*) AS BIGINT) AS n
           FROM staged GROUP BY first_fail),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM staged),
stages(stage_idx, stage) AS (VALUES {stage_values}),
joined AS (
  SELECT s.stage_idx, s.stage, COALESCE(c.n, 0) AS docs_dropped
  FROM stages s LEFT JOIN counts c ON c.first_fail = s.stage_idx
)
SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
       CAST(t - COALESCE(SUM(docs_dropped) OVER (ORDER BY stage_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS docs_in,
       CAST(docs_dropped AS BIGINT) AS docs_dropped,
       CAST(t - COALESCE(SUM(docs_dropped) OVER (ORDER BY stage_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          - docs_dropped AS BIGINT) AS docs_out
FROM joined CROSS JOIN total
"""


def _fp64_duck() -> str:
    from .dedup import _norm_expr

    return H.char_hash_wide(_norm_expr(False), spark=False)


# --- intra-document repetition ----------------------------------------------

def doc_repetition(docs: DataFrame) -> DataFrame:
    """Per-document boilerplate signal: 3-gram shingle totals, distinct
    count, the hottest shingle's occurrence count, and the repetition
    ratio 1 - distinct/total (rounded 6dp; 0 for docs under 3 tokens).

    Shape: narrow shingle map -> explode -> two-level aggregation
    keyed by (doc_id, shingle) then doc_id — both combine map-side, so
    the shuffle carries per-doc-per-distinct-shingle partials, not raw
    occurrences."""
    # staged columns + checkpoint before the explode — the same two
    # Catalyst traps dedup._hashes_df documents bite here too: inlined
    # trees re-evaluate the token split per shingle element, and
    # InferFiltersFromGenerate pushes a size()>0 filter below the
    # explode that re-runs the whole hash pipeline in interpreted mode
    # (measured: 88 s -> ~3 s at sf0.1 for this operator)
    tok = H.tokens("text", spark=True)
    staged = (
        docs.select("doc_id", F.expr(tok).alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.expr(H.hash_array("toks", spark=True)).alias("wh"))
        .select(
            "doc_id",
            F.expr(H.shingle_hashes_from_words("wh", 3, spark=True)).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    ex = staged.select("doc_id", F.explode("sh").alias("h"))
    per_sh = ex.groupBy("doc_id", "h").agg(F.count(F.lit(1)).alias("c"))
    agg = per_sh.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_shingles"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("max_repeat"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
        F.coalesce("max_repeat", F.lit(0)).cast("long").alias("max_repeat"),
        # unrounded: ROUND(x, 6) on small-integer ratios diverges
        # between engines on 7th-decimal ties; the raw IEEE arithmetic
        # is bit-identical (functions/hashing.py rounding hazard note)
        F.when(
            F.coalesce("n_shingles", F.lit(0)) > 0,
            1.0 - F.col("n_distinct").cast("double") / F.col("n_shingles"),
        )
        .otherwise(F.lit(0.0))
        .alias("repetition_ratio"),
    )


def doc_repetition_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    wh = f"list_transform({tok}, t -> {H.char_hash('t', False)})"
    sh = H.shingle_hashes_from_words(wh, 3, spark=False)
    return f"""WITH {corpus_cte},
ex AS (SELECT doc_id, unnest({sh}) AS h FROM corpus),
per_sh AS (SELECT doc_id, h, COUNT(*) AS c FROM ex GROUP BY doc_id, h),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_shingles,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS max_repeat
  FROM per_sh GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(a.n_shingles, 0) AS n_shingles,
       COALESCE(a.n_distinct, 0) AS n_distinct,
       COALESCE(a.max_repeat, 0) AS max_repeat,
       CASE WHEN COALESCE(a.n_shingles, 0) > 0
            THEN 1.0 - CAST(a.n_distinct AS DOUBLE) / a.n_shingles
            ELSE 0.0 END AS repetition_ratio
FROM corpus c LEFT JOIN agg a ON a.doc_id = c.doc_id
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
    # tf feeds BOTH the df aggregation and the scored join; without
    # materialization Catalyst re-derives it from a second corpus
    # scan + explode + shuffle (plan-verified). Same eager
    # localCheckpoint pattern as the dedup signature table.
    tf = tf.localCheckpoint(eager=True)
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
            # unrounded integer ratio — a ROUND tie here would not just
            # shift a digit, it would reorder the term_rank window
            # (hashing.py rounding-hazard note)
            "tfidf",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
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
         CAST(tf.tf * n.n_docs AS DOUBLE) / dfs.df AS tfidf
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


# --- deterministic train/val/test split --------------------------------------

# Permille cut points: [0, 980) train, [980, 990) val, [990, 1000) test.
SPLIT_TRAIN_PERMILLE = 980
SPLIT_VAL_PERMILLE = 990


def _split_gate_expr(spark: bool) -> str:
    """Split gate in [0, 1000): polynomial hash of 'doc_id:split'.

    A DIFFERENT salt than the sampling gate (':split' vs ':lang'), so
    split membership is independent of sample membership — sampling a
    stratum harder never leaks docs between train and test."""
    cast = "STRING" if spark else "VARCHAR"
    key = f"concat(CAST(doc_id AS {cast}), ':split')"
    return f"({H.char_hash(key, spark)}) % 1000"


def corpus_split(docs: DataFrame) -> DataFrame:
    """Deterministic 98/1/1 train/val/test assignment per document.

    The same hash-threshold contract as stratified_sample: membership
    is a pure function of doc_id — stable across partitionings, cluster
    sizes, re-runs, and joinable from any table keyed by doc_id (the
    property an RNG or row-position split lacks). Raising the val share
    moves docs train->val monotonically, never reshuffling test.

    Scale notes: narrow per-row map, no shuffle, no RNG state; at
    100 TB the split column is computed at scan time and pruned joins
    keep eval-set isolation checks cheap."""
    gate = F.expr(_split_gate_expr(spark=True))
    split = (
        F.when(F.col("split_gate") < SPLIT_TRAIN_PERMILLE, "train")
        .when(F.col("split_gate") < SPLIT_VAL_PERMILLE, "val")
        .otherwise("test")
    )
    return (
        docs.select("doc_id", "lang", gate.cast("long").alias("split_gate"))
        .withColumn("split", split)
    )


def corpus_split_oracle(corpus_cte: str) -> str:
    gate = _split_gate_expr(spark=False)
    return f"""WITH {corpus_cte},
gated AS (
  SELECT doc_id, lang, CAST({gate} AS BIGINT) AS split_gate FROM corpus
)
SELECT doc_id, lang, split_gate,
       CASE WHEN split_gate < {SPLIT_TRAIN_PERMILLE} THEN 'train'
            WHEN split_gate < {SPLIT_VAL_PERMILLE} THEN 'val'
            ELSE 'test' END AS split
FROM gated
"""


# --- domain mixture weights ---------------------------------------------------


def domain_mix_weights(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) sampling weights for training-mixture
    construction: weight ~ sqrt(stratum token count), normalized — the
    standard alpha=0.5 temperature that upweights small domains
    relative to proportional sampling.

    Cross-engine exactness: per-stratum token counts are exact BIGINTs;
    the sqrt is floored to a BIGINT weight (IEEE sqrt is correctly
    rounded in both engines, floor makes the last-bit question moot);
    the normalizer is then an INTEGER sum — order-independent, so the
    final double division is bit-identical regardless of aggregation
    order. A raw double sum over strata would be order-dependent and
    could flip the 6dp hash.

    Scale notes: one shuffle on (lang, source) with map-side combine;
    the strata table is tiny (domains, not docs), so the normalizing
    total is a broadcastable 1-row aggregate."""
    tok = H.tokens("text", spark=True)
    strata = (
        docs.select("lang", "source", F.expr(f"size({tok})").alias("ntok"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "weight_int", F.expr("cast(floor(sqrt(cast(n_tokens as double))) as long)")
        )
    )
    total = strata.agg(F.sum("weight_int").cast("long").alias("w_total"))
    return (
        strata.crossJoin(F.broadcast(total))
        .withColumn(
            "mix_weight",
            F.expr("cast(weight_int as double) / cast(w_total as double)"),
        )
        .select("lang", "source", "n_docs", "n_tokens", "weight_int", "mix_weight")
    )


def domain_mix_weights_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    return f"""WITH {corpus_cte},
strata AS (
  SELECT lang, source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({tok})) AS BIGINT) AS n_tokens
  FROM corpus GROUP BY lang, source
),
w AS (SELECT *, CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight_int
      FROM strata),
tot AS (SELECT CAST(SUM(weight_int) AS BIGINT) AS w_total FROM w)
SELECT lang, source, n_docs, n_tokens, weight_int,
       CAST(weight_int AS DOUBLE) / CAST(w_total AS DOUBLE) AS mix_weight
FROM w CROSS JOIN tot
"""


# --- curriculum quantile binning ---------------------------------------------
# Decile assignment by VALUE-quantile boundaries (ties share a bucket),
# not NTILE: NTILE needs a global total order (single-partition sort at
# corpus scale); value boundaries need only a histogram over the score
# DOMAIN, which for integer token counts is thousands of rows at any
# corpus size. Membership is a pure function of (score, boundaries) —
# stable under any partitioning and joinable from any doc_id-keyed
# table (the corpus_split/stratified_sample discipline).
CURRICULUM_BUCKETS = 10


def curriculum_buckets(docs: DataFrame) -> DataFrame:
    """Curriculum bucket (1..CURRICULUM_BUCKETS) per document by token
    count: bucket b holds docs whose score lies between the (b-1)/10
    and b/10 exact value-quantile boundaries. The curriculum-training
    primitive: order training data easy->hard by a difficulty proxy.

    Execution shape: one map-side-combined shuffle to the score DOMAIN
    (distinct integer token counts), a domain-sized cumulative window,
    a 1-row boundary agg broadcast back over the corpus — the corpus
    itself is never sorted and never shuffled. All comparisons are
    BIGINT; the boundary rule `cum * 10 >= b * N` is ceil(b*N/10)
    without division, so the gate is integer-exact cross-engine."""
    tok = H.tokens("text", spark=True)
    scored = docs.select(
        "doc_id", F.expr(f"size({tok})").cast("long").alias("score")
    )
    hist = scored.groupBy("score").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cum = hist.select(
        "score",
        F.sum("cnt").over(Window.orderBy("score")).cast("long").alias("cum"),
    )
    total = hist.agg(F.sum("cnt").cast("long").alias("n_total"))
    bound_aggs = [
        F.min(
            F.when(
                F.col("cum") * CURRICULUM_BUCKETS >= b * F.col("n_total"),
                F.col("score"),
            )
        ).alias(f"b{b}")
        for b in range(1, CURRICULUM_BUCKETS)
    ]
    bounds = cum.crossJoin(F.broadcast(total)).agg(*bound_aggs)
    bucket = F.lit(1)
    for b in range(1, CURRICULUM_BUCKETS):
        bucket = bucket + F.when(F.col("score") > F.col(f"b{b}"), 1).otherwise(0)
    return (
        scored.crossJoin(F.broadcast(bounds))
        .select("doc_id", "score", bucket.cast("int").alias("bucket"))
    )


def curriculum_buckets_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    n = CURRICULUM_BUCKETS
    bcols = ", ".join(
        f"MIN(CASE WHEN cum * {n} >= {b} * n_total THEN score END) AS b{b}"
        for b in range(1, n)
    )
    badd = " + ".join(
        f"CAST(score > b{b} AS INT)" for b in range(1, n)
    )
    return f"""WITH {corpus_cte},
cbs AS (
  SELECT doc_id, CAST(LEN({tok}) AS BIGINT) AS score FROM corpus
),
cbh AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt FROM cbs GROUP BY score),
cbc AS (SELECT score, CAST(SUM(cnt) OVER (ORDER BY score) AS BIGINT) AS cum FROM cbh),
cbn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM cbh),
cbb AS (SELECT {bcols} FROM cbc CROSS JOIN cbn)
SELECT doc_id, score, CAST(1 + {badd} AS INT) AS bucket
FROM cbs CROSS JOIN cbb
"""


# --- fixed-size per-stratum sample (distributed reservoir) -------------------
# The fixed-SIZE complement of stratified_sample's fixed-RATE gate:
# exactly K docs per (lang, source) stratum, chosen as the K smallest
# values of a salted hash — i.e. a uniform reservoir sample that is a
# pure function of the data (re-runs, re-partitions and incremental
# backfills all pick the same K docs; growing K only ADDS docs).
TOPK_SAMPLE_K = 20
TOPK_SAMPLE_FANOUT = 64


def _topk_hash(spark: bool) -> str:
    cast = "STRING" if spark else "VARCHAR"
    key = (f"concat('topk:', CAST(doc_id AS {cast}), ':', lang, ':', source)")
    return H.char_hash(key, spark)


def domain_topk_sample(docs: DataFrame) -> DataFrame:
    """Exactly TOPK_SAMPLE_K docs per (lang, source) stratum: the K
    smallest salted-hash values, ties impossible (hash ties broken by
    doc_id). Two-phase top-k: a per-(stratum, hash-bucket) local
    window bounds the rows entering the final per-stratum window at
    FANOUT*K, so a giant stratum (at corpus scale one (lang, source)
    pair can hold billions of docs) never funnels through a single
    window partition. Both phases share one total order, so the result
    equals the oracle's single window for any fanout."""
    h = F.expr(_topk_hash(spark=True)).cast("long")
    scored = docs.select("doc_id", "lang", "source", h.alias("sample_h"))
    order = [F.asc("sample_h"), F.asc("doc_id")]
    local = Window.partitionBy(
        "lang", "source", F.pmod(F.hash("doc_id"), F.lit(TOPK_SAMPLE_FANOUT))
    ).orderBy(*order)
    w = Window.partitionBy("lang", "source").orderBy(*order)
    return (
        scored.withColumn("lr", F.row_number().over(local))
        .filter(F.col("lr") <= TOPK_SAMPLE_K)
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= TOPK_SAMPLE_K)
        .select("lang", "source", "doc_id", "sample_h", "sample_rank")
    )


def domain_topk_sample_oracle(corpus_cte: str) -> str:
    h = _topk_hash(spark=False)
    return f"""WITH {corpus_cte},
tks AS (
  SELECT doc_id, lang, source, CAST({h} AS BIGINT) AS sample_h FROM corpus
),
tkr AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
                                    ORDER BY sample_h, doc_id) AS INT) AS sample_rank
  FROM tks
)
SELECT lang, source, doc_id, sample_h, sample_rank
FROM tkr WHERE sample_rank <= {TOPK_SAMPLE_K}
"""
