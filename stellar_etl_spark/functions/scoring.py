"""Corpus scoring & packaging operators, wave 5: RAG chunking, a
hashed-vocabulary bigram language-model score, weighted priority
sampling, a broadcast linear quality gate, and a token blocklist
safety filter.

Reference analog: the reference ends its pipeline at flat export rows
(one struct per entity, /root/reference/internal/transform/schema.go);
a training-data pipeline continues from those rows into model-facing
packaging (chunks, weighted samples) and model-facing *scores*
(language-model fluency, learned quality gates, safety filters) —
plus the composed curation pipeline chaining the gates into one
per-stage report (the LM also ships a streamed incremental-index
form, streaming/parity.streamed_ngram_lm). All are pure DataFrame ops
with exact DuckDB value oracles — the same
integer-until-the-final-division discipline as functions/curation.py.

Scale notes (100 TB):

* ``chunk_documents`` is a narrow map + one generate (posexplode) —
  zero shuffle; output partitioning inherits the scan. The lineage is
  truncated before the explode (``localCheckpoint``) for the same two
  Catalyst traps functions/curation.doc_repetition documents: projection
  collapse re-evaluating the token split per chunk, and
  InferFiltersFromGenerate re-running the pipeline interpreted below
  the generate.
* ``ngram_lm_score`` shuffles the corpus once keyed by bigram hash and
  once by word hash; BOTH stats sides are vocabulary-bounded (≪ corpus,
  AQE-broadcastable at any realistic vocab), so the expensive side of
  each join stays where the occurrences already live. Conditional
  probabilities are integer permille (``(1000*c2) div c1``) so the
  per-doc sum is associative-exact; only the final per-doc average is a
  double division (deterministic, bit-identical cross-engine).
* ``priority_sample`` (Duffield/Lund/Thorup priority sampling:
  priority = weight / uniform(0,1]) uses a hash-derived uniform, so the
  sample is a pure function of the data — stable across partitionings
  and re-runs, like curation.stratified_sample. Top-k runs as Spark's
  distributed TakeOrdered (per-partition heads + driver merge of k
  rows), never a global sort.
* ``quality_logreg`` and ``blocklist_hits`` are zero-shuffle narrow
  maps in whole-stage codegen; the "model" (weight vector / blocklist)
  is a plan literal — the broadcast-a-tiny-model pattern. Swapping real
  learned weights in changes constants, not the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import hashing as H

# --- RAG chunking -----------------------------------------------------------

CHUNK_SIZE = 24    # tokens per chunk
CHUNK_STRIDE = 16  # tokens between chunk starts (overlap = 8)


def chunk_documents(docs: DataFrame) -> DataFrame:
    """Fixed-size overlapping token chunks per document (RAG packaging).

    Chunk k covers 1-based token positions [k*S+1, k*S+C]; the last
    chunk is the first one whose window reaches the end of the doc, so
    every token is covered and every chunk except possibly the last has
    exactly C tokens. Docs with zero tokens emit no chunks. The chunk
    identity hash is the ~60-bit text hash (functions/hashing.char_hash_wide),
    ready for chunk-level exact dedup downstream."""
    C, S = CHUNK_SIZE, CHUNK_STRIDE
    tok = H.tokens("text", spark=True)
    staged = (
        docs.select("doc_id", F.expr(tok).alias("toks"))
        .filter(F.size("toks") > 0)
        .withColumn("n", F.size("toks").cast("long"))
        .localCheckpoint(eager=True)
    )
    n_last = F.expr(
        f"CASE WHEN n <= {C} THEN 0L ELSE (n - {C} + {S} - 1) div {S} END"
    )
    ex = staged.select(
        "doc_id", "toks", "n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_last)).alias("chunk_idx"),
    )
    chunks = ex.select(
        "doc_id",
        "chunk_idx",
        F.least(F.lit(C).cast("long"), F.col("n") - F.col("chunk_idx") * S)
        .alias("n_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("chunk_idx").cast("int") * S + 1, C)
        ).alias("chunk_text"),
    )
    return chunks.select(
        "doc_id", "chunk_idx", "n_tokens", "chunk_text",
        F.expr(H.char_hash_wide("chunk_text", spark=True)).alias("chunk_hash"),
    )


def _chunk_ctes(src: str) -> str:
    """DuckDB CTE chain producing (doc_id, chunk_idx, n_tokens,
    chunk_text, chunk_hash) chunks from relation `src`(doc_id, text) —
    the SINGLE source of the chunk-window SQL, shared by
    chunk_documents_oracle and curation_pipeline_oracle."""
    C, S = CHUNK_SIZE, CHUNK_STRIDE
    tok = H.tokens("text", spark=False)
    return f"""
cbase AS (SELECT doc_id, {tok} AS toks FROM {src}),
csized AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
           FROM cbase WHERE len(toks) > 0),
cidx AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0,
           CASE WHEN n <= {C} THEN 0 ELSE (n - {C} + {S} - 1) // {S} END)) AS chunk_idx
  FROM csized),
cchunks AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         CAST(least({C}, n - chunk_idx * {S}) AS BIGINT) AS n_tokens,
         array_to_string(toks[chunk_idx * {S} + 1 : least(chunk_idx * {S} + {C}, n)], ' ')
           AS chunk_text
  FROM cidx),
chashed AS (
  SELECT doc_id, chunk_idx, n_tokens, chunk_text,
         {H.char_hash_wide('chunk_text', spark=False)} AS chunk_hash
  FROM cchunks)"""


def chunk_documents_oracle(corpus_cte: str) -> str:
    return f"""WITH {corpus_cte},{_chunk_ctes('corpus')}
SELECT doc_id, chunk_idx, n_tokens, chunk_text, chunk_hash FROM chashed"""


# --- hashed-vocabulary bigram LM score --------------------------------------

LM_SCALE = 1000  # conditional probabilities in integer permille


def lm_parts(docs: DataFrame) -> dict[str, DataFrame]:
    """The bigram LM decomposed into its additive index tables —
    shared by the batch operator and the streamed incremental-index
    form (streaming/parity.streamed_ngram_lm commits per-epoch PARTIAL
    uni/big counts; SUM-merging partials equals these totals):
      docs: (doc_id)            — every document, for the left join
      occ:  (doc_id, w1h, bh)   — one row per in-doc bigram position
      uni:  (w1h, c1)           — corpus unigram counts
      big:  (bh, c2)            — corpus bigram counts
    """
    B, P = H.SHINGLE_B, H.P
    tok = H.tokens("text", spark=True)
    staged = (
        docs.select("doc_id", F.expr(H.hash_array(tok, spark=True)).alias("wh"))
        .withColumn("n", F.size("wh"))
        .localCheckpoint(eager=True)
    )
    uni = (
        staged.select(F.explode("wh").alias("w1h"))
        .groupBy("w1h")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    occ = (
        staged.filter(F.col("n") >= 2)
        .select("doc_id", "wh", F.explode(F.sequence(F.lit(1), F.col("n") - 1)).alias("i"))
        .select(
            "doc_id",
            F.expr("element_at(wh, i)").alias("w1h"),
            F.expr(f"(element_at(wh, i) * {B}L + element_at(wh, i + 1)) % {P}L")
            .alias("bh"),
        )
    )
    big = occ.groupBy("bh").agg(F.count(F.lit(1)).alias("c2"))
    return {"docs": staged.select("doc_id"), "occ": occ, "uni": uni, "big": big}


def lm_score_tail(
    doc_ids: DataFrame, occ: DataFrame, uni: DataFrame, big: DataFrame
) -> DataFrame:
    """Serve-time scoring over the LM index tables: join each bigram
    occurrence to its counts, integer-permille per bigram, per-doc
    sum + one final double division."""
    perdoc = (
        occ.join(big, "bh")
        .join(uni, "w1h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.expr(f"({LM_SCALE}L * c2) div c1")).cast("long").alias("sum_permille"),
        )
    )
    # NO rounding on the final division: IEEE division of exact integer
    # inputs is already bit-identical cross-engine, while round(x, 6)
    # DIVERGES on integer-ratio quotients whose shortest decimal repr
    # ties at the 7th place (Spark rounds via BigDecimal HALF_UP on the
    # shortest repr, DuckDB via x*1e6 float rounding — e.g. 41/640:
    # 0.064063 vs 0.064062, verified on both engines)
    return (
        doc_ids.select("doc_id")
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_permille", F.lit(0)).cast("long").alias("sum_permille"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.col("sum_permille").cast("double") / F.col("n_bigrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("lm_score_permille"),
        )
    )


def ngram_lm_score(docs: DataFrame) -> DataFrame:
    """Count-based bigram language-model fluency score per document
    (the CCNet/Gopher-style perplexity-filter shape, with the LM
    trained on the corpus itself in the same job).

    For each in-document bigram (w1, w2): permille = (1000 * c(w1 w2))
    div c(w1), both counts over the whole corpus, vocabulary hashed to
    BIGINT. The doc score is the mean permille over its bigrams —
    integer sum, one final double division. Docs under 2 tokens score
    0 with n_bigrams = 0."""
    p = lm_parts(docs)
    return lm_score_tail(p["docs"], p["occ"], p["uni"], p["big"])


def ngram_lm_score_oracle(corpus_cte: str) -> str:
    B, P = H.SHINGLE_B, H.P
    tok = H.tokens("text", spark=False)
    wh = H.hash_array(tok, spark=False)
    return f"""WITH {corpus_cte},
base AS (SELECT doc_id, {wh} AS wh FROM corpus),
sized AS (SELECT doc_id, wh, len(wh) AS n FROM base),
uni AS (SELECT w1h, COUNT(*) AS c1
        FROM (SELECT unnest(wh) AS w1h FROM sized) GROUP BY w1h),
pos AS (SELECT doc_id, wh, unnest(generate_series(1, n - 1)) AS i
        FROM sized WHERE n >= 2),
occ AS (SELECT doc_id, wh[i] AS w1h, (wh[i] * {B} + wh[i + 1]) % {P} AS bh
        FROM pos),
big AS (SELECT bh, COUNT(*) AS c2 FROM occ GROUP BY bh),
perdoc AS (
  SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(({LM_SCALE} * b.c2) // u.c1) AS BIGINT) AS sum_permille
  FROM occ o JOIN big b USING (bh) JOIN uni u USING (w1h)
  GROUP BY o.doc_id)
SELECT c.doc_id,
       COALESCE(p.n_bigrams, 0) AS n_bigrams,
       COALESCE(p.sum_permille, 0) AS sum_permille,
       CASE WHEN COALESCE(p.n_bigrams, 0) > 0
            THEN CAST(p.sum_permille AS DOUBLE) / p.n_bigrams
            ELSE 0.0 END AS lm_score_permille
FROM corpus c LEFT JOIN perdoc p USING (doc_id)"""


# --- weighted priority sampling ---------------------------------------------

PRIORITY_K = 100


def _priority_exprs(spark: bool) -> tuple[str, str]:
    """(weight, priority) SQL for priority sampling with a hash-derived
    uniform: u = (h + 1) / P in (0, 1], priority = w / u = (w * P) / (h + 1).
    w * P < 2^63 for any realistic token count, so the numerator is an
    exact integer and the single division is bit-deterministic."""
    cast = "STRING" if spark else "VARCHAR"
    tok = H.tokens("text", spark)
    w = f"len({tok})" if not spark else f"size({tok})"
    h = H.char_hash(f"concat(CAST(doc_id AS {cast}), ':ps')", spark)
    lit = f"{H.P}L" if spark else str(H.P)
    pr = f"CAST(CAST({w} AS BIGINT) * {lit} AS DOUBLE) / (({h}) + 1)"
    return w, pr


def priority_sample(docs: DataFrame) -> DataFrame:
    """Deterministic weighted sample of K docs, weight = token count
    (longer docs proportionally more likely). Priority sampling keeps
    the k rows with the largest weight/uniform priority; with the
    uniform derived from a doc_id hash the sample is reproducible on
    any cluster, and top-(k-1) of the same run is a strict subset
    (prefix property). Spark executes the orderBy+limit as distributed
    TakeOrdered — per-partition top-k then a k-row driver merge, no
    global sort."""
    w, pr = _priority_exprs(spark=True)
    # the nonempty gate is regex-based, NOT size(tokens) > 0: "text
    # contains a non-whitespace char" is exactly ">= 1 token" (tokens
    # split on \s+), and a token-fold filter would re-tokenize the text
    # in a separate operator from the projection (per-operator
    # subexpression elimination can't reach across Filter/Project).
    # trim() would NOT be equivalent — it strips spaces only, letting
    # tab/newline-only docs through with weight 0.
    return (
        docs.filter(F.expr("text RLIKE '\\\\S'"))
        .select(
            "doc_id", "lang", "source",
            F.expr(w).cast("long").alias("weight_tokens"),
            F.expr(pr).alias("priority"),
        )
        .orderBy(F.desc("priority"), "doc_id")
        .limit(PRIORITY_K)
    )


def priority_sample_oracle(corpus_cte: str) -> str:
    w, pr = _priority_exprs(spark=False)
    return f"""WITH {corpus_cte}
SELECT doc_id, lang, source,
       CAST({w} AS BIGINT) AS weight_tokens,
       {pr} AS priority
FROM corpus WHERE regexp_matches(text, '\\S')
ORDER BY priority DESC, doc_id LIMIT {PRIORITY_K}"""


# --- broadcast linear quality gate ------------------------------------------

# Integer milli-weights of a small linear quality model over exact
# token features: logit_milli = B0 + W·x. A learned model swaps these
# constants; the plan (zero-shuffle codegen map) is unchanged.
LOGREG_B0 = -3000
LOGREG_W_NTOK = 15       # length reward
LOGREG_W_UNIQ = 150      # vocabulary-richness reward
LOGREG_W_MAXLEN = 10     # long-token (code/url-ish) signal
LOGREG_W_REPEAT = -50    # repetition penalty (n_tok - n_uniq)


def _logreg_exprs(spark: bool) -> dict[str, str]:
    tok = H.tokens("text", spark)
    if spark:
        n_tok = f"size({tok})"
        n_uniq = f"size(array_distinct({tok}))"
        max_len = f"coalesce(array_max(transform({tok}, t -> length(t))), 0)"
    else:
        n_tok = f"len({tok})"
        n_uniq = f"len(list_distinct({tok}))"
        max_len = f"COALESCE(list_max(list_transform({tok}, t -> len(t))), 0)"
    logit = (
        f"{LOGREG_B0} + {LOGREG_W_NTOK} * ({n_tok}) + {LOGREG_W_UNIQ} * ({n_uniq})"
        f" + {LOGREG_W_MAXLEN} * ({max_len})"
        f" + {LOGREG_W_REPEAT} * (({n_tok}) - ({n_uniq}))"
    )
    return {"n_tok": n_tok, "n_uniq": n_uniq, "max_len": max_len, "logit": logit}


def quality_logreg(docs: DataFrame) -> DataFrame:
    """Model-based quality gate: integer linear logit over exact
    per-doc features (token count, distinct tokens, longest token,
    repetition), decision = logit > 0. All integer until the one
    divide-by-1000 display column."""
    e = _logreg_exprs(spark=True)
    return docs.select(
        "doc_id",
        F.expr(e["n_tok"]).cast("long").alias("n_tokens"),
        F.expr(e["n_uniq"]).cast("long").alias("n_unique"),
        F.expr(e["max_len"]).cast("long").alias("max_token_len"),
        F.expr(e["logit"]).cast("long").alias("logit_milli"),
        (F.expr(e["logit"]).cast("double") / 1000.0).alias("quality_score"),
        (F.expr(e["logit"]) > 0).alias("keep"),
    )


def quality_logreg_oracle(corpus_cte: str) -> str:
    e = _logreg_exprs(spark=False)
    return f"""WITH {corpus_cte}
SELECT doc_id,
       CAST({e['n_tok']} AS BIGINT) AS n_tokens,
       CAST({e['n_uniq']} AS BIGINT) AS n_unique,
       CAST({e['max_len']} AS BIGINT) AS max_token_len,
       CAST({e['logit']} AS BIGINT) AS logit_milli,
       CAST({e['logit']} AS DOUBLE) / 1000.0 AS quality_score,
       ({e['logit']}) > 0 AS keep
FROM corpus"""


# --- token blocklist safety filter ------------------------------------------

BLOCKLIST = ("dup", "slow", "leak")
BLOCK_MAX_PERMILLE = 30  # flag docs where blocked tokens exceed 3% of tokens


def _block_exprs(spark: bool) -> dict[str, str]:
    lits = ", ".join(f"'{t}'" for t in BLOCKLIST)
    tok = H.tokens("text", spark)
    if spark:
        hits = f"filter({tok}, t -> t IN ({lits}))"
        return {
            "n_tok": f"size({tok})",
            "n_blocked": f"size({hits})",
            "first": f"try_element_at({hits}, 1)",
        }
    hits = f"list_filter({tok}, t -> t IN ({lits}))"
    return {
        "n_tok": f"len({tok})",
        "n_blocked": f"len({hits})",
        "first": f"({hits})[1]",
    }


def blocklist_hits(docs: DataFrame) -> DataFrame:
    """Safety filter: per doc, blocked-token count, the first blocked
    token (NULL if clean), and a flag when blocked density exceeds
    BLOCK_MAX_PERMILLE. Zero shuffle, whole-stage codegen; the
    blocklist is a plan literal (broadcast-a-tiny-denylist pattern —
    a large denylist becomes a broadcast join on token hash, same
    semantics)."""
    e = _block_exprs(spark=True)
    return docs.select(
        "doc_id",
        F.expr(e["n_tok"]).cast("long").alias("n_tokens"),
        F.expr(e["n_blocked"]).cast("long").alias("n_blocked"),
        F.expr(e["first"]).alias("first_blocked"),
        (
            F.expr(e["n_blocked"]) * 1000
            > F.expr(e["n_tok"]) * F.lit(BLOCK_MAX_PERMILLE)
        ).alias("flagged"),
    )


def blocklist_hits_oracle(corpus_cte: str) -> str:
    e = _block_exprs(spark=False)
    return f"""WITH {corpus_cte}
SELECT doc_id,
       CAST({e['n_tok']} AS BIGINT) AS n_tokens,
       CAST({e['n_blocked']} AS BIGINT) AS n_blocked,
       {e['first']} AS first_blocked,
       ({e['n_blocked']}) * 1000 > ({e['n_tok']}) * {BLOCK_MAX_PERMILLE} AS flagged
FROM corpus"""


# --- composed curation pipeline ---------------------------------------------

PIPELINE_STAGES = (
    "input", "quality_gate", "blocklist", "doc_dedup", "chunk", "chunk_dedup",
)


def curation_pipeline(docs: DataFrame) -> DataFrame:
    """End-to-end curation DAG as ONE job, reported as a per-stage
    row-count table: model quality gate (T63) → blocklist screen (T64)
    → exact doc dedup (min doc_id per normalized-text fingerprint, the
    T1 canonical rule) → RAG chunking of the survivors (T60) →
    chunk-level exact dedup on the chunk-identity hash. The composed
    form is what a training-data pipeline actually ships; each stage
    alone is separately oracle-gated, this query gates the composition.

    Scale shape: the doc stages are ONE narrow flag map + one
    fingerprint-keyed shuffle (dedup); the chunk stages add the
    zero-shuffle generate and one distinct-agg on chunk_hash. The
    6-row report unions six aggregates that all reuse the same staged
    scan (lineage-truncated once)."""
    from .dedup import _norm_expr

    e_l = _logreg_exprs(spark=True)
    e_b = _block_exprs(spark=True)
    # the fingerprint (two full char folds — the costliest expression
    # here) is NOT computed in this staged scan: only gate-passing rows
    # ever reach the dedup stage, so fp is derived after the filter
    staged = (
        docs.select(
            "doc_id",
            "text",
            (F.expr(e_l["logit"]) > 0).alias("q_ok"),
            (
                F.expr(e_b["n_blocked"]) * 1000
                <= F.expr(e_b["n_tok"]) * F.lit(BLOCK_MAX_PERMILLE)
            ).alias("b_ok"),
        )
        .localCheckpoint(eager=True)
    )
    passed = staged.filter(F.col("q_ok") & F.col("b_ok"))
    # materialized once: stages 4-6 each aggregate over this subtree,
    # so without truncation the dedup shuffle+join would run 3x
    survivors = (
        passed.select(
            "doc_id",
            F.expr(H.char_hash_wide(_norm_expr(True), spark=True)).alias("fp"),
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(passed.select("doc_id", "text"), "doc_id")
        .localCheckpoint(eager=True)
    )
    chunks = chunk_documents(survivors.select("doc_id", "text"))

    def row(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col("n").cast("long").alias("rows_out"),
        )

    one = F.count(F.lit(1)).alias("n")
    return (
        row(1, "input", staged.agg(one))
        .unionByName(row(2, "quality_gate", staged.filter("q_ok").agg(one)))
        .unionByName(row(3, "blocklist", passed.agg(one)))
        .unionByName(row(4, "doc_dedup", survivors.agg(one)))
        .unionByName(row(5, "chunk", chunks.agg(one)))
        .unionByName(
            row(6, "chunk_dedup",
                chunks.agg(F.count_distinct("chunk_hash").alias("n")))
        )
    )


def curation_pipeline_oracle(corpus_cte: str) -> str:
    from .dedup import _norm_expr

    e_l = _logreg_exprs(spark=False)
    e_b = _block_exprs(spark=False)
    fp = H.char_hash_wide(_norm_expr(False), spark=False)
    return f"""WITH {corpus_cte},
g AS (SELECT doc_id, text,
             ({e_l['logit']}) > 0 AS q_ok,
             ({e_b['n_blocked']}) * 1000 <= ({e_b['n_tok']}) * {BLOCK_MAX_PERMILLE} AS b_ok,
             {fp} AS fp
      FROM corpus),
p AS (SELECT * FROM g WHERE q_ok AND b_ok),
surv AS (SELECT fp, MIN(doc_id) AS doc_id FROM p GROUP BY fp),
sd AS (SELECT s.doc_id, p.text FROM surv s JOIN p ON p.doc_id = s.doc_id),
{_chunk_ctes('sd')}
SELECT CAST(1 AS BIGINT) AS stage_idx, 'input' AS stage,
       (SELECT COUNT(*) FROM g) AS rows_out
UNION ALL SELECT 2, 'quality_gate', (SELECT COUNT(*) FROM g WHERE q_ok)
UNION ALL SELECT 3, 'blocklist', (SELECT COUNT(*) FROM p)
UNION ALL SELECT 4, 'doc_dedup', (SELECT COUNT(*) FROM surv)
UNION ALL SELECT 5, 'chunk', (SELECT COUNT(*) FROM chashed)
UNION ALL SELECT 6, 'chunk_dedup', (SELECT COUNT(DISTINCT chunk_hash) FROM chashed)"""
