"""Exact duplicated-span detection — substring-level dedup (T38).

Document-level dedup (T1-T5) drops whole near-copies; the remaining
corpus still carries *span*-level repetition — boilerplate headers,
license blocks, quoted replies — that document measures cannot see.
The standard pretraining remedy (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better") removes every token span
of length >= K that occurs more than once in the corpus. Their
implementation is a suffix array over the concatenated corpus — a
single-machine construction that does not distribute. The
Spark-native equivalent below gets the same detection semantics from
relational primitives only:

  1. positional K-token gram hashes per doc (narrow map, the
     ``shingle_hashes_from_words`` fold — JVM codegen, no Python);
  2. one map-side-combinable count by gram hash -> the set of grams
     occurring >= 2 times corpus-wide (within- and cross-doc repeats
     both count, as in the suffix-array formulation);
  3. semi-join the positional grams against the duplicated set
     (shuffle on the 60-bit gram hash);
  4. per-doc gaps-and-islands merge of overlapping/adjacent duplicated
     gram windows (one window pass partitioned by doc_id) -> maximal
     duplicated spans [span_start, span_end] in token coordinates.

Reference analog: none — the reference has no text-similarity surface;
this extends SURVEY §2.11 alongside T4/T20.

Scale notes (100 TB): no pair generation anywhere — unlike the
Jaccard/containment family this op is linear in corpus size: the
gram count and the semi-join are two shuffles of the positional-gram
table (|tokens| rows per doc, same volume as every other shingle op),
and the island merge partitions by doc_id so window state is bounded
by document length. A 60-bit gram hash (widen_hash) keeps birthday
collisions negligible at 10^12 grams; a collision can only mark one
extra K-token span (no cascading), and both engines share the
arithmetic so the oracle stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import hashing as H

SPAN_K = 5  # minimum duplicated run, in tokens


def _widened_grams(wh: str, spark: bool) -> str:
    """ARRAY<BIGINT> of positional 60-bit K-gram hashes from a
    word-hash COLUMN reference `wh` (must be a real column, not an
    inlined expression — neither engine does CSE inside lambda bodies,
    so an inlined word-hash pipeline would be re-folded K times per
    gram; measured 50x on the DuckDB side)."""
    gh = H.shingle_hashes_from_words(wh, SPAN_K, spark)
    if spark:
        return f"transform({gh}, h -> {H.widen_hash('h', True)})"
    return f"list_transform({gh}, h -> {H.widen_hash('h', False)})"


def dup_spans(corpus: DataFrame) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (doc_id, span_start, span_end, span_len, n_grams): 1-based
    token coordinates of every maximal span covered by K-gram windows
    that occur >= 2 times corpus-wide; n_grams = duplicated gram
    starts inside the span (an exact-copy pair of L-token docs yields
    one span of span_len L with n_grams = L - K + 1)."""
    tok = H.tokens("text", spark=True)
    grams = (
        corpus.select("doc_id", F.expr(tok).alias("toks"))
        # cheap-count filter here, not on gh: a later size(gh) filter
        # gets alias-substituted into an interpreted predicate that
        # re-evaluates the whole hash pipeline (see dedup._hashes_df)
        .filter(F.size("toks") >= SPAN_K)
        .select("doc_id", F.expr(H.hash_array("toks", spark=True)).alias("wh"))
        .select("doc_id", F.expr(_widened_grams("wh", True)).alias("gh"))
        # truncate lineage BEFORE the explode: InferFiltersFromGenerate
        # re-infers size(gh)>0 from the Generate, alias-substitutes the
        # whole hash pipeline into an interpreted filter and re-runs it
        # per row (the doc_repetition 88s trap; measured 25x here). The
        # checkpoint is the bench-scale stand-in for materializing the
        # positional-gram table, the correct 100 TB design anyway.
        .localCheckpoint(eager=True)
        .select("doc_id", F.posexplode("gh").alias("pos0", "h"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
        # one exchange on h feeds BOTH consumers (the occ>=2 count and
        # the semi-join probe side) as a ReusedExchange, and both then
        # run shuffle-free on the co-partitioned data — without it each
        # branch re-runs the whole hash pipeline from the scan
        .repartition("h")
    )
    dup = grams.groupBy("h").agg(F.count(F.lit(1)).alias("occ")).filter(
        F.col("occ") >= 2
    )
    hits = grams.join(dup.select("h"), "h").select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        hits.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + SPAN_K),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + SPAN_K - 1).cast("int").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .withColumn(
            "span_len", (F.col("span_end") - F.col("span_start") + 1).cast("int")
        )
        .select("doc_id", "span_start", "span_end", "span_len", "n_grams")
    )


def dup_spans_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    wharr = H.hash_array("toks", spark=False)
    gh = _widened_grams("wh", spark=False)
    return f"""WITH {corpus_cte},
t AS (SELECT doc_id, {tok} AS toks FROM corpus),
w AS (SELECT doc_id, {wharr} AS wh FROM t WHERE len(toks) >= {SPAN_K}),
g AS (SELECT doc_id, {gh} AS gh FROM w),
ex AS (
  SELECT doc_id,
         UNNEST(list_transform(gh, (h, i) -> {{'pos': i, 'h': h}}),
                recursive := true)
  FROM g WHERE len(gh) > 0
),
dup AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) >= 2),
hits AS (SELECT ex.doc_id, ex.pos FROM ex JOIN dup ON ex.h = dup.h),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos > lag(pos) OVER w + {SPAN_K}
              THEN 1 ELSE 0 END AS new_island
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grp AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
)
SELECT doc_id,
       CAST(MIN(pos) AS INT) AS span_start,
       CAST(MAX(pos) + {SPAN_K - 1} AS INT) AS span_end,
       CAST(MAX(pos) + {SPAN_K - 1} - MIN(pos) + 1 AS INT) AS span_len,
       CAST(COUNT(*) AS BIGINT) AS n_grams
FROM grp
GROUP BY doc_id, island
"""
