"""Text analysis for training-data curation: token counting, quality
scoring, language ID, document fingerprinting.

Reference analog: the per-row Transform* projections (e.g.
TransformTransaction's derived columns, /root/reference/internal/
transform/transaction.go:20-301) — pure functions of one row producing
typed derived columns. Here they are whole-stage-codegen Spark SQL
expressions (no Python in the hot path), each with an exact DuckDB
oracle built from the same `hashing.py` dialect builders.

Scale notes: all four operators are narrow per-row maps — no shuffle,
column-pruned to (doc_id, text) at the parquet scan, linear scaling
with executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import hashing as H

# BPE-ish tokenization regex: letter runs, single digits, single
# non-alnum marks — a crude proxy for subword token count.
_BPE_RE_SPARK = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
_BPE_RE_DUCK = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
_PUNCT_RE = "[^.,;:!?]"

# Tiny per-language stopword vocabularies for the n-gram/stopword
# language-ID heuristic (deterministic, SQL-expressible).
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auf"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "de", "un", "una", "por", "con"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority


def _in_list(langwords: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in langwords)


def _lang_score(tok: str, lang: str, spark: bool) -> str:
    words = _in_list(LANG_STOPWORDS[lang])
    if spark:
        return f"size(filter({tok}, t -> t IN ({words})))"
    return f"len(list_filter({tok}, t -> t IN ({words})))"


def punct_ratio_expr(spark: bool) -> str:
    """Non-punctuation char share — raw IEEE division, deliberately
    UNROUNDED (ROUND(x, 6) diverges between the engines on 7th-decimal
    shortest-repr ties; see the rounding-hazard note in hashing.py).
    Shared by doc_stats and its oracle so the dialect-parity fuzz
    battery (tests/test_hashing_parity.py) always covers the shipped
    expression."""
    if spark:
        return (
            f"cast(length(regexp_replace(text, '{_PUNCT_RE}', '')) as double)"
            f" / greatest(length(text), 1)"
        )
    return (
        f"CAST(LENGTH(regexp_replace(text, '{_PUNCT_RE}', '', 'g')) AS DOUBLE)"
        f" / GREATEST(LENGTH(text), 1)"
    )


def stopword_ratio_expr(spark: bool) -> str:
    tok = H.tokens("text", spark=spark)
    en = _lang_score(tok, "en", spark)
    if spark:
        return f"cast({en} as double) / greatest(size({tok}), 1)"
    return f"CAST({en} AS DOUBLE) / GREATEST(len({tok}), 1)"


def quality_score_expr(spark: bool) -> str:
    """0.4*len_score + 0.3*(1 - punct_ratio) + 0.3*stop_ratio, len
    score saturating at 200 tokens. A multi-term double expression:
    bit-parity rests on both engines evaluating the identical op
    sequence with no FP contraction, which is exactly what the fuzz
    battery pins (ADVICE r04 #3)."""
    tok = H.tokens("text", spark=spark)
    if spark:
        return (
            f"0.4 * least(cast(size({tok}) as double) / 200.0, 1.0)"
            f" + 0.3 * (1.0 - {punct_ratio_expr(True)})"
            f" + 0.3 * ({stopword_ratio_expr(True)})"
        )
    return (
        f"0.4 * LEAST(CAST(len({tok}) AS DOUBLE) / 200.0, 1.0)"
        f" + 0.3 * (1.0 - {punct_ratio_expr(False)})"
        f" + 0.3 * ({stopword_ratio_expr(False)})"
    )


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document counting + quality score (expression builders
    shared with the oracle and the dialect fuzz battery above)."""
    tok = H.tokens("text", spark=True)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.expr(f"cast(size({tok}) as long)").alias("n_tokens_ws"),
        F.expr(f"cast(regexp_count(text, '{_BPE_RE_SPARK}') as long)").alias("n_tokens_bpe"),
        F.expr(punct_ratio_expr(True)).alias("punct_ratio"),
        F.expr(stopword_ratio_expr(True)).alias("stopword_ratio"),
        F.expr(quality_score_expr(True)).alias("quality_score"),
    )


def doc_stats_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    return f"""WITH {corpus_cte}
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars,
       CAST(len({tok}) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '{_BPE_RE_DUCK}')) AS BIGINT) AS n_tokens_bpe,
       {punct_ratio_expr(False)} AS punct_ratio,
       {stopword_ratio_expr(False)} AS stopword_ratio,
       {quality_score_expr(False)} AS quality_score
FROM corpus
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-overlap language ID with deterministic tie-break
    (en > de > fr > es on equal scores)."""
    tok = H.tokens("text", spark=True)
    scores = {L: F.expr(f"cast({_lang_score(tok, L, True)} as long)") for L in _LANG_ORDER}
    pred = F.lit(None).cast("string")
    # build the CASE chain from lowest to highest priority
    for L in reversed(_LANG_ORDER):
        higher = _LANG_ORDER[: _LANG_ORDER.index(L)]
        cond = None
        for o in _LANG_ORDER:
            if o == L:
                continue
            c = scores[L] > scores[o] if o in higher else scores[L] >= scores[o]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(L)).otherwise(pred)
    out = docs.select(
        "doc_id",
        *[scores[L].alias(f"score_{L}") for L in _LANG_ORDER],
        pred.alias("pred_lang"),
    )
    return out


def lang_id_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    s = {L: _lang_score(tok, L, False) for L in _LANG_ORDER}
    cases = []
    for L in _LANG_ORDER:
        higher = _LANG_ORDER[: _LANG_ORDER.index(L)]
        conds = []
        for o in _LANG_ORDER:
            if o == L:
                continue
            op = ">" if o in higher else ">="
            conds.append(f"{s[L]} {op} {s[o]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{L}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE NULL END"
    cols = ",\n       ".join(f"CAST({s[L]} AS BIGINT) AS score_{L}" for L in _LANG_ORDER)
    return f"""WITH {corpus_cte}
SELECT doc_id,
       {cols},
       {case_sql} AS pred_lang
FROM corpus
"""


def fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint + min 3-gram shingle hash
    (the winnowing-style second signal).

    Built stagewise (tokens -> shingles -> hashes as real columns):
    inlining the token split into the shingle lambda makes codegen
    re-split the text once per shingle element."""
    tok = H.tokens("text", spark=True)
    return (
        docs.select("doc_id", F.expr(tok).alias("toks"))
        .select(
            "doc_id",
            F.expr("concat_ws(' ', toks)").alias("norm"),
            F.expr(H.hash_array("toks", spark=True)).alias("wh"),
        )
        .select(
            "doc_id",
            F.expr(H.char_hash_wide("norm", spark=True)).alias("fp64"),
            F.expr(
                f"array_min({H.shingle_hashes_from_words('wh', 3, spark=True)})"
            ).alias("min_shingle_hash"),
        )
    )


def fingerprint_oracle(corpus_cte: str) -> str:
    tok = H.tokens("text", spark=False)
    norm = f"array_to_string({tok}, ' ')"
    sh = H.shingle_hashes_from_words("wh", 3, spark=False)
    return f"""WITH {corpus_cte},
whs AS (SELECT doc_id, {H.char_hash_wide(norm, spark=False)} AS fp64,
               {H.hash_array(tok, spark=False)} AS wh
        FROM corpus)
SELECT doc_id, fp64, list_min({sh}) AS min_shingle_hash FROM whs
"""


# --- PII redaction ----------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded/unbounded
# repetition, alternation-free. Replacement order is part of the
# contract (emails first, then URLs, then long digit runs) and is
# mirrored verbatim in the oracle.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"https?://[A-Za-z0-9./_%-]+"
PII_LONGNUM_RE = r"[0-9]{8,}"


def _pii_case(spark: bool) -> str:
    """Deterministic synthetic-PII injection (the raw synthetic corpus
    contains none, so the operator would be a no-op): doc_id % 4
    selects an email / URL / long-number suffix or none. Shared
    verbatim with the oracle, same pattern as corpus.CORPUS_CTE."""
    did = "CAST(doc_id AS VARCHAR)" if not spark else "cast(doc_id as string)"
    num = (
        f"lpad({did}, 9, '0')"  # 9-digit run, always >= 8
    )
    return (
        f"CASE CAST(doc_id % 4 AS INT) "
        f"WHEN 0 THEN ' contact user' || {did} || '@example.com today' "
        f"WHEN 1 THEN ' see https://example.org/repo/' || {did} || '/readme' "
        f"WHEN 2 THEN ' ref id 9' || {num} || ' follows' "
        f"ELSE '' END"
    )


def inject_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Benchmark/test FIXTURE, not part of the operator: append the
    deterministic synthetic PII suffix (_pii_case) to each document's
    text so the scrub below has something to find (the raw synthetic
    corpus contains none). Production callers never use this — they
    call redact_pii directly on their own text."""
    return docs.withColumn(
        "text", F.concat(F.col("text"), F.expr(_pii_case(spark=True)))
    )


def redact_pii(docs: DataFrame) -> DataFrame:
    """Scrub PII-shaped spans (emails, URLs, >=8-digit number runs)
    from document text, reporting per-doc match counts — the standard
    pre-training scrub pass. Whole-stage-codegen regexes (JVM
    regexp_replace / regexp_count), zero Python, narrow map. Pure: it
    redacts exactly the text it is given (the synthetic-PII injection
    lives in the inject_synthetic_pii fixture, composed by the driver
    query and mirrored in the oracle's CTE).

    Reference analog: the per-row string sanitation in the Transform*
    projections (internal/transform/transaction.go:20-301 dispositions
    of memo/text fields) — here a declarative per-row projection.

    Scale notes: no shuffle; regex evaluation is linear in text bytes
    and runs inside codegen. At 100 TB this is scan-bound; the three
    fixed patterns compile once per task."""
    t0 = F.col("text")
    n_em = F.regexp_count(t0, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    n_url = F.regexp_count(t1, F.lit(PII_URL_RE))
    t2 = F.regexp_replace(t1, PII_URL_RE, "<URL>")
    n_num = F.regexp_count(t2, F.lit(PII_LONGNUM_RE))
    t3 = F.regexp_replace(t2, PII_LONGNUM_RE, "<NUM>")
    return docs.select(
        "doc_id",
        t3.alias("clean_text"),
        n_em.cast("long").alias("n_emails"),
        n_url.cast("long").alias("n_urls"),
        n_num.cast("long").alias("n_longnums"),
    )


def redact_pii_oracle(corpus_cte: str) -> str:
    case = _pii_case(spark=False)
    em, url, num = PII_EMAIL_RE, PII_URL_RE, PII_LONGNUM_RE
    return f"""WITH {corpus_cte},
pii AS (SELECT doc_id, text || {case} AS t0 FROM corpus),
s1 AS (
  SELECT doc_id, t0,
         regexp_replace(t0, '{em}', '<EMAIL>', 'g') AS t1,
         len(regexp_extract_all(t0, '{em}')) AS n_emails
  FROM pii
),
s2 AS (
  SELECT doc_id, t1, n_emails,
         regexp_replace(t1, '{url}', '<URL>', 'g') AS t2,
         len(regexp_extract_all(t1, '{url}')) AS n_urls
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_urls,
         regexp_replace(t2, '{num}', '<NUM>', 'g') AS clean_text,
         len(regexp_extract_all(t2, '{num}')) AS n_longnums
  FROM s2
)
SELECT doc_id, clean_text, n_emails, n_urls, n_longnums FROM s3
"""
