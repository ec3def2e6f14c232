"""Cross-dialect property tests for the hashing expression builders.

Every exact oracle in the repo rests on `functions/hashing.py` emitting
bit-identical values from Spark SQL and DuckDB SQL. The driver's
queries exercise them over the generator's corpus; this suite fuzzes
them over a seeded adversarial corpus (empty strings, whitespace runs,
punctuation-only, single chars, long repeats, ASCII edge codepoints)
so a dialect divergence can't hide behind friendly data.

Batched design: all examples are evaluated in ONE Spark pass and ONE
DuckDB pass per builder (a per-example Spark round-trip would be ~0.5 s
each); rows are compared by id. Seeded RNG, deterministic corpus.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from stellar_etl_spark.functions import hashing as H

_PRINTABLE = string.ascii_letters + string.digits + " .,;:!?|'-_/()"


def _corpus() -> list[str]:
    rng = random.Random(0xBEEF)
    texts = [
        "",
        " ",
        "   \t  ",
        "a",
        "Z",
        ".",
        "...",
        "the the the the the",
        "word " * 50,
        "no-spaces-just-one-token",
        "MiXeD CaSe ToKeNs Here",
        "1 2 3 4 5 6 7 8 9 10",
        "trailing spaces   ",
        "   leading spaces",
        "~!@#$%^&*()_+ {}[]<>",
    ]
    for n in range(60):
        length = rng.randint(1, 120)
        texts.append("".join(rng.choice(_PRINTABLE) for _ in range(length)))
    return texts


@pytest.fixture(scope="module")
def frames(spark):
    texts = _corpus()
    sdf = spark.createDataFrame(
        list(enumerate(texts)), "i long, text string"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    return sdf, con


def _compare(spark_df, con, duck_sql, tag):
    s = {r["i"]: r["v"] for r in spark_df.collect()}
    d = {i: v for i, v in con.execute(duck_sql).fetchall()}
    assert s.keys() == d.keys()
    for i in s:
        sv, dv = s[i], d[i]
        if isinstance(sv, list):
            sv = tuple(sv)
        if isinstance(dv, list):
            dv = tuple(dv)
        assert sv == dv, f"{tag}: row {i}: spark={sv!r} duck={dv!r}"


def _run(spark_df, con, spark_expr, duck_expr, tag):
    from pyspark.sql import functions as F

    _compare(
        spark_df.select("i", F.expr(spark_expr).alias("v")),
        con,
        f"SELECT i, {duck_expr} AS v FROM t ORDER BY i",
        tag,
    )


def test_char_hash(frames):
    sdf, con = frames
    _run(sdf, con, H.char_hash("text", True), H.char_hash("text", False), "char_hash")


def test_char_hash_wide(frames):
    sdf, con = frames
    _run(sdf, con, H.char_hash_wide("text", True),
         H.char_hash_wide("text", False), "char_hash_wide")


def test_tokens(frames):
    sdf, con = frames
    _run(sdf, con, H.tokens("text", True), H.tokens("text", False), "tokens")


def test_shingles(frames):
    sdf, con = frames
    for n in (2, 3):
        _run(sdf, con,
             H.shingles(H.tokens("text", True), n, True),
             H.shingles(H.tokens("text", False), n, False),
             f"shingles{n}")


def test_hash_array_over_tokens(frames):
    sdf, con = frames
    _run(sdf, con,
         H.hash_array(H.tokens("text", True), True),
         H.hash_array(H.tokens("text", False), False),
         "hash_array")


def test_shingle_hashes_from_words(frames):
    sdf, con = frames
    wh_s = H.hash_array(H.tokens("text", True), True)
    wh_d = H.hash_array(H.tokens("text", False), False)
    for n in (2, 3):
        _run(sdf, con,
             H.shingle_hashes_from_words(wh_s, n, True),
             H.shingle_hashes_from_words(wh_d, n, False),
             f"shingle_hashes{n}")


def test_widen_hash(frames):
    sdf, con = frames
    base_s = H.char_hash("text", True)
    base_d = H.char_hash("text", False)
    _run(sdf, con, H.widen_hash(base_s, True), H.widen_hash(base_d, False),
         "widen_hash")


def test_minhash_sigs(frames):
    sdf, con = frames
    hs_s = H.shingle_hashes_from_words(H.hash_array(H.tokens("text", True), True), 3, True)
    hs_d = H.shingle_hashes_from_words(H.hash_array(H.tokens("text", False), False), 3, False)
    # guard empties: array_min/list_min of [] is NULL on both sides
    for i in (0, 7, 31):
        _run(sdf, con, H.minhash_sig(hs_s, i, True), H.minhash_sig(hs_d, i, False),
             f"minhash_{i}")


def test_dot_and_norm_folds(spark):
    """Vector folds compared on seeded float arrays (round-6 literals,
    the same family the LSH planes use)."""
    import random as _r

    from pyspark.sql import functions as F

    rng = _r.Random(0xF00D)
    vecs = [
        [round(rng.uniform(-2, 2), 6) for _ in range(H.EMB_DIM)] for _ in range(40)
    ]
    sdf = spark.createDataFrame(
        [(i, v, vecs[(i + 1) % len(vecs)]) for i, v in enumerate(vecs)],
        "i long, a array<double>, b array<double>",
    )
    got = {
        r["i"]: (r["dp"], r["nm"])
        for r in sdf.select(
            "i",
            F.expr(H.dot_fold("a", "b", True)).alias("dp"),
            F.expr(H.norm_fold("a", True)).alias("nm"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE v (i BIGINT, a DOUBLE[], b DOUBLE[])")
    con.executemany(
        "INSERT INTO v VALUES (?, ?, ?)",
        [(i, v, vecs[(i + 1) % len(vecs)]) for i, v in enumerate(vecs)],
    )
    dp = H.dot_fold("a", "b", False)
    nm = H.norm_fold("a", False)
    for i, d, n in con.execute(f"SELECT i, {dp}, {nm} FROM v").fetchall():
        assert got[i][0] == d, f"dot_fold row {i}"  # bit-exact, same fold order
        assert got[i][1] == n, f"norm_fold row {i}"


def test_cms_buckets(frames):
    """CMS row-hash buckets agree across dialects for every depth (the
    sketch oracle rests on this affine arithmetic)."""
    from stellar_etl_spark.functions import sketch as SK

    sdf, con = frames
    for d in range(SK.CMS_D):
        _run(
            sdf, con,
            SK._cms_bucket(d, SK._cms_hmod("text", True)),
            SK._cms_bucket(d, SK._cms_hmod("text", False)),
            f"cms_bucket_{d}",
        )


def test_bloom_positions(frames):
    """Bloom set-bit positions: the JVM build expression equals the
    numpy probe arithmetic on adversarial gram values (both reduce an
    int64 gram < P through the same affine map)."""
    import numpy as np
    from pyspark.sql import functions as F

    from stellar_etl_spark.functions import trainprep as ftp
    from stellar_etl_spark.functions.hashing import P

    sdf, con = frames
    # gram stand-ins: the char hash of each text (same < P domain)
    from stellar_etl_spark.functions.hashing import char_hash

    g_spark = char_hash("text", True)
    rows = sdf.select(
        "i",
        F.expr(g_spark).alias("g"),
        *[
            F.expr(
                f"pmod(({ftp.BLOOM_A[j]}L * ({g_spark}) + {ftp.BLOOM_B[j]}L) "
                f"% {P}L, {ftp.BLOOM_BITS}L)"
            ).alias(f"p{j}")
            for j in range(ftp.BLOOM_K)
        ],
    ).collect()
    a = np.array(ftp.BLOOM_A, dtype=np.int64)
    b = np.array(ftp.BLOOM_B, dtype=np.int64)
    for r in rows:
        g = np.int64(r["g"])
        want = ((a * g + b) % P) % ftp.BLOOM_BITS
        got = np.array([r[f"p{j}"] for j in range(ftp.BLOOM_K)], dtype=np.int64)
        assert (want == got).all(), f"row {r['i']}: {want} != {got}"


def test_scoring_logreg_exprs(frames):
    """Wave-5 quality-gate features + logit agree across dialects over
    the adversarial corpus (empty/whitespace/punct-only strings hit the
    COALESCE(max token len) and zero-token paths)."""
    from stellar_etl_spark.functions import scoring as S

    se, de = S._logreg_exprs(True), S._logreg_exprs(False)
    sdf, con = frames
    for key in ("n_tok", "n_uniq", "max_len", "logit"):
        _run(sdf, con, se[key], de[key], f"logreg:{key}")


def test_scoring_blocklist_exprs(frames):
    from stellar_etl_spark.functions import scoring as S

    se, de = S._block_exprs(True), S._block_exprs(False)
    sdf, con = frames
    for key in ("n_tok", "n_blocked", "first"):
        _run(sdf, con, se[key], de[key], f"blocklist:{key}")


def test_scoring_priority_expr(frames):
    """Weight and the priority (the single double division) bit-agree;
    the fuzz table's id column is `i`, so substitute it for doc_id in
    both dialects' expressions."""
    from stellar_etl_spark.functions import scoring as S

    sdf, con = frames
    _, sp = S._priority_exprs(True)
    _, dp = S._priority_exprs(False)
    _run(sdf, con, sp.replace("doc_id", "i"), dp.replace("doc_id", "i"),
         "priority")


def test_doc_stats_ratio_exprs(frames):
    """punct_ratio / stopword_ratio / quality_score bit-agree across
    dialects (ADVICE r04 #3: quality_score is a multi-term unrounded
    double expression — 0.4*x + 0.3*y + 0.3*z — whose parity rests on
    both engines evaluating the identical op sequence with no FP
    contraction; this pins it over the adversarial corpus so an
    engine/compiler change surfaces at test time, not at gate time).
    The builders are the SAME strings doc_stats and its oracle ship."""
    from stellar_etl_spark.functions import text as TX

    sdf, con = frames
    for name, builder in (
        ("punct_ratio", TX.punct_ratio_expr),
        ("stopword_ratio", TX.stopword_ratio_expr),
        ("quality_score", TX.quality_score_expr),
    ):
        _run(sdf, con, builder(True), builder(False), f"doc_stats:{name}")
