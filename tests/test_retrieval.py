"""BM25 sparse retrieval: ranking sanity, fanout invariance, and the
planted-relevance contract. Exact value parity vs the DuckDB oracle is
covered by tests/test_oracle_parity.py (the `bm25_topk` registry
entry); these tests pin the semantic properties the hash compare alone
would not explain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stellar_etl_spark.functions import retrieval as R
from stellar_etl_spark.functions.corpus import load_corpus
from tests.conftest import SF_UNIT


@pytest.fixture(scope="module")
def topk(spark):
    return R.bm25_topk(load_corpus(spark, SF_UNIT)).collect()


def test_bm25_rank_contract(topk):
    """Per query: ranks are 1..n contiguous, n <= k, scores
    non-increasing in rank, doc_id strictly increasing on ties."""
    by_q = {}
    for r in topk:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {qid for qid, _ in R.BM25_QUERIES}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= R.BM25_K
        for a, b in zip(rows, rows[1:]):
            assert a.bm25 > b.bm25 or (a.bm25 == b.bm25 and a.doc_id < b.doc_id)


def test_bm25_matches_contain_query_terms(spark, topk):
    """Every returned doc really contains >= n_terms distinct query
    terms (the score is never awarded to a term-free document)."""
    docs = {
        r.doc_id: set(r.toks)
        for r in load_corpus(spark, SF_UNIT)
        .select("doc_id", F.expr(
            "filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')"
        ).alias("toks"))
        .collect()
    }
    qterms = {qid: set(q.lower().split()) for qid, q in R.BM25_QUERIES}
    for r in topk:
        hit = docs[r.doc_id] & qterms[r.query_id]
        assert len(hit) == r.n_terms and r.n_terms >= 1


def test_bm25_fanout_invariance(spark, monkeypatch):
    """The two-phase top-k is identical to the single-window form for
    any fanout (the local phase only ever drops rows that cannot reach
    the global top-k)."""
    corpus = load_corpus(spark, SF_UNIT)

    def run():
        return sorted(
            tuple(r) for r in R.bm25_topk(corpus).collect()
        )

    base = run()
    for fanout in (1, 7):
        monkeypatch.setattr(R, "BM25_FANOUT", fanout)
        assert run() == base


def test_bm25_planted_relevance(spark):
    """A document that is exactly the query (repeated) outranks
    everything else for that query; a document sharing no terms is
    absent."""
    rows = [
        (1, "fast hash join fast hash join fast hash join"),
        (2, "fast table table table table scan scan value"),
        (3, "customer order order order"),
        (4, "zzz qqq ppp"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in rows],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r.query_id, r.rank): r.doc_id
        for r in R.bm25_topk(docs, k=3).collect()
    }
    assert got[(1, 1)] == 1  # the pure 'fast hash join' doc wins query 1
    assert got[(3, 1)] == 3  # 'customer order ...' wins query 3
    assert 4 not in set(got.values())  # no shared term, never retrieved
