"""Integer-exact PageRank (functions/graph.pagerank): bit-equality
against an independent pure-Python fold on a hand graph, plus the
two-phase candidate window of retrieve_rerank."""

from __future__ import annotations

from stellar_etl_spark.functions.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITERS,
    PR_SCALE,
    pagerank,
)


def _py_pagerank(edges, iters=PR_ITERS, scale=PR_SCALE):
    """Reference fold with the same integer arithmetic, written
    independently of the DataFrame plan (dict-based)."""
    outw: dict = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    base = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    r = {n: scale for n in nodes}
    for _ in range(iters):
        inr: dict = {}
        for s, d, w in edges:
            inr[d] = inr.get(d, 0) + (r[s] * w) // outw[s]
        r = {n: base + (PR_DAMP_NUM * inr.get(n, 0)) // PR_DAMP_DEN for n in nodes}
    return r


def test_pagerank_matches_python_reference(spark):
    # a hub, a chain, a dangling sink, a self-reinforcing pair
    edges = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
        ("c", "d", 4), ("d", "e", 1),  # e dangles (rank leaks)
        ("f", "g", 1), ("g", "f", 1),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = dict(pagerank(df).collect())
    assert got == _py_pagerank(edges)
    # dangling sink keeps only base + damped inflow, never redistributes
    assert got["e"] > 0 and "e" in got


def test_pagerank_rank_mass_bounded(spark):
    """Floor arithmetic only loses mass: total rank stays <= n*scale
    and every node keeps at least the teleport base."""
    edges = [("a", "b", 1), ("b", "a", 1), ("b", "c", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    ranks = [r for _, r in pagerank(df).collect()]
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    assert all(r >= base for r in ranks)
    assert sum(ranks) <= 3 * PR_SCALE


def test_rerank_invariants(spark):
    """Structural invariants of the rerank funnel (the two-phase ==
    single-window equality itself is proven end-to-end by the oracle
    parity test: the DuckDB mirror uses ONE window)."""
    from stellar_etl_spark.functions.corpus import load_documents, load_embeddings
    from stellar_etl_spark.functions.retrieval import RERANK_CAND, retrieve_rerank

    sf = "/root/testdata/sf0.001"
    docs, emb = load_documents(spark, sf), load_embeddings(spark, sf)
    got = retrieve_rerank(docs, emb)
    rows = got.collect()
    assert rows, "rerank produced no rows at sf0.001"
    # rank is dense 1..k per query and every row's overlap is positive
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.overlap >= 1
    for q, rs in by_q.items():
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= RERANK_CAND
        # rerank order is by cosine desc, doc_id asc
        ordered = sorted(rs, key=lambda x: (-x.cos_sim, x.doc_id))
        assert [x.doc_id for x in ordered] == [
            x.doc_id for x in sorted(rs, key=lambda x: x.rank)
        ]
