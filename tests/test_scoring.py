"""Behavior tests for the wave-5 scoring/packaging operators
(functions/scoring.py). Oracle value-parity for each driver query is
covered by tests/test_oracle_parity.py; these pin the *semantic
properties* a user relies on: chunk coverage/overlap, sample
determinism under repartitioning, gate/flag consistency, and CLI
round-trips."""

from __future__ import annotations

import pytest

from stellar_etl_spark import cli
from stellar_etl_spark.functions import scoring as S

DOCS_PARQUET = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS_PARQUET).select(
        "doc_id", "text", "lang", "source"
    )


def test_chunk_coverage_and_shape(spark, docs):
    """Every token position is covered, every chunk but the last is
    full-size, chunk starts advance by exactly the stride."""
    C, St = S.CHUNK_SIZE, S.CHUNK_STRIDE
    rows = S.chunk_documents(docs).collect()
    n_tok = {
        r["doc_id"]: r["n"]
        for r in docs.selectExpr(
            "doc_id",
            "size(filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')) AS n",
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, n in n_tok.items() if n > 0}
    for doc_id, chunks in by_doc.items():
        n = n_tok[doc_id]
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks[:-1]:
            assert c["n_tokens"] == C
            assert len(c["chunk_text"].split(" ")) == C
        last = chunks[-1]
        # last chunk reaches exactly the end of the doc
        assert last["chunk_idx"] * St + last["n_tokens"] == n
        # and the one-more-chunk start would fall beyond the doc
        if len(chunks) > 1:
            assert (last["chunk_idx"] - 1) * St + C < n


def test_chunk_hash_identity(spark, docs):
    """Chunk hash is a pure function of chunk text: equal text <=>
    equal hash across the whole output (dedup-ready identity)."""
    rows = S.chunk_documents(docs).select("chunk_text", "chunk_hash").collect()
    seen: dict[str, int] = {}
    for r in rows:
        h = seen.setdefault(r["chunk_text"], r["chunk_hash"])
        assert h == r["chunk_hash"]
    # distinct hashes == distinct texts (no collision in this corpus)
    assert len({r["chunk_hash"] for r in rows}) == len(seen)


def test_priority_sample_deterministic_across_partitioning(spark, docs):
    """The sample is a pure function of the data: same K rows whatever
    the physical partitioning (TakeOrdered merges per-partition heads)."""
    a = {r["doc_id"] for r in S.priority_sample(docs).collect()}
    b = {
        r["doc_id"]
        for r in S.priority_sample(docs.repartition(17, "lang")).collect()
    }
    assert a == b
    assert len(a) == S.PRIORITY_K


def test_priority_sample_is_exact_topk(spark, docs):
    """The sample is exactly the K rows with the largest priority
    (ties broken by doc_id) — TakeOrdered must agree with a full
    driver-side recompute over every row's priority."""
    _, pr = S._priority_exprs(spark=True)
    full = docs.selectExpr("doc_id", f"{pr} AS priority").collect()
    want = [
        r["doc_id"]
        for r in sorted(full, key=lambda r: (-r["priority"], r["doc_id"]))
    ][: S.PRIORITY_K]
    got = [r["doc_id"] for r in S.priority_sample(docs).collect()]
    assert sorted(got) == sorted(want)


def test_quality_logreg_consistency(spark, docs):
    rows = S.quality_logreg(docs).collect()
    assert any(r["keep"] for r in rows) and not all(r["keep"] for r in rows)
    for r in rows:
        assert r["keep"] == (r["logit_milli"] > 0)
        assert r["quality_score"] == r["logit_milli"] / 1000.0
        assert r["n_unique"] <= r["n_tokens"]


def test_blocklist_flag_consistency(spark, docs):
    rows = S.blocklist_hits(docs).collect()
    assert any(r["n_blocked"] > 0 for r in rows)
    for r in rows:
        assert (r["first_blocked"] is None) == (r["n_blocked"] == 0)
        if r["first_blocked"] is not None:
            assert r["first_blocked"] in S.BLOCKLIST
        assert r["flagged"] == (
            r["n_blocked"] * 1000 > r["n_tokens"] * S.BLOCK_MAX_PERMILLE
        )


def test_lm_score_consistency(spark, docs):
    """Score is exactly the mean of the integer permille sum, zero for
    sub-bigram docs. (No upper-bound assertion: c2 <= c1 holds only
    absent bigram-hash collisions, so a 1000-permille cap would be a
    corpus-size-dependent flake.)"""
    for r in S.ngram_lm_score(docs).collect():
        assert r["sum_permille"] >= 0 and r["n_bigrams"] >= 0
        if r["n_bigrams"] > 0:
            assert r["lm_score_permille"] == r["sum_permille"] / r["n_bigrams"]
        else:
            assert r["sum_permille"] == 0 and r["lm_score_permille"] == 0.0


def test_curation_pipeline_composition(spark, docs):
    """The composed pipeline's stage counts equal recomputing each
    stage from the standalone operators, and doc-stage counts are
    monotone non-increasing."""
    got = {r["stage"]: r["rows_out"] for r in S.curation_pipeline(docs).collect()}
    assert list(got) == list(S.PIPELINE_STAGES)
    assert got["input"] >= got["quality_gate"] >= got["blocklist"] >= got["doc_dedup"]
    assert got["chunk"] >= got["chunk_dedup"]

    q = {r["doc_id"]: r["keep"] for r in S.quality_logreg(docs).collect()}
    b = {r["doc_id"]: not r["flagged"] for r in S.blocklist_hits(docs).collect()}
    assert got["quality_gate"] == sum(q.values())
    assert got["blocklist"] == sum(1 for d in q if q[d] and b[d])

    passed = docs.filter(
        docs.doc_id.isin([d for d in q if q[d] and b[d]])
    )
    from pyspark.sql import functions as F
    from stellar_etl_spark.functions.dedup import _norm_expr
    from stellar_etl_spark.functions.hashing import char_hash_wide

    surv = (
        passed.select(
            "doc_id", "text",
            F.expr(char_hash_wide(_norm_expr(True), spark=True)).alias("fp"),
        )
        .groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    )
    assert got["doc_dedup"] == surv.count()
    surv_docs = passed.join(surv.select("doc_id"), "doc_id").select("doc_id", "text")
    chunks = S.chunk_documents(surv_docs)
    assert got["chunk"] == chunks.count()
    assert got["chunk_dedup"] == chunks.select("chunk_hash").distinct().count()


def test_cli_scoring_tables_export(spark, tmp_path):
    """Wave-5 tables round-trip through the CLI (one-export-command-
    per-table parity, /root/reference/cmd/export_ledger_entry_changes.go:90-109)."""
    out = str(tmp_path / "out")
    for cmd, table in [
        ("export-chunk-documents", "chunk_documents"),
        ("export-ngram-lm-score", "ngram_lm_score"),
        ("export-priority-sample", "priority_sample"),
        ("export-quality-logreg", "quality_logreg"),
        ("export-blocklist-hits", "blocklist_hits"),
        ("export-curation-pipeline", "curation_pipeline"),
    ]:
        rc = cli.main([cmd, "--input", DOCS_PARQUET, "--out", out], spark=spark)
        assert rc == 0
        assert spark.read.parquet(f"{out}/{table}").count() > 0
