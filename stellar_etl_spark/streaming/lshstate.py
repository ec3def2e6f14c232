"""Streaming MinHash-LSH dedup — bucket membership as bounded state.

The streaming shape of T2 (functions/dedup.minhash_lsh_dedup): documents
arrive as a stream, each contributes its 16 LSH band keys (a stateless
narrow map — the same minhash_sig expressions as the batch operator, so
band keys are bit-identical), and the per-(band_idx, band_key) bucket
membership lives in the state store. Unlike a declarative
collect_set aggregation — whose state grows without bound on a hot
bucket — the processor enforces the batch operator's BAND_CAP
semantics IN the state: a bucket that exceeds the cap drops its member
list and keeps only the counter ("poisoned"), so per-key state is hard-
bounded at BAND_CAP doc ids + one counter regardless of how degenerate
the corpus is. n never decreases, so a poisoned bucket can never emit
members again — exactly the batch rule (buckets with final occupancy
> BAND_CAP are excluded from candidate generation).

Emission is update-mode: each micro-batch the processor emits the new
(n, members) snapshot of every bucket it touched; the exactly-once
epoch sink keeps them all and the batch-side fold takes the latest
epoch per bucket (cumulative state makes the fold order-safe — the
dedup_exact drain discipline), generates within-bucket pairs row-
locally (nested transform, no extra shuffle), and verifies exact
Jaccard against the narrow signature table. Stream result == batch
operator == the shared DuckDB oracle.

No timers and no closer sentinels: documents carry no event time, and
update emission + final-epoch fold needs neither — state+offsets
checkpoint atomically, so kill/resume replays rebuild identical bucket
snapshots (tests/test_streaming.py::test_minhash_resume_...).

Reference analog: the in-process seen-maps the reference keeps per
export loop (cmd/export_assets.go:40-58), lifted to a distributed,
checkpointed, hard-bounded state store keyed by LSH bucket.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from stellar_etl_spark.functions import hashing as H
from stellar_etl_spark.functions.dedup import BAND_CAP

BUCKET_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("band_key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("members", T.ArrayType(T.LongType())),
    ]
)

# state: total docs ever seen in this bucket + members while n <= cap
BUCKET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("members", T.ArrayType(T.LongType())),
    ]
)


def _bucket_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    band_idx, band_key = key
    n, members = (0, [])
    if state.exists:
        n, members = state.get
        members = list(members)

    seen = set(members)
    for pdf in pdf_iter:
        for d in pdf["doc_id"]:
            d = int(d)
            if d in seen:
                continue  # same doc replayed into the same bucket
            n += 1
            if n <= BAND_CAP:
                seen.add(d)
                members.append(d)
            elif members:
                members = []  # poisoned: counter only from here on
    state.update((n, members if n <= BAND_CAP else []))
    yield pd.DataFrame(
        {
            "band_idx": pd.array([band_idx], dtype="Int32"),
            "band_key": pd.array([band_key], dtype="string"),
            "n": pd.array([n], dtype="Int64"),
            "members": [members if n <= BAND_CAP else []],
        }
    )


def minhash_bucket_stream(doc_stream: DataFrame) -> DataFrame:
    """(doc_id, text) stream -> update-mode bucket snapshots.

    The signature map is the batch operator's expression tree verbatim
    (tokens -> word hashes -> distinct shingle hashes -> 32 minhash
    slots -> 16 2-row band keys), evaluated stagewise so codegen
    computes each stage once; no repartition/checkpoint (streaming-
    incompatible and unnecessary — the exchange here is the stateful
    groupBy itself)."""
    tok = H.tokens("text", spark=True)
    sig_exprs = ", ".join(
        H.minhash_sig("hs", i, spark=True) for i in range(H.MINHASH_K)
    )
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
    bands = (
        doc_stream.select("doc_id", F.expr(tok).alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.expr(H.hash_array("toks", spark=True)).alias("wh"))
        .select(
            "doc_id",
            F.expr(
                f"array_distinct({H.shingle_hashes_from_words('wh', 3, spark=True)})"
            ).alias("hs"),
        )
        .select("doc_id", F.expr(f"array({sig_exprs})").alias("sig"))
        .select("doc_id", F.explode(F.array(*band_structs)).alias("b"))
        .select("doc_id", "b.band_idx", "b.band_key")
    )
    return bands.groupBy("band_idx", "band_key").applyInPandasWithState(
        _bucket_fn,
        BUCKET_OUTPUT_SCHEMA,
        BUCKET_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def pairs_from_bucket_table(buckets: DataFrame, sigs: DataFrame) -> DataFrame:
    """Final bucket snapshots -> verified duplicate pairs, the batch
    operator's candidate/verify semantics: buckets with 2..BAND_CAP
    members produce all within-bucket pairs (row-local nested
    transform — no shuffle for pair generation), then exact Jaccard on
    the distinct shingle sets from `sigs` (doc_id, hs).

    `buckets` must already be folded to one row per (band_idx,
    band_key)."""
    from stellar_etl_spark.functions.dedup import MINHASH_JACCARD_T

    pairs = (
        buckets.filter((F.col("n") >= 2) & (F.col("n") <= BAND_CAP))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (x, i) -> "
                    "transform(slice(members, i + 2, size(members)), y -> "
                    "struct(least(x, y) as doc_a, greatest(x, y) as doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    ha = sigs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    hb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
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
