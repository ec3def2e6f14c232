"""Streaming MinHash-LSH dedup — bucket membership as bounded state.

The streaming shape of T2 (functions/dedup.minhash_lsh_dedup): documents
arrive as a stream, each contributes its 16 LSH band keys (a stateless
narrow map — the same minhash_sig expressions as the batch operator, so
band keys are bit-identical), and the per-(band_idx, band_key) bucket
membership lives in the state store. Unlike a declarative
collect_set aggregation — whose state grows without bound on a hot
bucket — the processor enforces the batch operator's BAND_CAP
semantics IN the state: a bucket that exceeds the cap drops its member
list and keeps only the counter ("poisoned"), so per-bucket state is
hard-bounded at BAND_CAP doc ids + one counter regardless of how
degenerate the corpus is. n never decreases, so a poisoned bucket can
never emit members again — exactly the batch rule (buckets with final
occupancy > BAND_CAP are excluded from candidate generation).

State is SHARDED, not per-bucket: the state key is (band_idx,
pmod(hash(band_key), LSH_STATE_SHARDS)) and the state value is the
shard's bucket map (an array of (band_key, n, members) structs). LSH
buckets are overwhelmingly singletons (16 near-unique band keys per
doc), so per-bucket state keys would pay the stateful-operator's
per-group Python/Arrow round-trip ~once per (doc x band) — measured
~23-29 s for a sf0.1 drain; sharding amortizes it into
16 x LSH_STATE_SHARDS group invocations per trigger, each emitting all
its touched buckets as ONE multi-row Arrow batch (measured ~6 s, same
output). The per-bucket invariants (cap, poisoning, monotone n) are
enforced inside the shard map per band_key, unchanged. Sharding is the
deployment knob: per-shard state is ~total_buckets/shards entries
(each ≤ BAND_CAP ids), so shards scale with the corpus to bound both
shard state size and per-trigger write amplification (a touched shard
rewrites its map on commit — the RocksDB provider makes that an
incremental delta).

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
checkpointed, hard-bounded state store keyed by LSH bucket shard.
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

# state shards per band; 16 bands x 64 = 1024 state keys. Scale knob:
# grow with the corpus so per-shard maps stay small (see module doc).
LSH_STATE_SHARDS = 64

BUCKET_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("band_key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("members", T.ArrayType(T.LongType())),
    ]
)

# state: the shard's bucket map — per bucket, total docs ever seen and
# the member list while n <= cap (emptied forever once past it)
SHARD_STATE_SCHEMA = T.StructType(
    [
        T.StructField(
            "buckets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("band_key", T.StringType()),
                        T.StructField("n", T.LongType()),
                        T.StructField("members", T.ArrayType(T.LongType())),
                    ]
                )
            ),
        )
    ]
)


def _shard_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    band_idx = int(key[0])
    buckets: dict[str, list] = {}
    if state.exists:
        (stored,) = state.get
        for bk, n, members in stored:
            buckets[bk] = [n, list(members)]

    touched: set[str] = set()
    for pdf in pdf_iter:
        for bk, d in zip(pdf["band_key"], pdf["doc_id"]):
            ent = buckets.get(bk)
            if ent is None:
                ent = buckets[bk] = [0, []]
            d = int(d)
            if d in ent[1]:
                continue  # same doc replayed into the same bucket
            ent[0] += 1
            if ent[0] <= BAND_CAP:
                ent[1].append(d)
            else:
                ent[1] = []  # poisoned: counter only from here on
            touched.add(bk)
    state.update(
        ([(bk, n, members) for bk, (n, members) in buckets.items()],)
    )
    tl = sorted(touched)
    yield pd.DataFrame(
        {
            "band_idx": pd.array([band_idx] * len(tl), dtype="Int32"),
            "band_key": pd.array(tl, dtype="string"),
            "n": pd.array([buckets[bk][0] for bk in tl], dtype="Int64"),
            "members": [list(buckets[bk][1]) for bk in tl],
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
        .withColumn(
            "shard", F.pmod(F.hash("band_key"), F.lit(LSH_STATE_SHARDS))
        )
    )
    return bands.groupBy("band_idx", "shard").applyInPandasWithState(
        _shard_fn,
        BUCKET_OUTPUT_SCHEMA,
        SHARD_STATE_SCHEMA,
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
