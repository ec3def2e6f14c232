#!/usr/bin/env python
"""Empirical sub-quadratic scaling evidence for the dedup/ANN family.

Round-2 verdict item 8: the band/df caps that bound candidate growth
were asserted from theory at sf0.1 — this harness measures them. It
runs every dedup/ANN driver query at 1x (sf0.1 as-is) and at a
deterministic 10x replication of the same corpus, and reports the
wall-time ratio per query. Linear-ish growth shows as ratio ~ 10 (plus
fixed Spark overhead, so < 10 is common at this scale); a quadratic
candidate explosion would show as ratio -> 100.

The 10x corpus is synthesized deterministically (no external data, per
the driver contract) so that population grows 10x WITHOUT creating
10-way duplicate clusters between replicas — otherwise the workload
shape changes instead of the scale:

  * documents: replica r in 0..9 gets doc_id + r*1_000_000 (clear of
    the corpus-mutation +10000/+20000 offsets) and, for r > 0, every
    token suffixed with "_r" — replicas share no shingles, so the only
    duplicate pairs are the per-replica planted ones from
    functions/corpus.load_corpus (their count scales exactly 10x
    because the mutation keys on doc_id % 10 and r*1_000_000 % 10 == 0).
  * embeddings: replica r gets vec_id + r*1_000_000 and the 64-dim
    vector cyclically rotated by r dims THEN sign-flipped per
    (replica, dim) by murmur3 parity — both factors orthogonal, so
    norms are preserved and the planted near-pairs (vec_id % 10 == 0,
    +perturbation) transform together (cosine unchanged), while
    cross-replica cosines are those of independent-ish vectors (far
    below the 0.98 gate). The sign flip breaks rotation's 64-dim
    period, so replicas are distinct at any replica count.

Prints ONE JSON line with per-query walls at both scales, the ratio,
and candidate-pair counts where the operator exposes them.

Usage: python bench_dedup_scale.py        (~ a few minutes at local[32])
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_DEDUP_SCALE_DIR", "/tmp/spark_graft_dedup_scale")
REPLICAS = int(os.environ.get("SPARK_GRAFT_DEDUP_REPLICAS", "10"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

QUERIES = (
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "doc_containment",
    "dup_spans",
    "ann_topk_brute",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "doc_top_terms",
    "doc_repetition",
    "semdedup",
    # closing-wave round-4 doc-family queries
    "bm25_topk",
    "retrieve_rerank",
    "curriculum_buckets",
    "domain_topk_sample",
)


# optional comma-list override, e.g. a 100x spot-check on a subset:
#   SPARK_GRAFT_DEDUP_REPLICAS=100 SPARK_GRAFT_SCALE_QUERIES=dedup_minhash_lsh ...
# Embedding replicas decorrelate via cyclic dim rotation COMPOSED WITH a
# deterministic per-(replica, dim) sign flip (both orthogonal, so planted
# pairs keep their cosine exactly); the sign pattern breaks the 64-dim
# rotation period, so replicas are distinct at ANY replica count — the
# former REPLICAS <= 64 validity cap on the embedding/ANN family is gone.
_q_env = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
if _q_env:
    QUERIES = tuple(q.strip() for q in _q_env.split(",") if q.strip())

MARKER_TAG = f"{REPLICAS}-labels-v3"  # bump when the synthesis changes

# Per-replica orthogonal transform over a row with columns (embedding, r):
# cyclic rotation by r dims composed with a murmur3-parity sign flip per
# (replica, dim). Properties guaranteed by orthogonality and TESTED in
# tests/test_scale_replicas.py: r=0 is the identity, norms are preserved,
# same-replica pair cosines are invariant (both vectors get the same
# matrix), and replicas are pairwise distinct at any count (the sign
# pattern breaks rotation's size(embedding)-period).
EMB_REPLICA_EXPR = (
    "transform(sequence(1, size(embedding)), "
    "i -> element_at(embedding, ((i - 1 + r) % size(embedding)) + 1)"
    " * cast(case when r = 0 then 1"
    " else 1 - 2 * pmod(hash(r, i), 2) end as float))"
)


def ensure_scaled_input(spark) -> str:
    """Write the 10x corpus dir once (deterministic; reused across runs)."""
    out = os.path.join(WORK, f"x{REPLICAS}")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == MARKER_TAG:
                return out
    if os.path.isdir(out):
        shutil.rmtree(out)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    r = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("r")

    # token-suffix per replica: replicas share no shingles/words
    sdocs = (
        docs.select("doc_id", "text", "lang", "source", r)
        .select(
            (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text")).otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(t, F.lit("_"), F.col("r").cast("string")),
                    ),
                )
            ).alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    # per-replica orthogonal transform = cyclic dim rotation COMPOSED WITH
    # a deterministic per-(replica, dim) sign flip (murmur3 hash(r, i)
    # parity; replica 0 is the identity so the 1x corpus is a strict
    # subset). Both factors are orthogonal: norms and planted-pair
    # cosines are preserved exactly (both vectors of a pair share r, so
    # they get the SAME matrix), while cross-replica cosine is
    # decorrelated — and unlike rotation alone (period = dim = 64), the
    # sign pattern makes replicas distinct at any count. Labels are
    # replica-disjoint (label + r*10): the transformed replicas ARE
    # separate semantic regions, and this grows the cluster count with
    # the corpus — the K ∝ N regime SemDeDup's scale story assumes
    # (constant expected cluster size). With labels held fixed a 10x run
    # would grow cluster SIZE 10x instead, measuring the wrong regime.
    sembs = (
        embs.select("vec_id", "embedding", "label", r)
        .select(
            (F.col("vec_id") + F.col("r") * 1_000_000).alias("vec_id"),
            F.expr(EMB_REPLICA_EXPR).alias("embedding"),
            (F.col("label") + F.col("r") * 10).alias("label"),
        )
    )
    sdocs.repartition(32).write.parquet(os.path.join(out, "documents.parquet"))
    sembs.repartition(32).write.parquet(os.path.join(out, "embeddings.parquet"))
    with open(marker, "w") as f:
        f.write(MARKER_TAG)
    return out


def main() -> None:
    import __spark_entry__ as entry_mod
    from bench import build_spark

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled_input(spark)
    qs = {k: v for k, v in entry_mod.queries().items() if k in QUERIES}

    def run(sf_dir: str) -> dict[str, float]:
        raw: dict[str, list[float]] = {n: [] for n in qs}
        for _ in range(REPS):
            for name, fn in qs.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                raw[name].append(time.perf_counter() - t0)
                # Release the rep's localCheckpoint blocks NOW (outside
                # the timed region): ContextCleaner only reclaims a
                # checkpointed RDD after a driver full GC notices the
                # reference is dead, and with a large heap full GCs are
                # rare (periodicGC.interval defaults to 30 min) — at
                # 1000x the dead blocks from prior reps otherwise
                # accumulate to an OOM before any single rep's working
                # set comes close to the heap.
                import gc as _gc

                _gc.collect()
                spark.sparkContext._jvm.System.gc()
        return {n: round(sorted(xs)[len(xs) // 2], 3) for n, xs in raw.items()}

    # warmup pass at 1x (JIT/codegen/python pool), then timed 1x, timed 10x
    for name, fn in qs.items():
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    base = run(SF_DIR)
    big = run(scaled)

    # observable output sizes (dup pairs found) at both scales: candidate
    # growth, not just wall time
    rows = {
        n: {
            "x1": qs[n](spark, SF_DIR).count(),
            f"x{REPLICAS}": qs[n](spark, scaled).count(),
        }
        for n in (
            "dedup_minhash_lsh",
            "dedup_ngram_jaccard",
            "dedup_embedding",
            "doc_containment",
            "dup_spans",
        )
        if n in qs
    }

    out = {
        "metric": f"dedup_wall_ratio_{REPLICAS}x_over_1x",
        "unit": f"ratio ({REPLICAS} = linear, {REPLICAS * REPLICAS} = quadratic)",
        "replicas": REPLICAS,
        "reps_per_query": REPS,
        "queries": {
            n: {
                "x1_sec": base[n],
                f"x{REPLICAS}_sec": big[n],
                "ratio": round(big[n] / base[n], 2) if base[n] else None,
            }
            for n in qs
        },
        "dup_pairs_found": rows,
        "sf": SF_DIR,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
