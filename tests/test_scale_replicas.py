"""Properties of the scale-harness replica transform (bench_dedup_scale.

EMB_REPLICA_EXPR). The 100x/1000x embedding-family scale artifacts
(SCALE_EMBED_*.json, BASELINE.md 4j) are only valid measurements if the
per-replica transform is orthogonal (workload shape preserved: norms and
planted-pair cosines unchanged) AND replicas are pairwise distinct (the
corpus really grows, instead of repeating at the rotation period). Those
two facts are exactly what these tests pin, on the real embeddings
table, including replica pairs that straddle the 64-dim rotation period
where the pre-fix synthesis collapsed."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bench_dedup_scale import EMB_REPLICA_EXPR
from tests.conftest import SF_UNIT

# replicas chosen to cross the 64-dim rotation period: (1, 65) and
# (64, 128) were IDENTICAL under rotation-only synthesis
REPLICAS = (0, 1, 7, 64, 65, 128)


@pytest.fixture(scope="module")
def transformed(spark):
    embs = spark.read.parquet(f"{SF_UNIT}/embeddings.parquet").limit(40)
    r = F.explode(F.array(*[F.lit(x) for x in REPLICAS])).alias("r")
    rows = (
        embs.select("vec_id", "embedding", r)
        .select("vec_id", "r", F.expr(EMB_REPLICA_EXPR).alias("e"), "embedding")
        .collect()
    )
    base = {row.vec_id: row.embedding for row in rows if row.r == 0}
    return base, {(row.vec_id, row.r): row.e for row in rows}


def _cos(a, b):
    d = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return sum(x * y for x, y in zip(a, b)) / d if d else 0.0


def test_replica_zero_is_identity(transformed):
    base, by = transformed
    assert all(by[(v, 0)] == base[v] for v in base)


def test_norms_preserved(transformed):
    base, by = transformed
    for (v, _r), e in by.items():
        n0 = math.sqrt(sum(x * x for x in base[v]))
        n1 = math.sqrt(sum(x * x for x in e))
        assert abs(n0 - n1) <= 1e-3 * max(n0, 1.0)


def test_replicas_distinct_across_rotation_period(transformed):
    base, by = transformed
    v = min(base)
    for ra, rb in ((0, 64), (1, 65), (64, 128)):
        assert by[(v, ra)] != by[(v, rb)], (
            f"replicas {ra} and {rb} collapsed — rotation period leak"
        )
        # decorrelated, not merely unequal: far below the 0.98 dup gate
        assert abs(_cos(by[(v, ra)], by[(v, rb)])) < 0.9


def test_same_replica_pair_cosines_invariant(transformed):
    base, by = transformed
    vs = sorted(base)[:6]
    for r in (1, 64, 65):
        for i in range(len(vs) - 1):
            a, b = vs[i], vs[i + 1]
            before = _cos(base[a], base[b])
            after = _cos(by[(a, r)], by[(b, r)])
            assert after == pytest.approx(before, abs=1e-4)
