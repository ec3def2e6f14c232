"""Mergeable cardinality sketches: a deterministic HyperLogLog.

Exact COUNT(DISTINCT) at 100 TB forces a full shuffle of every
distinct key; the scale answer is a mergeable register sketch whose
per-partition partials combine with MAX — associative, commutative,
map-side combinable, so the shuffle carries at most (group, m)
register rows instead of the key universe. Spark ships
approx_count_distinct (a native HLL++), but its register layout is
engine-internal and cannot be value-checked against another engine.
This HLL is built from the repo's portable hash builders, so the
whole sketch — registers, estimator, bias corrections — is a
deterministic function of the input and has an EXACT DuckDB value
oracle (the same property every other operator here has), while
keeping the genuine O(m)-state mergeable-sketch shape.

Reference analog: the reference counts distinct entities by folding
into in-memory seen-maps (/root/reference/cmd/export_assets.go:40-58)
— exact but unbounded state; this is the bounded-state distributed
replacement.

Layout: h is the ~60-bit portable identity hash masked to 48 bits
(close to uniform: the dual-modulus product space ~2^60 covers the
mask many times over); low HLL_P bits select the register, the
remaining HLL_B=38 bits w give rho = 39 - bitlen(w) (w=0 -> 39).
Standard HLL estimator alpha_m * m^2 / sum(2^-M_j) with the
linear-counting small-range correction; every float op (the
register fold runs in ascending-bucket order, one division, one ln)
is order-pinned so both engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import hashing as H

HLL_P = 10                     # register-index bits
HLL_M = 1 << HLL_P             # 1024 registers
HLL_B = 38                     # rho window bits (48 - HLL_P)
_MASK48 = (1 << 48) - 1
# alpha_m * m^2 for m = 1024 (Flajolet et al. 2007), one Python-side
# constant inlined as the identical literal in both dialects
HLL_ALPHA_M2 = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M


def _rho_exprs(key_hash: str, spark: bool) -> tuple[str, str]:
    """(bucket, rho) SQL expressions from a key-hash expression."""
    div = "div" if spark else "//"
    hm = f"(({key_hash}) & {_MASK48})"
    bucket = f"({hm} % {HLL_M})"
    w = f"({hm} {div} {HLL_M})"
    rho = (
        f"(CASE WHEN {w} = 0 THEN {HLL_B + 1} "
        f"ELSE {HLL_B + 1} - length(bin({w})) END)"
    )
    return bucket, rho


def hll_registers(
    df: DataFrame, key: str, group: str, out_group: str | None = None
) -> DataFrame:
    """(group, bucket, MAX rho) register table — the mergeable sketch
    state. Works identically on a batch DataFrame and on a stream
    (update-mode stateful aggregation: MAX is the merge operator, so
    per-micro-batch deltas are cumulative and replay-safe)."""
    gname = out_group or group
    bucket, rho = _rho_exprs(H.char_hash_wide(key, spark=True), spark=True)
    return (
        df.select(
            F.col(group).alias(gname),
            F.expr(bucket).cast("int").alias("bucket"),
            F.expr(rho).cast("int").alias("rho"),
        )
        .groupBy(gname, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, gname: str) -> DataFrame:
    """Fold a register table into per-group estimates: ascending-bucket
    ordered 2^-rho fold (order-pinned doubles), standard estimator with
    the linear-counting small-range correction."""
    fold = (
        "aggregate(transform(arr, x -> power(cast(2 as double), "
        "-cast(x.rho as double))), cast(0 as double), (acc, v) -> acc + v)"
    )
    per = (
        regs.groupBy(gname)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_registers"),
            F.sort_array(F.collect_list(F.struct("bucket", "rho"))).alias("arr"),
        )
        .select(
            gname,
            "n_registers",
            (
                (F.lit(HLL_M) - F.col("n_registers")).cast("double")
                + F.expr(fold)
            ).alias("s"),
        )
    )
    e_raw = F.lit(HLL_ALPHA_M2) / F.col("s")
    v = F.lit(HLL_M) - F.col("n_registers")
    linear = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / v.cast("double")
    )
    est = F.when((e_raw <= 2.5 * HLL_M) & (v > 0), linear).otherwise(e_raw)
    return per.select(gname, "n_registers", F.round(est, 6).alias("est_distinct"))


def hll_join_exact(
    sk: DataFrame, df: DataFrame, key: str, group: str, gname: str
) -> DataFrame:
    """Attach the exact distinct count + relative error (verification
    columns — at 100 TB one would keep only the sketch)."""
    exact = df.groupBy(F.col(group).alias(gname)).agg(
        F.countDistinct(key).cast("long").alias("exact_distinct")
    )
    return sk.join(exact, gname).select(
        gname,
        "n_registers",
        "est_distinct",
        "exact_distinct",
        # unrounded: est_distinct is a 6dp decimal over an integer —
        # a scaled integer ratio with the ROUND tie hazard; the raw
        # division of identical operands is bit-identical
        (
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("rel_err"),
    )


def hll_distinct(
    df: DataFrame, key: str, group: str, out_group: str | None = None
) -> DataFrame:
    """Per-`group` HLL cardinality estimate of distinct `key` values,
    alongside the exact count and relative error.

    Plan shape: narrow map to (group, bucket, rho) -> MAX-agg on
    (group, bucket) [the mergeable-sketch shuffle, map-side combined,
    <= m rows per group] -> per-group register fold. The exact-count
    branch is the expensive one and exists only for verification."""
    gname = out_group or group
    regs = hll_registers(df, key, group, gname)
    return hll_join_exact(hll_estimate(regs, gname), df, key, group, gname)


def tool_conv_hll(transcripts: DataFrame) -> DataFrame:
    """Distinct conversations per tool via the HLL sketch (plus exact
    + rel_err verification columns)."""
    return hll_distinct(
        transcripts.filter(F.col("tool").isNotNull()), "conv_id", "tool"
    )


def tool_conv_hll_oracle() -> str:
    bucket, rho = _rho_exprs(H.char_hash_wide("conv_id", spark=False), spark=False)
    return f"""
, base AS (
  SELECT tool, {bucket} AS bucket, {rho} AS rho
  FROM transcripts WHERE tool IS NOT NULL
),
regs AS (SELECT tool, bucket, MAX(rho) AS rho FROM base GROUP BY tool, bucket),
per AS (
  SELECT tool, CAST(COUNT(*) AS BIGINT) AS n_registers,
         CAST({HLL_M} - COUNT(*) AS DOUBLE)
         + list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(list(rho ORDER BY bucket),
                              r -> power(CAST(2 AS DOUBLE), -CAST(r AS DOUBLE)))),
             (acc, v) -> acc + v) AS s
  FROM regs GROUP BY tool
),
est AS (
  SELECT tool, n_registers,
         CASE WHEN ({HLL_ALPHA_M2!r} / s) <= 2.5 * {HLL_M}
                   AND ({HLL_M} - n_registers) > 0
              THEN CAST({float(HLL_M)!r} AS DOUBLE)
                   * ln(CAST({float(HLL_M)!r} AS DOUBLE)
                        / CAST({HLL_M} - n_registers AS DOUBLE))
              ELSE ({HLL_ALPHA_M2!r} / s) END AS est_raw
  FROM per
),
exact AS (
  SELECT tool, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS exact_distinct
  FROM transcripts WHERE tool IS NOT NULL GROUP BY tool
)
SELECT e.tool, e.n_registers, ROUND(e.est_raw, 6) AS est_distinct,
       x.exact_distinct,
       ABS(ROUND(e.est_raw, 6) - x.exact_distinct)
             / x.exact_distinct AS rel_err
FROM est e JOIN exact x ON x.tool = e.tool
"""


# --- count-min frequency sketch ----------------------------------------------
#
# The frequency-estimation complement of the HLL: per-key counts at
# 100 TB without shuffling the key universe. Counters are a D x W grid
# (D independent hash rows, W buckets); the per-partition partials
# merge with SUM — associative, map-side combinable — so the shuffle
# carries at most D*W counter rows regardless of key cardinality, and
# the per-key estimate is the MIN over its D buckets (never an
# under-count; over-count bounded by e*N/W w.p. 1-e^-D). Like the HLL,
# every hash is a portable mod-P affine of the identity hash, so the
# full sketch has an EXACT DuckDB value oracle; the exact-count branch
# exists only as the verification column.

CMS_D = 4
CMS_W = 2048
# affine row-hash family over the mod-P-reduced identity hash:
# A,B < P and hmod < P so A*hmod + B < 2^60 — ANSI/int64-exact in
# Spark, DuckDB and the estimate probes alike
CMS_A = [(d * 40503 + 2654435761) % (H.P - 1) + 1 for d in range(CMS_D)]
CMS_B = [(d * 69069 + 998244353) % H.P for d in range(CMS_D)]


def _cms_hmod(key: str, spark: bool) -> str:
    return f"(({H.char_hash_wide(key, spark)}) % {H.P})"


def _cms_bucket(d: int, hmod: str) -> str:
    # identical text in both dialects (integer ops only)
    return f"((({CMS_A[d]} * {hmod} + {CMS_B[d]}) % {H.P}) % {CMS_W})"


def cms_counters(df: DataFrame, key: str) -> DataFrame:
    """(d, bucket, SUM count) counter grid — the mergeable sketch
    state. Identical on a batch DataFrame and as an update-mode
    streaming aggregation (SUM merge => cumulative, replay-safe)."""
    hmod = _cms_hmod(key, spark=True)
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.expr(_cms_bucket(d, hmod)).cast("int").alias("bucket"),
            )
            for d in range(CMS_D)
        ]
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .select("r.d", "r.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_freq(df: DataFrame, key: str, out_key: str | None = None) -> DataFrame:
    """Per-key CMS frequency estimate (MIN over the key's D counters)
    alongside the exact count and relative over-count.

    Plan shape: one narrow pass -> D*W-bounded counter shuffle; the
    probe side is the DISTINCT key table (exploded x D, joined on the
    counter grid — the grid is sketch-sized, so the join broadcasts)."""
    kname = out_key or key
    counters = cms_counters(df, key)
    hmod = _cms_hmod(key, spark=True)
    keys = (
        df.select(F.col(key).alias(kname), F.expr(hmod).alias("hmod"))
        .groupBy(kname, "hmod")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    probes = keys.select(
        kname,
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(_cms_bucket(d, "hmod")).cast("int").alias("bucket"),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("r"),
    ).select(kname, "exact_count", "r.d", "r.bucket")
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy(kname, "exact_count")
        .agg(F.min("c").cast("long").alias("est_count"))
        .select(
            kname,
            "est_count",
            "exact_count",
            # unrounded integer ratio (hashing.py rounding-hazard note)
            (
                (F.col("est_count") - F.col("exact_count")).cast("double")
                / F.col("exact_count")
            ).alias("rel_overcount"),
        )
    )


def conv_turns_cms(transcripts: DataFrame) -> DataFrame:
    """Per-conversation turn counts via the CMS (plus exact + error
    verification columns) — a genuinely high-cardinality key, unlike
    the tool vocabulary."""
    return cms_freq(transcripts, "conv_id")


def conv_turns_cms_oracle() -> str:
    hmod = _cms_hmod("conv_id", spark=False)
    counter_rows = "\n    UNION ALL ".join(
        f"SELECT {d} AS d, {_cms_bucket(d, 'hmod')} AS bucket FROM base"
        for d in range(CMS_D)
    )
    probe_rows = "\n    UNION ALL ".join(
        f"SELECT conv_id, exact_count, {d} AS d, {_cms_bucket(d, 'hmod')} AS bucket FROM keys"
        for d in range(CMS_D)
    )
    return f"""
, base AS (SELECT conv_id, {hmod} AS hmod FROM transcripts),
counters AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({counter_rows})
  GROUP BY d, bucket
),
keys AS (
  SELECT conv_id, hmod, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM base GROUP BY conv_id, hmod
),
probes AS ({probe_rows})
SELECT p.conv_id,
       CAST(MIN(c.c) AS BIGINT) AS est_count,
       p.exact_count,
       CAST(MIN(c.c) - p.exact_count AS DOUBLE) / p.exact_count
         AS rel_overcount
FROM probes p JOIN counters c ON c.d = p.d AND c.bucket = p.bucket
GROUP BY p.conv_id, p.exact_count
"""
