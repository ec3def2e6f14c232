"""Portable deterministic hashing — one definition, two SQL dialects.

The reference mints every identity with deterministic hashes of the
row content (FarmHash asset ids /root/reference/internal/transform/
asset.go:72-77, FNV-1a surrogate keys offer_normalized.go:108-178,
TOID packing internal/toid/main.go:139-157) precisely so outputs are
reproducible across runs and engines. We follow the same rule for the
training-data operators (MinHash, SimHash, fingerprints): the hash is
a pure arithmetic function expressible in BOTH Spark SQL and DuckDB
SQL, so the correctness oracle compares exact values, not just shapes.

Core primitive: a character-level polynomial rolling hash

    h(s) = fold_{c in s} (h * 31 + codepoint(c)) mod P,  P = 1e9+7

computed with higher-order array functions (JVM codegen in Spark —
``aggregate(split(...))`` — no Python in the hot path). All derived
hashes (shingle hashes, MinHash permutations a*h+b mod P, SimHash bit
sums) stay in int64 range: a,b,h < P ~ 2^30, so a*h < 2^60.

Scale notes (100 TB): every expression here is a narrow per-row map —
no shuffle, fully pipelined into the scan. Char-level folds cost
O(len(text)) per row inside codegen; for a 100 TB corpus that is the
same asymptotic cost as tokenizing, and it parallelizes linearly with
executors (no driver involvement, no UDF serialization).

CROSS-ENGINE ROUNDING HAZARD (for anyone adding oracle columns):
``ROUND(x, 6)`` is NOT dialect-portable when x is a ratio of small
integers. Spark rounds via BigDecimal HALF_UP on the double's shortest
decimal repr; DuckDB multiplies by 1e6 in floating point and rounds
that — they disagree whenever the quotient's shortest repr ties at the
7th decimal (e.g. 41/640 → 0.064063 vs 0.064062, verified on both
engines; ~1e-5 of random small-integer pairs). The raw IEEE division
of exact integer inputs is already bit-identical — prefer emitting it
unrounded (scoring.lm_score_permille does this). The integer-ratio
columns (doc_repetition ratio, text.py ratios, tool_lift, trainprep
fracs, CMS rel_overcount, latency-quantile interpolation) are
migrated to unrounded divisions. Rounding remains only where the
quantity's shortest repr is long and ties are measure-zero in
practice: sqrt/cosine folds (zscore, cos_sim, kmeans dist),
float-sum means, and the HLL estimate — where the 6dp round is
load-bearing, deliberately absorbing the engines' libm ln()
differences in the linear-counting branch (do NOT unround it).
"""

from __future__ import annotations

P = 1_000_000_007

# MinHash: k permutations h_i(x) = (A[i]*x + B[i]) mod P over shingle
# hashes; LSH banding b=16 bands x r=2 rows: collision threshold
# (1/b)^(1/r) ~ 0.25, recall at jaccard 0.44 (a doc with every 7th
# word removed) is 1-(1-0.44^2)^16 ~ 0.97. r=2 keeps false candidates
# rare on shingle-sparse corpora; the exact-Jaccard verify stage
# removes the rest.
MINHASH_K = 32
MINHASH_BANDS = 16
MINHASH_ROWS = 2
MINHASH_A = [(i * 2654435761 + 40503) % (P - 1) + 1 for i in range(MINHASH_K)]
MINHASH_B = [(i * 998244353 + 12289) % P for i in range(MINHASH_K)]

# SimHash: 60-bit signature (packed from two independent 30-bit
# streams — exact int arithmetic in both dialects), 4 bands x 15 bits
# for candidate generation. Pigeonhole: Hamming distance <= 3 cannot
# touch all 4 bands, so every true pair collides in >= 1 band.
# 15-bit bands give 32,768 distinct values per band — a 30-bit/10-bit
# scheme caps the keyspace at 1,024 per band, making band buckets grow
# O(N/1024) and the self-join quadratic at corpus scale.
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15

# Random-hyperplane LSH for embeddings: deterministic seeded-PCG64
# normal planes. The planes are materialized as SQL literals in BOTH
# dialects (they never need to be SQL-generated), so true gaussian
# isotropy is free — an arithmetic lattice here is NOT acceptable:
# lattice "planes" are near-shifted copies of each other, so
# multi-table LSH tables become correlated and a pair missed by one
# table is likely missed by all (observed: a cos=0.9938 planted pair
# missed by 12 lattice tables that independent planes catch).
EMB_DIM = 64
N_PLANES = 8


def lsh_plane(j: int, dim: int = EMB_DIM) -> list[float]:
    import numpy as np

    rng = np.random.default_rng(0xC0FFEE + j)
    return [float(v) for v in np.round(rng.standard_normal(dim), 6)]


# --- dialect expression builders -------------------------------------------
# Each returns a SQL string; `spark=True` emits Spark SQL (for F.expr),
# else DuckDB SQL. Identical arithmetic, identical fold order.

def char_hash(e: str, spark: bool, mult: int = 31, mod: int = P) -> str:
    """Polynomial rolling hash of a string expression -> BIGINT in [0, mod).

    ASCII-only contract: Spark folds ``ascii(c)`` and DuckDB
    ``unicode(c)``, which agree only for codepoints < 128. The synthetic
    corpora are ASCII by construction (sources/generator.py); non-ASCII
    text would diverge between the engine and the oracle. A production
    deployment would fold UTF-8 bytes on both sides instead."""
    if spark:
        return (f"aggregate(filter(split({e}, ''), c -> c <> ''), 0L, "
                f"(acc, c) -> (acc * {mult}L + ascii(c)) % {mod}L)")
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(list_filter(string_split_regex({e}, ''), c -> c <> ''), "
            f"c -> CAST(unicode(c) AS BIGINT))), (acc, c) -> (acc * {mult} + c) % {mod})")


# Second independent modulus for the wide identity hash. P2 prime,
# (P-1)*P2 + (P2-1) ~ 1e18 < 2^63, so the packed value stays in BIGINT.
P2 = 999_999_937


def char_hash_wide(e: str, spark: bool) -> str:
    """~60-bit identity hash: two independent polynomial hashes
    (different multiplier AND modulus) packed into one BIGINT as
    ``h31_modP * P2 + h131_modP2``.

    Identity keys (exact-dedup fingerprints, star surrogate keys) need
    collision-free behavior at corpus scale; a single ~2^30 hash expects
    birthday collisions from ~50k distinct keys. The reference uses
    64-bit FarmHash/FNV-1a for exactly these keys
    (/root/reference/internal/transform/asset.go:72-77,
    offer_normalized.go:108-178); this is the portable dual-dialect
    equivalent (~2^60 space: collision odds ~4e-6 at 10^6 distinct keys,
    still <1% at 10^8). Keep the narrow 30-bit hashes only where
    approximation is inherent (MinHash/SimHash shingles)."""
    h1 = char_hash(e, spark, mult=31, mod=P)
    h2 = char_hash(e, spark, mult=131, mod=P2)
    suffix = "L" if spark else ""
    return f"(({h1}) * {P2}{suffix} + ({h2}))"


def tokens(e: str, spark: bool) -> str:
    """Lower-cased whitespace tokens of a string expression -> ARRAY<STRING>."""
    if spark:
        return f"filter(split(lower(trim({e})), '\\\\s+'), t -> t <> '')"
    return f"list_filter(string_split_regex(lower(trim({e})), '\\s+'), t -> t <> '')"


def shingles(tok: str, n: int, spark: bool) -> str:
    """Word n-gram shingle strings from a token-array expression."""
    joins = " || ' ' || ".join(f"{tok}[i+{k}]" for k in range(n))
    if spark:
        el = ", ".join(f"element_at({tok}, i + {k})" for k in range(n))
        return (f"CASE WHEN size({tok}) >= {n} THEN "
                f"transform(sequence(1, size({tok}) - {n - 1}), i -> concat_ws(' ', {el})) "
                f"ELSE CAST(array() AS array<string>) END")
    return (f"CASE WHEN len({tok}) >= {n} THEN "
            f"list_transform(generate_series(1, len({tok}) - {n - 1}), "
            f"i -> {tok}[i]" + "".join(f" || ' ' || {tok}[i+{k}]" for k in range(1, n)) + ") "
            f"ELSE []::VARCHAR[] END")


def hash_array(arr: str, spark: bool) -> str:
    """Element-wise char_hash over an ARRAY<STRING> expression."""
    if spark:
        return f"transform({arr}, s -> {char_hash('s', True)})"
    return f"list_transform({arr}, s -> {char_hash('s', False)})"


# Word-hash composition: hash each word once, derive shingle hashes by
# modular combination — 3x fewer char folds than hashing shingle
# strings, and no string concatenation in the hot path. B is a word
# separator multiplier; W[i] < P so W[i]*B < 2^43, safely in int64.
SHINGLE_B = 8191


def shingle_hashes_from_words(wh: str, n: int, spark: bool) -> str:
    """Shingle hashes from a word-hash ARRAY<BIGINT> expression `wh`:
    h = fold over n consecutive word hashes of (acc*B + w) mod P."""
    combo = f"{wh}[i]"
    for k in range(1, n):
        combo = f"(({combo}) * {SHINGLE_B} + {wh}[i+{k}]) % {P}"
    if spark:
        el = f"element_at({wh}, i)"
        for k in range(1, n):
            el = f"(({el}) * {SHINGLE_B}L + element_at({wh}, i + {k})) % {P}L"
        return (f"CASE WHEN size({wh}) >= {n} THEN "
                f"transform(sequence(1, size({wh}) - {n - 1}), i -> {el}) "
                f"ELSE CAST(array() AS array<bigint>) END")
    return (f"CASE WHEN len({wh}) >= {n} THEN "
            f"list_transform(generate_series(1, len({wh}) - {n - 1}), i -> {combo}) "
            f"ELSE []::BIGINT[] END")


def widen_hash(h: str, spark: bool) -> str:
    """Spread a 30-bit hash expression over ~60 bits: two independent
    affine maps (different multiplier AND modulus) packed as
    ``g1 * P2 + g2``. Used by SimHash so all 60 signature bits carry
    signal (the raw word hash only has ~30 bits of entropy). Max value
    (P-1)*P2 + (P2-1) ~ 1e18 < 2^63: BIGINT-safe in both dialects."""
    s = "L" if spark else ""
    return (f"(((({h}) * 1566083941{s} + 11{s}) % {P}{s}) * {P2}{s}"
            f" + ((({h}) * 69069{s} + 13{s}) % {P2}{s}))")


def minhash_sig(hashes: str, i: int, spark: bool) -> str:
    """i-th MinHash value over an ARRAY<BIGINT> of shingle hashes."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    if spark:
        return f"array_min(transform({hashes}, h -> ({a}L * h + {b}L) % {P}L))"
    return f"list_min(list_transform({hashes}, h -> ({a} * h + {b}) % {P}))"


def dot_fold(a: str, b: str, spark: bool, dim: int = EMB_DIM) -> str:
    """Sequential left-fold dot product of two ARRAY<DOUBLE> expressions.

    Fold order is identical in both dialects, so the resulting double is
    bit-identical — float comparisons in the oracle are exact, not
    tolerance-based."""
    if spark:
        return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                f"cast(0 as double), (acc, v) -> acc + v)")
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), i -> {a}[i] * {b}[i])), "
            f"(acc, v) -> acc + v)")


def plane_literal(j: int, spark: bool) -> str:
    """The j-th LSH hyperplane as an ARRAY<DOUBLE> literal."""
    vals = ", ".join(repr(v) + ("D" if spark else "") for v in lsh_plane(j))
    return f"array({vals})" if spark else f"[{vals}]"


def norm_fold(a: str, spark: bool, dim: int = EMB_DIM) -> str:
    """Sequential left-fold sum of squares of an ARRAY<DOUBLE> expression."""
    if spark:
        return f"aggregate({a}, cast(0 as double), (acc, v) -> acc + v * v)"
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), i -> {a}[i] * {a}[i])), "
            f"(acc, v) -> acc + v)")


def sqdist_fold(a: str, b: str, spark: bool, dim: int = EMB_DIM) -> str:
    """Sequential left-fold squared L2 distance of two ARRAY<DOUBLE>
    expressions — same fixed fold order in both dialects, so the
    resulting double is bit-identical (exact oracle comparisons)."""
    if spark:
        return (f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
                f"cast(0 as double), (acc, v) -> acc + v)")
    return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
            f"(acc, v) -> acc + v)")
