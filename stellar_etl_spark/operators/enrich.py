"""Per-turn projection — the TransformTransaction analog.

The reference turns one transaction into a 44-column flat row with
per-field guards, returning (row, error)
(/root/reference/internal/transform/transaction.go:20-301); failures
are counted and skipped in lenient mode or fatal in strict mode
(internal/utils/logger.go:17-23, flag internal/utils/main.go:234).

Here the projection is a vectorized pandas UDF over Arrow batches
(never per-row Python), emitting an ``error`` quarantine column; the
caller either filters the quarantine rows to a side table (lenient) or
fails the job on first error (strict). Cheap derived columns that the
JVM can codegen (lengths, packed ids) stay as built-in expressions —
the UDF only covers what F.* can't express cheaply.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from stellar_etl_spark import ids
from stellar_etl_spark.config import DEFAULT, EngineConfig

VALID_ROLES = ("user", "assistant", "tool", "system")


@pandas_udf(T.StringType())
def _validate_turn(
    conv_id: pd.Series, turn_idx: pd.Series, role: pd.Series, ts_ok: pd.Series
) -> pd.Series:
    """Vectorized row validation -> error string or None.

    Mirrors the reference's guard style (negative-value checks,
    transform/ledger.go:44-51, account.go:30-47) as whole-column
    boolean masks; one string allocation per *bad* row only.
    """
    err = pd.Series([None] * len(conv_id), dtype=object)
    bad_conv = conv_id.isna() | (conv_id.astype(str).str.len() == 0)
    bad_idx = turn_idx.isna() | (turn_idx < 0)
    bad_role = ~role.isin(VALID_ROLES)
    bad_ts = ~ts_ok.astype(bool)
    err[bad_ts] = "null ts"
    err[bad_role.fillna(True)] = "invalid role"
    err[bad_idx.fillna(True)] = "negative or null turn_idx"
    err[bad_conv] = "empty conv_id"
    return err


def _validate_turn_jvm() -> F.Column:
    """The same guards as a pure F.when chain — whole-stage codegen,
    no Arrow round-trip. Identical precedence to the pandas UDF
    (conv > idx > role > ts: the UDF assigns in reverse order so
    earlier guards overwrite later ones)."""
    role = F.col("role")
    return (
        F.when(
            F.col("conv_id").isNull() | (F.length("conv_id") == 0), "empty conv_id"
        )
        .when(
            F.col("turn_idx").isNull() | (F.col("turn_idx") < 0),
            "negative or null turn_idx",
        )
        .when(role.isNull() | ~role.isin(*VALID_ROLES), "invalid role")
        .when(F.col("ts").isNull(), "null ts")
    )


def enrich_turns(
    df: DataFrame,
    cfg: EngineConfig = DEFAULT,
    conv_num=None,
) -> DataFrame:
    """transcripts -> turns_enriched (FIXTURES.md §2.1).

    Adds: turn_id (packed TOID analog), text_len, word_count, error.
    Works identically on batch and streaming DataFrames (no window
    functions; everything row-local -> no shuffle at all).

    cfg.validator picks the guard implementation: "jvm" (default —
    the whole projection is one WholeStageCodegen span, zero Python)
    or "pandas" (the Arrow-batched quarantine-UDF pattern, kept as the
    template for guards F.* genuinely can't express). Both emit the
    same error strings with the same precedence.
    """
    conv_num = conv_num if conv_num is not None else ids.conv_num_from_suffix("conv_id")
    if cfg.validator == "pandas":
        error = _validate_turn(
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("role"),
            F.col("ts").isNotNull(),
        )
    else:
        error = _validate_turn_jvm()
    out = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        ids.pack_turn_id(conv_num, "turn_idx").alias("turn_id"),
        F.length("text").alias("text_len"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("word_count"),
        error.alias("error"),
    )
    return out


def split_quarantine(df: DataFrame, cfg: EngineConfig = DEFAULT):
    """(good, bad) split; strict mode raises on any bad row — the
    lenient/strict dichotomy of EtlLogger.LogError (logger.go:17-23)."""
    good = df.filter(F.col("error").isNull())
    bad = df.filter(F.col("error").isNotNull())
    if cfg.strict_errors:
        n = bad.limit(1).count()
        if n:
            first = bad.select("conv_id", "turn_idx", "error").first()
            raise ValueError(f"strict mode: transform error {first}")
    return good, bad
