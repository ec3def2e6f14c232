"""Streaming data-quality monitor — the batch integrity checker
(operators/dq.py) as a continuously-maintained violations stream.

Why this needs state: three of the five checks are ORDER checks
(dup_turn_idx, turn_gap, ts_regression) over the conversation's full
(turn_idx, ts) sequence, and a conversation's turns arrive across many
micro-batches — possibly out of turn_idx order across batches (an
upstream mutation/backfill can append a high-idx row long before its
neighbors arrive). The detector therefore buffers one COMPACT tuple
per turn — (turn_idx:int32, ts:int64 µs), never the text — as
per-conversation state in applyInPandasWithState, and finalizes the
conversation when the watermark passes its last event (EventTimeTimeout
— the matcher's eviction machinery as audit finalization). At finalize
it sorts by (turn_idx, ts) and replays the batch checker's exact lag
semantics, so the emitted rows hash-match the batch DQ_ORACLE_SQL.

The two ROW-LOCAL checks (bad_role, empty_text) need no state and no
watermark wait: they stream through a stateless filter branch of the
same query and are unioned with the stateful branch — violations for
malformed rows surface within one micro-batch while the order checks
finalize at close, mirroring how a production monitor wants schema
violations NOW and sequence audits at session close.

Scale notes (100 TB): state is 12 bytes per turn per OPEN conversation
only (conversations are removed at finalize), not the text payload;
with a production watermark delay the open-conversation set is the
active window, exactly the session-window state bound. Hot
conversations stream through one task with list-append state; the
stateless branch is a narrow map. Reference analog: the reference's
strict-mode per-row validation inside each transform
(internal/transform/*, hard-fail on malformed rows) — here lenient,
distributed, checkpointed, and emitted as a queryable stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from stellar_etl_spark.config import DEFAULT, EngineConfig
from stellar_etl_spark.operators.dq import ROLE_VOCAB

DQ_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("check_name", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("detail", T.StringType()),
    ]
)

# state: the conversation's compact turn ledger (parallel arrays)
DQ_STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
    ]
)


def _violations(conv_id: str, idxs: list, ts: list) -> list[tuple]:
    """The batch checker's order semantics over one conversation's
    sorted (turn_idx, ts) ledger: dup counts, lag gap, lag regression
    (operators/dq.py dq_violations — same rows, same details)."""
    order = sorted(range(len(idxs)), key=lambda i: (idxs[i], ts[i]))
    idxs = [idxs[i] for i in order]
    ts = [ts[i] for i in order]
    out: list[tuple] = []
    # dup_turn_idx: count per idx > 1 (detail = count, as the batch cast)
    i = 0
    while i < len(idxs):
        j = i
        while j < len(idxs) and idxs[j] == idxs[i]:
            j += 1
        if j - i > 1:
            out.append(("dup_turn_idx", conv_id, idxs[i], str(j - i)))
        i = j
    for k in range(1, len(idxs)):
        if idxs[k] != idxs[k - 1] + 1:
            out.append(("turn_gap", conv_id, idxs[k], str(idxs[k - 1])))
        if ts[k] < ts[k - 1]:
            out.append(("ts_regression", conv_id, idxs[k], ""))
    return out


def _frame(rows: list[tuple]) -> pd.DataFrame:
    cols = list(zip(*rows))
    return pd.DataFrame(
        {
            "check_name": pd.array(cols[0], dtype="string"),
            "conv_id": pd.array(cols[1], dtype="string"),
            "turn_idx": pd.array(cols[2], dtype="Int32"),
            "detail": pd.array(cols[3], dtype="string"),
        }
    )


def _dq_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key

    if state.hasTimedOut:
        idxs, ts_us = state.get
        state.remove()
        rows = _violations(conv_id, list(idxs), list(ts_us))
        if rows:
            yield _frame(rows)
        return

    idxs: list[int] = []
    ts_us: list[int] = []
    if state.exists:
        got_idx, got_ts = state.get
        idxs, ts_us = list(got_idx), list(got_ts)

    for pdf in pdf_iter:
        ts = pdf["ts"]
        if getattr(ts.dt, "tz", None) is not None:
            ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
        idxs.extend(int(v) for v in pdf["turn_idx"])
        ts_us.extend(
            int(v) for v in ts.astype("datetime64[us]").astype("int64")
        )

    state.update((idxs, ts_us))
    # finalize when the watermark passes the conversation's last event
    # (timeout must sit strictly above the current watermark)
    state.setTimeoutTimestamp(
        max(max(ts_us) // 1000, state.getCurrentWatermarkMs() + 1)
    )
    return
    yield  # pragma: no cover — keeps this a generator


def dq_violations_stream(df: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Append-mode streaming integrity monitor over the turn stream:
    row-local checks (bad_role, empty_text) emit within their
    micro-batch via the stateless branch; order checks (dup_turn_idx,
    turn_gap, ts_regression) finalize per conversation when the
    watermark passes its last event. Output rows equal the batch
    checker's (operators/dq.DQ_ORACLE_SQL) for the same input."""
    wm = df.withWatermark("ts", cfg.watermark_delay)

    ordered = (
        wm.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _dq_fn,
            DQ_OUTPUT_SCHEMA,
            DQ_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

    rol = wm.filter(~F.col("role").isin(*ROLE_VOCAB)).select(
        F.lit("bad_role").alias("check_name"),
        "conv_id",
        "turn_idx",
        F.col("role").alias("detail"),
    )
    emp = wm.filter(F.col("text").isNull() | (F.col("text") == "")).select(
        F.lit("empty_text").alias("check_name"),
        "conv_id",
        "turn_idx",
        F.lit("").alias("detail"),
    )
    return ordered.unionByName(rol).unionByName(emp)
