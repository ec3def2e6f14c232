"""The stateful user->response matcher on Spark 4's transformWithState
API (StatefulProcessor + ValueState + event-time timers) — the second,
forward-facing implementation of J1 next to the applyInPandasWithState
form (streaming/matcher.py). Same input contract, same OUTPUT_SCHEMA,
same semantics row-for-row: a pending user turn matches the next
assistant/tool turn; a user turn displaced by a newer user turn, or
passed by the watermark, emits an ``evicted_unmatched`` row.

Why both exist: applyInPandasWithState is the stable API;
transformWithState is its successor (composable typed state, explicit
timers, state TTL, RocksDB-only). The engine keeps the two
implementations oracle-equal — ``turn_pairs_tws`` runs behind the SAME
DuckDB value oracle as ``turn_pairs``/``turn_pairs_streamed`` — so a
deployment can switch APIs without a semantic diff. Reference analog
unchanged: the tx<->result in-process matcher loop
(/root/reference/internal/input/operations.go:23-56), distributed.

Scale notes (100 TB): transformWithState REQUIRES the RocksDB state
store provider (enforced by Spark) — which is the provider a real
10^12-turn deployment runs anyway (BASELINE.md streaming table, state
out-of-heap, changelog checkpointing). State per conversation is one
fixed-width row + one timer; eviction timers bound state to
conversations inside the watermark horizon.

Sandbox scoping: the TWS state-server protocol imports google.protobuf
in its dedicated Python driver worker; this container ships no
protobuf and installs are not allowed, so the parity test
(tests/test_streaming.py::test_tws_matcher_parity) importorskips and
the op is not driver-gated here. On any real Spark 4 cluster (protobuf
is a standard pyspark[connect] dependency) the test runs as-is.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from stellar_etl_spark.config import DEFAULT, EngineConfig
from stellar_etl_spark.streaming.matcher import OUTPUT_SCHEMA

# transformWithState runs the processor in a dedicated "driver worker"
# python process that is NOT seeded with sc.addPyFile paths (unlike
# executor workers), so the processor class must serialize by VALUE:
# a by-reference pickle would try `import stellar_etl_spark` there and
# die with ModuleNotFoundError. Registering the module keeps the
# engine deployable via addPyFile alone (no PYTHONPATH contract).
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_STATE_SCHEMA = "pending_idx integer, pending_ts_us long, max_idx integer"


def _eviction_pdf(conv_id: str, pending_idx: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.array([conv_id], dtype="string"),
            "user_turn_idx": pd.array([pending_idx], dtype="Int32"),
            "response_turn_idx": pd.array([None], dtype="Int32"),
            "response_role": pd.array([None], dtype="string"),
            "response_tool": pd.array([None], dtype="string"),
            "latency_s": pd.array([None], dtype="Float64"),
            "evicted_unmatched": pd.array([True], dtype="boolean"),
        }
    )


class PairMatcherProcessor(StatefulProcessor):
    """One pending user turn + replay high-water mark per conversation;
    an event-time timer at the pending turn's timestamp implements
    watermark eviction (the EventTimeTimeout analog)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._pending = handle.getValueState("pending", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        pending_idx, pending_ts_us, max_idx = (None, None, -1)
        if self._pending.exists():
            pending_idx, pending_ts_us, max_idx = self._pending.get()

        out: list[tuple] = []
        for pdf in rows:
            pdf = pdf.sort_values("turn_idx")
            idxs = pdf["turn_idx"].to_numpy()
            roles = pdf["role"].to_numpy()
            tools = pdf["tool"].to_numpy()
            ts = pdf["ts"]
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            ts_us = ts.astype("datetime64[us]").astype("int64").to_numpy()
            for i in range(len(pdf)):
                if idxs[i] <= max_idx:
                    continue  # replayed row: drop (idempotence)
                max_idx = int(idxs[i])
                if roles[i] == "user":
                    if pending_idx is not None:
                        out.append(
                            (conv_id, pending_idx, None, None, None, None, True)
                        )
                    pending_idx, pending_ts_us = int(idxs[i]), int(ts_us[i])
                elif pending_idx is not None:
                    # divide-then-subtract: bit-identical to the batch
                    # double arithmetic (see matcher.py)
                    lat = int(ts_us[i]) / 1e6 - pending_ts_us / 1e6
                    out.append(
                        (conv_id, pending_idx, int(idxs[i]), roles[i], tools[i],
                         lat, False)
                    )
                    pending_idx, pending_ts_us = None, None

        # one live timer per key: clear any stale one before re-arming
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        if pending_idx is not None:
            self._pending.update((pending_idx, pending_ts_us, max_idx))
            want_ms = pending_ts_us // 1000
            self._handle.registerTimer(
                max(want_ms, timerValues.getCurrentWatermarkInMs() + 1)
            )
        elif self._pending.exists():
            self._pending.clear()

        if out:
            cols = list(zip(*out))
            yield pd.DataFrame(
                {
                    "conv_id": pd.array(cols[0], dtype="string"),
                    "user_turn_idx": pd.array(cols[1], dtype="Int32"),
                    "response_turn_idx": pd.array(cols[2], dtype="Int32"),
                    "response_role": pd.array(cols[3], dtype="string"),
                    "response_tool": pd.array(cols[4], dtype="string"),
                    "latency_s": pd.array(cols[5], dtype="Float64"),
                    "evicted_unmatched": pd.array(cols[6], dtype="boolean"),
                }
            )

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # the pending turn may have matched in this same batch (state
        # cleared, timer deletion races the expiry): emit only if live
        if self._pending.exists():
            pending_idx, _, _ = self._pending.get()
            (conv_id,) = key
            self._pending.clear()
            yield _eviction_pdf(conv_id, pending_idx)

    def close(self) -> None:
        pass


def match_pairs_stream_tws(
    df: DataFrame, cfg: EngineConfig = DEFAULT
) -> DataFrame:
    """transformWithState form of match_pairs_stream: append-mode,
    event-time timers, RocksDB-backed state (Spark enforces the
    provider — set ``spark.sql.streaming.stateStore.providerClass`` to
    ROCKSDB_PROVIDER before starting the query)."""
    return (
        df.withWatermark("ts", cfg.watermark_delay)
        .select("conv_id", "turn_idx", "role", "tool", "ts")
        .groupBy("conv_id")
        .transformWithStateInPandas(
            PairMatcherProcessor(),
            OUTPUT_SCHEMA,
            "append",
            "EventTime",
        )
    )
