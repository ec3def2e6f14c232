"""Streaming first-order tool-transition detection — the CEP shape of
operators/journeys.tool_transitions: per conversation, each tool turn
emits the (previous tool -> tool) bigram the moment it arrives, with
'__start__' marking the first tool use. A per-conversation ValueState
(last tool + replay high-water mark) carries the pattern context
across micro-batches, so a bigram that straddles a batch boundary is
detected exactly like one inside a batch.

This is the simplest instance of the engine's CEP pattern family: the
matcher (streaming/matcher.py) detects user->response pairs with
eviction semantics; this detects adjacency patterns over a filtered
event stream. Downstream the emitted bigrams reduce per micro-batch to
mergeable partial counts (SUM) through the exactly-once epoch sink —
the same partial-aggregate discipline as the streamed quantile
histogram and CMS.

Scale notes (100 TB): state is one (int, string) row per conversation
seen — for bounded state under unbounded conversation churn, arm the
same EventTimeTimeout the matcher uses (evicting last_tool only
forgets context for a conversation idle past the watermark; its next
tool turn re-enters as '__start__', the standard CEP session-reset
trade). The parity drain runs NoTimeout because its input is bounded
and the batch oracle has no reset semantics.

Reference analog: the in-process previous-value loops the reference
runs per ledger entry (/root/reference/internal/input/changes.go:102-136
keeps last-change maps keyed by ledger key), distributed and
checkpointed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("prev_tool", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
    ]
)

TRANS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_idx", T.IntegerType()),
        T.StructField("last_tool", T.StringType()),
    ]
)

START = "__start__"


def _trans_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    max_idx, last_tool = (-1, None)
    if state.exists:
        max_idx, last_tool = state.get

    out: list[tuple] = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("turn_idx")
        idxs = pdf["turn_idx"].to_numpy()
        tools = pdf["tool"].to_numpy()
        for i in range(len(pdf)):
            if idxs[i] <= max_idx:
                continue  # replayed row: drop (idempotence)
            max_idx = int(idxs[i])
            out.append(
                (conv_id, last_tool if last_tool is not None else START,
                 tools[i], max_idx)
            )
            last_tool = tools[i]

    state.update((max_idx, last_tool))
    if out:
        cols = list(zip(*out))
        yield pd.DataFrame(
            {
                "conv_id": pd.array(cols[0], dtype="string"),
                "prev_tool": pd.array(cols[1], dtype="string"),
                "tool": pd.array(cols[2], dtype="string"),
                "turn_idx": pd.array(cols[3], dtype="Int32"),
            }
        )


def tool_transitions_stream(df: DataFrame) -> DataFrame:
    """Append-mode bigram emission over the tool-bearing turn stream.
    Input: a streaming DataFrame already filtered to tool IS NOT NULL
    (the filter stays outside so the watermark column choice is the
    caller's)."""
    return (
        df.select("conv_id", "turn_idx", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _trans_fn,
            TRANS_OUTPUT_SCHEMA,
            TRANS_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
