"""Deterministic synthetic transcript generator (seed=42 convention).

The streaming/bench analog of the reference's hand-built XDR fixtures
(/root/reference/internal/transform/test_variables_test.go) and its
golden CLI corpora (/root/reference/testdata/*/*.golden). Everything is
a pure function of (seed, sf) — same call, same bytes.

Features exercised (FIXTURES.md §1):
  * roles cycle user -> assistant [-> tool -> assistant]* so every user
    turn has a response (the stateful-join fixture);
  * tool drawn from a fixed 8-name vocabulary;
  * conversation start times spread over 24 h; intra-conversation gaps
    in [1 s, 120 s] with a seeded fraction of gaps > session_gap to
    split sessions (ledger-close analog). Session splits land ONLY
    before user turns — a session naturally reopens with a user
    message, and it bounds every user->response gap at 120 s, below
    any sane watermark delay. That bound is what makes the streaming
    matcher PROVABLY equal to the batch matcher on this corpus: with
    time-sliced files picked up in order, the watermark trails the
    response slice by >= (delay - 120 s), so no pending user turn can
    be evicted before its response is read (tests/test_streaming.py);
  * hot-key skew: 1% of conversations get 10-100x turn count;
  * optional late/out-of-order shuffle for watermark-drop tests.

Generation is vectorized numpy -> Arrow -> parquet; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOOLS = [f"tool_{i}" for i in range(8)]
EPOCH_START = np.datetime64("2026-01-01T00:00:00", "us")
SESSION_GAP_S = 30 * 60  # 30 minutes; generator-side session boundary


def generate_transcripts(
    n_convs: int,
    seed: int = 42,
    skew_frac: float = 0.01,
    skew_mult_max: int = 100,
    session_split_frac: float = 0.08,
    late_frac: float = 0.0,
    watermark_s: int = 600,
) -> pa.Table:
    """Return an Arrow table with the transcript schema."""
    rng = np.random.default_rng(seed)

    turns = rng.integers(2, 41, size=n_convs)
    hot = rng.random(n_convs) < skew_frac
    turns = np.where(
        hot, turns * rng.integers(10, skew_mult_max + 1, size=n_convs), turns
    ).astype(np.int64)

    total = int(turns.sum())
    conv_ord = np.repeat(np.arange(n_convs), turns)
    conv_id = np.char.add("c", conv_ord.astype("U10"))
    # dense 0-based turn index within conversation
    starts = np.concatenate(([0], np.cumsum(turns)[:-1]))
    turn_idx = (np.arange(total) - np.repeat(starts, turns)).astype(np.int32)

    # roles: cycle user, assistant, tool, assistant (period 4, first two
    # always user/assistant so 2-turn convs still pair up)
    phase = turn_idx % 4
    role = np.select(
        [phase == 0, phase == 1, phase == 2, phase == 3],
        ["user", "assistant", "tool", "assistant"],
    ).astype("U9")

    tool_pick = rng.integers(0, 8, size=total)
    tool = np.where(phase == 2, np.take(TOOLS, tool_pick), None)

    # timestamps: conv start uniform over 24h, gaps 1..120s, with a
    # seeded fraction of gaps inflated past the session gap
    conv_start = rng.integers(0, 24 * 3600, size=n_convs) * 1_000_000
    gaps = rng.integers(1, 121, size=total).astype(np.int64)
    # splits only before user turns (phase 0): sessions reopen with a
    # user message; responses stay within 120 s of their user turn
    split = (rng.random(total) < session_split_frac) & (phase == 0)
    gaps = np.where(split, SESSION_GAP_S + rng.integers(60, 3600, size=total), gaps)
    gaps = np.where(turn_idx == 0, 0, gaps) * 1_000_000
    # cumulative within conversation: cumsum minus the carry-over at conv starts
    cum = np.cumsum(gaps)
    carry = np.repeat(cum[starts], turns)
    offset_us = cum - carry + np.repeat(conv_start, turns)
    ts = EPOCH_START + offset_us.astype("timedelta64[us]")

    tool_str = np.where(phase == 2, np.take(TOOLS, tool_pick), "")
    text = np.char.add(
        np.char.add(
            np.char.add(np.char.add(role.astype("U9"), "|"), tool_str.astype("U7")),
            np.char.add("|", conv_id),
        ),
        np.char.add("|", turn_idx.astype("U10")),
    )

    if late_frac > 0.0:
        # shift a seeded subset late by up to 2x watermark (arrival order
        # is by file/row order; ts stays event time)
        late = rng.random(total) < late_frac
        order = np.argsort(ts + np.where(late, np.timedelta64(2 * watermark_s, "s"), np.timedelta64(0, "s")), kind="stable")
    else:
        order = np.argsort(ts, kind="stable")

    return pa.table(
        {
            "conv_id": pa.array(conv_id[order]),
            "turn_idx": pa.array(turn_idx[order], type=pa.int32()),
            "role": pa.array(role[order]),
            "text": pa.array(text[order]),
            "tool": pa.array(tool[order]),
            "ts": pa.array(ts[order]),
        }
    )


def write_transcripts(
    out_dir: str,
    n_convs: int,
    n_files: int = 8,
    seed: int = 42,
    **kwargs,
) -> int:
    """Write the table as n_files parquet parts (a file-per-micro-batch
    layout for readStream with maxFilesPerTrigger); returns row count.

    Files are split on ts order so each file is roughly one time slice —
    the analog of the reference's one-file-per-ledger-batch naming
    (/root/reference/cmd/command_utils.go:105-111).
    """
    import os
    import time

    os.makedirs(out_dir, exist_ok=True)
    table = generate_transcripts(n_convs, seed=seed, **kwargs)
    n = table.num_rows
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    # Strictly increasing mtimes (2 s apart, ending now): Spark's file
    # stream source orders new files by modification time, and parquet
    # parts written back-to-back can tie at ms granularity — a tie lets
    # a later time slice enter an earlier micro-batch, jumping the
    # watermark past pending state (the round-2 flake). Distinct mtimes
    # pin pickup order = time order, deterministically.
    t0 = time.time() - 2.0 * n_files
    for i in range(n_files):
        part = table.slice(bounds[i], bounds[i + 1] - bounds[i])
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(part, path)
        os.utime(path, (t0 + 2.0 * i, t0 + 2.0 * i))
    return n
