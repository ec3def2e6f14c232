"""Data-quality validation: the pure checker flags exactly the planted
defects on a hand-built table, and nothing on clean input. Exact value
parity vs the DuckDB oracle (checker + mutation fixture) is covered by
tests/test_oracle_parity.py (`dq_violations`)."""

from __future__ import annotations

from datetime import datetime

from stellar_etl_spark.operators.dq import dq_violations, inject_dq_violations


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )


def _t(m):
    return datetime(2026, 1, 1, 12, m)


def test_dq_flags_each_planted_defect(spark):
    rows = [
        # c1: clean
        ("c1", 0, "user", "hi", None, _t(0)),
        ("c1", 1, "assistant", "yo", None, _t(1)),
        # c2: duplicate turn 1
        ("c2", 0, "user", "a", None, _t(0)),
        ("c2", 1, "tool", "b", "t1", _t(1)),
        ("c2", 1, "tool", "b", "t1", _t(1)),
        # c3: gap (0 -> 2)
        ("c3", 0, "user", "a", None, _t(0)),
        ("c3", 2, "assistant", "b", None, _t(1)),
        # c4: ts regression
        ("c4", 0, "user", "a", None, _t(5)),
        ("c4", 1, "assistant", "b", None, _t(3)),
        # c5: bad role + empty text
        ("c5", 0, "robot", "", None, _t(0)),
    ]
    got = sorted(
        (r.check_name, r.conv_id, r.turn_idx, r.detail)
        for r in dq_violations(_df(spark, rows)).collect()
    )
    assert got == [
        ("bad_role", "c5", 0, "robot"),
        ("dup_turn_idx", "c2", 1, "2"),
        ("empty_text", "c5", 0, ""),
        ("ts_regression", "c4", 1, ""),
        ("turn_gap", "c2", 1, "1"),  # the duplicated row breaks +1
        ("turn_gap", "c3", 2, "0"),
    ]


def test_dq_clean_input_produces_no_violations(spark):
    rows = [
        ("c1", 0, "user", "hi", None, _t(0)),
        ("c1", 1, "assistant", "yo", None, _t(1)),
        ("c1", 2, "tool", "ok", "t1", _t(2)),
    ]
    assert dq_violations(_df(spark, rows)).count() == 0


def test_dq_injection_only_adds_rows(spark):
    """The mutation fixture is additive: every original row survives
    byte-identical (the redact_pii injection-split contract)."""
    rows = [
        ("c%d" % i, j, "user", "x", None, _t(j))
        for i in range(40) for j in range(3)
    ]
    base = _df(spark, rows)
    mutated = inject_dq_violations(base)
    n_base, n_mut = base.count(), mutated.count()
    assert n_mut >= n_base
    # original rows all present (exceptAll is null-safe, unlike an
    # equi-join on the NULL tool column)
    assert base.exceptAll(mutated).count() == 0
