"""Property tests for the TOID-style id packing (pure Python — the
Spark expressions in ids.py implement the same arithmetic; their
dialect parity is covered by the driver oracles).

Reference analog: the TOID invariants in /root/reference/internal/
toid/main.go:32-56 — field round-trip, total-order preservation, and
capacity guards."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stellar_etl_spark import ids

conv_nums = st.integers(min_value=0, max_value=(1 << ids.CONV_BITS) - 1)
turn_idxs = st.integers(min_value=0, max_value=(1 << ids.TURN_BITS) - 1)


@settings(max_examples=300, deadline=None)
@given(conv_nums, turn_idxs)
def test_pack_unpack_roundtrip(conv, turn):
    packed = ids.pack_py(conv, turn)
    assert packed >= 0  # never overflows signed int64
    assert packed < 1 << 63
    assert ids.unpack_py(packed) == (conv, turn)


@settings(max_examples=300, deadline=None)
@given(conv_nums, turn_idxs, conv_nums, turn_idxs)
def test_pack_preserves_total_order(c1, t1, c2, t2):
    """Numeric order of packed ids == lexicographic (conv, turn) order —
    the property that makes turn_id a valid global cursor (S4 bounded
    ranges, --limit determinism)."""
    assert (ids.pack_py(c1, t1) < ids.pack_py(c2, t2)) == ((c1, t1) < (c2, t2))


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1 << ids.TURN_BITS, max_value=1 << 40))
def test_turn_capacity_guard(bad_turn):
    with pytest.raises(ValueError):
        ids.pack_py(0, bad_turn)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << ids.CONV_BITS) - 2))
def test_after_conv_is_half_open_range(conv):
    """after_conv's (lo, hi) must cover exactly conversation `conv`:
    lo = its first turn, hi = the next conversation's first turn
    (exclusive) — the range-prepare boundary rule. Max conv_num is
    excluded: conv+1 would need CONV_BITS+1 bits."""
    lo, hi = ids.after_conv(conv)
    assert lo == ids.pack_py(conv, 0)
    assert hi == ids.pack_py(conv + 1, 0)
    assert lo <= ids.pack_py(conv, (1 << ids.TURN_BITS) - 1) < hi
