"""Guard the evidence-rotation invariant (README "Evidence rotation").

The driver's CORRECTNESS artifact gates only the first 50 entries of
``__spark_entry__.queries()``. While never-green queries fit in the
window, every registered query must either hold a fully-green row in
some committed round artifact or sit inside the window — a query that
is neither is invisible to the hard gate, exactly the round-3
regression (VERDICT r03 "What's wrong" #1). Once never-green queries
outnumber the 50 seats, a wait-list is unavoidable; the enforced
invariant then is that no seat is WASTED: while any never-green query
waits outside, NO query with a green row in ANY committed round may
hold a seat — regardless of how old that green row is — unless it has
a live entry in gating_ledger.REVALIDATION_SEATS (a VERDICT-mandated
re-gate, bound to the mandating round and self-expiring when the next
artifact lands). tools/gating_ledger.py implements the rule; adding a
registry-tail query while an already-green query sits unexempted in
the window trips this test.
"""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_gated_or_seated():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gating_ledger.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, (
        "queries with no green driver row are sitting outside the 50-entry "
        "gate window — rotate them to the front of queries():\n"
        + proc.stdout.splitlines()[-1]
    )
