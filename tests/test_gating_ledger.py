"""Guard the evidence-rotation invariant (README "Evidence rotation").

The driver's CORRECTNESS artifact gates only the first 50 entries of
``__spark_entry__.queries()``. Every registered query must therefore
either already hold a fully-green row in some committed round artifact,
or sit inside the current 50-entry window so the next artifact gates it.
A query that is neither is invisible to the hard gate — exactly the
round-3 regression (VERDICT r03 "What's wrong" #1). Adding a query at
the registry tail without rotating the window trips this test.
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
