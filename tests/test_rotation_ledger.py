"""CI gate for the mechanized driver-window rotation ledger (VERDICT r5 #4).

``tools/rotation_check.py --check`` fails when a rotation rule is violated:
an entry whose transitive-closure hash drifted from its recorded green
evidence is OUTSIDE the first-50 window, or an out-of-window entry has no
ledger record at all. Running it in pytest makes a forgotten rotation a red
suite, not a judge finding.

No SparkSession needed: hashing is static (AST + source bytes + oracle
text), so this test is cheap and runs early.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_ledger_check_passes():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rotation_check.py"), "--check"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, (
        "rotation violations (update _PRIORITY or re-stamp after a green "
        f"sweep):\n{proc.stdout}\n{proc.stderr}"
    )


def test_window_is_exactly_fifty():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    assert len(entry_mod._PRIORITY) == 50
    names = entry_mod.queries()
    assert list(names)[:50] == entry_mod._PRIORITY
