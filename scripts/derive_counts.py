"""Derive the query/test counts the round-end docs cite — run AFTER the
final code commit and paste the output, never hand-count (VERDICT r08
'What's wrong' #1: shipped counts drifted twice because they were written
before the last commits landed).

Usage:  python scripts/derive_counts.py
Prints one line per fact, command-derived:
  - registered queries (len(queries())) and oracles (len(oracle_sql()))
  - collected pytest tests (pytest --collect-only -q)
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry  # Spark-free import (no session)

    print(f"queries: {len(entry.queries())}")
    print(f"oracles: {len(entry.oracle_sql())}")
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=ROOT, capture_output=True, text=True,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    if out.returncode != 0 or not lines:
        # a broken collection must never masquerade as an authoritative
        # count — that IS the drift this script exists to prevent
        sys.exit(
            f"pytest --collect-only failed (rc={out.returncode}):\n"
            + out.stdout[-2000:] + out.stderr[-2000:]
        )
    print(f"tests: {lines[-1]}")


if __name__ == "__main__":
    main()
