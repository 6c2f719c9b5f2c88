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
    tail = [ln for ln in out.stdout.strip().splitlines() if ln.strip()][-1]
    print(f"tests: {tail}")


if __name__ == "__main__":
    main()
