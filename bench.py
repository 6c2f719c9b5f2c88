"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Usage: python bench.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import __spark_entry__ as entry_mod
from comet_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("comet-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so per-query times measure the queries
    for t in ("embeddings", "documents", "part", "events"):
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(entry_mod.queries().items()):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
        except Exception as ex:  # keep the bench line parseable on failure
            print(f"FAIL {name}: {ex}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 3)
        total += dt if dt == dt else 0.0

    print(
        json.dumps(
            {
                "metric": "batch_query_suite_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
