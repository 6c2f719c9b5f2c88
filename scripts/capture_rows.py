"""Dump FULL sorted rowsets of every registered query at a given SF —
the r13/r14 multiset-equality capture used to prove a rewrite changes
nothing a query computes (driver hashes are row-order-insensitive).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/capture_rows.py OUT.json [names...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from comet_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("comet-spark-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("embeddings", "documents", "part", "events"):
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    import __spark_entry__ as entry

    qmap = entry.queries()
    names = sorted(n for n in qmap if not only or n in only)
    dump = {}
    for name in names:
        df = qmap[name](spark, sf_dir)
        rows = [[repr(v) for v in r] for r in df.collect()]
        rows.sort()
        dump[name] = {"cols": sorted(df.columns), "rows": rows}
        print(name, len(rows), flush=True)
    with open(out_path, "w") as fh:
        json.dump(dump, fh, sort_keys=True)
    print(f"dumped {len(names)} queries to {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
