"""r14 verification: artifact build-once reopen equivalence.

Run the ANN/maint/hybrid family queries in THIS session and dump their
full rowsets as JSON. Invoke twice (fresh process each): run 1 pays the
build and stamps signatures, run 2 reopens. Diffing the two dumps proves
reopen ≡ rebuild.

Usage: python scripts/check_reopen.py OUT.json [name-substring ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from comet_spark.session import get_spark  # noqa: E402

SUBS = sys.argv[2:] or [
    "ivf", "pq", "hybrid", "knn_f16", "reranker", "recluster", "reencode",
    "autocut", "bm25", "hnsw", "lsh", "range_search", "soft_delete",
    "tiered", "store_live",
]


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("comet-spark-check-reopen")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qmap = entry.queries()
    names = sorted(n for n in qmap if any(s in n for s in SUBS))
    dump = {}
    for name in names:
        rows = [[repr(v) for v in r] for r in qmap[name](spark, sf_dir).collect()]
        rows.sort()
        dump[name] = rows
    with open(out_path, "w") as fh:
        json.dump(dump, fh, sort_keys=True)
    print(f"dumped {len(names)} queries to {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
