"""r14: quantify the in-suite vs isolated gap (VERDICT r13 #2).

Protocol, one session:
  phase A  isolated floors of the gap queries (3 reps each)
  phase B  one full pass over all 169 registered queries (the bench shape)
  phase C  the gap queries again (3 reps) — the in-suite number
  phase D  spark.catalog.clearCache() + re-prime, re-measure (storage?)
  phase E  jvm System.gc(), re-measure (heap/GC backlog?)
JVM heap + storage-memory readings at each phase boundary.

Usage: python scripts/insuite_gap.py [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from comet_spark.session import get_spark  # noqa: E402

GAP_QUERIES = ["simhash_neardup_pairs", "ngram_jaccard_pairs", "cms_term_counts",
               "bm25_batch50", "token_surprisal_scores"]


def main() -> None:
    names = sys.argv[1:] or GAP_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("insuite-gap")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("embeddings", "documents", "part", "events"):
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    import __spark_entry__ as entry

    qmap = entry.queries()
    jvm = spark.sparkContext._jvm

    def heap() -> dict:
        mx = jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
        h = mx.getHeapMemoryUsage()
        return {"heap_used_mb": h.getUsed() // 2**20, "heap_max_mb": h.getMax() // 2**20}

    def floors(tag: str) -> dict:
        out = {}
        for n in names:
            fn = qmap[n]
            fn(spark, sf_dir).collect()  # prime (cold builds / memo)
            best = min(
                _timed(fn, spark, sf_dir) for _ in range(3)
            )
            out[n] = round(best, 3)
            print(f"[{tag}] {n}: {best:.3f}", flush=True)
        print(f"[{tag}] {heap()}", flush=True)
        return out

    def _timed(fn, spark, sf_dir) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        return time.perf_counter() - t0

    report = {}
    report["A_isolated"] = floors("A")
    t0 = time.perf_counter()
    for n in sorted(qmap):
        try:
            qmap[n](spark, sf_dir).collect()
        except Exception as ex:  # noqa: BLE001
            print(f"FULL-PASS FAIL {n}: {ex}", file=sys.stderr)
    report["B_full_pass_sec"] = round(time.perf_counter() - t0, 1)
    report["B_heap"] = heap()
    report["C_in_suite"] = floors("C")
    spark.catalog.clearCache()
    report["D_after_clearcache"] = floors("D")
    jvm.java.lang.System.gc()
    time.sleep(2)
    report["E_after_gc"] = floors("E")
    print(json.dumps(report, indent=1, sort_keys=True))
    with open("/tmp/insuite_gap.json", "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
