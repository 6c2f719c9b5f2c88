"""Round-13 optimization profiler: timed re-runs + formatted plans.

For each target query (argv names, or the slowest-N from a bench JSON):
  - run it REPS times warm (after a full cold pass) with the noop sink so
    we time the computation, not result pickling to the driver
    (optimization guide §1.4) — EXCEPT the collect twin is also recorded,
    since bench.py times `.collect()` and the two can diverge when the
    result is wide;
  - write `.explain("formatted")` to plans/r13/<query>_<tag>.txt;
  - print a sorted table of per-query min times.

Usage:
  python scripts/opt_profile.py [--tag before|after] [--reps 3] [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from comet_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    reps = 3
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("comet-spark-opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("embeddings", "documents", "part", "events"):
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    import __spark_entry__ as entry

    qmap = entry.queries()
    if not names:
        names = sorted(qmap)
    missing = [n for n in names if n not in qmap]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # cold pass pays one-time memoized builds; not recorded as warm
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        cold = time.perf_counter() - t0

        best_noop = best_collect = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.perf_counter() - t0)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect()
            best_collect = min(best_collect, time.perf_counter() - t0)
        results[name] = {
            "cold": round(cold, 3),
            "noop_min": round(best_noop, 3),
            "collect_min": round(best_collect, 3),
        }
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, sf_dir)._jdf.queryExecution(), "formatted"))
        print(f"{name:34s} cold={cold:7.3f} noop={best_noop:7.3f} "
              f"collect={best_collect:7.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)

    out = os.path.join(os.path.dirname(__file__), "..", f"PROFILE_r13_{tag}.json")
    merged: dict[str, dict[str, float]] = {}
    if os.path.exists(out):  # accumulate across invocations, one file per tag
        with open(out) as fh:
            merged = json.load(fh)
    merged.update(results)
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print("\nslowest (by collect_min):")
    for n, r in sorted(results.items(), key=lambda kv: -kv[1]["collect_min"])[:25]:
        print(f"{r['collect_min']:8.3f}  {n}")
    spark.stop()


if __name__ == "__main__":
    main()
