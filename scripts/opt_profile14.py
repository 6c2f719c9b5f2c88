"""Round-14 optimization profiler: timed re-runs + formatted plans + job counts.

Same protocol as scripts/opt_profile.py (r13) plus per-query Spark JOB
counts (the r13 verdict's "job waves" metric): each warm collect runs
under its own job group, and the status tracker reports how many jobs the
execution needed — AQE stage materializations, broadcast builds and the
result job all count, so this is the wave number the hybrid fusion work
targets.

Usage:
  python scripts/opt_profile14.py [--tag before|after|cur] [--reps 3] [q1 ...]
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
    plans_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("comet-spark-opt-profile14")
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

    tracker = spark.sparkContext.statusTracker()
    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # cold pass pays one-time memoized builds; not recorded as warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        cold = time.perf_counter() - t0

        best_noop = best_collect = float("inf")
        jobs = -1
        for i in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.perf_counter() - t0)
            group = f"prof14:{name}:{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect()
            best_collect = min(best_collect, time.perf_counter() - t0)
            jobs = len(tracker.getJobIdsForGroup(group))
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        results[name] = {
            "cold": round(cold, 3),
            "noop_min": round(best_noop, 3),
            "collect_min": round(best_collect, 3),
            "jobs": jobs,
        }
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, sf_dir)._jdf.queryExecution(), "formatted"))
        print(f"{name:34s} cold={cold:7.3f} noop={best_noop:7.3f} "
              f"collect={best_collect:7.3f} jobs={jobs}", flush=True)
        spark.sparkContext.setJobDescription(None)

    out = os.path.join(os.path.dirname(__file__), "..", f"PROFILE_r14_{tag}.json")
    merged: dict[str, dict[str, float]] = {}
    if os.path.exists(out):  # accumulate across invocations, one file per tag
        with open(out) as fh:
            merged = json.load(fh)
    merged.update(results)
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print("\nslowest (by collect_min):")
    for n, r in sorted(results.items(), key=lambda kv: -kv[1]["collect_min"])[:25]:
        print(f"{r['collect_min']:8.3f}  jobs={r['jobs']:3d}  {n}")
    spark.stop()


if __name__ == "__main__":
    main()
