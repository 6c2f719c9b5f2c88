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

    # best-of-N per query (default 2): pass 1 pays one-time costs (index
    # train/build memoization, shuffle files, page cache); the min is the
    # steady-state serving latency — the same convention BASELINE.md's
    # reference numbers use (per-query latency on a built index). Local
    # page-cache variance is ±15%, so single-pass totals are not
    # comparable across rounds; mins are.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for p in range(passes):
        for name, fn in sorted(entry_mod.queries().items()):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
            except Exception as ex:  # keep the bench line parseable on failure
                print(f"FAIL {name}: {ex}", file=sys.stderr)
                dt = float("nan")
            if p == 0:
                cold[name] = round(dt, 3)
            prev = timings.get(name, float("inf"))
            timings[name] = round(min(prev, dt) if dt == dt else prev, 3)
    total = sum(v for v in timings.values() if v == v and v != float("inf"))
    cold_total = sum(v for v in cold.values() if v == v)

    # cross-round comparable total (VERDICT r09): the suite `value` grows
    # with every registered query, so diffing it across rounds conflates
    # registry growth with regressions. `frozen_r09_total` is the warm-min
    # sum over the FROZEN r09 registry (bench_frozen_r09.json, 147 names,
    # never appended to) — comparable round-over-round regardless of how
    # many queries later rounds add. `frozen_r09_n` says how many of the
    # frozen names actually summed: a failed/renamed frozen query would
    # otherwise silently SHRINK the total and read as a speedup. A broken
    # frozen file must never cost the run its output line (null fields +
    # stderr note instead).
    frozen_total = frozen_n = None
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "bench_frozen_r09.json",
            )
        ) as fh:
            frozen_names = json.load(fh)["queries"]
        ok = [
            v
            for n in frozen_names
            if (v := timings.get(n, float("nan"))) == v and v != float("inf")
        ]
        frozen_total, frozen_n = round(sum(ok), 3), len(ok)
        if frozen_n != len(frozen_names):
            # a dropped/failed frozen query must read as INCOMPARABLE in
            # the JSON itself, not as a speedup — keep frozen_r09_n so
            # the miss is diagnosable (ADVICE r10)
            frozen_total = None
            print(
                f"WARN frozen subset: only {frozen_n}/{len(frozen_names)} "
                "frozen queries produced a timing — frozen_r09_total "
                "nulled (NOT comparable this run)",
                file=sys.stderr,
            )
    except Exception as ex:  # noqa: BLE001 — never lose the bench line
        print(f"WARN frozen subset unreadable: {ex}", file=sys.stderr)

    # dedicated pinned measurement for the headline queries (the 5 most
    # expensive in the suite, plus any round's drift-watch pins — see
    # the per-name comments below): min-of-2 made the cross-round JSON key on
    # the noisiest number in the suite (knn_batch100 swung 3× between
    # rounds on byte-identical code — r07 postmortem). An N-pass min at
    # the end of the run converges to the true serving floor, so the
    # round-over-round ratio on unchanged code stays inside the measured
    # ±9% host A/B band; the pass-0 'cold' twin (one-time costs + cold
    # cache) is recorded separately instead of polluting the min.
    pinned_names = [
        "knn_batch100", "lsm_merge_bm25", "minhash_lsh_pairs",
        "hybrid_ivfpq_rrf", "range_join_recent_orders",
        # r13 watch items (VERDICT r12 "What's wrong" #1): the two
        # largest common-query moves in the r12 local A/B —
        # hybrid_reencode_rrf 1.73× (1.95 → 3.38 s) and
        # bm25_tiered_delete_score 1.67× (0.83 → 1.39 s), both on paths
        # whose code changed only via shared-helper extraction. N=5
        # floors decide drift-vs-real, the protocol that resolved all
        # four prior watch items as noise. (Rotated OUT after their r12
        # pins did exactly that: tiered_store_knn floor 0.59-0.82 s vs
        # the 1.55 s single reading; simhash_neardup_pairs 0.82-0.95 s.)
        "hybrid_reencode_rrf",
        "bm25_tiered_delete_score",
    ]
    pinned_passes = int(os.environ.get("SPARK_GRAFT_PINNED_PASSES", "5"))
    qmap = entry_mod.queries()
    pinned: dict[str, dict[str, float | None]] = {}
    for name in pinned_names:
        fn = qmap.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(pinned_passes):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            except Exception as ex:
                print(f"FAIL pinned {name}: {ex}", file=sys.stderr)
        pinned[name] = {
            "cold": cold.get(name),
            "warm_min": round(best, 3) if best != float("inf") else None,
        }

    # key order matters: the driver records only a TAIL of this line, so
    # the per-query map (the bulky part) goes FIRST and every summary
    # field — including the passes marker that says these are best-of-N
    # minima, not single-pass wall times, and the pinned headline
    # measurements — goes LAST, where the tail always keeps it
    knn_pin = pinned.get("knn_batch100", {})
    # a query that failed every pass leaves inf in `timings`;
    # json.dumps would print a bare `Infinity`, which is NOT valid JSON
    # and would cost the run its one parseable output line — emit null
    # for that query instead (the name stays present, the failure is
    # already on stderr)
    safe_timings = {
        n: (v if v == v and v != float("inf") else None)
        for n, v in timings.items()
    }
    payload = {
        "queries": safe_timings,
        "sf": sf,
        "passes": passes,
        "timing": f"per-query min over {passes} passes",
        "cold_total": round(cold_total, 3),
        "pinned_passes": pinned_passes,
        "pinned": pinned,
        "knn_batch100_cold": knn_pin.get("cold"),
        "knn_batch100_warm": knn_pin.get("warm_min"),
        "frozen_r09_total": frozen_total,
        "frozen_r09_n": frozen_n,
        "metric": "batch_query_suite_runtime",
        "value": round(total, 3),
        "unit": "sec",
    }
    print(json.dumps(payload))
    # the driver's BENCH record truncates to a tail of the stdout line, so
    # round-over-round diffs lose the first third of the alphabet — also
    # persist the COMPLETE per-query map (cold pass included) as a local
    # artifact next to the repo root
    try:
        out = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
        safe_cold = {n: (v if v == v else None) for n, v in cold.items()}
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), out), "w") as fh:
            json.dump({**payload, "cold": safe_cold}, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # a read-only checkout must not fail the bench
    spark.stop()


if __name__ == "__main__":
    main()
