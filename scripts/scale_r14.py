"""r14 scaling spot-check (VERDICT r13 #8): run the heavy six at a
10x-local corpus on 32 AND 8 cores and record the ratios.

At sf0.1 every query is floor-bound (job waves + py4j), so 8c ≈ 32c and
the bench cannot distinguish parallel from serial plans. At the 10x soak
corpus (50k docs / 20k vectors / 10x events+orders) the compute term
dominates, so a fanned-out/skew-safe plan must show low-core/high-core
ratios well above 1 (→ core ratio 4 in the limit), while a serialized
plan would stay ≈ 1.

Usage:
  python scripts/scale_r14.py            # generate corpus, run 32c + 8c, write SCALE_r14.json
  python scripts/scale_r14.py --run 32   # (internal) one measured session
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

SOAK_DIR = os.path.join(ROOT, ".artifacts", "soak", "sf1")
SF01 = "/root/testdata/sf0.1"

QUERIES = [
    "knn_batch100",
    "range_join_recent_orders",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "repetition_metrics",
    "bm25_batch50",
]


def _generate_events_orders() -> None:
    """10x events/orders for range_join: replicate the sf0.1 tables with
    shifted ids, shifting user_id and o_custkey by the SAME per-replica
    offset so per-user join selectivity (orders per event-user-week)
    stays what it is at sf0.1 — the corpus grows, the key distribution
    doesn't degenerate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(SOAK_DIR, "orders.parquet")):
        return
    ev = pq.read_table(f"{SF01}/events.parquet")
    orders = pq.read_table(f"{SF01}/orders.parquet")
    uoff = max(
        max(ev.column("user_id").to_pylist()),
        max(orders.column("o_custkey").to_pylist()),
    ) + 1
    eoff = max(ev.column("event_id").to_pylist()) + 1
    ooff = max(orders.column("o_orderkey").to_pylist()) + 1

    def _shift(tbl: pa.Table, shifts: dict[str, int], rep: int) -> pa.Table:
        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in shifts:
                col = pa.compute.add(col, shifts[name] * rep)
            cols[name] = col
        return pa.table(cols, schema=tbl.schema)

    pq.write_table(
        pa.concat_tables(
            _shift(ev, {"event_id": eoff, "user_id": uoff}, r) for r in range(10)
        ),
        os.path.join(SOAK_DIR, "events.parquet"),
    )
    pq.write_table(
        pa.concat_tables(
            _shift(orders, {"o_orderkey": ooff, "o_custkey": uoff}, r)
            for r in range(10)
        ),
        os.path.join(SOAK_DIR, "orders.parquet"),
    )
    print(f"wrote 10x events/orders to {SOAK_DIR}")


def run_session(cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from comet_spark.session import get_spark

    spark = get_spark(f"scale-r14-{cpus}c", cpus=str(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qmap = entry.queries()
    out = {}
    for name in QUERIES:
        fn = qmap[name]
        fn(spark, SOAK_DIR).collect()  # cold: artifact/cache builds
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SOAK_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"[{cpus}c] {name}: {best:.3f}", flush=True)
    spark.stop()
    return out


def main() -> None:
    if "--run" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--run") + 1])
        res = run_session(cpus)
        with open(f"/tmp/scale_r14_{cpus}c.json", "w") as fh:
            json.dump(res, fh)
        return

    from scripts.soak_scale import generate

    generate()
    _generate_events_orders()
    for cpus in (32, 8):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cpus)],
            check=True, cwd=ROOT,
        )
    r32 = json.load(open("/tmp/scale_r14_32c.json"))
    r8 = json.load(open("/tmp/scale_r14_8c.json"))
    payload = {
        "corpus": "10x-local soak (50k docs / 20k vecs / 10x events+orders)",
        "cpus_high": 32, "cpus_low": 8,
        "per_query": {
            q: {
                "sec_32c": r32[q], "sec_8c": r8[q],
                "ratio_8c_over_32c": round(r8[q] / r32[q], 2) if r32[q] else None,
            }
            for q in QUERIES
        },
    }
    with open(os.path.join(ROOT, "SCALE_r14.json"), "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps(payload, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
