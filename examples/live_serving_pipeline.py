"""Serve while you write — the streaming CRUD + live-maintenance loop a
production vector deployment runs, on the sf0.001 sample.

The reference engine's core promise is an index that stays searchable
while Add/Update/Remove mutate it (its memtable is visible to Search
the moment Add returns). This demo is that loop, Spark-shaped — every
mechanism here sits under an oracle gate in `__spark_entry__.py`:

  1. boot                  (micro-batches stream through a real
                            checkpoint; batch 0 trains and COMMITS the
                            first versioned IVF layout — a monotone
                            marker create, never a pointer rewrite)
  2. read between drains   (ivf_serving_view = max committed version ∪
                            _SUCCESS-gated newer tails — partition-
                            pruned parquet, no stream coordination)
  3. CRUD through the      (op_col: NULL rows upsert — their tail
     SAME stream            assignment shadows older versions under
                            newest-wins — and 'delete' rows accumulate
                            as _SUCCESS-gated marker partitions the
                            view anti-joins by precedence; a later
                            re-append resurrects)
  4. scheduled refresh     (every refresh_every batches the retrain
                            bakes tails + markers into an IMMUTABLE
                            full_v{N}; crash replays skip via the
                            marker — serving never wobbles)
  5. GC                    (gc_index_versions removes only what the
                            committed version superseded; run it while
                            the stream is stopped)

Run: python examples/live_serving_pipeline.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F

from comet_spark.session import get_spark
from comet_spark.storage.store import DocumentStore
from comet_spark.streaming.ingest import (
    gc_index_versions,
    ivf_ingest_stream,
    ivf_serving_view,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SCHEMA = "id bigint, vector array<double>, op string"


def main() -> None:
    spark = get_spark("live-serving-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="comet_live_")
    try:
        _run(spark, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def _run(spark, work: str) -> None:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vector"),
    )
    src = f"{work}/src"
    store = DocumentStore(spark, f"{work}/store", id_col="id")
    index = f"{work}/index"
    op_null = F.lit(None).cast("string").alias("op")

    def feed(df) -> None:  # one part file per call → one micro-batch
        df.repartition(1).write.mode("append").parquet(src)

    def drain() -> None:  # availableNow: drain what's fed, then stop
        q = ivf_ingest_stream(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            store, index, checkpoint=f"{work}/ckpt",
            nlist=8, refresh_every=2, op_col="op",
        )
        assert q.awaitTermination(600)

    qvec = [float(x) for x in emb.filter("id = 0").first()["vector"]]

    def topk(tag: str) -> None:
        ivf, layout = ivf_serving_view(spark, index)
        hits = ivf.search(layout, qvec, k=3, nprobe=2).collect()
        print(f"  [{tag}] top-3:",
              [(r["id"], round(r["score"], 4)) for r in hits])

    # 1-2) boot, then read between drains
    feed(emb.filter("id % 3 = 0").select("id", "vector", op_null))
    drain()  # batch 0 → trains + commits full_v0
    print("1) booted: full_v0 committed, serving immediately")
    topk("boot")

    # 3) CRUD rides the same stream: fresh inserts + an upsert that
    #    moves doc 0 far away + a delete of doc 3
    feed(
        emb.filter("id % 3 = 1").select("id", "vector", op_null)
        .unionByName(
            emb.filter("id = 0").select(
                "id", F.transform("vector", lambda x: x + 10.0).alias("vector"),
                op_null,
            )
        )
        .unionByName(
            spark.createDataFrame([(3, None, "delete")], SCHEMA)
        )
    )
    drain()  # batch 1 → tail shadows full_v0; marker partition lands
    print("2) CRUD batch drained: doc 0 upserted away, doc 3 deleted")
    topk("post-CRUD")  # doc 0 no longer nearest itself; 3 never appears

    # 4) the scheduled refresh bakes it all into an immutable full_v2
    feed(emb.filter("id % 3 = 2").select("id", "vector", op_null))
    drain()  # batch 2 → retrain on the merged view → full_v2 committed
    print("3) refresh committed full_v2 (tails + markers baked)")
    topk("post-refresh")

    # 5) GC what the committed version superseded (stream stopped)
    removed = gc_index_versions(spark, index)
    print(f"4) gc removed {len(removed)} superseded dir(s):",
          sorted(os.path.basename(p) for p in removed))
    topk("post-gc")  # serving unchanged — GC touches only dead state

    n = ivf_serving_view(spark, index)[1].count()
    print(f"5) serving {n} vectors (corpus minus the delete)")


if __name__ == "__main__":
    main()
