"""Index lifecycle on a growing corpus — the maintenance loop a serving
deployment runs, on the sf0.001 sample.

A trained ANN layout is only as good as the corpus it was trained on.
This demo walks the full loop:

  1. train + ingest        (IVF on the initial corpus, write-time
                            assignment into a DocumentStore segment)
  2. drift                 (append 2x more docs AFTER training — their
                            cluster_id is missing and the centroids no
                            longer describe the corpus)
  3. serve through drift   (the store's merged view still answers
                            queries — recall degrades, availability
                            doesn't)
  4. refresh + compact     (retrain on the merged view; ONE rewrite
                            merges segments, applies deletes, and
                            re-assigns every surviving row; fresh
                            cluster_id drives file co-location)
  5. serve the maintained  (export the compacted view partitionBy
     layout                 (cluster_id) — nprobe search prunes to the
                            probed lists' files)
  6. grow the graph        (DistributedHNSW.add_batch: cost ∝ batch,
                            appended docs immediately searchable)

Run: python examples/maintenance_pipeline.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F

from comet_spark.operators.ann import IVFIndex
from comet_spark.operators.hnsw import DistributedHNSW
from comet_spark.session import get_spark
from comet_spark.storage.store import DocumentStore

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("maintenance-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="comet_maint_")
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
    initial = emb.filter(F.col("id") % 3 == 0)
    drift = emb.filter(F.col("id") % 3 != 0)
    qvec = [float(x) for x in emb.first()["vector"]]

    # 1. train + ingest with write-time assignment
    ivf = IVFIndex.train(initial, nlist=8, max_iter=10)
    store = DocumentStore(spark, f"{work}/store")
    store.append(ivf.assign_inplace(initial))
    print(f"trained on {initial.count()} docs, ingested as segment 0")

    # 2. drift: the corpus doubles AFTER training
    store.append(drift)
    print(f"appended {drift.count()} post-training docs (no cluster_id)")

    # 3. the store still serves — merged view over both segments
    view = store.read()
    print(f"merged view: {view.count()} docs, "
          f"{view.filter(F.col('cluster_id').isNull()).count()} unassigned")

    # 4. refresh the centroids on the CURRENT corpus and compact:
    #    one rewrite = segment merge + hard delete + fresh assignment
    refreshed = ivf.refresh(view, max_iter=10)
    store.compact(recluster=refreshed)
    view = store.read()
    print(f"compacted: {store.segment_count()} segment, "
          f"{view.filter(F.col('cluster_id').isNull()).count()} unassigned")

    # 5. export the serving layout (lists = partitions) and search it —
    #    the nprobe filter becomes partition pruning on disk
    layout_path = f"{work}/layout.parquet"
    refreshed.write(view, layout_path)
    layout = spark.read.parquet(layout_path)
    top = refreshed.search(layout, qvec, k=5, nprobe=2).collect()
    print("nprobe=2 over the maintained layout:",
          [(r["id"], r["score"]) for r in top])

    # 6. the graph layout grows incrementally instead of recompacting
    graph = DistributedHNSW.build(initial, m=8, ef_construction=100,
                                  num_partitions=4)
    graph = graph.add_batch(drift, num_partitions=4)
    top_g = graph.search(emb, qvec, k=5, ef_search=100).collect()
    print("grown graph top-5:", [(r["id"], r["score"]) for r in top_g])

    # 7. the TEXT index has the same maintenance story: build once on
    #    the initial corpus, then grow by O(batch) appends — postings
    #    segments land inside the bucketed layout, scores stay exactly
    #    equal to a full rebuild
    from comet_spark.operators.bm25 import BM25

    docs = spark.createDataFrame(
        [(i, f"doc {i} spark maintenance text") for i in range(200)],
        "id bigint, text string",
    )
    first, late = docs.filter(F.col("id") < 120), docs.filter(F.col("id") >= 120)
    ix_path = f"{work}/bm25"
    BM25(first).write(ix_path, buckets=8)
    BM25.append(spark, ix_path, late)
    live = BM25.read(spark, ix_path)
    print("appended text index top-3:",
          [(r["id"], r["score"]) for r in live.score("spark text", k=3).collect()])

    # 8. ...and the same compaction story: consolidate the accumulated
    #    postings segments back to one file per bucket in an INDEX-sized
    #    rewrite (no re-tokenize) — the text twin of store.compact()
    BM25.compact(spark, ix_path)
    compacted = BM25.read(spark, ix_path)
    print("compacted text index top-3 (identical):",
          [(r["id"], r["score"]) for r in compacted.score("spark text", k=3).collect()])

    # 9. on a HUGE index, skip even the index-sized rewrite: tiered
    #    compaction merges only the small appended files per bucket and
    #    RENAMES the consolidated base across — cost ∝ appends
    more = spark.createDataFrame(
        [(i, f"doc {i} late spark arrival") for i in range(200, 210)],
        "id bigint, text string",
    )
    BM25.append(spark, ix_path, more)
    BM25.compact(spark, ix_path, tiered=True)
    tiered = BM25.read(spark, ix_path)
    print("tiered-compacted text index top-3:",
          [(r["id"], r["score"]) for r in tiered.score("spark text", k=3).collect()])

    # 10. documents leave the corpus too: BM25.delete soft-deletes by id
    #     (results AND df/n_docs/avgdl corrected exactly at read); the
    #     vector survives tiered compacts, and the next FULL compact is
    #     the hard delete — rows dropped, stats recomputed, vector gone
    BM25.delete(spark, ix_path, [0, 1, 2])
    after_del = BM25.read(spark, ix_path)
    print("after soft-delete top-3:",
          [(r["id"], r["score"]) for r in after_del.score("spark text", k=3).collect()])
    BM25.compact(spark, ix_path)  # hard delete
    print("doc_len after hard delete:",
          spark.read.parquet(f"{ix_path}/doc_len").count(), "docs")

    # 11. the RECOMMENDED operational loop ties it together: stream the
    #     corpus in and let the stream (the single writer) run the
    #     size-tiered compact in-band every Nth micro-batch — file
    #     counts stay bounded by the size-class ladder with O(log)
    #     write amplification, and NO full compact is ever required
    from comet_spark.streaming.ingest import bm25_ingest_stream

    src = f"{work}/incoming"
    for lo in (300, 320, 340, 360):
        spark.createDataFrame(
            [(i, f"streamed doc {i} spark text") for i in range(lo, lo + 20)],
            "id bigint, text string",
        ).repartition(1).write.mode("append").parquet(src)
    live_store = DocumentStore(spark, f"{work}/stream_store")
    stream_ix = f"{work}/stream_bm25"
    q = bm25_ingest_stream(
        spark.readStream.schema("id bigint, text string")
        .option("maxFilesPerTrigger", "1").parquet(src),
        live_store, stream_ix, checkpoint=f"{work}/ckpt",
        buckets=8, tiered_compact_every=2,
    )
    q.awaitTermination(300)
    streamed = BM25.read(spark, stream_ix)
    print("stream-maintained index top-3:",
          [(r["id"], r["score"]) for r in streamed.score("spark text", k=3).collect()])

    # 12. DELETES ride the same stream (r10): with op_col, marker rows
    #     (op='delete', only the id read) apply after each batch's
    #     inserts as DocumentStore.delete + BM25.delete — idempotent, so
    #     crash replays just re-apply them. Insert rows keep op NULL;
    #     any other value fails the micro-batch loudly. One stream, one
    #     checkpoint lineage, full CRUD (minus upsert-by-id, which the
    #     postings layout can't retract — route that through the LSM
    #     merge view).
    crud_src = f"{work}/crud_incoming"
    spark.createDataFrame(
        [(500 + i, f"crud doc {i} spark text", None) for i in range(8)],
        "id bigint, text string, op string",
    ).repartition(1).write.mode("append").parquet(crud_src)
    spark.createDataFrame(
        [(510, "late doc spark text", None), (500, None, "delete"),
         (501, None, "delete")],
        "id bigint, text string, op string",
    ).repartition(1).write.mode("append").parquet(crud_src)
    crud_store = DocumentStore(spark, f"{work}/crud_store")
    crud_ix = f"{work}/crud_bm25"
    q = bm25_ingest_stream(
        spark.readStream.schema("id bigint, text string, op string")
        .option("maxFilesPerTrigger", "1").parquet(crud_src),
        crud_store, crud_ix, checkpoint=f"{work}/ckpt_crud",
        buckets=8, op_col="op",
    )
    q.awaitTermination(300)
    after_crud = BM25.read(spark, crud_ix)
    print("after streamed deletes (500/501 gone):",
          sorted(r["id"] for r in after_crud.score("spark text", k=20).collect()))


if __name__ == "__main__":
    main()
