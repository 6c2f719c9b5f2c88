"""One feed, three search surfaces — the unified document stream a
production hybrid deployment runs, on the sf0.001 sample.

The reference's unit of ingest is ONE document carrying (vector, text,
metadata) under one ID, added atomically: a single Add fans into the
vector index, the text index, and storage (``index.go:103-139``,
``storage.go:233-250``). This demo is that loop, Spark-shaped — every
mechanism sits under the ``hybrid_doc_stream_rrf`` oracle gate in
``__spark_entry__.py``:

  1. one feed            ((id, vector, text, lang, op) micro-batches
                          through ONE checkpoint → ONE store + the
                          versioned IVF layout; the index side projects
                          to (id, vector), the store keeps whole rows)
  2. three views         (doc_serving_views → the tail-bounded CRUD
                          vector layout, a BM25 scorer over the
                          newest-wins merged view, and the document
                          view for metadata prefilters — one commit
                          history, three serving surfaces)
  3. hybrid serve        (metadata prefilter → pruned vector leg +
                          text leg → RRF, between drains)
  4. CRUD atomically     (an upsert moves a document's vector AND text
                          AND metadata in one micro-batch; a delete
                          vanishes from all three views at once; a
                          crash replays the batch through EVERY sink
                          idempotently)

Run: python examples/unified_doc_pipeline.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F

from comet_spark.operators.fusion import rrf
from comet_spark.session import get_spark
from comet_spark.storage.store import DocumentStore
from comet_spark.streaming.ingest import doc_ingest_stream, doc_serving_views

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SCHEMA = "id bigint, vector array<double>, text string, lang string, op string"


def main() -> None:
    spark = get_spark("unified-doc-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    work = tempfile.mkdtemp(prefix="doc_pipeline_")
    src, ckpt = f"{work}/src", f"{work}/ckpt"
    store = DocumentStore(spark, f"{work}/store", id_col="id")
    index_base = f"{work}/index"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        docs["doc_id"].alias("id"),
        emb["embedding"].cast("array<double>").alias("vector"),
        docs["text"], docs["lang"],
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    def feed(df):
        df.repartition(1).write.mode("append").parquet(src)

    def drain():
        q = doc_ingest_stream(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1").parquet(src),
            store, index_base, checkpoint=ckpt, nlist=8,
            refresh_every=4, op_col="op",
        )
        assert q.awaitTermination(600)

    def serve(tag: str) -> None:
        ivf, layout, bm, view = doc_serving_views(
            spark, store, index_base, normalize=False, cache=False
        )
        cand = view.filter(F.col("lang") == "en").select("id")
        vres = ivf.search(
            layout.join(cand, "id", "left_semi"), qvec, k=5, nprobe=2
        )
        tres = bm.score("spark table join fast", k=5, prefilter_ids=cand)
        fused = rrf(vres, tres, k=5).collect()
        print(f"  [{tag}] hybrid top-5 (lang=en):",
              [(r["id"], round(r["score"], 4)) for r in fused])

    op_null = F.lit(None).cast("string").alias("op")

    print("1. boot: half the corpus in two micro-batches")
    feed(corpus.filter(F.col("id") % 4 == 0).withColumn("op", op_null))
    feed(corpus.filter(F.col("id") % 4 == 1).withColumn("op", op_null))
    drain()
    serve("after boot")

    print("2. CRUD batch 2 (OFF the refresh cadence): upsert doc 0's text")
    print("   AND vector together, delete doc 4 — served from the tail +")
    print("   marker plan, nothing baked yet")
    feed(
        corpus.filter(F.col("id") == 0).select(
            "id",
            F.transform("vector", lambda x: -x).alias("vector"),
            F.concat("text", F.lit(" v2")).alias("text"),
            "lang",
        ).withColumn("op", op_null)
        .unionByName(spark.createDataFrame(
            [(4, None, None, None, "delete")], SCHEMA))
    )
    drain()
    serve("after CRUD")
    assert os.path.exists(f"{index_base}/_deletes/batch=2/_SUCCESS"), (
        "the live delete serves via the marker partition pre-bake"
    )
    ivf, layout, bm, view = doc_serving_views(
        spark, store, index_base, normalize=False, cache=False
    )
    assert view.filter(F.col("id") == 4).count() == 0, "deleted everywhere"
    assert layout.filter(F.col("id") == 4).count() == 0
    v2 = {r["id"] for r in bm.score("v2", k=10).collect()}
    assert v2 == {0}, "the upserted text serves from the text view"
    print("  doc 4 gone from every view; doc 0's new text + vector serve")

    print("3. batches 3-4: more inserts; batch 4 = the scheduled refresh,")
    print("   which bakes the tails AND the delete marker into full_v4")
    feed(corpus.filter(F.col("id") % 4 == 2).withColumn("op", op_null))
    feed(corpus.filter(F.col("id") % 4 == 3).withColumn("op", op_null))
    drain()
    assert os.path.exists(f"{index_base}/_versions/4")
    serve("after refresh")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print("done.")


if __name__ == "__main__":
    main()
