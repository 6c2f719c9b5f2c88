"""comet-spark quickstart — the fluent search API end-to-end.

Run: python examples/quickstart.py  (uses /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F

from comet_spark.operators.metadata import Eq, Field, Gt, NumField, Where
from comet_spark.plans.builder import Corpus
from comet_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("comet-spark-quickstart", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")

    # one corpus = id + vector + text + typed metadata columns
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = Corpus(
        docs.join(emb, docs["doc_id"] == emb["vec_id"], "left").select(
            docs["doc_id"].alias("id"),
            emb["embedding"].alias("vector"),
            docs["text"],
            docs["lang"],
            docs["n_chars"],
        )
    )

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    print("— vector search (exact flat scan) —")
    corpus.vector_search().with_query(qvec).with_k(5).execute().show()

    print("— more-like-this (stored vector as query) —")
    corpus.vector_search().with_node(7).with_k(5).execute().show()

    print("— BM25 text search —")
    corpus.text_search().with_query("spark table join fast").with_k(5).execute().show()

    print("— hybrid: metadata prefilter + vector + text + RRF fusion —")
    (
        corpus.hybrid_search()
        .with_vector(qvec)
        .with_text("spark table join fast")
        .with_metadata(Eq(Field("lang"), "en"))
        .with_metadata_groups(
            Where(Gt(NumField("n_chars", quantize=False), 100)).Or(
                Eq(Field("lang"), "de")
            )
        )
        .with_k(5)
        .with_fusion("rrf")
        .execute()
        .show()
    )

    print("— IVF: train once, then pruned probing —")
    corpus.build_ivf(nlist=8)
    corpus.vector_search().with_query(qvec).with_k(5).with_nprobes(2).execute().show()

    print("— LSH (distributed ANN) approximate search —")
    corpus.vector_search().with_query(qvec).with_k(5).with_ef_search(50).execute().show()

    print("— true graph-HNSW (serving index): build once, beam search —")
    corpus.build_hnsw(m=8, ef_construction=100)
    corpus.vector_search().with_query(qvec).with_k(5).with_ef_search(50).execute().show()

    print("— multi-query batch ANN with Sum aggregation —")
    qvec2 = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    (
        corpus.vector_search().with_query(qvec, qvec2).with_k(5)
        .with_score_aggregation("sum").with_ef_search(50).execute().show()
    )

    print("— int8 quantized storage: 4x smaller scan, same ranking —")
    from comet_spark.operators.scalar_quant import ScalarQuantizedIndex

    sq = ScalarQuantizedIndex.build(corpus.docs.filter(F.col("vector").isNotNull()), "int8")
    sq.search(qvec, k=5).show()

    print("— hybrid over the IVF-pruned layout (ANN knobs compose) —")
    (
        corpus.hybrid_search()
        .with_vector(qvec)
        .with_text("fast table scan")
        .with_k(5)
        .with_nprobes(2)
        .with_fusion("rrf")
        .execute()
        .show()
    )

    print("— multimodal: REAL decode of PPM/BMP/WAV payloads —")
    from comet_spark.multimodal import attach_media_real, audio_duration, image_features

    media = attach_media_real(docs.select("doc_id"), id_col="doc_id")
    image_features(media, dim=4, decode_mode="real").show(3)
    audio_duration(media, decode_mode="real").show(3)

    print("— token surprisal (corpus-LM proxy quality score) —")
    from comet_spark.operators.quality import token_surprisal

    token_surprisal(docs).orderBy(F.col("surprisal").desc()).show(3)

    spark.stop()


if __name__ == "__main__":
    main()
