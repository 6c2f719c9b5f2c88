"""Scalar quantizers (H8/H9) + reranker plugin point (§2.K)."""

import numpy as np
import pyspark.sql.functions as F

from comet_spark.functions.quantize import (
    float16_roundtrip,
    int8_absmax,
    int8_dequantize,
    int8_quantize,
)
from comet_spark.functions.vector import to_double_array


def test_int8_symmetric_roundtrip(spark):
    rows = [(1, [1.0, -2.0, 0.5]), (2, [4.0, 0.0, -4.0])]
    df = spark.createDataFrame(rows, "id bigint, vector array<double>")
    am = int8_absmax(df, "vector")
    assert am == 4.0
    q = df.select("id", int8_quantize(to_double_array("vector"), am).alias("q")).collect()
    got = {r["id"]: list(r["q"]) for r in q}
    # round(v/4*127): 1.0→32 (31.75), -2.0→-64 (-63.5 rounds away), 0.5→16
    assert got[1] == [32, -64, 16]
    assert got[2] == [127, 0, -127]
    deq = df.select(
        int8_dequantize(int8_quantize(to_double_array("vector"), am), am).alias("d")
    ).collect()
    for r, (_, orig) in zip(deq, rows):
        err = max(abs(a - b) for a, b in zip(r["d"], orig))
        assert err <= am / 127.0 / 2 + 1e-12  # half a quantization step


def test_float16_roundtrip_matches_numpy(spark):
    vals = [0.1, 1.5, -3.14159, 65504.0, 1e-5]
    df = spark.createDataFrame([(1, vals)], "id bigint, vector array<double>")
    got = float16_roundtrip(df).first()["vector_f16"]
    want = np.array(vals, dtype=np.float64).astype(np.float16).astype(np.float32)
    assert list(got) == list(want)


def test_reranker_hook(spark):
    from comet_spark.plans.builder import Corpus

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    docs = spark.createDataFrame(rows, "id bigint, vector array<double>")
    corpus = Corpus(docs)

    def reverse_rerank(df):  # silly reranker: invert the order
        return df.orderBy(F.col("score").desc())

    base = corpus.vector_search().with_query([1.0, 0.0]).with_k(3).execute().collect()
    rr = (
        corpus.vector_search()
        .with_query([1.0, 0.0])
        .with_k(3)
        .with_reranker(reverse_rerank)
        .execute()
        .collect()
    )
    assert [r["id"] for r in rr] == [r["id"] for r in base][::-1]


def test_scalar_quantized_index_int8_close_to_exact(spark):
    """int8 storage search ranks like the exact scan (quantization noise is
    tiny at 8 bits) and the layout round-trips through parquet."""
    import pyspark.sql.functions as F

    from comet_spark.operators.knn import knn
    from comet_spark.operators.scalar_quant import ScalarQuantizedIndex
    from tests.conftest import SF_DIR_SMALL

    emb = (
        spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    )
    qvec = [float(x) for x in emb.filter(F.col("id") == 0).first()["vector"]]
    qdf = spark.createDataFrame([(0, qvec)], "qid bigint, qvec array<double>")
    gt = {r["id"] for r in knn(emb, qdf, k=10, metric="l2").collect()}
    ix = ScalarQuantizedIndex.build(emb, "int8")
    got = {r["id"] for r in ix.search(qvec, k=10).collect()}
    assert len(got & gt) >= 8


def test_scalar_quantized_index_f16_parquet_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from comet_spark.operators.scalar_quant import ScalarQuantizedIndex
    from tests.conftest import SF_DIR_SMALL

    emb = (
        spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    )
    qvec = [float(x) for x in emb.filter(F.col("id") == 0).first()["vector"]]
    ix = ScalarQuantizedIndex.build(emb, "float16")
    before = [tuple(r) for r in ix.search(qvec, k=10).collect()]
    ix.write(str(tmp_path / "sq"))
    back = ScalarQuantizedIndex.read(spark, str(tmp_path / "sq"))
    assert [tuple(r) for r in back.search(qvec, k=10).collect()] == before
    # the query doc itself survives the squeeze as the nearest hit
    assert before[0][0] == 0
