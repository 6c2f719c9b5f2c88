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
