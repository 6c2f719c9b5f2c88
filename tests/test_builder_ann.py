"""Builder ANN routing (§2.L WithNProbes / WithEfSearch) + LSH top-k
recall-vs-flat, mirroring the reference's HNSW validation strategy."""

import pyspark.sql.functions as F
import pytest

from comet_spark.operators.similarity import lsh_ann_topk
from comet_spark.plans.builder import Corpus
from tests.conftest import SF_DIR_SMALL


@pytest.fixture(scope="module")
def corpus(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"), "label")
        .cache()
    )
    docs.count()
    return Corpus(docs)


@pytest.fixture(scope="module")
def qvec(corpus):
    return [float(x) for x in corpus.docs.filter(F.col("id") == 0).first()["vector"]]


@pytest.fixture(scope="module")
def flat_ids(corpus, qvec):
    res = corpus.vector_search().with_query(qvec).with_k(10).execute()
    return [r["id"] for r in res.collect()]


def test_nprobes_full_equals_flat(corpus, qvec, flat_ids):
    corpus.build_ivf(nlist=8)
    res = corpus.vector_search().with_query(qvec).with_k(10).with_nprobes(8).execute()
    assert [r["id"] for r in res.collect()] == flat_ids


def test_nprobes_partial_recall(corpus, qvec, flat_ids):
    if corpus._ivf is None:
        corpus.build_ivf(nlist=8)
    res = corpus.vector_search().with_query(qvec).with_k(10).with_nprobes(2).execute()
    got = {r["id"] for r in res.collect()}
    assert len(got & set(flat_ids)) >= 3


def test_ef_search_lsh_recall(corpus, qvec, flat_ids):
    res = corpus.vector_search().with_query(qvec).with_k(10).with_ef_search(100).execute()
    got = {r["id"] for r in res.collect()}
    # recall >= 0.5 vs flat (reference tests HNSW with recall >= 0.9 at
    # efSearch=200 on real data; synthetic near-uniform vectors hash worse)
    assert len(got & set(flat_ids)) >= 5


def test_lsh_ann_topk_standalone(corpus, qvec, flat_ids):
    res = lsh_ann_topk(corpus.docs, qvec, k=10, ef=50)
    rows = res.collect()
    assert len(rows) == 10
    assert rows[0]["id"] == 0 and rows[0]["score"] == 0.0  # query is doc 0


def test_ann_multi_query_rejected(corpus, qvec):
    vs = corpus.vector_search().with_query(qvec, qvec).with_k(5).with_nprobes(2)
    with pytest.raises(ValueError):
        vs.execute()
