"""The three all-pairs similarity strategies must agree (blocked == expr
exactly; LSH ⊆ exact with bounded recall)."""

import pyspark.sql.functions as F
import pytest

from comet_spark.operators.similarity import (
    cosine_pairs_blocked,
    cosine_pairs_expr,
    lsh_bucket_pairs,
)
from tests.conftest import SF_DIR_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").cache()
    df.count()
    return df


def _pairs(df):
    return {(r["a_id"], r["b_id"]): r["cos_sim"] for r in df.collect()}


def test_blocked_equals_expr(emb):
    exact = _pairs(cosine_pairs_expr(emb, min_sim=0.35))
    fast = _pairs(cosine_pairs_blocked(emb, min_sim=0.35, serving=True))
    assert fast == exact
    assert len(exact) > 0


def test_lsh_subset_with_recall(emb):
    exact = _pairs(cosine_pairs_blocked(emb, min_sim=0.35, serving=True))
    lsh = _pairs(lsh_bucket_pairs(emb, min_sim=0.35, n_planes=16, bands=8))
    # verification step makes precision exact
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # banded with 8 bands of 2 bits → high collision prob for sim≥0.35
    assert len(lsh) >= 0.5 * len(exact)


def test_semantic_dedup_kernels_agree(spark):
    """BLAS per-cluster kernel ≡ the zero-Python Catalyst equi-join
    (same DOUBLE/clip/ROUND-6 math) on the IVF assignment."""
    import pyspark.sql.functions as F

    from comet_spark.operators.ann import IVFIndex
    from comet_spark.operators.similarity import semantic_dedup_pairs
    from tests.conftest import SF_DIR_SMALL

    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    ivf = IVFIndex.train(emb, 4)
    assigned = ivf.assign(emb).cache()
    blas = {
        (r["a_id"], r["b_id"], r["cos_sim"])
        for r in semantic_dedup_pairs(assigned, min_sim=0.3, kernel="blas").collect()
    }
    expr = {
        (r["a_id"], r["b_id"], r["cos_sim"])
        for r in semantic_dedup_pairs(assigned, min_sim=0.3, kernel="expr").collect()
    }
    assert blas == expr and len(blas) > 0


def test_blocked_kernel_requires_serving_ack(emb):
    """The driver-collect kernel is serving-scoped: calling it without
    the explicit serving=True acknowledgment must fail fast (the scale
    paths are cosine_pairs_grid / lsh_bucket_pairs)."""
    import pytest

    with pytest.raises(ValueError, match="serving"):
        cosine_pairs_blocked(emb, min_sim=0.35)


def test_lsh_ann_soft_delete_skip(spark):
    """exclude_ids on the LSH ANN path: deleted docs (including the
    query's own top-1) drop before the exact rescore and never consume
    result slots — the same per-layout delete contract as IVF/PQ/HNSW."""
    import pyspark.sql.functions as F

    from comet_spark.operators.knn import knn
    from comet_spark.operators.similarity import lsh_ann_topk
    from tests.conftest import SF_DIR_SMALL

    emb = (
        spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    )
    qvec = [float(x) for x in emb.filter(F.col("id") == 0).first()["vector"]]
    base = [
        r["id"]
        for r in lsh_ann_topk(emb, qvec, k=10, ef=100, n_probes=16).collect()
    ]
    deleted = spark.createDataFrame([(int(base[0]),)], "id bigint")
    got = lsh_ann_topk(
        emb, qvec, k=10, ef=100, n_probes=16, exclude_ids=deleted
    ).collect()
    assert len(got) == 10
    ids = [r["id"] for r in got]
    assert base[0] not in ids
    # the survivors are exactly the base ranking minus the deleted doc,
    # extended by one candidate (exclusion happens pre-top-k)
    assert ids[: len(base) - 1] == base[1:]
