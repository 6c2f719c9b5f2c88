"""Trained-index tests: full-probe identity, recall bounds (the reference's
own validation strategy for approximate indexes), and the partition-pruning
physical layout."""

import pyspark.sql.functions as F
import pytest

from comet_spark.operators.ann import IVFIndex, IVFPQIndex, PQIndex
from comet_spark.operators.knn import knn
from tests.conftest import SF_DIR_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.filter(F.col("id") == 0).first()["vector"]]


@pytest.fixture(scope="module")
def flat_top10(spark, emb, qvec):
    qdf = spark.createDataFrame([(0, qvec)], "qid bigint, qvec array<double>")
    return [tuple(r) for r in knn(emb, qdf, k=10, metric="l2").select("id", "score").collect()]


def test_ivf_fullprobe_equals_flat(emb, qvec, flat_top10):
    ivf = IVFIndex.train(emb, 8)
    assigned = ivf.assign(emb)
    got = [tuple(r) for r in ivf.search(assigned, qvec, k=10, nprobe=8).collect()]
    assert got == flat_top10


def test_ivf_nprobe_recall(emb, qvec, flat_top10):
    ivf = IVFIndex.train(emb, 8)
    assigned = ivf.assign(emb).cache()
    gt = {r[0] for r in flat_top10}
    r2 = {r["id"] for r in ivf.search(assigned, qvec, k=10, nprobe=2).collect()}
    r8 = {r["id"] for r in ivf.search(assigned, qvec, k=10, nprobe=8).collect()}
    assert len(r8 & gt) / 10 == 1.0
    assert len(r2 & gt) / 10 >= 0.3  # partial probing keeps most of top-k
    assert len(r2 & gt) <= len(r8 & gt)


def test_ivf_partition_pruned_layout(emb, qvec, tmp_path, spark):
    """Writing lists as partitions makes nprobe search a pruned scan."""
    ivf = IVFIndex.train(emb, 8)
    path = str(tmp_path / "ivf_table")
    ivf.write(ivf.assign(emb), path)
    table = spark.read.parquet(path)
    probed = ivf.probe_lists(qvec, 2)
    plan = table.filter(F.col("cluster_id").isin(probed))._jdf.queryExecution().executedPlan().toString()
    # partition filter must appear as a PartitionFilters entry, not a post-scan filter
    assert "PartitionFilters" in plan and "cluster_id" in plan.split("PartitionFilters")[1][:200]


def test_pq_recall_beats_random(emb, qvec, flat_top10):
    pq = PQIndex.train(emb, m=4, nbits=6, max_iter=10)
    codes = pq.encode(emb)
    got = {r["id"] for r in pq.search(codes, qvec, k=10).collect()}
    gt = {r[0] for r in flat_top10}
    # random top-10 of 500 would intersect ~0.2 ids; require well above
    assert len(got & gt) >= 2


def test_pq_rescore_recovers_recall(emb, qvec, flat_top10):
    """ADC+R: exact rerank of the ADC shortlist dominates pure ADC — with a
    corpus-sized shortlist it must reproduce the exact top-k."""
    pq = PQIndex.train(emb, m=4, nbits=4, max_iter=5)
    codes = pq.encode(emb)
    gt = {r[0] for r in flat_top10}
    pure = {r["id"] for r in pq.search(codes, qvec, k=10).collect()}
    res = pq.search(codes, qvec, k=10, rescore=100, vectors=emb)
    rescored = {r["id"] for r in res.collect()}
    assert len(rescored & gt) >= len(pure & gt)
    full = pq.search(codes, qvec, k=10, rescore=emb.count(), vectors=emb)
    assert [tuple(r) for r in full.collect()] == flat_top10


def test_pq_params_for():
    assert PQIndex.params_for(64) == (8, 8)
    assert PQIndex.params_for(60) == (10, 8)
    assert PQIndex.params_for(13) == (13, 8)  # 13 divides itself within 8..32
    assert PQIndex.params_for(6) == (4, 8)  # reference fallback (pq_index.go:50-67)


def test_ivfpq_search_runs_and_overlaps(emb, qvec, flat_top10):
    ix = IVFPQIndex.train(emb, nlist=4, m=4, nbits=4, max_iter=5)
    enc = ix.encode(emb)
    got = {r["id"] for r in ix.search(enc, qvec, k=10, nprobe=4).collect()}
    assert len(got) == 10
    gt = {r[0] for r in flat_top10}
    assert len(got & gt) >= 1


def test_ivf_batch_fullprobe_equals_flat_batch(spark, emb):
    """search_batch with nprobe = nlist reproduces the exact batch scan."""
    from comet_spark.operators.ann import IVFIndex
    from comet_spark.operators.knn import knn

    qs = emb.filter(F.col("id") < 5).select(
        F.col("id").alias("qid"), F.col("vector").alias("qvec")
    )
    flat = {
        (r["qid"], r["id"], r["score"])
        for r in knn(emb, qs, k=10, metric="l2").collect()
    }
    ivf = IVFIndex.train(emb, 8)
    assigned = ivf.assign(emb)
    got = {
        (r["qid"], r["id"], r["score"])
        for r in ivf.search_batch(assigned, qs, k=10, nprobe=8).collect()
    }
    assert got == flat


def test_ann_model_save_load_roundtrip(spark, emb, qvec, tmp_path):
    """A8 for the trained models: IVF/PQ/IVFPQ persist + reload and
    reproduce searches exactly."""
    import numpy as np

    ivf = IVFIndex.train(emb, 4)
    ivf.save(spark, str(tmp_path / "ivf"))
    ivf2 = IVFIndex.load(spark, str(tmp_path / "ivf"))
    assert np.array_equal(ivf.centroids, ivf2.centroids) and ivf2.metric == ivf.metric

    pq = PQIndex.train(emb, m=4, nbits=4, max_iter=3)
    pq.save(spark, str(tmp_path / "pq"))
    pq2 = PQIndex.load(spark, str(tmp_path / "pq"))
    assert np.array_equal(pq.codebooks, pq2.codebooks)
    codes = pq.encode(emb)
    a = [tuple(r) for r in pq.search(codes, qvec, k=5).collect()]
    b = [tuple(r) for r in pq2.search(codes, qvec, k=5).collect()]
    assert a == b

    ix = IVFPQIndex.train(emb, nlist=2, m=4, nbits=4, max_iter=3)
    ix.save(spark, str(tmp_path / "ivfpq"))
    ix2 = IVFPQIndex.load(spark, str(tmp_path / "ivfpq"))
    assert np.array_equal(ix.ivf.centroids, ix2.ivf.centroids)
    assert np.array_equal(ix.pq.codebooks, ix2.pq.codebooks)


def test_pq_search_batch_matches_single(spark, emb):
    """One batched ADC scan ≡ per-query literal-expression searches (same
    math; sum order differs only below ROUND 6)."""
    pq = PQIndex.train(emb, m=4, nbits=4, max_iter=3)
    codes = pq.encode(emb).cache()
    qs = emb.filter(F.col("id") < 4).select(
        F.col("id").alias("qid"), F.col("vector").alias("qvec")
    )
    got = {
        (r["qid"], r["id"], r["score"])
        for r in pq.search_batch(codes, qs, k=5).collect()
    }
    want = set()
    for r in qs.collect():
        qv = [float(x) for x in r["qvec"]]
        for s in pq.search(codes, qv, k=5).collect():
            want.add((r["qid"], s["id"], s["score"]))
    assert got == want


def test_auto_nprobe_scan_mass_target():
    """Uniform lists -> nprobe tracks the mass target; a huge nearest
    list satisfies the target in one probe."""
    import numpy as np

    from comet_spark.operators.ann import IVFIndex

    cents = np.array([[float(i), 0.0] for i in range(8)])
    ix = IVFIndex(cents, "l2")
    q = np.array([0.1, 0.0])  # nearest list order: 0,1,2,...
    uniform = {i: 100 for i in range(8)}
    assert ix.auto_nprobe(q, uniform, target_scan_frac=0.25) == 2
    assert ix.auto_nprobe(q, uniform, target_scan_frac=1.0) == 8
    skewed = {0: 1000, **{i: 10 for i in range(1, 8)}}
    assert ix.auto_nprobe(q, skewed, target_scan_frac=0.25) == 1
    assert ix.auto_nprobe(q, uniform, target_scan_frac=0.9, max_nprobe=4) == 4


def test_ivf_cosine_probing_uses_cosine_geometry(spark):
    """probe_lists must rank centroids under the INDEX metric: an
    L2-ranking of cosine centroids can probe lists that exclude every
    cosine-nearest doc. Recall vs flat cosine at nprobe=nlist/2 must be
    high on direction-clustered data."""
    import numpy as np
    import pyspark.sql.functions as F

    from comet_spark.operators.ann import IVFIndex
    from comet_spark.operators.knn import knn

    rng = np.random.RandomState(11)
    # direction clusters with wildly different norms (the L2-bias trap)
    dirs = rng.randn(8, 16)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        d = dirs[i % 8] + 0.05 * rng.randn(16)
        scale = 0.1 if i % 2 == 0 else 10.0  # mixed norms
        rows.append((i, [float(x) for x in (scale * d)]))
    docs = spark.createDataFrame(rows, "id bigint, vector array<double>")
    ivf = IVFIndex.train(docs, 8, metric="cosine")
    assigned = ivf.assign(docs)
    hits = tot = 0
    for qid in (0, 3, 5, 8, 13):
        qvec = rows[qid][1]
        qdf = spark.createDataFrame([(0, qvec)], "qid bigint, qvec array<double>")
        flat = {r["id"] for r in knn(docs, qdf, k=10, metric="cosine").select("id").collect()}
        got = {
            r["id"]
            for r in ivf.search(assigned, qvec, k=10, nprobe=2).collect()
        }
        hits += len(flat & got)
        tot += 10
    assert hits / tot >= 0.9, f"cosine IVF recall {hits/tot}"


def test_dot_metric_ranks_most_similar_first(spark):
    import pyspark.sql.functions as F

    from comet_spark.operators.knn import knn

    docs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [10.0, 0.0]), (3, [-5.0, 0.0])],
        "id bigint, vector array<double>",
    )
    qdf = spark.createDataFrame([(0, [1.0, 0.0])], "qid bigint, qvec array<double>")
    got = [r["id"] for r in knn(docs, qdf, k=3, metric="dot").select("id").collect()]
    assert got[0] == 2 and got[-1] == 3  # largest dot first, most negative last


def test_build_pq_preserves_caller_nbits(spark):
    from tests.conftest import SF_DIR_SMALL

    import pyspark.sql.functions as F

    from comet_spark.plans.builder import Corpus

    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    c = Corpus(emb, metric="l2").build_pq(nbits=4, max_iter=2)
    assert c._pq.codebooks.shape[1] == 16  # 2^4, not 2^8


def test_build_pq_rejects_non_l2_corpus(spark):
    from tests.conftest import SF_DIR_SMALL

    import pyspark.sql.functions as F

    from comet_spark.plans.builder import Corpus

    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="L2 layout"):
        Corpus(emb, metric="cosine").build_pq()


def test_pq_encode_inplace_matches_encode(spark, emb):
    """Column-preserving encode must produce the SAME codes as the
    (id, codes)-projecting encode, with payload columns intact."""
    from comet_spark.operators.ann import PQIndex

    pq = PQIndex.train(emb, m=4, nbits=4, max_iter=3)
    via_encode = {r["id"]: list(r["codes"]) for r in pq.encode(emb).collect()}
    inplace = pq.encode_inplace(emb).collect()
    assert {r["id"]: list(r["codes"]) for r in inplace} == via_encode
    assert all("vector" in r.asDict() for r in inplace)  # payload preserved


def test_ivfpq_encode_inplace_matches_encode(spark, emb):
    """The one-pass struct kernel (assign -> residual -> codes) must
    agree with the multi-step encode on both cluster_id and codes."""
    from comet_spark.operators.ann import IVFPQIndex

    ix = IVFPQIndex.train(emb, nlist=4, m=4, nbits=4, max_iter=3)
    multi = {
        r["id"]: (r["cluster_id"], list(r["codes"]))
        for r in ix.encode(emb).collect()
    }
    one = {
        r["id"]: (r["cluster_id"], list(r["codes"]))
        for r in ix.encode_inplace(emb).collect()
    }
    assert one == multi


def test_compact_recluster_codes_only_drops_stale_cluster_id(spark, tmp_path, emb):
    """compact(recluster=PQIndex) is a codes-only refresh: a cluster_id
    column written at ingest (by an earlier/unrelated assignment) must
    NOT survive the rewrite — persisting it would let the rewrite
    co-locate files by an assignment nobody refreshed, and readers would
    trust it as current (ADVICE r05). The hook owns the layout columns:
    after a codes-only compact the view carries fresh codes and no
    cluster_id at all."""
    from comet_spark.operators.ann import PQIndex
    from comet_spark.storage.store import DocumentStore

    some = emb.limit(200).withColumn("cluster_id", F.col("id") % 3)
    store = DocumentStore(spark, str(tmp_path / "stale_cid"))
    store.append(some)

    pq = PQIndex.train(store.read(), m=4, nbits=4, max_iter=3)
    store.compact(recluster=pq)
    merged = store.read()
    assert "cluster_id" not in merged.columns
    fresh = {r["id"]: list(r["codes"]) for r in pq.encode(emb.limit(200)).collect()}
    assert {r["id"]: list(r["codes"]) for r in merged.collect()} == fresh


def test_compact_recluster_assignment_only_drops_stale_codes(spark, tmp_path, emb):
    """The symmetric case: compact(recluster=IVFIndex) regenerates only
    cluster_id — PQ codes written at ingest are encoded against
    codebooks nobody refreshed and must NOT survive the rewrite (a later
    ADC read would silently score with them)."""
    from comet_spark.operators.ann import IVFIndex, PQIndex
    from comet_spark.storage.store import DocumentStore

    some = emb.limit(200)
    pq = PQIndex.train(some, m=4, nbits=4, max_iter=3)
    store = DocumentStore(spark, str(tmp_path / "stale_codes"))
    store.append(pq.encode_inplace(some))  # ingest-time codes

    ivf = IVFIndex.train(store.read(), 4, max_iter=3)
    store.compact(recluster=ivf)
    merged = store.read()
    assert "codes" not in merged.columns
    assert "cluster_id" in merged.columns
    want = {r["id"]: r["cluster_id"] for r in ivf.assign(some).collect()}
    assert {r["id"]: r["cluster_id"] for r in merged.collect()} == want


def test_compact_recluster_keep_layout_cols_opt_out(spark, tmp_path, emb):
    """ADVICE r06: two INDEPENDENT indexes can share a store — plain-PQ
    codes (standalone codebooks) plus an IVF assignment being refreshed.
    An IVF centroid refresh does not supersede non-residual PQ codes, so
    keep_layout_cols=['codes'] must carry them through the recluster
    rewrite unchanged (the default drop would silently break the ADC
    serving path until a re-encode)."""
    from comet_spark.operators.ann import IVFIndex, PQIndex
    from comet_spark.storage.store import DocumentStore

    some = emb.limit(200)
    pq = PQIndex.train(some, m=4, nbits=4, max_iter=3)
    store = DocumentStore(spark, str(tmp_path / "keep_codes"))
    store.append(pq.encode_inplace(some))  # ingest-time plain-PQ codes

    ivf = IVFIndex.train(store.read(), 4, max_iter=3)
    store.compact(recluster=ivf, keep_layout_cols=["codes"])
    merged = store.read().cache()
    # fresh assignment AND the still-valid codes both present
    assert {"cluster_id", "codes"} <= set(merged.columns)
    want_cid = {r["id"]: r["cluster_id"] for r in ivf.assign(some).collect()}
    assert {r["id"]: r["cluster_id"] for r in merged.collect()} == want_cid
    want_codes = {r["id"]: list(r["codes"]) for r in pq.encode(some).collect()}
    assert {r["id"]: list(r["codes"]) for r in merged.collect()} == want_codes
    # the ADC serving path over the kept codes still works
    qvec = [float(x) for x in emb.filter(F.col("id") == 0).first()["vector"]]
    via_store = pq.search(merged.select("id", "codes"), qvec, k=5).collect()
    fresh = pq.search(pq.encode(some), qvec, k=5).collect()
    assert [tuple(r) for r in via_store] == [tuple(r) for r in fresh]
    merged.unpersist()


def test_compact_recluster_with_ivfpq_reencodes(spark, tmp_path, emb):
    """compact(recluster=ivfpq) rewrites BOTH the coarse assignment and
    the residual codes for the merged view; ADC search over the
    compacted store matches search over a fresh encode of the same
    corpus."""
    from comet_spark.operators.ann import IVFPQIndex
    from comet_spark.storage.store import DocumentStore

    half_a = emb.filter(F.col("id") % 2 == 0)
    half_b = emb.filter(F.col("id") % 2 == 1)
    store = DocumentStore(spark, str(tmp_path / "pqstore"))
    store.append(half_a)
    store.append(half_b)

    ix = IVFPQIndex.train(store.read(), nlist=4, m=4, nbits=4, max_iter=3)
    store.compact(recluster=ix)
    merged = store.read().cache()
    assert {"cluster_id", "codes"} <= set(merged.columns)

    qvec = [float(x) for x in emb.filter(F.col("id") == 0).first()["vector"]]
    via_store = ix.search(merged, qvec, k=5, nprobe=4).collect()
    fresh = ix.search(ix.encode(emb), qvec, k=5, nprobe=4).collect()
    assert [tuple(r) for r in via_store] == [tuple(r) for r in fresh]
    merged.unpersist()


def test_inplace_hooks_null_vector_safe(spark, emb):
    """A merged store view can surface NULL vectors (mergeSchema mixes
    vector-less segments in); the compaction hooks must yield NULL
    layout columns for those rows, not crash the Arrow worker."""
    from comet_spark.operators.ann import IVFIndex, IVFPQIndex, PQIndex

    some = emb.limit(50)
    with_null = some.unionByName(
        spark.createDataFrame(
            [(999999, None)], "id bigint, vector array<double>"
        )
    )
    ivf = IVFIndex.train(some, 4, max_iter=3)
    got = {r["id"]: r["cluster_id"] for r in ivf.assign_inplace(with_null).collect()}
    assert got[999999] is None and sum(v is not None for v in got.values()) == 50

    pq = PQIndex.train(some, m=4, nbits=4, max_iter=3)
    pg = {r["id"]: r["codes"] for r in pq.encode_inplace(with_null).collect()}
    assert pg[999999] is None and all(
        pg[i] is not None for i in pg if i != 999999
    )

    ivfpq = IVFPQIndex.train(some, nlist=4, m=4, nbits=4, max_iter=3)
    ig = {
        r["id"]: (r["cluster_id"], r["codes"])
        for r in ivfpq.encode_inplace(with_null).collect()
    }
    assert ig[999999] == (None, None)
    assert all(c is not None and k is not None for i, (k, c) in ig.items() if i != 999999)


def test_ivf_pq_ivfpq_soft_delete_skip(spark, emb, qvec, flat_top10):
    """Soft-delete skip on every compressed/pruned layout (J6 per index;
    reference TestIVFIndexSoftDeleteWithSearch, ivf_index_test.go:716):
    exclude_ids drops deleted docs BEFORE top-k, so they neither appear
    nor consume result slots — k live results come back, including when
    the deleted set contains the query's own doc (id 0, the corpus
    top-1). Probe ranking stays delete-oblivious like the reference's
    bitmap skip."""
    from comet_spark.operators.ann import IVFIndex, IVFPQIndex, PQIndex

    top_ids = [r[0] for r in flat_top10]
    deleted = spark.createDataFrame(
        [(int(top_ids[0]),), (int(top_ids[1]),)], "id bigint"
    )

    ivf = IVFIndex.train(emb, 8)
    assigned = ivf.assign(emb)
    got = [
        tuple(r)
        for r in ivf.search(
            assigned, qvec, k=10, nprobe=8, exclude_ids=deleted
        ).collect()
    ]
    assert len(got) == 10
    assert {g[0] for g in got}.isdisjoint({top_ids[0], top_ids[1]})
    # fullprobe minus deleted == flat ranking with those docs never built
    want = [t for t in flat_top10 if t[0] not in top_ids[:2]]
    assert got[: len(want)] == want

    pq = PQIndex.train(emb, m=8, nbits=4)
    codes = pq.encode(emb)
    got_pq = [
        tuple(r)
        for r in pq.search(
            codes, qvec, k=10, rescore=50, vectors=emb, exclude_ids=deleted
        ).collect()
    ]
    assert len(got_pq) == 10
    assert {g[0] for g in got_pq}.isdisjoint({top_ids[0], top_ids[1]})

    ivfpq = IVFPQIndex.train(emb, nlist=8, m=8, nbits=4)
    enc = ivfpq.encode(ivfpq.ivf.assign(emb))
    got_ivfpq = [
        tuple(r)
        for r in ivfpq.search(
            enc, qvec, k=10, nprobe=8, rescore=50, vectors=emb,
            exclude_ids=deleted,
        ).collect()
    ]
    assert len(got_ivfpq) == 10
    assert {g[0] for g in got_ivfpq}.isdisjoint({top_ids[0], top_ids[1]})
