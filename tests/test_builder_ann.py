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


def test_auto_nprobe_full_mass_equals_flat(corpus, qvec, flat_ids):
    """with_auto_nprobe(1.0) must scan the whole corpus mass →
    degenerates to the exact fullprobe scan."""
    if corpus._ivf is None:
        corpus.build_ivf(nlist=8)
    res = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_auto_nprobe(1.0).execute()
    )
    assert [r["id"] for r in res.collect()] == flat_ids


def test_auto_nprobe_matches_manual_choice(corpus, qvec):
    """The builder knob must make the SAME choice as calling
    IVFIndex.auto_nprobe by hand with the memoized list sizes, and an
    explicit with_nprobes must override it."""
    import numpy as np

    if corpus._ivf is None:
        corpus.build_ivf(nlist=8)
    sizes = corpus._ivf_list_sizes()
    n = corpus._ivf.auto_nprobe(np.asarray(qvec), sizes, target_scan_frac=0.5)
    auto = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_auto_nprobe(0.5).execute()
    )
    manual = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_nprobes(n).execute()
    )
    assert [tuple(r) for r in auto.collect()] == [tuple(r) for r in manual.collect()]
    # explicit nprobes wins over the auto knob
    override = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_auto_nprobe(0.1).with_nprobes(8).execute()
    )
    full = corpus.vector_search().with_query(qvec).with_k(10).with_nprobes(8).execute()
    assert [tuple(r) for r in override.collect()] == [tuple(r) for r in full.collect()]


def test_auto_nprobe_validation_and_adc_composition(corpus, qvec):
    """Knob hygiene (r06 review): out-of-range fractions and caps fail
    loudly at the knob; with_adc + with_auto_nprobe routes through the
    IVFPQ coarse lists (same results as the equivalent manual nprobe),
    and a rebuilt IVF layout invalidates the list-size memo."""
    import numpy as np

    import pytest as _pytest

    vs = corpus.vector_search()
    with _pytest.raises(ValueError, match="target_scan_frac"):
        vs.with_auto_nprobe(0.0)
    with _pytest.raises(ValueError, match="target_scan_frac"):
        vs.with_auto_nprobe(1.5)
    with _pytest.raises(ValueError, match="max_nprobe"):
        vs.with_auto_nprobe(0.5, max_nprobe=0)

    if corpus._ivfpq is None:
        corpus.build_ivfpq(nlist=4, m=4, nbits=4, max_iter=3)
    sizes = corpus._ivfpq_list_sizes()
    n = corpus._ivfpq.ivf.auto_nprobe(np.asarray(qvec), sizes, target_scan_frac=0.5)
    auto = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_adc().with_auto_nprobe(0.5).execute()
    )
    manual = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_adc().with_nprobes(n).execute()
    )
    assert [tuple(r) for r in auto.collect()] == [tuple(r) for r in manual.collect()]

    # rebuilding the layout must invalidate the memoized masses
    if corpus._ivf is None:
        corpus.build_ivf(nlist=8)
    corpus._ivf_list_sizes()
    assert corpus._ivf_sizes is not None
    corpus.build_ivf(nlist=4)
    assert corpus._ivf_sizes is None
    assert len(corpus._ivf_list_sizes()) <= 4
    corpus.build_ivf(nlist=8)  # restore for sibling tests


def test_auto_nprobe_batch_probes_per_query(corpus, spark):
    """A batch with per-query probe depths (what the auto knob produces)
    must equal running each query alone at ITS OWN depth — no query
    pays another query's scan; and the builder's multi-query auto path
    matches the manually aggregated per-query singles."""
    import numpy as np

    from comet_spark.operators.knn import knn_aggregate

    if corpus._ivf is None:
        corpus.build_ivf(nlist=8)
    ivf, assigned = corpus._ivf, corpus._ivf_assigned
    qvecs = {
        int(r["id"]): [float(x) for x in r["vector"]]
        for r in corpus.docs.filter(F.col("id") < 3).collect()
    }
    depth = {0: 1, 1: 3, 2: 8}
    qdf = spark.createDataFrame(
        [(i, v) for i, v in qvecs.items()], "qid bigint, qvec array<double>"
    )
    batch = {
        (r["qid"], r["id"], r["score"])
        for r in ivf.search_batch(assigned, qdf, k=5, nprobe=depth).collect()
    }
    singles = set()
    for qid, v in qvecs.items():
        for r in ivf.search(assigned, v, k=5, nprobe=depth[qid]).collect():
            singles.add((qid, r["id"], r["score"]))
    assert batch == singles

    sizes = corpus._ivf_list_sizes()
    auto = (
        corpus.vector_search()
        .with_query(*qvecs.values()).with_k(5)
        .with_auto_nprobe(0.5).with_score_aggregation("sum").execute()
    )
    per_q = []
    for qid, v in zip(range(len(qvecs)), qvecs.values()):
        n = ivf.auto_nprobe(np.asarray(v), sizes, target_scan_frac=0.5)
        per_q.append(
            ivf.search(assigned, v, k=5, nprobe=n)
            .select(F.lit(qid).alias("qid"), "id", "score")
        )
    u = per_q[0]
    for p in per_q[1:]:
        u = u.unionByName(p)
    want = knn_aggregate(u, k=5, agg="sum", ascending=True)
    assert [tuple(r) for r in auto.collect()] == [tuple(r) for r in want.collect()]


def test_ef_search_lsh_recall(corpus, qvec, flat_ids):
    res = corpus.vector_search().with_query(qvec).with_k(10).with_ef_search(100).execute()
    got = {r["id"] for r in res.collect()}
    # recall >= 0.5 vs flat (reference tests HNSW with recall >= 0.9 at
    # efSearch=200 on real data; synthetic near-uniform vectors hash worse)
    assert len(got & set(flat_ids)) >= 5


def test_lsh_ef_ladder_monotone(corpus, qvec, flat_ids):
    """ef is efSearch's role: a larger Hamming beam must not lose recall,
    and a corpus-sized beam makes the scan exact (recall 1.0) — the
    reference's ef-ladder validation (docs/INDEX.md:972-974)."""
    n = corpus.docs.count()
    gt = set(flat_ids)
    recalls = []
    for ef in (0, 50, n):
        got = {r["id"] for r in lsh_ann_topk(corpus.docs, qvec, k=10, ef=ef).collect()}
        recalls.append(len(got & gt))
    assert recalls == sorted(recalls)  # monotone non-decreasing
    assert recalls[-1] == 10  # beam = corpus -> exact scan


def test_lsh_multiprobe_ladder_monotone(corpus, qvec, flat_ids):
    """Multi-probe LSH (Lv et al., VLDB'07): probing the cheapest
    bit-flip neighbor buckets only ever ADDS candidates, so recall must
    be monotone non-decreasing in n_probes; probing every bucket of
    every band (bands * 2^band_bits) admits the whole corpus -> exact."""
    gt = set(flat_ids)
    recalls = []
    for npb in (0, 8, 16, 4 * 16):
        got = {
            r["id"]
            for r in lsh_ann_topk(
                corpus.docs, qvec, k=10, ef=0, n_probes=npb
            ).collect()
        }
        recalls.append(len(got & gt))
    assert recalls == sorted(recalls)  # monotone non-decreasing
    assert recalls[-1] == 10  # all buckets probed -> exact scan
    assert recalls[2] > recalls[0]  # probing must actually buy recall


def test_lsh_ann_topk_standalone(corpus, qvec, flat_ids):
    res = lsh_ann_topk(corpus.docs, qvec, k=10, ef=50)
    rows = res.collect()
    assert len(rows) == 10
    assert rows[0]["id"] == 0 and rows[0]["score"] == 0.0  # query is doc 0


@pytest.fixture(scope="module")
def qvec2(corpus):
    return [float(x) for x in corpus.docs.filter(F.col("id") == 1).first()["vector"]]


def test_ann_multi_query_ivf_fullprobe_equals_exact(corpus, qvec, qvec2):
    """Multi-query through the IVF path at nprobe=nlist must equal the
    exact multi-query aggregation (reference: multi-query on every index,
    index_search.go:141-279)."""
    if corpus._ivf is None:
        corpus.build_ivf(nlist=8)
    exact = (
        corpus.vector_search().with_query(qvec, qvec2).with_k(10)
        .with_score_aggregation("sum").execute()
    )
    approx = (
        corpus.vector_search().with_query(qvec, qvec2).with_k(10)
        .with_score_aggregation("sum").with_nprobes(8).execute()
    )
    assert [tuple(r) for r in approx.collect()] == [tuple(r) for r in exact.collect()]


def test_ann_multi_query_lsh_runs(corpus, qvec, qvec2, flat_ids):
    res = (
        corpus.vector_search().with_query(qvec, qvec2).with_k(10)
        .with_score_aggregation("sum").with_ef_search(100).execute()
    )
    rows = res.collect()
    assert len(rows) == 10
    assert len({r["id"] for r in rows} & set(flat_ids)) >= 3


def test_ef_search_routes_to_hnsw_when_built(corpus, qvec, flat_ids):
    """build_hnsw attaches the graph; with_ef_search then traverses it —
    recall must be in the reference's HNSW regime (>= 0.9 at ef=100)."""
    corpus.build_hnsw(m=8, ef_construction=100)
    try:
        res = corpus.vector_search().with_query(qvec).with_k(10).with_ef_search(100).execute()
        got = {r["id"] for r in res.collect()}
        assert len(got & set(flat_ids)) >= 9
    finally:
        corpus._hnsw = None  # don't leak into the module-scoped fixture


def test_ann_threshold_postfilter(corpus, qvec):
    corpus.build_hnsw(m=8, ef_construction=100)
    try:
        res = (
            corpus.vector_search().with_query(qvec).with_k(10)
            .with_ef_search(100).with_threshold(0.5).execute()
        )
        rows = res.collect()
        assert all(r["score"] <= 0.5 for r in rows)
        assert rows[0]["id"] == 0  # the query doc itself at distance 0
    finally:
        corpus._hnsw = None


def test_builder_adc_rescore_full_equals_exact(corpus, qvec, flat_ids):
    """build_pq + with_adc(rescore=corpus) must reproduce the exact flat
    top-k (ADC shortlist covers everything, exact rerank decides)."""
    n = corpus.docs.count()
    corpus.build_pq(m=4, nbits=4, max_iter=3)
    exact = corpus.vector_search().with_query(qvec).with_k(10).execute().collect()
    got = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_adc(rescore=n).execute().collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]


def test_builder_ivfpq_adc_runs(corpus, qvec, flat_ids):
    corpus.build_ivfpq(nlist=4, m=4, nbits=4, max_iter=3)
    res = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_adc(rescore=50).with_nprobes(4).execute()
    )
    rows = res.collect()
    assert len(rows) == 10
    assert len({r["id"] for r in rows} & set(flat_ids)) >= 3


def test_hybrid_with_ann_vector_side(corpus, qvec):
    """Hybrid delegates the vector side to the attached index (reference
    hybrid wraps whatever vector index it holds)."""
    if corpus._ivf is None:
        corpus.build_ivf(nlist=8)
    flat = (
        corpus.hybrid_search().with_vector(qvec).with_k(5)
        .with_fusion("rrf").execute().collect()
    )
    probed = (
        corpus.hybrid_search().with_vector(qvec).with_k(5)
        .with_nprobes(8).with_fusion("rrf").execute().collect()
    )
    # fullprobe == flat identity survives the hybrid wrapper
    assert [tuple(r) for r in probed] == [tuple(r) for r in flat]


def test_builder_multi_probe_knob(corpus, qvec, flat_ids):
    """with_multi_probe routes n_probes into the LSH path: recall at the
    same ef must be >= the single-probe builder result (supersets of
    candidates), and the knob leaves the graph/IVF paths untouched."""
    single = {
        r["id"]
        for r in corpus.vector_search().with_query(qvec).with_k(10)
        .with_ef_search(50).execute().collect()
    }
    multi = {
        r["id"]
        for r in corpus.vector_search().with_query(qvec).with_k(10)
        .with_ef_search(50).with_multi_probe(16).execute().collect()
    }
    gt = set(flat_ids)
    assert len(multi & gt) >= len(single & gt)


def test_hybrid_multi_probe_passthrough(corpus, qvec, flat_ids):
    """with_multi_probe flows through HybridSearch to the LSH vector
    leg: with enough probes the leg reaches the exact flat top-k, so the
    vector-only hybrid equals the flat hybrid result."""
    flat = (
        corpus.hybrid_search().with_vector(qvec).with_k(5)
        .with_fusion("rrf").execute().collect()
    )
    probed = (
        corpus.hybrid_search().with_vector(qvec).with_k(5)
        .with_ef_search(0).with_multi_probe(4 * 16)  # every band bucket
        .with_fusion("rrf").execute().collect()
    )
    assert [tuple(r) for r in probed] == [tuple(r) for r in flat]


def test_hybrid_threshold_and_cutoff_route_to_vector_leg(corpus, qvec):
    """Reference parity (hybrid_search_index.go:520,529): threshold and
    autocut apply to the WRAPPED vector search, not the fused scores —
    a vector-only hybrid must therefore equal the equivalent
    VectorSearch with the same knobs."""
    direct = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_threshold(0.5).execute().collect()
    )
    via_hybrid = (
        corpus.hybrid_search().with_vector(qvec).with_k(10)
        .with_threshold(0.5).execute().collect()
    )
    assert [tuple(r) for r in via_hybrid] == [tuple(r) for r in direct]
    assert all(r["score"] <= 0.5 for r in via_hybrid)

    cut_direct = (
        corpus.vector_search().with_query(qvec).with_k(10)
        .with_cutoff(1).execute().collect()
    )
    cut_hybrid = (
        corpus.hybrid_search().with_vector(qvec).with_k(10)
        .with_cutoff(1).execute().collect()
    )
    assert [tuple(r) for r in cut_hybrid] == [tuple(r) for r in cut_direct]


def test_hybrid_multi_text_and_custom_fusion(corpus, qvec, spark):
    """Reference-interface parity: WithText accepts a query batch
    (aggregated per with_score_aggregation), and WithFusion accepts a
    custom strategy callable (the K2 plugin surface)."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "spark joins tables fast"),
            (2, [0.0, 1.0], "spark shuffles data"),
            (3, [0.5, 0.5], "unrelated text entirely"),
        ],
        "id bigint, vector array<double>, text string",
    )
    c = Corpus(docs)

    # multi-text: both queries hit doc 1/2; max-agg keeps the best score
    multi = (
        c.hybrid_search().with_text("spark joins", "spark shuffles")
        .with_score_aggregation("max").with_k(3).execute().collect()
    )
    assert {r["id"] for r in multi} >= {1, 2}

    # custom fusion callable: vector score only, text ignored
    def vec_only(vec_df, txt_df, *, k):
        return vec_df.orderBy(F.col("score").asc(), F.col("id").asc()).limit(k)

    got = (
        c.hybrid_search().with_vector([1.0, 0.0]).with_text("spark")
        .with_fusion(vec_only).with_k(2).execute().collect()
    )
    direct = c.vector_search().with_query([1.0, 0.0]).with_k(2).execute().collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in direct]

    import pytest

    with pytest.raises(ValueError, match="unknown fusion"):
        c.hybrid_search().with_fusion("borda")


def test_text_more_like_this_node(spark):
    """TextSearch.with_node: the stored doc's text becomes the query
    (reference bm25_index_search.go:230-260) — the node itself scores
    highest, and unknown ids fail loudly."""
    docs = spark.createDataFrame(
        [
            (1, "spark joins tables quickly today"),
            (2, "spark joins tables quickly yesterday"),
            (3, "entirely different content here"),
        ],
        "id bigint, text string",
    )
    c = Corpus(docs)
    got = c.text_search().with_node(1).with_k(3).execute().collect()
    assert got[0]["id"] == 1  # the source doc is its own best match
    assert {r["id"] for r in got} >= {1, 2}  # near-twin ranks too

    with pytest.raises(ValueError, match="not found"):
        c.text_search().with_node(99).execute().collect()
