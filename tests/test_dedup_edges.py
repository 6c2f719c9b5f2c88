"""Edge-case guards added after the r3 operator review: empty-doc
shingles, LSH band validation, component-convergence failure, sampling
API traps, null-text packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from comet_spark.operators.dedup import minhash_lsh_pairs, shingles
from comet_spark.operators.graph import connected_components
from comet_spark.operators.sampling import hash_sample, pack_sequences


def test_shingles_empty_docs_yield_no_rows(spark):
    """Zero-token docs must not share an empty-string sentinel shingle
    (which would make them all mutual jaccard-1.0 duplicates and one hot
    join key)."""
    docs = spark.createDataFrame(
        [(1, "!!!"), (2, "???"), (3, "real words here")],
        "doc_id bigint, text string",
    )
    rows = shingles(docs).collect()
    ids = {r["id"] for r in rows}
    assert ids == {3}
    assert all(r["shingle"] != "" for r in rows)


def test_minhash_rejects_runt_bands(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="evenly divide"):
        minhash_lsh_pairs(docs, n_hashes=16, bands=3)


def test_connected_components_raises_on_nonconvergence(spark):
    # a 6-node path has diameter 5 > max_iter=2: must raise, not return
    # silently split components
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "a_id bigint, b_id bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
    # and with enough iterations the chain is one component
    out = connected_components(edges, max_iter=10).collect()
    assert {r["component"] for r in out} == {0}


def test_hash_sample_rejects_float_rate(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="rates must be an integer"):
        hash_sample(df, id_col="doc_id", rates=0.3)


def test_pack_sequences_null_text_counts_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "s"), (2, None, "s"), (3, "d e", "s")],
        "doc_id bigint, text string, source string",
    )
    rows = pack_sequences(docs, budget=4).collect()
    assert all(r["bin"] is not None for r in rows)
    assert sum(r["total_tokens"] for r in rows) == 5
    assert sum(r["n_docs"] for r in rows) == 3


def test_minhash_inrow_matches_exploded_formulation(spark):
    """r13: the default (in-row) minhash path — shingle sets, per-row
    signature minima, in-row band digests, set-intersection verify —
    must produce EXACTLY the rows of the original exploded-shingle
    groupBy formulation (still reachable via ``shingles_df``): same
    signature integers, same md5 band digests, same verified pairs.
    Corpus exercises duplicates, near-duplicates, short (<n tokens) and
    empty docs."""
    from comet_spark.operators.dedup import (
        minhash_band_signatures, minhash_signatures, shingle_sets,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "completely different text about spark optimization"),
            (5, "tiny"),
            (6, "!!!"),
        ],
        "doc_id bigint, text string",
    )
    sh = shingles(docs).cache()
    sets = shingle_sets(docs)

    sig_old = minhash_signatures(docs, shingles_df=sh)
    sig_new = minhash_signatures(docs, sets_df=sets)
    assert sorted(map(tuple, sig_old.collect())) == sorted(
        map(tuple, sig_new.collect())
    )

    band_old = minhash_band_signatures(docs, shingles_df=sh)
    band_new = minhash_band_signatures(docs, sets_df=sets)
    assert sorted(map(tuple, band_old.collect())) == sorted(
        map(tuple, band_new.collect())
    )

    pairs_old = minhash_lsh_pairs(docs, min_jaccard=0.0, shingles_df=sh)
    pairs_new = minhash_lsh_pairs(docs, min_jaccard=0.0, sets_df=sets)
    ro = sorted(map(tuple, pairs_old.collect()))
    rn = sorted(map(tuple, pairs_new.collect()))
    assert ro == rn
    assert (1, 3, 1.0) in [(a, b, j) for a, b, j in rn]
