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
