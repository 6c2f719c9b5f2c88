"""Winnowing document fingerprints (MOSS-style k-gram selection).

Algorithm: Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
Document Fingerprinting" (SIGMOD 2003) — hash every word k-gram, slide a
window of w consecutive gram-hashes, keep each window's minimum; the
distinct kept hashes are the document's fingerprints. Guarantees every
shared run of >= k+w-1 tokens between two documents produces at least one
shared fingerprint, while storing only ~2/(w+1) of the gram hashes.

This rounds out the dedup family (exact / minhash-LSH / simhash / n-gram
jaccard, operators/dedup.py) with the *substring-overlap* detector the
reference's training-data role calls "document fingerprinting": unlike
set-based minhash it localizes plagiarized/quoted RUNS, not whole-document
similarity.

Spark-first design (100 TB posture):
- Fingerprint extraction is per-row native array algebra (transform /
  slice / array_min) inside whole-stage codegen — zero shuffles, zero
  Python, embarrassingly parallel over document partitions.
- Pairing joins docs only on SHARED fingerprints (equi-join on fp), the
  same bucketed shape as minhash-LSH banding — never an all-pairs
  cartesian. ``max_df`` drops ubiquitous grams (boilerplate headers)
  before the join, which is both standard winnowing practice and the
  hot-bucket skew bound: a fingerprint bucket joins at most max_df^2
  pairs.
- All hashes are the repo-pinned 32-bit md5 prefix so a DuckDB oracle
  recomputes the pipeline exactly (dedup.py:_hash32 convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comet_spark.operators.dedup import _hash32, _tok  # one pinned hash convention

__all__ = ["winnow_fingerprints", "winnow_neardup_pairs"]


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    tokens_col: str | None = None,
) -> DataFrame:
    """Distinct winnowed fingerprints per document -> (id, fp).

    Documents shorter than k+w-1 tokens have no complete window and are
    dropped (they cannot share a guaranteed run anyway).
    """
    toks = _tok(text_col, tokens_col).alias("toks")
    base = docs.select(F.col(id_col).alias("id"), toks).filter(
        F.size("toks") >= k + w - 1
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (k - 1)),
        lambda i: _hash32(F.concat_ws(" ", F.slice(F.col("toks"), i, k))),
    ).alias("hashes")
    windows = F.transform(
        F.sequence(F.lit(1), F.size("hashes") - (w - 1)),
        lambda i: F.array_min(F.slice(F.col("hashes"), i, w)),
    )
    return (
        base.select("id", grams)
        .select("id", F.explode(F.array_distinct(windows)).alias("fp"))
    )


def winnow_neardup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    max_df: int = 20,
    min_shared: int = 3,
    tokens_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by shared winnowed fingerprints ->
    (a_id, b_id, n_shared, overlap).

    overlap = n_shared / min(|fps_a|, |fps_b|) over the df-filtered
    fingerprint sets, rounded to 6 — a containment score, so a short doc
    fully quoted inside a long one still scores ~1.0.
    """
    fps = winnow_fingerprints(
        docs, id_col=id_col, text_col=text_col, k=k, w=w, tokens_col=tokens_col
    )
    # drop boilerplate grams BEFORE sizing/pairing: bounds bucket skew and
    # keeps |fps| consistent between the overlap denominator and the join
    keep = fps.groupBy("fp").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
    fk = fps.join(keep.select("fp"), "fp").cache()
    sizes = fk.groupBy("id").agg(F.count("*").alias("n_fps"))
    a = fk.select(F.col("id").alias("a_id"), "fp")
    b = fk.select(F.col("id").alias("b_id"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(sizes.select(F.col("id").alias("a_id"), F.col("n_fps").alias("n_a")), "a_id")
        .join(sizes.select(F.col("id").alias("b_id"), F.col("n_fps").alias("n_b")), "b_id")
        .select(
            "a_id",
            "b_id",
            "n_shared",
            F.round(F.col("n_shared") / F.least("n_a", "n_b"), 6).alias("overlap"),
        )
    )
