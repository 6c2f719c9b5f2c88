"""TF-IDF vector-space document similarity (Salton's VSM).

Complements the retrieval stack: BM25 scores *query→doc* relevance
(bm25.py), Jaccard/MinHash measure *set* overlap (dedup.py); TF-IDF
cosine is the classic weighted *doc→doc* similarity — the standard
"related documents" operator, and the sparse twin of the embedding
cosine in similarity.py.

Weights: w(d,t) = tf(d,t) · ln(N/df(t)), cosine = Σ w_a·w_b / (‖a‖·‖b‖),
all DOUBLE, rounded at the end (repo parity convention).

Scale shape: similarity is computed through a **shared-term equi-join**
— quadratic only within a term's posting list, so cost is Σ_t df(t)².
The ``max_df`` knob drops terms appearing in more than that many docs
(ubiquitous terms carry ~zero idf weight anyway) — the same hot-key
bound winnowing and LSH bucketing use; at 100 TB you always set it.
Pre-grouping by a partition column (the caller filters/blocks) confines
the join further, exactly like the grid/LSH paths for embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comet_spark.operators.dedup import _tok

__all__ = ["tfidf_cosine_pairs", "tfidf_norms", "tfidf_weights"]


def tfidf_weights(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """The (id, term, df, w) TF-IDF weight table over ``docs`` —
    factored out of :func:`tfidf_cosine_pairs` so a session can compute
    it once, cache it, and hand it back in as ``weights_df``."""
    tf = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(_tok(text_col, tokens_col)).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    n_docs = docs.select(F.col(id_col)).agg(F.count("*").cast("double").alias("n"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id", "term", "df",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("w"),
        )
    )


def tfidf_norms(weights: DataFrame) -> DataFrame:
    """The per-doc ``(id, nrm)`` vector norms of a weight table — the
    second cacheable side table of :func:`tfidf_cosine_pairs` (r14).
    Must be built from the PRE-``max_df`` weights (the norm covers the
    whole document vector even when ubiquitous terms are pruned from
    the pair join)."""
    return weights.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.3,
    max_df: int | None = None,
    round_to: int = 6,
    tokens_col: str | None = None,
    weights_df: DataFrame | None = None,
    norms_df: DataFrame | None = None,
) -> DataFrame:
    """All doc pairs with TF-IDF cosine ≥ ``min_sim`` → ``(a_id, b_id,
    cosine)``. N and df are computed over the full input corpus BEFORE
    the ``max_df`` join pruning, so weights don't depend on the knob.

    ``weights_df`` (r14) lets a caller hand in an already-computed
    (id, term, df, w) weight table — the weight subtree feeds THREE
    consumers (both pair legs and the norms), and Spark re-executes it
    per consumer, so a session that caches it pays the tokenize +
    tf/df aggregation once instead of three times per run (the
    shingles_df/sets_df convention, guide §2.4). ``norms_df`` (r14)
    does the same for the per-doc ``(id, nrm)`` table — without it the
    norm aggregation re-runs over the weight table per execution (it
    must derive from the PRE-max_df weights, so hand in
    ``tfidf_norms(weights)``)."""
    w = (
        weights_df
        if weights_df is not None
        else tfidf_weights(
            docs, id_col=id_col, text_col=text_col, tokens_col=tokens_col
        )
    )
    norm = norms_df if norms_df is not None else tfidf_norms(w)
    if max_df is not None:
        w = w.filter(F.col("df") <= max_df)
    a = w.select(F.col("id").alias("a_id"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("b_id"), "term", F.col("w").alias("wb"))
    dot = (
        a.join(b, "term")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = F.round(
        F.col("dot")
        / (F.col("na") * F.col("nb")),
        round_to,
    )
    return (
        dot.join(norm.select(F.col("id").alias("a_id"), F.col("nrm").alias("na")), "a_id")
        .join(norm.select(F.col("id").alias("b_id"), F.col("nrm").alias("nb")), "b_id")
        # a zero norm (every term of the doc has df = N) would make the
        # cosine NaN; such docs carry no signal — exclude them
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select("a_id", "b_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= min_sim)
    )
