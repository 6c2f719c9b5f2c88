"""Score fusion across search modalities.

Reference strategies (``fusion.go``): weighted sum (full-outer + coalesce,
131-149), reciprocal-rank fusion (0-based ranks per modality, score =
Σ 1/(k+rank), default k=60, 174-243), max (full outer, 245-270), min
(*inner join* — only docs present in both modalities, 291-306). Fused
results always sort descending (``hybrid_search_index.go:604-607``).

Inputs are the per-modality top-k result DataFrames ``(id, score)`` — tiny
(≤ k rows each, unique ids per leg by construction).
Rank assignment uses a deterministic total order (score, then id), unlike
the reference's map-iteration-order ties.

Physical shape: the union-of-ids combine is a ``unionByName`` + one hash
aggregation, NOT a full-outer join — Spark cannot broadcast a full-outer
join, so the join form paid two exchanges plus two sorts (SortMergeJoin)
for two ≤k-row inputs; the union form pays a single exchange with
map-side partial aggregation. Float-identical: IEEE addition/extremes of
the two per-leg contributions are commutative, and a single-leg id sums
to its own contribution exactly as ``coalesce(x, 0) + 0`` did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from comet_spark.operators.topk import topk

__all__ = ["weighted_sum", "rrf", "fuse_max", "fuse_min", "RRF_K"]

RRF_K = 60.0


def _finish(df: DataFrame, k: int, round_to: int | None) -> DataFrame:
    if round_to is not None:
        df = df.withColumn("score", F.round("score", round_to))
    return topk(df, [F.col("score").desc(), F.col("id").asc()], k)


def weighted_sum(
    vec: DataFrame,
    txt: DataFrame,
    *,
    k: int = 10,
    vector_weight: float = 1.0,
    text_weight: float = 1.0,
    round_to: int | None = 6,
) -> DataFrame:
    """score = w_v·vec_score + w_t·txt_score over the union of ids."""
    # coalesce keeps the old full-outer semantics for a NULL leg score
    # (it contributed 0, it did not null the fused sum)
    v = vec.select("id", F.coalesce(F.col("score") * vector_weight, F.lit(0.0)).alias("score"))
    t = txt.select("id", F.coalesce(F.col("score") * text_weight, F.lit(0.0)).alias("score"))
    out = v.unionByName(t).groupBy("id").agg(F.sum("score").alias("score"))
    return _finish(out, k, round_to)


def _ranked(df: DataFrame, ascending: bool) -> DataFrame:
    order = [F.col("score").asc() if ascending else F.col("score").desc(), F.col("id").asc()]
    # bounded-rows: modality results are ≤ k rows by construction, so a
    # single-partition window is fine here
    w = Window.orderBy(*order)
    return df.select("id", (F.row_number().over(w) - 1).alias("rank"))


def rrf(
    vec: DataFrame,
    txt: DataFrame,
    *,
    k: int = 10,
    rrf_k: float = RRF_K,
    round_to: int | None = 6,
) -> DataFrame:
    """Reciprocal-rank fusion; vector ranks ascend by distance, text ranks
    descend by relevance (``fusion.go:174-200``)."""
    v = _ranked(vec, ascending=True).select("id", (1.0 / (rrf_k + F.col("rank"))).alias("score"))
    t = _ranked(txt, ascending=False).select("id", (1.0 / (rrf_k + F.col("rank"))).alias("score"))
    out = v.unionByName(t).groupBy("id").agg(F.sum("score").alias("score"))
    return _finish(out, k, round_to)


def fuse_max(vec: DataFrame, txt: DataFrame, *, k: int = 10, round_to: int | None = 6) -> DataFrame:
    """Max score across modalities, union of ids (``fusion.go:245-270``)."""
    out = (
        vec.select("id", "score")
        .unionByName(txt.select("id", "score"))
        .groupBy("id")
        .agg(F.max("score").alias("score"))
    )
    return _finish(out, k, round_to)


def fuse_min(vec: DataFrame, txt: DataFrame, *, k: int = 10, round_to: int | None = 6) -> DataFrame:
    """Min score, docs present in BOTH modalities only (``fusion.go:291-306``)."""
    # modality presence is tracked EXPLICITLY (bit_or of a per-leg tag),
    # not via count(*) == 2 (ADVICE r13): a caller passing a leg with
    # duplicate ids must not sneak a single-modality doc through the
    # both-legs filter. For unique-id legs (the builder's contract) the
    # row set is identical to the count form.
    out = (
        vec.select("id", "score", F.lit(1).alias("__leg"))
        .unionByName(txt.select("id", "score", F.lit(2).alias("__leg")))
        .groupBy("id")
        .agg(F.min("score").alias("score"), F.bit_or("__leg").alias("__legs"))
        .filter(F.col("__legs") == 3)  # present in BOTH legs
        .drop("__legs")
    )
    return _finish(out, k, round_to)
