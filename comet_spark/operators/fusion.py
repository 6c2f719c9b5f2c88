"""Score fusion across search modalities.

Reference strategies (``fusion.go``): weighted sum (full-outer + coalesce,
131-149), reciprocal-rank fusion (0-based ranks per modality, score =
Σ 1/(k+rank), default k=60, 174-243), max (full outer, 245-270), min
(*inner join* — only docs present in both modalities, 291-306). Fused
results always sort descending (``hybrid_search_index.go:604-607``).

Inputs are the per-modality top-k result DataFrames ``(id, score)`` — tiny
(≤ k rows each) — so every join here is a broadcast join on the scale path.
Rank assignment uses a deterministic total order (score, then id), unlike
the reference's map-iteration-order ties.
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
    v = vec.select("id", (F.col("score") * vector_weight).alias("vs"))
    t = txt.select("id", (F.col("score") * text_weight).alias("ts"))
    out = v.join(t, "id", "full_outer").select(
        "id", (F.coalesce("vs", F.lit(0.0)) + F.coalesce("ts", F.lit(0.0))).alias("score")
    )
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
    v = _ranked(vec, ascending=True).select("id", (1.0 / (rrf_k + F.col("rank"))).alias("vs"))
    t = _ranked(txt, ascending=False).select("id", (1.0 / (rrf_k + F.col("rank"))).alias("ts"))
    out = v.join(t, "id", "full_outer").select(
        "id", (F.coalesce("vs", F.lit(0.0)) + F.coalesce("ts", F.lit(0.0))).alias("score")
    )
    return _finish(out, k, round_to)


def fuse_max(vec: DataFrame, txt: DataFrame, *, k: int = 10, round_to: int | None = 6) -> DataFrame:
    """Max score across modalities, union of ids (``fusion.go:245-270``)."""
    v = vec.select("id", F.col("score").alias("vs"))
    t = txt.select("id", F.col("score").alias("ts"))
    out = v.join(t, "id", "full_outer").select(
        "id", F.greatest(F.coalesce("vs", "ts"), F.coalesce("ts", "vs")).alias("score")
    )
    return _finish(out, k, round_to)


def fuse_min(vec: DataFrame, txt: DataFrame, *, k: int = 10, round_to: int | None = 6) -> DataFrame:
    """Min score, docs present in BOTH modalities only (``fusion.go:291-306``)."""
    v = vec.select("id", F.col("score").alias("vs"))
    t = txt.select("id", F.col("score").alias("ts"))
    out = v.join(t, "id", "inner").select("id", F.least("vs", "ts").alias("score"))
    return _finish(out, k, round_to)
