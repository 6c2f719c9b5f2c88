"""Benchmark decontamination for training-data pipelines.

Standard practice before pretraining (GPT-3 appendix C; Gopher §A1.2;
FineWeb): remove or flag training documents that share word n-grams with
an evaluation/benchmark set, so downstream eval numbers aren't inflated
by memorized test data. The reference engine has no such operator; this
is part of the LLM-data-pipeline surface this repo adds on top of parity.

Report shape (auditable, like ``gopher_rules``): one row per train doc
with its total distinct n-gram count, how many of those n-grams occur
anywhere in the eval set, the contaminated fraction, and how many eval
docs it collides with — so a pipeline can threshold (e.g. drop if any
13-gram matches, GPT-3's rule) and attribute drops per eval source.

Scale shape: eval/benchmark suites are tiny (MBs) next to a 100 TB train
corpus, so the eval shingle set is **broadcast** — the train side is
scanned once, never shuffled for the join itself; the only shuffle is
the per-doc groupBy for the counts. At n=13 the collision rate is near
zero and the broadcast hash lookup discards almost every row map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comet_spark.operators.dedup import shingles

__all__ = ["decontaminate"]


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    round_to: int = 6,
    train_shingles: DataFrame | None = None,
    eval_shingles: DataFrame | None = None,
    train_sets: DataFrame | None = None,
) -> DataFrame:
    """Per-train-doc contamination audit against an eval set.

    Returns ``(id, n_shingles, n_contaminated, contaminated_frac,
    n_eval_docs_hit)`` — every train doc appears, including clean ones
    (zeros), so drop-rate accounting is total.

    ``train_shingles``/``eval_shingles`` let a caller that already holds
    a cached ``(id, shingle)`` table (e.g. filtered views of one corpus-
    wide shingle cache) skip re-shingling; ``train_sets`` a cached
    per-doc ``(id, sh_set)`` table, from which the per-doc totals come
    in-row instead of aggregating the exploded table (same distinct
    shingles, so ``size(sh_set)`` is the identical count). The caller
    owns their lifecycle.
    """
    # the train shingle table feeds both the per-doc totals and the
    # hit counting — compute once, cache across the two passes (same
    # pattern as minhash_lsh_pairs)
    tr = (
        train_shingles
        if train_shingles is not None
        else shingles(train_docs, id_col=id_col, text_col=text_col, n=n).cache()
    )
    ev = (
        eval_shingles
        if eval_shingles is not None
        else shingles(eval_docs, id_col=id_col, text_col=text_col, n=n)
    ).select(F.col("id").alias("eval_id"), "shingle")
    totals = (
        train_sets.select("id", F.size("sh_set").cast("bigint").alias("n_shingles"))
        if train_sets is not None
        else tr.groupBy("id").agg(F.count("*").alias("n_shingles"))
    )
    hits = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("id")
        .agg(
            F.countDistinct("shingle").alias("n_contaminated"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
        )
    )
    return totals.join(hits, "id", "left").select(
        "id",
        "n_shingles",
        F.coalesce("n_contaminated", F.lit(0)).cast("bigint").alias("n_contaminated"),
        F.round(
            F.coalesce("n_contaminated", F.lit(0)).cast("double") / F.col("n_shingles"),
            round_to,
        ).alias("contaminated_frac"),
        F.coalesce("n_eval_docs_hit", F.lit(0)).cast("bigint").alias("n_eval_docs_hit"),
    )
