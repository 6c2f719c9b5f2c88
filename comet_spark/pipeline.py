"""Fluent curation-pipeline builder — the training-data twin of the
search builders in :mod:`comet_spark.plans.builder`.

A ``CurationPipeline`` chains the pipeline operators (Gopher quality
rules, near-dup cluster dedup, deterministic sampling, sequence packing)
into ONE lazy DataFrame graph: nothing materializes until ``docs()`` /
``funnel()`` / ``packed()`` is evaluated, so Catalyst optimizes across
stage boundaries (a later sample predicate can prune work in an earlier
stage's scan). Every stage is the already-tested operator — this module
adds only composition and bookkeeping.

    kept = (CurationPipeline(docs)
            .quality()                       # Gopher rules, default knobs
            .dedup(min_shared=3)             # winnow pairs -> CC -> keep longest
            .sample(rate=50, salt="s2")      # deterministic 50%
            .docs())                         # -> surviving documents
    audit = pipeline.funnel()                # per-stage (n_docs, total_tokens)

At 100 TB each stage is linear with the shuffle budget documented in
SCALE.md; the funnel audit is the drop-rate report a production curation
run ships with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from comet_spark.functions.text import tokenize
from comet_spark.operators.fingerprint import winnow_neardup_pairs
from comet_spark.operators.graph import connected_components
from comet_spark.operators.quality import gopher_rules
from comet_spark.operators.sampling import hash_bucket, pack_sequences

__all__ = ["CurationPipeline"]


class CurationPipeline:
    def __init__(self, docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"):
        self._raw = docs
        self._docs = docs
        self._id = id_col
        self._text = text_col
        self._stages: list[tuple[str, DataFrame]] = [("raw", docs)]

    def _push(self, name: str, docs: DataFrame) -> "CurationPipeline":
        self._docs = docs
        self._stages.append((name, docs))
        return self

    def quality(self, **rules) -> "CurationPipeline":
        """Keep documents passing the Gopher rule family (quality.py)."""
        keep = (
            gopher_rules(self._docs, id_col=self._id, text_col=self._text, **rules)
            .filter("keep")
            .select(F.col("id").alias(self._id))
        )
        return self._push("quality", self._docs.join(keep, self._id))

    def dedup(
        self,
        *,
        k: int = 4,
        w: int = 5,
        max_df: int = 20,
        min_shared: int = 3,
        length_col: str | None = None,
    ) -> "CurationPipeline":
        """Drop non-canonical members of near-dup clusters: winnowing
        pairs -> connected components -> keep the longest document per
        cluster (tie: lowest id)."""
        pairs = winnow_neardup_pairs(
            self._docs, id_col=self._id, text_col=self._text,
            k=k, w=w, max_df=max_df, min_shared=min_shared,
        )
        comp = connected_components(pairs)
        length = (
            F.col(length_col) if length_col else F.length(self._text)
        )
        sized = self._docs.select(F.col(self._id).alias("id"), length.alias("__len"))
        drop = (
            comp.join(sized, "id")
            .select(
                "id",
                F.row_number()
                .over(Window.partitionBy("component").orderBy(F.desc("__len"), "id"))
                .alias("rk"),
            )
            .filter("rk > 1")
            .select(F.col("id").alias(self._id))
        )
        return self._push("dedup", self._docs.join(drop, self._id, "left_anti"))

    def sample(self, *, rate: int, salt: str = "", denom: int = 100) -> "CurationPipeline":
        """Deterministic Bernoulli sample by hashed id (sampling.py)."""
        kept = self._docs.filter(
            hash_bucket(F.col(self._id), salt=salt, denom=denom) < rate
        )
        return self._push("sampled", kept)

    def docs(self) -> DataFrame:
        """The surviving documents after all chained stages."""
        return self._docs

    def funnel(self) -> DataFrame:
        """Per-stage audit -> (stage, stage_order, n_docs, total_tokens)."""
        out = None
        for i, (name, docs) in enumerate(self._stages, start=1):
            agg = docs.agg(
                F.lit(name).alias("stage"),
                F.lit(i).cast("bigint").alias("stage_order"),
                F.count("*").alias("n_docs"),
                F.sum(F.size(tokenize(self._text))).cast("bigint").alias("total_tokens"),
            )
            out = agg if out is None else out.unionByName(agg)
        return out

    def packed(self, *, shard_col: str = "source", budget: int = 256) -> DataFrame:
        """Sequence-packing summary of the surviving documents."""
        return pack_sequences(
            self._docs, id_col=self._id, text_col=self._text,
            shard_col=shard_col, budget=budget,
        )
