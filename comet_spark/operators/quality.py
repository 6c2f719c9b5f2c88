"""Gopher-style document quality filtering for training-data pipelines.

Implements the public rule family from Rae et al. 2021 ("Scaling Language
Models: ... Gopher", §A1.1 data pipeline) restricted to rules that are
deterministic and engine-portable:

- word count within [min_words, max_words]
- mean token length within [min_mean_len, max_mean_len]
- at least ``min_stopwords`` DISTINCT stop words present (the "ellipsis /
  boilerplate" guard)
- repetition: the most frequent token accounts for at most
  ``max_top_token_frac`` of the document (the "excessive repetition"
  guard — Gopher's most-common-n-gram-fraction rule at n=1)

Spark shape: every per-row metric is native array algebra in whole-stage
codegen; only the repetition rule needs a (doc, term) aggregation — one
shuffle with map-side combine, linear in corpus size. Output is one row
per document with the metrics, each rule's verdict, and the AND'd keep
decision, so the filter is auditable (a pipeline can log WHY a document
was dropped — the operational requirement at 100 TB, where you audit
drop-rate per source before deleting anything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comet_spark.functions.text import STOPWORDS_EN, tokenize

__all__ = ["gopher_rules"]


def gopher_rules(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 10000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stopwords: int = 2,
    max_top_token_frac: float = 0.125,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-document quality audit -> (id, n_tokens, mean_token_len,
    n_stopwords, top_token_frac, ok_words, ok_mean_len, ok_stopwords,
    ok_repetition, keep)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = tokenize(text_col)
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    per_doc = base.select(
        "id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.aggregate(F.col("toks"), F.lit(0).cast("bigint"), lambda s, t: s + F.length(t))
            .cast("double")
            / F.size("toks"),
            6,
        ).alias("mean_token_len"),
        F.size(F.filter(F.array_distinct("toks"), lambda t: F.array_contains(sw, t)))
        .cast("bigint")
        .alias("n_stopwords"),
    )
    # repetition rule: per-doc mode frequency — the only shuffled metric
    top = (
        base.select("id", F.explode("toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_c"))
    )
    m = per_doc.join(top, "id").withColumn(
        "top_token_frac", F.round(F.col("top_c") / F.col("n_tokens"), 6)
    )
    ok_words = F.col("n_tokens").between(min_words, max_words)
    ok_mean = F.col("mean_token_len").between(min_mean_len, max_mean_len)
    ok_stop = F.col("n_stopwords") >= min_stopwords
    ok_rep = F.col("top_token_frac") <= max_top_token_frac
    return m.select(
        "id",
        "n_tokens",
        "mean_token_len",
        "n_stopwords",
        "top_token_frac",
        ok_words.alias("ok_words"),
        ok_mean.alias("ok_mean_len"),
        ok_stop.alias("ok_stopwords"),
        ok_rep.alias("ok_repetition"),
        (ok_words & ok_mean & ok_stop & ok_rep).alias("keep"),
    )
