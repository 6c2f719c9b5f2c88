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

from comet_spark.functions.text import STOPWORDS_EN
from comet_spark.operators.dedup import _tok

__all__ = ["gopher_rules", "repetition_metrics", "token_surprisal"]


def repetition_metrics(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    tokens_col: str | None = None,
) -> DataFrame:
    """Gopher §A1.1 repetition family beyond the top-1-token rule in
    :func:`gopher_rules`: per-document

    - ``top_bigram_frac`` / ``top_trigram_frac`` — fraction of n-gram
      occurrences taken by the single most frequent n-gram (n=2, 3)
    - ``dup_5gram_frac`` — fraction of 5-gram occurrences that are
      repeats of an earlier 5-gram (1 − distinct/total; the portable
      form of Gopher's duplicate-n-gram character fraction)

    Docs shorter than n yield one truncated gram (same convention as
    ``dedup.shingles``).

    Spark shape: ALL three n-levels explode from one scan into one
    tagged (id, n, gram) table — a single shuffle for the gram counts
    and a second tiny one per doc; no per-n pass over the corpus. At
    100 TB this is the same two-shuffle budget as the top-token rule.
    """
    toks = _tok(text_col, tokens_col)
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") > 0
    )

    def grams(n: int):
        g = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("toks") - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
        )
        return F.transform(
            g, lambda s: F.struct(F.lit(n).alias("n"), s.alias("gram"))
        )

    tagged = base.select(
        "id", F.explode(F.flatten(F.array(grams(2), grams(3), grams(5)))).alias("t")
    ).select("id", F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
    per_gram = tagged.groupBy("id", "n", "gram").agg(F.count("*").alias("c"))
    per_n = per_gram.groupBy("id", "n").agg(
        F.max("c").alias("top_c"),
        F.sum("c").alias("tot"),
        F.count("*").alias("dis"),
    )

    def pick(n: int, expr):
        return F.max(F.when(F.col("n") == n, expr))

    top = F.col("top_c").cast("double") / F.col("tot")
    dup = (F.col("tot") - F.col("dis")).cast("double") / F.col("tot")
    return per_n.groupBy("id").agg(
        F.round(pick(2, top), round_to).alias("top_bigram_frac"),
        F.round(pick(3, top), round_to).alias("top_trigram_frac"),
        F.round(pick(5, dup), round_to).alias("dup_5gram_frac"),
    )


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
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document quality audit -> (id, n_tokens, mean_token_len,
    n_stopwords, top_token_frac, ok_words, ok_mean_len, ok_stopwords,
    ok_repetition, keep)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = _tok(text_col, tokens_col)
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


def token_surprisal(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    tokens_col: str | None = None,
) -> DataFrame:
    """Corpus-LM proxy quality score: per-document mean token surprisal
    ``mean(-ln(ctf/total))`` under the corpus unigram distribution — the
    codec-free stand-in for perplexity filtering (documents made of rare
    tokens score high; boilerplate scores low). Returns
    ``(id, n_tokens, surprisal)``.

    Spark shape: the tokenized corpus is scanned twice — once to build
    the vocabulary-sized term-frequency table (broadcast, with its total
    attached lazily via a 1-row cross join, so constructing this
    DataFrame launches no job) and once as the per-doc probe side; the
    only full shuffle is the per-doc mean aggregation. Linear at 100 TB.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_tok(text_col, tokens_col)).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count("*").alias("ctf"))
    tot = tf.agg(F.sum("ctf").cast("double").alias("__total"))
    scored = (
        toks.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(tot))
        .select("id", (-F.log(F.col("ctf") / F.col("__total"))).alias("s"))
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("s"), round_to).alias("surprisal"),
    )
