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

    Spark shape: every metric is per-document, so NO shuffle is
    fundamentally required — each n-level's gram array is sorted
    in-row and a single left fold over the sorted array yields the max
    run length (= the top gram's count) and the distinct count in one
    pass. Counts are integers, so the ratios are bit-identical to the
    explode → groupBy formulation this replaced (r13 optimization:
    that shape shuffled the gram table three times — per-gram counts,
    per-n rollup, per-id pivot — for metrics that never cross rows).
    At 100 TB this is a pure map over the corpus.
    """
    toks = _tok(text_col, tokens_col)
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") > 0
    )

    zero = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")

    def stats(n: int):
        """(top gram count, distinct grams, total grams) for word
        n-grams, computed in-row: sort the gram array, then fold —
        a run of equal values in the sorted array IS one gram's
        occurrence list, so max-run == max per-gram count and the
        number of run starts == the distinct count."""
        g = F.array_sort(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("toks") - (n - 1), F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
            )
        )
        acc0 = F.struct(
            F.lit(None).cast("string").alias("prev"),
            zero.alias("run"),
            zero.alias("top"),
            zero.alias("dis"),
        )

        def step(acc, x):
            # grams are non-null; x == NULL prev is NULL → otherwise()
            run = F.when(x == acc["prev"], acc["run"] + one).otherwise(one)
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["top"], run).alias("top"),
                (
                    acc["dis"] + F.when(x == acc["prev"], zero).otherwise(one)
                ).alias("dis"),
            )

        st = F.aggregate(g, acc0, step)
        return st["top"], st["dis"], F.size(g).cast("bigint")

    top2, _, tot2 = stats(2)
    top3, _, tot3 = stats(3)
    _, dis5, tot5 = stats(5)
    return base.select(
        "id",
        F.round(top2.cast("double") / tot2, round_to).alias("top_bigram_frac"),
        F.round(top3.cast("double") / tot3, round_to).alias("top_trigram_frac"),
        F.round((tot5 - dis5).cast("double") / tot5, round_to).alias(
            "dup_5gram_frac"
        ),
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
    # repetition rule (top-token count) in-row, r14: the mode frequency
    # of the token multiset == the longest equal-run in the SORTED token
    # array, the same fold repetition_metrics uses — so the one metric
    # that shuffled (explode → two aggregations → join) is now array
    # algebra like the rest and the operator is a pure map over the
    # corpus (guide §2.4); counts are integers, ratios bit-identical
    zero = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("top"),
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + one).otherwise(one)
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["top"], run).alias("top"),
        )

    top_c = F.aggregate(F.array_sort(F.col("toks")), acc0, _step)["top"]
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
        top_c.alias("top_c"),
    )
    m = per_doc.withColumn(
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
    tf_df: DataFrame | None = None,
    total: float | None = None,
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

    ``tf_df`` / ``total`` (r14) let a session hand in the corpus unigram
    table (``(term, ctf)``) and its exact token count so repeat scoring
    skips the per-execution vocabulary aggregation (the weights_df
    convention). ``total`` is an exact integer ≤ 2⁵³ carried as a double
    — the identical value the 1-row cross join delivered.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_tok(text_col, tokens_col)).alias("term")
    )
    tf = (
        tf_df
        if tf_df is not None
        else toks.groupBy("term").agg(F.count("*").alias("ctf"))
    )
    probe = toks.join(F.broadcast(tf), "term")
    if total is not None:
        tot_col = F.lit(float(total))
    else:
        tot = tf.agg(F.sum("ctf").cast("double").alias("__total"))
        probe = probe.crossJoin(F.broadcast(tot))
        tot_col = F.col("__total")
    scored = probe.select("id", (-F.log(F.col("ctf") / tot_col)).alias("s"))
    return scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("s"), round_to).alias("surprisal"),
    )
