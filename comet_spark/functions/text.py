"""Text normalization / tokenization / analysis expressions.

The reference pipeline is NFKC-normalize → lowercase → UAX#29 word
segmentation (reference ``bm25_index.go:153-166``). Our pinned tokenizer is
``lower(text)`` split on ``[^a-z0-9]+`` (empties dropped) — declared in
FIXTURES.md §3: on ASCII space-separated corpora (the driver's ``documents``
table) this agrees exactly with UAX#29, and it is expressible identically in
Spark and in the DuckDB oracle, which is what makes BM25 scores
hash-checkable. NFKC for non-ASCII input is available separately as an
Arrow-batched pandas UDF (slow path, off the hot path by default).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "tokenize",
    "TOKEN_SPLIT_RE",
    "BPE_PRETOKEN_RE",
    "bpe_pretokenize",
    "nfkc",
    "token_count",
    "stopword_ratio",
    "STOPWORDS_EN",
]

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# GPT-2-style pretokenizer, simplified to the subset expressible
# identically in Java regex (Spark) and RE2 (DuckDB): letter runs, digit
# runs, and punctuation runs, each optionally preceded by one space.
# 'Customer#000000001' -> ['customer', '#', '000000001'].
BPE_PRETOKEN_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"


def bpe_pretokenize(col: Column | str) -> Column:
    """BPE-ish pretokenization: array of letter/digit/punct runs over
    lowered text (native regexp_extract_all — JVM-side, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_PRETOKEN_RE), 0)


def tokenize(text: Column | str) -> Column:
    """lower → split on non-alphanumeric runs → drop empty tokens."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: t != "")


def _nfkc_fn(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(lambda x: unicodedata.normalize("NFKC", x) if x is not None else None)


def nfkc(col: Column | str) -> Column:
    """NFKC Unicode normalization (Arrow-batched pandas UDF; reference
    ``bm25_index.go:153-156``). Only needed for non-ASCII corpora — built
    lazily because pandas_udf registration needs an active session."""
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_nfkc_fn, "string")(c)


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text))


# A small pinned English function-word list used by quality scoring and the
# language-ID heuristic. Pinned here so the DuckDB oracle can inline the
# same list.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are in the stopword list (0 for empty docs)."""
    toks = tokenize(text)
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
