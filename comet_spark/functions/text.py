"""Text normalization / tokenization / analysis expressions.

The reference pipeline is NFKC-normalize → lowercase → UAX#29 word
segmentation (reference ``bm25_index.go:153-166``). Default ``tokenize``
implements the UAX#29 word-break rules NATIVELY (JVM regex, codegen'd, no
Python in the hot path) for the character classes that matter outside
ideographic scripts:

- words are runs of letters/digits/connector-punctuation
  (``\\p{L}\\p{N}\\p{Pc}`` — WB5/8/9/10/13a/13b: they concatenate freely),
- combining marks (``\\p{M}`` — all Word_Break=Extend) are absorbed into
  the run per WB4: they continue a token and may follow a joiner, but
  never start one (Indic matras / Arabic harakat / decomposed Latin
  therefore tokenize natively),
- a single MidLetter/MidNumLet/quote (``: . '``) joins letter-runs
  (WB6/7), a single MidNum/MidNumLet/quote (``. , ; '``) joins digit-runs
  (WB11/12),
- only wordlike segments (containing an alphanumeric) are kept — the
  filter the reference's own tokenizer tests assert
  (``bm25_index_test.go:620-663``).

Mechanics: two consuming regexp_replace passes per class tag every
in-word joiner with a private-use marker (two passes fully resolve
overlapping chains — pass 1 consumes every other join, leaving only
pairwise-disjoint joins for pass 2), then one regexp_extract_all pulls
marker-joined tokens and the marker is stripped. The DuckDB oracle
(`__spark_entry__._SQL_TOKENIZE`) runs the same four replaces + extract,
so both engines tokenize identically — which is what keeps BM25/dedup
scores hash-checkable.

NFKC is not expressible natively; the engine therefore normalizes at
WRITE time (``ensure_nfkc`` — the same ingest-time design the reference
uses for cosine-normalizing vectors, ``flat_index.go:179-187``, applied
to its unconditional text NFKC, ``bm25_index.go:153-156``): an
already-NFKC corpus (ASCII is the common case; NFKC is identity on
ASCII) passes through with zero Python, a non-NFKC corpus pays one
Arrow-batched normalization when its index/projection is built, and
every QUERY-time plan stays native either way. ``tokenize_unicode``
(NFKC → lower → full pure-Python UAX#29) remains the reference-exact
per-row slow path — property-tested to agree with the native pipeline
on NFKC-normalized text (tests/test_text.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "tokenize",
    "tokenize_unicode",
    "TOKEN_MARK",
    "BPE_PRETOKEN_RE",
    "bpe_pretokenize",
    "nfkc",
    "ensure_nfkc",
    "has_non_ascii",
    "has_ideographic",
    "needs_unicode_tokenize",
    "IDEOGRAPHIC_RE",
    "NONNATIVE_TOKEN_RE",
    "token_count",
    "stopword_ratio",
    "STOPWORDS_EN",
]

# private-use marker meaning "the joiner after me sits INSIDE a word";
# inserted only between same-class neighbors, stripped from final tokens
TOKEN_MARK = "\ue000"

# UAX#29 ASCII-projection classes (see uax29.py for the full spec sets):
# MidLetter ∪ MidNumLet ∪ Single_Quote between letters; MidNum ∪
# MidNumLet ∪ Single_Quote between digits. Combining marks (\p{M}) are
# absorbed into the run exactly like the spec's WB4 (every \p{M} code
# point is Word_Break=Extend — uax29.wb_class maps Mn/Mc/Me to EXTEND):
# they may follow any token char or a joiner, but can never START a
# token (a mark after a space attaches to the space segment per WB4 and
# that segment is dropped as non-wordlike — same result both sides).
_L_JOIN = r"(\p{L}\p{M}*)([:.'])(\p{M}*\p{L})"
_N_JOIN = r"(\p{N}\p{M}*)([.,;'])(\p{M}*\p{N})"
_JOIN_REPL = "$1" + TOKEN_MARK + "$2$3"
_TOKEN_RE = (
    r"[\p{L}\p{N}\p{Pc}][\p{L}\p{N}\p{Pc}\p{M}]*(?:"
    + TOKEN_MARK
    + r"[:.',;]\p{M}*[\p{L}\p{N}\p{Pc}][\p{L}\p{N}\p{Pc}\p{M}]*)*"
)
_WORDLIKE_RE = r"[\p{L}\p{N}]"


def tokenize(text: Column | str) -> Column:
    """UAX#29 word tokens of lowered ``text`` (see module docstring).
    Fully native; the joiner-tagging replaces and the wordlike filter
    are gated behind cheap rlike probes (CASE WHEN in codegen), so text
    without in-word punctuation — the common case — pays one extract,
    same as a plain split."""
    c = F.col(text) if isinstance(text, str) else text
    s = F.lower(c)
    joined = s
    for pat in (_L_JOIN, _L_JOIN, _N_JOIN, _N_JOIN):
        joined = F.regexp_replace(joined, pat, _JOIN_REPL)
    # the replaces are identity unless a joiner char exists at all
    s = F.when(s.rlike(r"[:.,;']"), joined).otherwise(s)
    toks = F.regexp_extract_all(s, F.lit(_TOKEN_RE), 0)
    toks = F.transform(toks, lambda t: F.translate(t, TOKEN_MARK, ""))
    # a token can lack an alphanumeric only if it is pure connector
    # punctuation (e.g. "_"), impossible unless \p{Pc} occurs in the text
    return F.when(
        s.rlike(r"\p{Pc}"),
        F.filter(toks, lambda t: t.rlike(_WORDLIKE_RE)),
    ).otherwise(toks)


def _tokenize_unicode_fn(s: pd.Series) -> pd.Series:
    from comet_spark.functions.uax29 import tokenize_unicode_py

    return s.map(lambda x: tokenize_unicode_py(x) if x is not None else None)


def tokenize_unicode(col: Column | str) -> Column:
    """Reference-exact slow path: NFKC → lower → full UAX#29 word
    segmentation (pure-Python, Arrow-batched). Use when the corpus is not
    NFKC-normalized or uses non-ASCII joiner punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_tokenize_unicode_fn, "array<string>")(c)


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


def _nfkc_fn(s: pd.Series) -> pd.Series:
    import unicodedata

    def norm(x):
        if x is None:
            return None
        # ASCII fast path: NFKC is identity on ASCII, skip the normalize
        # call (the Arrow transfer is already paid; this avoids the
        # per-row normalization cost on mostly-ASCII corpora)
        if x.isascii():
            return x
        return unicodedata.normalize("NFKC", x)

    return s.map(norm)


def nfkc(col: Column | str) -> Column:
    """NFKC Unicode normalization (Arrow-batched pandas UDF; reference
    ``bm25_index.go:153-156``). Compose with :func:`tokenize` for corpora
    that aren't already NFKC-normalized."""
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_nfkc_fn, "string")(c)


def has_non_ascii(df, text_col: str = "text") -> bool:
    """Corpus probe: does any row carry non-ASCII text? One native
    column scan (early-exits on the first match); drives the write-time
    normalization decision in :func:`ensure_nfkc`."""
    c = F.col(text_col)
    return df.where(c.isNotNull() & c.rlike("[^\\x00-\\x7F]")).limit(1).count() > 0


# Scripts whose UAX#29 segmentation the native tokenizer cannot
# reproduce: Han and Hiragana segment char-by-char (WB999), and Katakana
# runs don't join adjacent ALetter — while the native [\p{L}...]+ run
# regex concatenates all of them. The class is deliberately WIDE — the
# whole U+2E80-9FFF CJK span (radicals, kanbun, punctuation, enclosed
# letters, compatibility blocks, Kana) plus halfwidth Kana and the
# supplementary extensions — because the probe runs on PRE-NFKC text
# and NFKC can CREATE ideographic characters from compatibility forms
# (halfwidth 'ｶ' U+FF76 → 'カ', '㈱' U+3231 → '(株)'): a false positive
# only costs the Arrow tokenize path (correct, slower); a false
# negative silently builds an index whose CJK tokens never match any
# query.
# Ranges: CJK radicals/Kana/Han (minus Hangul Compatibility Jamo
# U+3130-318F — jamo are ALetter under UAX#29, natively segmented
# identically, and 'ㅋㅋ'-style chat text would otherwise pay the Arrow
# path for nothing), compatibility ideographs, halfwidth Kana, Enclosed
# Ideographic Supplement (🈚 U+1F21A NFKC→ 無), and the supplementary
# planes through CJK Ext G/H.
IDEOGRAPHIC_RE = (
    "[\\u2E80-\\u312F\\u3190-\\u9FFF\\uF900-\\uFAFF\\uFF65-\\uFF9F"
    "\\x{1F200}-\\x{1F2FF}\\x{20000}-\\x{3FFFD}]"
)


def has_ideographic(df, text_col: str = "text") -> bool:
    """Corpus probe: any Han/Kana text? Where this fires, the native
    tokenize's letter-run segmentation DISAGREES with UAX#29 (which
    segments Han/Hiragana char-by-char per WB999), so an index built
    natively would never match a query tokenized per spec — callers
    (e.g. :class:`~comet_spark.operators.bm25.BM25`) switch both sides
    to :func:`tokenize_unicode`. One native scan, early-exit."""
    c = F.col(text_col)
    return df.where(c.isNotNull() & c.rlike(IDEOGRAPHIC_RE)).limit(1).count() > 0


# Everything the NATIVE pipeline cannot segment per UAX#29 — the per-row
# route predicate for mixed corpora (BM25 sends matching rows through
# tokenize_unicode, everything else stays native). Beyond the ideographic
# scripts above:
# - in-word joiners OUTSIDE the ASCII [:.',;] subset the native regex
#   tags: MidLetter (U+00B7 ·, U+0387, U+05F4, U+2027, U+FE13, U+FE55,
#   U+FF1A), MidNumLet (U+2018, U+2019 — the curly apostrophe in
#   "l’étoile" — U+2024, U+FE52, U+FF07, U+FF0E), MidNum (U+037E,
#   U+0589, U+060C, U+060D, U+066C, U+07F8, U+2044, U+FE10, U+FE14,
#   U+FE50, U+FE54, U+FF0C, U+FF1B) — uax29.py holds the spec sets;
# - NNBSP U+202F (ExtendNumLet) and the supplementary Kana blocks
#   (U+1B000-1B16F: archaic kana / hentaigana — uax29 classes them
#   Katakana/Hiragana, the native letter-run regex concatenates them);
# - the Hebrew letter block (U+0590-05FF): WB7a/7b/7c give ASCII ' and
#   " Hebrew-specific joining (gershayim acronyms like צה"ל are ONE
#   token; a trailing geresh stays attached) that the native joiner
#   regex cannot express — any Hebrew row takes the Arrow path;
# - format chars (\\p{Cf}): WB4 ignores them inside a word — soft
#   hyphen U+00AD, bidi marks U+200E/200F/061C, word joiner U+2060,
#   and ZWNJ/ZWJ (Persian/Indic text carries ZWNJ routinely) — while
#   the native class would break the run there;
# - emoji skin-tone modifiers (U+1F3FB-FF): Word_Break=Extend like
#   marks, but category Sk — outside the native \\p{M} absorption, so a
#   modifier glued directly to a letter/digit would split the run
#   natively while the spec absorbs it.
# Combining marks (\\p{M}) are NOT a route reason: since every \\p{M}
# code point is Word_Break=Extend, the native pipeline absorbs them
# in-run (token class + joiner contexts) exactly like WB4 — Indic
# matras, Arabic harakat, and decomposed Latin stay on the native leg
# (parity-fuzzed against tokenize_unicode_py in tests/test_text.py).
# Hebrew points would be absorbable too, but the block routes anyway
# for its quote rules (WB7a/b/c).
# Like IDEOGRAPHIC_RE, the class errs WIDE: it runs on pre-NFKC text and
# a false positive only costs the (correct, slower) Arrow path.
#
# _NFKC_ROUTE_SOURCES closes the last hole: characters that match NONE
# of the above pre-NFKC but whose NFKC expansion CREATES a route-class
# character — e.g. '½' → '1⁄2' (fraction slash is MidNum), U+FB1D →
# yod+hiriq (Hebrew block), 'Ŀ' U+013F → L+U+00B7 (MidLetter), U+2135 →
# alef. Exhaustively GENERATED by scripts/gen_nfkc_route_sources.py: for
# every cp, if NFKC(cp) != cp, cp is not already matched, and the
# expansion contains a base-route-class char (ideographic/Hebrew/SA
# blocks, non-ASCII joiners, NNBSP, Kana Supplement, skin tones, or any
# Cf), include it. Expansions that only add combining marks (Arabic
# presentation forms → haraka, Devanagari QA → ka+nukta) are natively
# absorbed post-NFKC and no longer route. (96 codepoints, unicodedata
# 14.0; regenerate if the runtime's Unicode tables change.)
_NFKC_ROUTE_SOURCES = (
    "\\u00BC-\\u00BE\\u013F-\\u0140\\u2135-\\u2138\\u2150-\\u215F\\u2189"
    "\\u2329-\\u232A\\uFB1D\\uFB1F-\\uFB28\\uFB2A-\\uFB36\\uFB38-\\uFB3C"
    "\\uFB3E\\uFB40-\\uFB41\\uFB43-\\uFB44\\uFB46-\\uFB4F\\uFE11-\\uFE12"
    "\\uFE17-\\uFE18\\uFE39-\\uFE44\\uFE51\\uFE5D-\\uFE5E\\uFF61-\\uFF64"
    "\\x{1F12A}"
)

NONNATIVE_TOKEN_RE = (
    IDEOGRAPHIC_RE[:-1]
    + "\\u00B7\\u0387\\u05F4\\u2027\\uFE13\\uFE55\\uFF1A"
    + "\\u2018\\u2019\\u2024\\uFE52\\uFF07\\uFF0E"
    + "\\u037E\\u0589\\u060C\\u060D\\u066C\\u07F8\\u2044"
    + "\\uFE10\\uFE14\\uFE50\\uFE54\\uFF0C\\uFF1B"
    + "\\u202F\\u0590-\\u05FF\\x{1B000}-\\x{1B16F}"
    # Line_Break=SA (complex-context) scripts — Thai/Lao, Myanmar,
    # Khmer, Tai Le/New Tai Lue/Khmer Symbols, Tai Tham, Myanmar
    # Ext-B/Cham/Myanmar Ext-A/Tai Viet, Ahom. UAX#29 excludes SA from
    # ALetter, so these letters segment per WB999 (char by char, like
    # Han) in the reference's data-table segmenter — while the native
    # letter-run regex concatenates them. Block-level (digits included)
    # per the err-WIDE rule: a Thai-digit-only row pays the Arrow path
    # needlessly, but a mark-free Thai row can never silently build
    # run-based postings that per-char queries would miss.
    + "\\u0E00-\\u0EFF\\u1000-\\u109F\\u1780-\\u17FF\\u1950-\\u19FF"
    + "\\u1A20-\\u1AAF\\uA9E0-\\uAADF\\x{11700}-\\x{1174F}"
    + "\\x{1F3FB}-\\x{1F3FF}"
    + _NFKC_ROUTE_SOURCES
    + "]|\\p{Cf}"
)


def needs_unicode_tokenize(df, text_col: str = "text") -> bool:
    """Corpus probe for :data:`NONNATIVE_TOKEN_RE` (superset of
    :func:`has_ideographic`): does ANY row need the reference-exact
    Arrow tokenizer? Gates the per-row routed index build — a corpus
    where this is False (plain ASCII/Latin) keeps the single-branch
    fully-native plan. One native scan, early-exit."""
    c = F.col(text_col)
    return df.where(c.isNotNull() & c.rlike(NONNATIVE_TOKEN_RE)).limit(1).count() > 0


def ensure_nfkc(df, text_col: str = "text"):
    """Write-time NFKC normalization (reference normalizes every string
    unconditionally at index build, ``bm25_index.go:153-156``; same
    ingest-time pattern as its cosine vector normalization,
    ``flat_index.go:179-187``).

    Scope: this closes the NFKC *normalization* gap only — after it, the
    native tokenize agrees with the reference pipeline on scripts whose
    UAX#29 segmentation is run-based. Segmentation approximations
    remain: ideographic scripts (Han/Hiragana segment char-by-char per
    WB999, Katakana doesn't join ALetter) and non-ASCII in-word joiners
    still require :func:`tokenize_unicode`; probe with
    :func:`has_ideographic` and route BOTH docs and queries through the
    Arrow path when it fires (BM25 does exactly this).

    An all-ASCII corpus (NFKC = identity) passes through untouched — the
    plan gains no Python stage at all. Otherwise the text column is
    rewritten through the Arrow-batched NFKC pass ONCE, at the moment
    the caller builds its index/projection, so every subsequent query
    stays on the native JVM pipeline."""
    if has_non_ascii(df, text_col):
        return df.withColumn(text_col, nfkc(text_col))
    return df


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
