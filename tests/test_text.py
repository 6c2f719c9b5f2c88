"""Tokenizer parity: native Spark expression ≡ DuckDB oracle ≡ pure-Python
UAX#29 (the reference pipeline, ``bm25_index.go:153-166``)."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from comet_spark.functions.text import tokenize
from comet_spark.functions.uax29 import (
    segments,
    tokenize_unicode_py,
    word_tokens,
)

# reference's own tokenizer expectations (bm25_index_test.go:620-663) plus
# the UAX#29 join rules the ASCII projection must honor
CASES = {
    "hello world": ["hello", "world"],
    "Hello, World!": ["hello", "world"],
    "test 123 document": ["test", "123", "document"],
    "don't stop": ["don't", "stop"],
    "3.14 and 1,000 end.": ["3.14", "and", "1,000", "end"],
    "foo_bar _ baz": ["foo_bar", "baz"],
    "a:b c:1 1:2": ["a:b", "c", "1", "1", "2"],  # ':' joins letters only
    "e.g. i.e.": ["e.g", "i.e"],
    "a..b 1..2": ["a", "b", "1", "2"],  # only single joiners join
    "a'b'c'd'e": ["a'b'c'd'e"],  # chains resolve fully
    "1.2.3.4 x1.2y": ["1.2.3.4", "x1.2y"],
    "1;2 x;y": ["1;2", "x", "y"],  # ';' joins digits only
    "": [],
}


def test_python_uax29_known_cases():
    for s, want in CASES.items():
        assert tokenize_unicode_py(s) == want, s


def test_python_uax29_unicode():
    # NFKC folds fullwidth/compatibility forms; UAX#29 keeps words across
    # combining marks and non-Latin scripts
    assert tokenize_unicode_py("ｆｕｌｌ １２３") == ["full", "123"]
    assert tokenize_unicode_py("héllo wörld") == ["héllo", "wörld"]
    assert tokenize_unicode_py("café bar") == ["café", "bar"]  # NFC via NFKC
    assert word_tokens("a\u00adb") == ["a\u00adb"]  # soft hyphen = Format (WB4)
    # segments() is exhaustive: whitespace/punct runs survive unfiltered
    assert segments("a b!") == ["a", " ", "b", "!"]


def test_python_uax29_sa_scripts_segment_per_wb999():
    """Line_Break=SA (complex-context) scripts are NOT ALetter: the
    spec's data tables give Thai/Lao/Khmer/Myanmar letters no Word_Break
    property, so they segment char-by-char (WB999) with combining
    vowels/tones attached via WB4 — matching the reference's
    clipperhouse/uax29 segmenter, which carries no dictionary either."""
    # mark-free Thai: every letter its own token (the routing-hole case)
    assert tokenize_unicode_py("กบ") == ["ก", "บ"]
    assert tokenize_unicode_py("ab กบ cd") == ["ab", "ก", "บ", "cd"]
    # Thai vowel (Mn U+0E34) attaches to its base per WB4
    assert tokenize_unicode_py("กิน") == ["กิ", "น"]
    # Thai digits stay Numeric and join per WB8
    assert tokenize_unicode_py("๑๒๓") == ["๑๒๓"]
    # Lao / Khmer / Myanmar: char+marks units, never letter runs
    assert tokenize_unicode_py("ລາວ") == ["ລ", "າ", "ວ"]  # U+0EB2 is Lo
    assert tokenize_unicode_py("ខ្មែរ") == ["ខ្", "មែ", "រ"]
    assert tokenize_unicode_py("မြန်မာ") == ["မြ", "န်", "မာ"]
    # Latin glued to Thai still breaks at the script edge (WB999)
    assert tokenize_unicode_py("xกy") == ["x", "ก", "y"]


@pytest.fixture(scope="module")
def _spark_tok(spark):
    def run(strings: list[str]) -> list[list[str]]:
        df = spark.createDataFrame([(s,) for s in strings], "s string")
        return [r["t"] for r in df.select(tokenize("s").alias("t")).collect()]

    return run


def test_native_matches_python_on_cases(_spark_tok):
    got = _spark_tok(list(CASES))
    for s, g in zip(CASES, got):
        assert g == tokenize_unicode_py(s), s


def test_duckdb_oracle_matches_python_on_cases():
    from __spark_entry__ import _SQL_TOKENIZE

    con = duckdb.connect()
    for s, want in CASES.items():
        lit = "'" + s.replace("'", "''") + "'"
        got = con.execute(
            "SELECT " + _SQL_TOKENIZE.format(col=lit)
        ).fetchone()[0]
        assert got == want, s


# NFKC-invariant alphabet: the native path assumes normalized input, so
# property-test over characters NFKC maps to themselves (ASCII + common
# accented letters — é ü ñ are NFC-composed and NFKC-stable)
_ALPHABET = "abcz ABZ 019 .,;:'_-!?\t\néüñ"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=40))
def test_python_vs_python_lower_nfkc_invariant(s):
    # sanity: alphabet really is NFKC-invariant (lowered)
    assert unicodedata.normalize("NFKC", s.lower()) == s.lower()


def test_native_matches_python_fuzz(_spark_tok):
    import random

    rng = random.Random(29)
    strings = [
        "".join(rng.choice(_ALPHABET) for _ in range(rng.randrange(0, 40)))
        for _ in range(400)
    ]
    got = _spark_tok(strings)
    for s, g in zip(strings, got):
        assert g == tokenize_unicode_py(s), repr(s)


def test_duckdb_matches_python_fuzz():
    from __spark_entry__ import _SQL_TOKENIZE

    import random

    rng = random.Random(31)
    con = duckdb.connect()
    for _ in range(400):
        s = "".join(rng.choice(_ALPHABET) for _ in range(rng.randrange(0, 40)))
        lit = "'" + s.replace("'", "''") + "'"
        got = con.execute("SELECT " + _SQL_TOKENIZE.format(col=lit)).fetchone()[0]
        assert got == tokenize_unicode_py(s), repr(s)


# Mark-heavy alphabet for the native \p{M}-absorption fuzz (r06+): the
# native pipeline absorbs combining marks per WB4 instead of routing the
# row to the Arrow leg. Generated strings are NFKC-normalized before
# feeding the native side (its contract — ensure_nfkc runs at build
# time), so composition (e.g. a+◌́ → á) is exercised rather than avoided.
_MARK_ALPHABET = (
    "abqx 019 .,;:'_"
    "कखगािीुे्"      # Devanagari consonants + matras + virama (Mn/Mc)
    "بتنًُِّ"  # Arabic letters + harakat (Mn)
    "́̈"                  # combining acute / diaeresis
)


def test_native_matches_python_marks_fuzz(_spark_tok):
    """Combining-mark text tokenizes NATIVELY and still agrees with the
    spec tokenizer exactly — the parity proof behind dropping \\p{M}
    from the route predicate."""
    import random

    rng = random.Random(37)
    strings = [
        unicodedata.normalize(
            "NFKC",
            "".join(rng.choice(_MARK_ALPHABET) for _ in range(rng.randrange(0, 40))),
        )
        for _ in range(400)
    ]
    got = _spark_tok(strings)
    for s, g in zip(strings, got):
        assert g == tokenize_unicode_py(s), repr(s)


def test_duckdb_matches_python_marks_fuzz():
    """DuckDB twin of the mark-absorption fuzz (the oracle SQL must stay
    expression-for-expression in sync with the native pipeline)."""
    import random

    from __spark_entry__ import _SQL_TOKENIZE

    rng = random.Random(39)
    con = duckdb.connect()
    for _ in range(400):
        s = unicodedata.normalize(
            "NFKC",
            "".join(rng.choice(_MARK_ALPHABET) for _ in range(rng.randrange(0, 40))),
        )
        lit = "'" + s.replace("'", "''") + "'"
        got = con.execute("SELECT " + _SQL_TOKENIZE.format(col=lit)).fetchone()[0]
        assert got == tokenize_unicode_py(s), repr(s)


def test_driver_corpus_is_nfkc_invariant_ascii(spark):
    """The native tokenize assumes NFKC-normalized input; assert the
    driver's documents corpus satisfies that (pure ASCII)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_bad = df.filter(F.col("text").rlike("[^\\x00-\\x7F]")).count()
    assert n_bad == 0


def test_python_uax29_spec_rules():
    """Deeper WB-rule coverage: newline rules, Hebrew quotes, regional
    indicator pairing, Katakana runs, Extend/Format/ZWJ skipping."""
    assert segments("a\rb") == ["a", "\r", "b"]  # WB3a/3b
    assert segments("a\r\nb") == ["a", "\r\n", "b"]  # WB3: CR x LF
    assert word_tokens("א'ב") == ["א'ב"]  # WB7a/6/7
    assert word_tokens('א"ב') == ['א"ב']  # WB7b/7c
    flags = "\U0001F1FA\U0001F1F8\U0001F1EB\U0001F1F7"
    assert segments(flags) == [flags[:2], flags[2:]]  # WB15/16 pairs
    assert word_tokens(flags) == []  # flags aren't wordlike
    assert word_tokens("カタカナ") == ["カタカナ"]  # WB13
    assert word_tokens("カタabc") == ["カタ", "abc"]  # Ka x AL splits
    assert word_tokens("ábc") == ["ábc"]  # combining mark = Extend (WB4)
    assert word_tokens("x‍y") == ["x‍y"]  # ZWJ skipped by WB4
    assert segments("a  b")[1] == "  "  # WB3d WSegSpace run


def test_python_uax29_concat_invariant():
    """Tokenizing space-joined text == concatenating per-piece tokens
    (spaces always break; no rule joins across them)."""
    import random

    rng = random.Random(41)
    pieces = ["don't", "3.14", "abc", "1,000", "x", "9"]
    for _ in range(50):
        ws = [rng.choice(pieces) for _ in range(rng.randrange(1, 6))]
        joined = " ".join(ws)
        expect = [t for w in ws for t in tokenize_unicode_py(w)]
        assert tokenize_unicode_py(joined) == expect, joined


def test_bm25_end_to_end_parity_on_punctuated_corpus(spark):
    """The driver corpus has no punctuation, so the tokenizer-scoring
    integration on joiner-bearing text (apostrophes, decimals, underscores)
    is otherwise untested end-to-end: score a randomized punctuated corpus
    with BM25 on Spark AND with the shared oracle SQL in DuckDB, and
    require identical rounded scores."""
    import random

    from __spark_entry__ import _SQL_TOKENIZE
    from comet_spark.operators.bm25 import BM25, tokenize_py

    rng = random.Random(47)
    vocab = [
        "don't", "3.14", "1,000", "foo_bar", "e.g.", "alpha", "beta",
        "x:y", "v2.0", "end.", "it's", "1;2", "data", "scan,merge",
    ]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 12))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    query = "don't 3.14 data foo_bar"

    got = {
        r["id"]: r["score"]
        for r in BM25(docs).score(query, k=0).collect()
    }

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE d (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    terms: dict[str, int] = {}
    for t in tokenize_py(query):
        terms[t] = terms.get(t, 0) + 1
    vals = ", ".join(
        "('" + t.replace("'", "''") + f"', {c}::DOUBLE)" for t, c in terms.items()
    )
    tok_sql = _SQL_TOKENIZE.format(col="text")
    sql = f"""
WITH tok AS (SELECT id, unnest({tok_sql}) AS term FROM d),
tf AS (SELECT id, term, count(*) AS tf FROM tok GROUP BY id, term),
dl AS (SELECT id, count(*) AS dl FROM tok GROUP BY id),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
st AS (SELECT (SELECT count(*) FROM d)::DOUBLE AS n_docs,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM d) AS avgdl),
qt AS (SELECT * FROM (VALUES {vals}) AS _q(term, qtf))
SELECT tf.id,
       ROUND(sum(qt.qtf * ln((st.n_docs - dft.df + 0.5)/(dft.df + 0.5) + 1.0)
           * (tf.tf * (1.2 + 1.0)) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / st.avgdl)))), 6) AS score
FROM tf JOIN qt USING (term) JOIN dl USING (id) JOIN dft USING (term) CROSS JOIN st
GROUP BY tf.id
"""
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want


def test_python_uax29_wb3c_zwj_emoji():
    """WB3c: ZWJ × Extended_Pictographic — ZWJ emoji sequences hold
    together (vendored emoji-data ranges; the reference gets this from
    clipperhouse/uax29, go.mod:7)."""
    zwj = "‍"
    family = "\U0001F468" + zwj + "\U0001F469" + zwj + "\U0001F467" + zwj + "\U0001F466"
    assert segments(family) == [family]
    woman_boy = "\U0001F469" + zwj + "\U0001F466"
    assert segments("go " + woman_boy + " now") == ["go", " ", woman_boy, " ", "now"]
    # emoji aren't wordlike; the filter still drops them
    assert word_tokens("go " + woman_boy + " now") == ["go", "now"]
    # heart with ZWJ + variation selector: ❤️‍🔥 (VS16 is Extend, WB4)
    heart_fire = "❤️" + zwj + "\U0001F525"
    assert segments(heart_fire) == [heart_fire]
    # negative: ZWJ before a NON-pictographic still breaks per WB999
    assert segments("?" + zwj + "!") == ["?" + zwj, "!"]
    # skin-tone modifiers are Word_Break=Extend
    thumbs = "\U0001F44D\U0001F3FD"
    assert segments(thumbs) == [thumbs]


def test_ensure_nfkc_ascii_passthrough(spark):
    """An all-ASCII corpus must pass through ensure_nfkc UNTOUCHED — same
    DataFrame object, so the plan gains no Python stage."""
    from comet_spark.functions.text import ensure_nfkc

    df = spark.createDataFrame([(1, "plain ascii text")], "id bigint, text string")
    assert ensure_nfkc(df) is df


def test_native_path_end_to_end_on_non_nfkc_corpus(spark):
    """Write-time normalization closes the NFKC gap: ensure_nfkc + the
    NATIVE tokenize must equal the reference-exact Python pipeline (and
    the DuckDB oracle on the normalized text) on a corpus full of
    NFKC-unstable characters — ligatures, fullwidth forms, circled
    digits, compatibility symbols, decomposed accents."""
    import random

    from __spark_entry__ import _SQL_TOKENIZE
    from comet_spark.functions.text import ensure_nfkc, tokenize

    # every char's NFKC image stays inside the native-supported class
    # (letters/digits/ASCII joiners) — CJK/fraction-slash outputs are the
    # documented Arrow-path cases, not regressions
    symbols = list("abc z 019 .,;:'ﬁﬂＡＢＣＴＥＳＴ①②²é") + ["é"]
    rng = random.Random(53)
    rows = [
        (i, "".join(rng.choice(symbols) for _ in range(rng.randrange(0, 30))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    normed = ensure_nfkc(df)
    got = {
        r["id"]: r["t"]
        for r in normed.select("id", tokenize("text").alias("t")).collect()
    }
    con = duckdb.connect()
    for i, s in rows:
        want = tokenize_unicode_py(s)
        assert got[i] == want, repr(s)
        ns = unicodedata.normalize("NFKC", s)
        lit = "'" + ns.replace("'", "''") + "'"
        oracle = con.execute("SELECT " + _SQL_TOKENIZE.format(col=lit)).fetchone()[0]
        assert oracle == want, repr(s)


def test_bm25_default_normalizes_non_ascii_corpus(spark):
    """BM25 end-to-end on a non-NFKC corpus: the default (write-time
    normalization) must score exactly like an explicitly pre-normalized
    corpus with normalization off."""
    from comet_spark.operators.bm25 import BM25

    rows = [
        (0, "ﬁsh and chips"),        # ligature fi
        (1, "ＦＩＳＨ market stall"),  # fullwidth FISH
        (2, "fish fish fish soup"),
        (3, "nothing relevant here"),
    ]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    pre = spark.createDataFrame(
        [(i, unicodedata.normalize("NFKC", t)) for i, t in rows],
        "id bigint, text string",
    )
    got = [tuple(r) for r in BM25(docs).score("fish", k=0).collect()]
    want = [tuple(r) for r in BM25(pre, normalize=False).score("fish", k=0).collect()]
    assert got == want
    # all three fish-bearing docs score (ligature + fullwidth folded in)
    assert sorted(i for i, _ in got) == [0, 1, 2]


def test_bm25_cjk_corpus_routes_both_sides_through_uax29(spark):
    """A BM25 index built (normalize=True default) on an ideographic
    corpus must MATCH CJK queries: the build probe detects Han/Kana and
    tokenizes docs with the same full-UAX#29 pipeline the query side
    uses (Han/Hiragana char-by-char per WB999), instead of the native
    letter-run regex that would never intersect the query tokens."""
    import pyspark.sql.functions as F

    from comet_spark.functions.text import has_ideographic
    from comet_spark.operators.bm25 import BM25

    rows = [
        (0, "東京タワーに行く"),          # Tokyo Tower (Han+Katakana+Hiragana)
        (1, "大阪の天気は良い"),          # Osaka weather
        (2, "plain english filler text"),
    ]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    assert has_ideographic(docs)
    assert not has_ideographic(
        spark.createDataFrame([(9, "ascii only")], "id bigint, text string")
    )

    # NFKC-source forms must ALSO trip the probe: halfwidth Katakana and
    # enclosed-CJK compatibility chars normalize INTO ideographic chars,
    # so missing them re-creates the zero-hit bug on the native path
    for s in ("ﾃｽﾄ halfwidth kana", "company ㈱ suffix", "free \U0001F21A tax"):
        assert has_ideographic(
            spark.createDataFrame([(0, s)], "id bigint, text string")
        ), s
    # Hangul Compatibility Jamo are ALetter (natively segmented the same
    # way) — Korean chat text must NOT pay the Arrow path
    assert not has_ideographic(
        spark.createDataFrame([(0, "ㅋㅋ so funny")], "id bigint, text string")
    )

    ix = BM25(docs)
    hits = ix.score("東京", k=3).collect()
    assert hits and hits[0]["id"] == 0  # CJK query matches the CJK doc
    # index tokens agree with the query tokenizer char-by-char rule
    tokyo = {r["term"] for r in ix.postings.filter(F.col("id") == 0).collect()}
    assert {"東", "京"} <= tokyo and "タワー" in tokyo  # Katakana run intact
    # and the English doc still scores through the same index
    eng = ix.score("english text", k=3).collect()
    assert eng and eng[0]["id"] == 2


def test_bm25_mixed_corpus_routes_per_row(spark):
    """A MIXED EN+JA corpus must not flip wholesale onto the Python
    tokenizer (VERDICT r05): only rows that actually carry ideographic
    text take the Arrow UAX#29 path; every other row — including
    non-ASCII-but-non-CJK text — tokenizes natively. Correctness bar:
    BOTH row classes' index tokens match tokenize_py (the query
    tokenizer) exactly, so any query matches any doc class. Plan bar:
    the Python stage feeds ONLY from the ideographic-filtered branch."""
    from collections import Counter

    import pyspark.sql.functions as F

    from comet_spark.operators.bm25 import BM25, tokenize_py

    rows = [
        (0, "東京タワーに行く today"),     # CJK row (mixed within the row)
        (1, "plain english filler text"),
        (2, "crème brûlée ﬁnal recipe"),   # non-ASCII non-CJK + ligature
        (3, "大阪の天気は良い"),
        (4, "spark joins are fast fast"),
        (5, "l’étoile du matin brille"),  # curly apostrophe: MidNumLet
    ]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    ix = BM25(docs)

    got: dict[int, Counter] = {}
    for r in ix.postings.collect():
        got.setdefault(r["id"], Counter())[r["term"]] = r["tf"]
    want = {i: Counter(tokenize_py(t)) for i, t in rows if tokenize_py(t)}
    assert got == want

    # queries hit BOTH row classes through one index
    assert ix.score("東京", k=2).collect()[0]["id"] == 0
    assert ix.score("brûlée", k=2).collect()[0]["id"] == 2
    # the U+2019 row must route to the Arrow leg (the native joiner set
    # is ASCII-only): per spec "l’étoile" is ONE token, and the query
    # tokenizer produces the same one — zero hits would mean the row
    # tokenized natively (the r06 review regression)
    hit = ix.score("l’étoile", k=2).collect()
    assert hit and hit[0]["id"] == 5

    # the Arrow TOKENIZE stage consumes the route-filtered branch only:
    # in the optimized plan the tokenize_unicode eval's child is the
    # RLIKE route filter. The other union leg tokenizes natively — its
    # only Python stage is the pre-existing write-time NFKC scalar pass
    # (this corpus has non-ASCII non-CJK rows), itself gated by the
    # negated route filter.
    plan = ix.postings._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("_tokenize_unicode_fn") == 1
    arrow_at = plan.index("_tokenize_unicode_fn")
    assert plan.index("Union") < arrow_at  # the eval lives inside one leg
    # the route filter is the eval's child: next Filter after it is the
    # un-negated route-class RLIKE
    child = plan[arrow_at:].split("Filter", 2)[1]
    assert "RLIKE" in child and "u2E80" in child and not child.lstrip().startswith("NOT")
    # the native leg is behind the NEGATED route filter
    assert "Filter NOT coalesce(RLIKE" in plan


def test_bm25_routing_adversarial_scripts_match_query_tokenizer(spark):
    """One index build over every script family the route predicate must
    catch — the batch adversarial version of the per-row routing
    guarantee: for EVERY row, index tokens == tokenize_py(text), so any
    query formed from a document's own words matches it. Rows cover the
    non-ASCII joiner classes (MidLetter ·, MidNumLet ’ and one-dot
    leader, MidNum arabic comma), ZWNJ (Persian), mark-bearing scripts
    (Devanagari matras and Arabic harakat — NATIVE since the \\p{M}
    absorption; Hebrew points — routed for the block's quote rules),
    Katakana halfwidth forms, enclosed-CJK NFKC sources, and plain
    ASCII/Latin/Greek/Cyrillic controls that must stay native."""
    from collections import Counter

    from comet_spark.operators.bm25 import BM25, tokenize_py

    rows = [
        (0, "a·b mid·letter dot"),              # MidLetter U+00B7
        (1, "don’t can’t won’t"),               # MidNumLet U+2019
        (2, "U.S.A․ one․dot"),        # MidNumLet U+2024
        (3, "١٢٣،٤٥٦ arabic comma"),       # MidNum U+060C + arabic digits
        (4, "می‌خواهم zwnj persian"),      # ZWNJ inside a word
        (5, "हिन्दी में पाठ"),                   # Devanagari with matras
        (6, "עִבְרִית נקודות"),                  # Hebrew with points
        (7, "ﾃﾞｼﾞﾀﾙ ﾒﾓ halfwidth"),             # halfwidth Katakana
        (8, "company ㈱ enclosed"),             # NFKC → (株)
        (9, "plain ascii control text"),
        (10, "ελληνικά κείμενο"),               # Greek: native
        (11, "русский текст"),                  # Cyrillic: native
        (12, "café naïve résumé"),              # composed Latin: native
        # r06 whole-round review: Cf / Hebrew-quote / kana-supplement
        # gaps — each mis-tokenized natively before the class widened
        (13, "foo­bar hyphenated"),        # soft hyphen (Cf)
        (14, "ab‎cd bidi mark"),           # LRM (Cf)
        (15, 'צה"ל גדול'),                      # gershayim acronym (WB7b/c)
        (16, "ד' ראשון"),                       # trailing geresh (WB7a)
        (17, "x\U0001B000y archaic"),           # Kana Supplement
        # NFKC-source rows: 18/19 still route (expansion creates a
        # MidNum joiner / Hebrew letters); 20/21 expand to marks only
        # and now tokenize NATIVELY via the \p{M} absorption — parity
        # must hold either way
        (18, "½ cup sugar"),                    # ½ → 1⁄2 (MidNum U+2044)
        (19, "יִדות presentation"),         # U+FB1D → yod+hiriq(Mn)
        (20, "xﹷy medial fatha"),          # → tatweel+fatha(Mn)
        (21, "क़ख़ nukta sources"),               # U+0958-59 → ka+nukta(Mn)
        # Line_Break=SA scripts (r06 fix): letters segment per WB999 in
        # the spec tables; mark-free rows are the ones only the SA block
        # ranges can route (no \p{M}/\p{Cf} char to catch them)
        (22, "กข markfree thai"),               # mark-free Thai
        (23, "สวัสดีครับ thai"),                 # Thai with vowels/tones
        (24, "ພາສາລາວ lao"),                    # Lao (spacing Lo vowels)
        (25, "ខ្មែរ khmer"),                     # Khmer with coeng/vowel
        (26, "မြန်မာ myanmar"),                  # Myanmar
    ]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    ix = BM25(docs)
    got: dict[int, Counter] = {}
    for r in ix.postings.collect():
        got.setdefault(r["id"], Counter())[r["term"]] = r["tf"]
    for i, t in rows:
        want = Counter(tokenize_py(t))
        assert got.get(i, Counter()) == want, (i, t, got.get(i), want)


def test_bm25_mark_corpus_stays_native(spark):
    """A corpus whose only non-ASCII content is combining-mark text
    (Hindi matras, Arabic harakat, NFKC-sourced nukta forms, decomposed
    Latin) must NOT route any row to the Arrow tokenizer — the native
    \\p{M} absorption (WB4) handles it — while the index tokens still
    match the query tokenizer exactly. This is the r06+ perf claim: a
    100 TB Indic/Arabic corpus pays zero Python tokenization."""
    from collections import Counter

    from comet_spark.functions.text import needs_unicode_tokenize
    from comet_spark.operators.bm25 import BM25, tokenize_py

    rows = [
        (0, "हिन्दी में पाठ लिखा"),
        (1, "क़ख़ nukta forms"),          # precomposed U+0958/59 → NFKC marks
        (2, "نصٌ عربيٌ مُشكول"),          # Arabic with harakat
        (3, "plain ascii text"),
        (4, "q́ẍ decomposed latin"),  # no precomposed forms
    ]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    assert not needs_unicode_tokenize(docs)  # no row routes
    ix = BM25(docs)
    plan = ix.postings._jdf.queryExecution().optimizedPlan().toString()
    assert "_tokenize_unicode_fn" not in plan  # fully native build
    got: dict[int, Counter] = {}
    for r in ix.postings.collect():
        got.setdefault(r["id"], Counter())[r["term"]] = r["tf"]
    for i, t in rows:
        assert got.get(i, Counter()) == Counter(tokenize_py(t)), (i, t)
    assert ix.score("हिन्दी", k=2).collect()[0]["id"] == 0
    assert ix.score("مُشكول", k=2).collect()[0]["id"] == 2


def test_skin_tone_modifier_routes(spark):
    """Emoji skin-tone modifiers (U+1F3FB-FF) are Word_Break=Extend but
    category Sk — outside the native \\p{M} absorption — so a modifier
    glued to a letter must route its row (per spec 'ok\U0001F3FBx' is
    ONE token: the modifier absorbs into k per WB4, then k×x joins per
    WB5)."""
    from collections import Counter

    from comet_spark.functions.text import needs_unicode_tokenize
    from comet_spark.operators.bm25 import BM25, tokenize_py

    rows = [(0, "ok\U0001F3FBx glued"), (1, "plain row")]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    assert needs_unicode_tokenize(docs)
    assert tokenize_py(rows[0][1]) == ["ok\U0001F3FBx", "glued"]
    ix = BM25(docs)
    got: dict[int, Counter] = {}
    for r in ix.postings.collect():
        got.setdefault(r["id"], Counter())[r["term"]] = r["tf"]
    for i, t in rows:
        assert got.get(i, Counter()) == Counter(tokenize_py(t)), (i, t)


def test_bm25_routing_fuzz_mixed_scripts(spark):
    """Seeded fuzz of the routed index build: 200 random strings drawn
    from a pool mixing ASCII words, Latin accents, CJK, Kana, Devanagari
    (marks), Persian+ZWNJ, non-ASCII joiners, digits with separators,
    and punctuation — ONE build, then every row's index tokens must
    equal tokenize_py(text). Catches interactions the curated
    adversarial rows don't (joiners adjacent to marks, CJK glued to
    Latin, tokens spanning pool pieces)."""
    import random
    from collections import Counter

    from comet_spark.operators.bm25 import BM25, tokenize_py

    rng = random.Random(20260814)
    pool = [
        "alpha", "beta42", "café", "l’étoile", "don’t", "a·b", "東京",
        "タワー", "ひらがな", "हिन्दी", "می‌خواهم", "a:b", "x.y", "1,234",
        "٣٤٥", "U.S.A", "naïve", "ﾃﾞｰﾀ", "㈱", "_under_", "éclair",
        "!", "--", "", "werewolf", "ТЕКСТ", "ㅋㅋ",
        "กข", "สวัสดี", "ລາວ", "ខ្មែរ",  # Line_Break=SA scripts (r06)
        # native \p{M} absorption (r06+): mark-bearing pieces that must
        # stay native yet glue correctly against every other pool piece
        "क़ि", "बिंदु", "بَت", "q́x", "ok\U0001F3FBx",
    ]
    rows = []
    for i in range(200):
        n = rng.randint(1, 12)
        # glue SOME pieces directly (no space) to fuzz cross-piece runs
        parts = []
        for j in range(n):
            parts.append(rng.choice(pool))
            parts.append("" if rng.random() < 0.2 else " ")
        rows.append((i, "".join(parts).strip()))
    docs = spark.createDataFrame(rows, "id bigint, text string")
    ix = BM25(docs)
    got: dict[int, Counter] = {}
    for r in ix.postings.collect():
        got.setdefault(r["id"], Counter())[r["term"]] = r["tf"]
    for i, t in rows:
        want = Counter(tokenize_py(t))
        assert got.get(i, Counter()) == want, (i, repr(t), got.get(i), want)
