"""Pure-Python UAX#29 word segmentation (Unicode Standard Annex #29).

The reference NFKC-normalizes + lowercases every string and then applies
UAX#29 word boundaries (``bm25_index.go:153-166``, via the public
``clipperhouse/uax29`` segmenter). This module implements the same public
spec from first principles — no vendored data tables; Word_Break
properties are derived from ``unicodedata`` categories plus the spec's
explicit small classes (MidLetter/MidNum/MidNumLet/quotes/newlines).

Fidelity notes (documented approximations, all irrelevant to the ASCII
corpora the driver ships):
- ALetter is approximated as "alphabetic, not Hiragana/Katakana/Han and
  not Line_Break=SA": ideographic AND complex-context scripts (Thai,
  Lao, Myanmar, Khmer, Tai, Cham — ``_SA_RANGES``) segment char-by-char
  per WB999, as in the spec's data tables.
- WB3c (ZWJ × Extended_Pictographic) is implemented against the
  Extended_Pictographic ranges vendored below from the public Unicode
  emoji-data file (UTS #51 / emoji-data.txt, merged contiguous form —
  the property is stable and intentionally covers unassigned reserved
  blocks), since ``unicodedata`` does not expose the property.
- Numeric is General_Category Nd (the spec adds a handful of Other_*
  code points).

``word_tokens`` applies the conventional "wordlike" filter — keep only
segments containing at least one alphanumeric — which is also what the
reference's own tokenizer tests expect (``bm25_index_test.go:620-663``:
only word tokens are asserted). The reference binds the unfiltered
iterator, so its doc-length statistic counts whitespace/punctuation
segments too; we deliberately follow the documented/tested word
semantics.
"""

from __future__ import annotations

import unicodedata

__all__ = [
    "wb_class",
    "segments",
    "word_tokens",
    "tokenize_unicode_py",
    "is_extended_pictographic",
]

# -- Word_Break property classification ---------------------------------

(CR, LF, NEWLINE, EXTEND, ZWJ, FORMAT, RI, KATAKANA, HEBREW, ALETTER,
 SQ, DQ, MIDNUMLET, MIDLETTER, MIDNUM, NUMERIC, EXTNUMLET, WSEGSPACE,
 OTHER) = range(19)

# spec class memberships (UAX#29 table 3; explicit escapes only)
_MIDLETTER = {"\u003a", "\u00b7", "\u0387", "\u05f4", "\u2027",
              "\ufe13", "\ufe55", "\uff1a"}
_MIDNUMLET = {"\u002e", "\u2018", "\u2019", "\u2024", "\ufe52",
              "\uff07", "\uff0e"}
_MIDNUM = {"\u002c", "\u003b", "\u037e", "\u0589", "\u060c", "\u060d",
           "\u066c", "\u07f8", "\u2044", "\ufe10", "\ufe14", "\ufe50",
           "\ufe54", "\uff0c", "\uff1b"}
_NEWLINES = {"\x0b", "\x0c", "\x85", "\u2028", "\u2029"}
_ZWJ_CH = "\u200d"
_ZWNJ_CH = "\u200c"
_NNBSP = "\u202f"  # ExtendNumLet per the spec

_KATAKANA_RANGES = (
    (0x3031, 0x3035), (0x309B, 0x309C), (0x30A0, 0x30FA), (0x30FC, 0x30FF),
    (0x31F0, 0x31FF), (0x32D0, 0x32FE), (0x3300, 0x3357), (0xFF66, 0xFF9D),
    (0x1B000, 0x1B000), (0x1B164, 0x1B167),
)
# scripts whose letters are NOT ALetter (segment per WB999 / Katakana)
_NON_ALETTER_RANGES = (
    (0x3040, 0x309F),                     # Hiragana
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF),   # CJK ideographs
    (0xF900, 0xFAFF), (0x20000, 0x2FA1F),
)

# Line_Break = SA ("complex context") blocks: UAX#29 derives ALetter as
# Alphabetic=Yes MINUS Ideographic/Kana MINUS Line_Break=Complex_Context,
# so Thai/Lao/Myanmar/Khmer/Tai/Cham LETTERS have no Word_Break property
# (→ OTHER) and segment per WB999 — char by char, combining vowels/tones
# attached via WB4 — exactly what the reference's data-table segmenter
# (clipperhouse/uax29, built from WordBreakProperty.txt) produces for
# these scripts; real word segmentation there needs a dictionary, which
# neither engine carries. Block-level ranges are safe: only alphabetic
# code points reach the ALetter check (digits resolved to Numeric and
# marks to Extend earlier), so the blocks' digits/marks/punctuation are
# unaffected by being spanned here.
_SA_RANGES = (
    (0x0E00, 0x0EFF),    # Thai, Lao
    (0x1000, 0x109F),    # Myanmar
    (0x1780, 0x17FF),    # Khmer
    (0x1950, 0x19FF),    # Tai Le, New Tai Lue, Khmer Symbols
    (0x1A20, 0x1AAF),    # Tai Tham
    (0xA9E0, 0xAADF),    # Myanmar Ext-B, Cham, Myanmar Ext-A, Tai Viet
    (0x11700, 0x1174F),  # Ahom
)

# Extended_Pictographic (WB3c operand): merged ranges from the public
# Unicode emoji-data.txt (UTS #51). The file deliberately includes
# unassigned/reserved code points so the property is forward-stable;
# the merged form below preserves that.
_EXT_PICT_RANGES = (
    (0x00A9, 0x00A9), (0x00AE, 0x00AE), (0x203C, 0x203C), (0x2049, 0x2049),
    (0x2122, 0x2122), (0x2139, 0x2139), (0x2194, 0x2199), (0x21A9, 0x21AA),
    (0x231A, 0x231B), (0x2328, 0x2328), (0x2388, 0x2388), (0x23CF, 0x23CF),
    (0x23E9, 0x23F3), (0x23F8, 0x23FA), (0x24C2, 0x24C2), (0x25AA, 0x25AB),
    (0x25B6, 0x25B6), (0x25C0, 0x25C0), (0x25FB, 0x25FE), (0x2600, 0x2605),
    (0x2607, 0x2612), (0x2614, 0x2685), (0x2690, 0x2705), (0x2708, 0x2712),
    (0x2714, 0x2714), (0x2716, 0x2716), (0x271D, 0x271D), (0x2721, 0x2721),
    (0x2728, 0x2728), (0x2733, 0x2734), (0x2744, 0x2744), (0x2747, 0x2747),
    (0x274C, 0x274C), (0x274E, 0x274E), (0x2753, 0x2755), (0x2757, 0x2757),
    (0x2763, 0x2767), (0x2795, 0x2797), (0x27A1, 0x27A1), (0x27B0, 0x27B0),
    (0x27BF, 0x27BF), (0x2934, 0x2935), (0x2B05, 0x2B07), (0x2B1B, 0x2B1C),
    (0x2B50, 0x2B50), (0x2B55, 0x2B55), (0x3030, 0x3030), (0x303D, 0x303D),
    (0x3297, 0x3297), (0x3299, 0x3299),
    (0x1F000, 0x1F0FF), (0x1F10D, 0x1F10F), (0x1F12F, 0x1F12F),
    (0x1F16C, 0x1F171), (0x1F17E, 0x1F17F), (0x1F18E, 0x1F18E),
    (0x1F191, 0x1F19A), (0x1F1AD, 0x1F1E5), (0x1F201, 0x1F20F),
    (0x1F21A, 0x1F21A), (0x1F22F, 0x1F22F), (0x1F232, 0x1F23A),
    (0x1F23C, 0x1F23F), (0x1F249, 0x1F3FA), (0x1F400, 0x1F53D),
    (0x1F546, 0x1F64F), (0x1F680, 0x1F6FF), (0x1F774, 0x1F77F),
    (0x1F7D5, 0x1F7FF), (0x1F80C, 0x1F80F), (0x1F848, 0x1F84F),
    (0x1F85A, 0x1F85F), (0x1F888, 0x1F88F), (0x1F8AE, 0x1F8FF),
    (0x1F90C, 0x1F93A), (0x1F93C, 0x1F945), (0x1F947, 0x1FAFF),
    (0x1FC00, 0x1FFFD),
)


def is_extended_pictographic(ch: str) -> bool:
    """Extended_Pictographic property (vendored emoji-data ranges)."""
    return _in_ranges(ord(ch), _EXT_PICT_RANGES)


def _in_ranges(cp: int, ranges) -> bool:
    return any(lo <= cp <= hi for lo, hi in ranges)


def wb_class(ch: str) -> int:
    """Word_Break property of one code point (approximate; see module
    docstring)."""
    cp = ord(ch)
    if ch == "\r":
        return CR
    if ch == "\n":
        return LF
    if ch in _NEWLINES:
        return NEWLINE
    if ch == _ZWJ_CH:
        return ZWJ
    if ch == "'":
        return SQ
    if ch == '"':
        return DQ
    if ch in _MIDLETTER:
        return MIDLETTER
    if ch in _MIDNUMLET:
        return MIDNUMLET
    if ch in _MIDNUM:
        return MIDNUM
    if 0x1F1E6 <= cp <= 0x1F1FF:
        return RI
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Mc", "Me") or ch == _ZWNJ_CH:
        return EXTEND
    if 0x1F3FB <= cp <= 0x1F3FF:
        return EXTEND  # emoji skin-tone modifiers are Word_Break=Extend
    if cat == "Cf":
        return FORMAT
    if cat == "Pc" or ch == _NNBSP:
        return EXTNUMLET
    if cat == "Nd":
        return NUMERIC
    if _in_ranges(cp, _KATAKANA_RANGES):
        return KATAKANA
    if 0x0590 <= cp <= 0x05FF and ch.isalpha():
        return HEBREW
    if (
        (ch.isalpha() or cat == "Nl")
        and not _in_ranges(cp, _NON_ALETTER_RANGES)
        and not _in_ranges(cp, _SA_RANGES)
    ):
        return ALETTER
    if cat == "Zs":
        return WSEGSPACE
    return OTHER

_AHLETTER = (ALETTER, HEBREW)
_MIDLET_Q = (MIDLETTER, MIDNUMLET, SQ)
_MIDNUM_Q = (MIDNUM, MIDNUMLET, SQ)
_SKIP = {EXTEND, FORMAT, ZWJ}
_AHNK = (ALETTER, HEBREW, NUMERIC, KATAKANA)


def _breaks(text: str) -> list[int]:
    """Break positions per WB1–WB999 (always includes 0 and len)."""
    n = len(text)
    cls = [wb_class(c) for c in text]
    breaks = [0]
    # classes of non-skip ("base", WB4) chars among cls[0..i-1]; the rules
    # below read the one/two nearest base classes to the left
    last_bases: list[int] = []
    for i in range(1, n):
        lc, rc = cls[i - 1], cls[i]
        if lc not in _SKIP:
            last_bases.append(lc)
        # WB3: CR × LF
        if lc == CR and rc == LF:
            continue
        # WB3a/3b: break around newlines (these ignore WB4 skipping)
        if lc in (NEWLINE, CR, LF) or rc in (NEWLINE, CR, LF):
            breaks.append(i)
            continue
        # WB3c: ZWJ × Extended_Pictographic (literal previous char — the
        # rule precedes WB4, so no skip-class folding applies)
        if lc == ZWJ and is_extended_pictographic(text[i]):
            continue
        # WB3d: WSegSpace × WSegSpace
        if lc == WSEGSPACE and rc == WSEGSPACE:
            continue
        # WB4: X (Extend|Format|ZWJ)* → X — never break before a skip char
        if rc in _SKIP:
            continue
        # effective classes with WB4 skipping applied
        l = last_bases[-1] if last_bases else OTHER
        l2 = last_bases[-2] if len(last_bases) >= 2 else OTHER
        j = i + 1
        while j < n and cls[j] in _SKIP:
            j += 1
        nxt = cls[j] if j < n else OTHER

        if l in _AHLETTER and rc in _AHLETTER:
            continue  # WB5
        if l in _AHLETTER and rc in _MIDLET_Q and nxt in _AHLETTER:
            continue  # WB6
        if l in _MIDLET_Q and rc in _AHLETTER and l2 in _AHLETTER:
            continue  # WB7
        if l == HEBREW and rc == SQ:
            continue  # WB7a
        if l == HEBREW and rc == DQ and nxt == HEBREW:
            continue  # WB7b
        if l == DQ and rc == HEBREW and l2 == HEBREW:
            continue  # WB7c
        if l == NUMERIC and rc == NUMERIC:
            continue  # WB8
        if l in _AHLETTER and rc == NUMERIC:
            continue  # WB9
        if l == NUMERIC and rc in _AHLETTER:
            continue  # WB10
        if l in _MIDNUM_Q and rc == NUMERIC and l2 == NUMERIC:
            continue  # WB11
        if l == NUMERIC and rc in _MIDNUM_Q and nxt == NUMERIC:
            continue  # WB12
        if l == KATAKANA and rc == KATAKANA:
            continue  # WB13
        if l in (*_AHNK, EXTNUMLET) and rc == EXTNUMLET:
            continue  # WB13a
        if l == EXTNUMLET and rc in _AHNK:
            continue  # WB13b
        if l == RI and rc == RI:
            # WB15/16: RIs join in pairs — join iff an odd-length RI run
            # ends at the left base
            run = 0
            for b in reversed(last_bases):
                if b == RI:
                    run += 1
                else:
                    break
            if run % 2 == 1:
                continue
        breaks.append(i)  # WB999
    breaks.append(n)
    return breaks


def segments(text: str) -> list[str]:
    """Every UAX#29 segment (including space/punctuation runs)."""
    if not text:
        return []
    b = _breaks(text)
    return [text[b[i]:b[i + 1]] for i in range(len(b) - 1)]


def word_tokens(text: str) -> list[str]:
    """Wordlike segments only: those containing an alphanumeric."""
    return [s for s in segments(text) if any(c.isalnum() for c in s)]


def tokenize_unicode_py(text: str) -> list[str]:
    """The reference-exact pipeline: NFKC → lowercase → UAX#29 word
    segmentation → wordlike filter (``bm25_index.go:153-166``)."""
    return word_tokens(unicodedata.normalize("NFKC", text).lower())
