"""Regenerate ``_NFKC_ROUTE_SOURCES`` in ``comet_spark/functions/text.py``.

The per-row tokenizer route predicate (``NONNATIVE_TOKEN_RE``) runs on
PRE-NFKC text, but the native tokenize pipeline normalizes first — so any
character whose NFKC expansion *creates* a member of the route class must
itself be routed. This script derives that source set exhaustively from
the runtime's ``unicodedata`` tables: for every assigned code point cp,
if ``NFKC(cp) != cp``, cp does not already match the base route class,
and the expansion contains a base-route-class character (ideographic
blocks, non-ASCII joiners, Hebrew block, Line_Break=SA blocks, NNBSP,
Kana Supplement, emoji skin-tone modifiers, or any ``\\p{Cf}`` format
char), then cp is a source.

Combining marks (``\\p{M}``) are NOT a route reason: the native token
class absorbs them exactly like UAX#29 WB4 (every ``\\p{M}`` code point
is Word_Break=Extend — ``uax29.wb_class`` maps Mn/Mc/Me to EXTEND), so
an expansion that only adds marks stays native-tokenizable.

Run when the runtime's Unicode tables change major version:
    python scripts/gen_nfkc_route_sources.py
and paste the emitted literal over ``_NFKC_ROUTE_SOURCES``.
"""

from __future__ import annotations

import sys
import unicodedata

# Base route class, mirrored from NONNATIVE_TOKEN_RE *minus* the
# generated sources themselves and minus \p{M} (absorbed natively).
_RANGES = (
    # IDEOGRAPHIC_RE
    (0x2E80, 0x312F), (0x3190, 0x9FFF), (0xF900, 0xFAFF),
    (0xFF65, 0xFF9F), (0x1F200, 0x1F2FF), (0x20000, 0x3FFFD),
    # Hebrew block, NNBSP, Kana Supplement
    (0x0590, 0x05FF), (0x202F, 0x202F), (0x1B000, 0x1B16F),
    # Line_Break=SA blocks
    (0x0E00, 0x0EFF), (0x1000, 0x109F), (0x1780, 0x17FF),
    (0x1950, 0x19FF), (0x1A20, 0x1AAF), (0xA9E0, 0xAADF),
    (0x11700, 0x1174F),
    # emoji skin-tone modifiers (Word_Break=Extend but category Sk — the
    # native token class cannot absorb them)
    (0x1F3FB, 0x1F3FF),
)
# Non-ASCII members of the UAX#29 joiner classes (uax29.py spec sets;
# the ASCII subset [:.',;] is handled natively and is NOT a route reason)
_JOINERS = {
    chr(cp)
    for cp in (
        0x00B7, 0x0387, 0x05F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A,  # MidLetter
        0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E,          # MidNumLet
        0x037E, 0x0589, 0x060C, 0x060D, 0x066C, 0x07F8, 0x2044,  # MidNum
        0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B,
    )
}


def in_base_class(ch: str) -> bool:
    cp = ord(ch)
    if any(lo <= cp <= hi for lo, hi in _RANGES):
        return True
    if ch in _JOINERS:
        return True
    return unicodedata.category(ch) == "Cf"


def sources() -> list[int]:
    out = []
    for cp in range(0x110000):
        ch = chr(cp)
        if unicodedata.category(ch) in ("Cs", "Cn"):
            continue
        if in_base_class(ch):
            continue
        n = unicodedata.normalize("NFKC", ch)
        if n == ch:
            continue
        if any(in_base_class(c) for c in n):
            out.append(cp)
    return out


def to_ranges(cps: list[int]) -> list[tuple[int, int]]:
    rs: list[list[int]] = []
    for cp in cps:
        if rs and cp == rs[-1][1] + 1:
            rs[-1][1] = cp
        else:
            rs.append([cp, cp])
    return [(a, b) for a, b in rs]


def esc(cp: int) -> str:
    return f"\\u{cp:04X}" if cp <= 0xFFFF else f"\\x{{{cp:04X}}}"


def main() -> None:
    cps = sources()
    parts = [esc(a) if a == b else f"{esc(a)}-{esc(b)}" for a, b in to_ranges(cps)]
    print(f"# {len(cps)} codepoints, unicodedata {unicodedata.unidata_version}")
    line = ""
    for p in parts:
        if len(line) + len(p) > 60:
            print(f'    "{line}"')
            line = ""
        line += p
    if line:
        print(f'    "{line}"')


if __name__ == "__main__":
    sys.exit(main())
