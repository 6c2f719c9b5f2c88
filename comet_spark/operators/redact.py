"""PII redaction for training-data pipelines.

Standard pretraining hygiene (applied by every major public pipeline
before training): replace personally-identifiable spans with typed
placeholder tokens and keep auditable per-document counts, so drop/keep
decisions and redaction rates can be reported per source.

The patterns are deliberately restricted to the regex subset that means
the same thing in Java regex (Spark, codegen'd) and RE2 (DuckDB) — so
redaction output and counts are oracle-checkable like every other
operator here. They are pattern-based detectors (emails, phone-like
digit runs, IPv4), not an NER model: the operator's job is the
plumbing — one native projection, zero shuffles, linear at 100 TB — a
model-based detector would slot into the same shape as an Arrow UDF.

Spark shape: pure per-row ``regexp_replace``/``regexp_count``
projection; nothing shuffles, predicates and column pruning pass
through, and the whole thing runs in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "redaction_stats"]

# pattern, placeholder — identical semantics in Java regex and RE2
# (no lookaround, no backrefs; \b and (?:...) work in both). ORDER
# MATTERS and is part of the contract: categories apply
# most-specific-first, each over the text as already redacted by the
# previous ones — ipv4 must precede phone, or '192.168.10.25' is eaten
# as a phone-like digit run.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # IPv4 dotted quad (before phone: dotted quads ARE phone-like runs)
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
    # local@domain.tld — the common-case detector, ASCII mailboxes
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # Phones as explicit shapes, not a generic digit run (a generic run
    # eats ISO dates: 2026-08-14 is phone-shaped). Every branch needs
    # >=7 digits total, and no branch matches a date layout
    # (YYYY-MM-DD = 4-2-2, DD.MM.YYYY = 2-2-4, M.DD.YY = 1-2-2):
    #   +CC then 3+ separated groups   (min 1+2+2+2 = 7 digits)
    #   +CC NNN-NNNN                   (min 1+3+4 = 8)
    #   (NNN) NNN-NNNN / NNN-NNN-NNNN  (10)
    #   bare NNN-NNNN local            (7)
    "phone": (
        r"\+\d{1,4}(?:[-. ]\d{2,4}){3,}\b"
        r"|\+\d{1,4}[-. ]\d{3}[-. ]\d{4}\b"
        r"|\(\d{3}\)[-. ]?\d{3}[-. ]\d{4}\b"
        r"|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
        r"|\b\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
}


def _count(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern)).cast("bigint")


def redact_pii(
    docs: DataFrame,
    *,
    text_col: str = "text",
    out_col: str | None = None,
    categories: list[str] | None = None,
) -> DataFrame:
    """Replace each PII category with its placeholder and add per-row
    ``n_<category>`` match counts. Categories apply SEQUENTIALLY in
    ``PII_PATTERNS`` order (most specific first) and each category's
    count is measured on the text as redacted by the PREVIOUS categories
    — so counts describe exactly what was replaced (an IPv4 redacted as
    <IPV4> is never also counted as a phone). ``out_col`` defaults to
    replacing ``text_col`` in place."""
    cats = categories or [c for c in PII_PATTERNS]
    unknown = set(cats) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII categories {sorted(unknown)}")
    cats = [c for c in PII_PATTERNS if c in cats]  # pin canonical order
    out = docs
    cur = F.col(text_col)
    for cat in cats:
        pattern, token = PII_PATTERNS[cat]
        out = out.withColumn(f"n_{cat}", _count(cur, pattern))
        cur = F.regexp_replace(cur, pattern, token)
    return out.withColumn(out_col or text_col, cur)


def redaction_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_col: str | None = None,
    categories: list[str] | None = None,
) -> DataFrame:
    """Corpus-level audit: per ``group_col`` (or one global row), the
    document count, per-category totals, and the fraction of documents
    carrying ANY PII — the report a redaction run ships with."""
    cats = categories or list(PII_PATTERNS)
    tagged = redact_pii(docs, text_col=text_col, categories=cats)
    any_pii = None
    for cat in cats:
        c = F.col(f"n_{cat}") > 0
        any_pii = c if any_pii is None else (any_pii | c)
    aggs = [F.count("*").alias("n_docs")] + [
        F.sum(f"n_{cat}").cast("bigint").alias(f"total_{cat}") for cat in cats
    ] + [
        F.round(
            F.sum(F.when(any_pii, 1).otherwise(0)) / F.count("*"), 6
        ).alias("frac_docs_with_pii")
    ]
    if group_col is None:
        return tagged.agg(*aggs)
    return tagged.groupBy(group_col).agg(*aggs)
