"""Metadata filter DSL with the reference's exact NULL / quantization rules.

The reference stores numeric metadata in a bit-sliced index after
quantizing floats to ``int64(v*100)`` (two fixed decimals — a lossy,
load-bearing semantic, ``metadata_index.go:142-143,396-408``), and strings
/ bools as roaring bitmaps per "field:value". Set-complement operators are
defined against *allDocs* or the field-existence set, which gives
non-obvious NULL semantics (``metadata_index.go:260-388``):

- ``Ne``   categorical: allDocs ANDNOT eq  → docs *missing the field match*
- ``Ne``   numeric:     existence ANDNOT eq → missing docs do NOT match
- ``NotIn``: allDocs ANDNOT union           → missing docs match
- ``Gt/Gte/Lt/Lte/Between``: BSI ops on the ×100 integers, missing → no
- ``Exists/NotExists``: field existence bitmap and its complement
- ``Not(f)``: static inversion table (eq↔ne, gt↔lte, lt↔gte, in↔not_in,
  exists↔not_exists) per ``metadata_index.go:518-543``. DELIBERATE
  DEVIATION for ranges: the reference's Not() switch has NO range case, so
  ``Not(Between)`` silently returns the Between filter UNCHANGED there; we
  return the true outside-the-range complement (missing-field docs still
  do not match, consistent with every other numeric comparison).

Each filter compiles to one Spark ``Column`` predicate, so Catalyst pushes
the whole conjunction into the data source scan; there is no bitmap
machinery to maintain because parquet row-group stats + predicate pushdown
play that role (SURVEY.md §4.1).

Filters combine with AND inside a group and OR across groups
(``metadata_index_search.go:62-73,193-250``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "q100",
    "Field",
    "NumField",
    "Filter",
    "Eq",
    "Ne",
    "Gt",
    "Gte",
    "Lt",
    "Lte",
    "Between",
    "In",
    "NotIn",
    "Exists",
    "NotExists",
    "Not",
    "Group",
    "Where",
]


def q100(col: Column | str) -> Column:
    """Reference numeric quantization: ``int64(v*100)`` — Go's float→int
    conversion TRUNCATES toward zero (``metadata_index.go:142-143``), so
    999.99 stores as 99998 (999.99*100 = 99998.99999…). Spark's
    double→bigint cast truncates identically; the DuckDB oracle needs an
    explicit ``trunc()`` because DuckDB rounds on cast."""
    c = F.col(col) if isinstance(col, str) else col
    return (c * 100).cast("bigint")


@dataclass(frozen=True)
class Field:
    """A categorical (string/bool) metadata field."""

    name: str

    def col(self) -> Column:
        return F.col(self.name)

    def key(self) -> Column:
        # bools are stored as the strings "true"/"false"
        # (metadata_index.go:146-147)
        return self.col().cast("string")


@dataclass(frozen=True)
class NumField(Field):
    """A numeric field; ``quantize`` applies the ×100 rule for floats."""

    quantize: bool = True

    def key(self) -> Column:
        return q100(self.col()) if self.quantize else self.col().cast("bigint")


def _qval(f: Field, v: Any) -> Any:
    if isinstance(f, NumField):
        # int() truncates toward zero like Go's int64() (metadata_index.go:396-408)
        return int(v * 100) if f.quantize else int(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


@dataclass(frozen=True)
class Filter:
    """Base filter; subclasses implement ``expr`` → Spark Column."""

    f: Field

    def expr(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def inverted(self) -> "Filter":  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass(frozen=True)
class Eq(Filter):
    v: Any = None

    def expr(self) -> Column:
        return self.f.key() == F.lit(_qval(self.f, self.v))

    def inverted(self) -> Filter:
        return Ne(self.f, self.v)


@dataclass(frozen=True)
class Ne(Filter):
    v: Any = None

    def expr(self) -> Column:
        neq = self.f.key() != F.lit(_qval(self.f, self.v))
        if isinstance(self.f, NumField):
            return neq  # NULL → false (existence ANDNOT eq)
        return F.coalesce(neq, F.lit(True))  # allDocs ANDNOT eq

    def inverted(self) -> Filter:
        return Eq(self.f, self.v)


@dataclass(frozen=True)
class _Cmp(Filter):
    v: Any = None
    _op: str = ""

    def expr(self) -> Column:
        k, qv = self.f.key(), F.lit(_qval(self.f, self.v))
        return {"gt": k > qv, "gte": k >= qv, "lt": k < qv, "lte": k <= qv}[self._op]


class Gt(_Cmp):
    def __init__(self, f: Field, v: Any):
        super().__init__(f, v, "gt")

    def inverted(self) -> Filter:
        return Lte(self.f, self.v)


class Gte(_Cmp):
    def __init__(self, f: Field, v: Any):
        super().__init__(f, v, "gte")

    def inverted(self) -> Filter:
        return Lt(self.f, self.v)


class Lt(_Cmp):
    def __init__(self, f: Field, v: Any):
        super().__init__(f, v, "lt")

    def inverted(self) -> Filter:
        return Gte(self.f, self.v)


class Lte(_Cmp):
    def __init__(self, f: Field, v: Any):
        super().__init__(f, v, "lte")

    def inverted(self) -> Filter:
        return Gt(self.f, self.v)


@dataclass(frozen=True)
class Between(Filter):
    lo: Any = None
    hi: Any = None

    def expr(self) -> Column:
        k = self.f.key()
        return (k >= F.lit(_qval(self.f, self.lo))) & (k <= F.lit(_qval(self.f, self.hi)))

    def inverted(self) -> Filter:
        # outside the range, missing-field docs excluded. Deliberate
        # deviation: the reference's Not() switch has no range case
        # (metadata_index.go:518-543), so Not(Between) is a silent no-op
        # there — a bug we choose not to reproduce (see module docstring).
        return _OutsideRange(self.f, self.lo, self.hi)


@dataclass(frozen=True)
class _OutsideRange(Filter):
    lo: Any = None
    hi: Any = None

    def expr(self) -> Column:
        k = self.f.key()
        return (k < F.lit(_qval(self.f, self.lo))) | (k > F.lit(_qval(self.f, self.hi)))

    def inverted(self) -> Filter:
        return Between(self.f, self.lo, self.hi)


@dataclass(frozen=True)
class In(Filter):
    vs: tuple = ()

    def expr(self) -> Column:
        return self.f.key().isin([_qval(self.f, v) for v in self.vs])

    def inverted(self) -> Filter:
        return NotIn(self.f, self.vs)


@dataclass(frozen=True)
class NotIn(Filter):
    vs: tuple = ()

    def expr(self) -> Column:
        # allDocs ANDNOT union(bitmaps): NULL rows match
        # (metadata_index.go:300-323)
        inside = self.f.key().isin([_qval(self.f, v) for v in self.vs])
        return F.coalesce(~inside, F.lit(True))

    def inverted(self) -> Filter:
        return In(self.f, self.vs)


@dataclass(frozen=True)
class Exists(Filter):
    def expr(self) -> Column:
        return self.f.col().isNotNull()

    def inverted(self) -> Filter:
        return NotExists(self.f)


@dataclass(frozen=True)
class NotExists(Filter):
    def expr(self) -> Column:
        return self.f.col().isNull()

    def inverted(self) -> Filter:
        return Exists(self.f)


def Not(flt: Filter) -> Filter:
    """Static operator inversion (``metadata_index.go:518-543``)."""
    return flt.inverted()


@dataclass
class Group:
    """Filters combined with AND (default) or OR inside one group."""

    filters: list[Filter] = field(default_factory=list)
    logic: str = "and"

    def expr(self) -> Column:
        cols = [f.expr() for f in self.filters]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if self.logic == "and" else (out | c)
        return out


class Where:
    """Fluent builder: ``Where(a, b).Or(c, d).expr()`` → (a∧b) ∨ (c∧d)
    — mirrors the reference's FilterGroups
    (``metadata_index_search.go:275-345``)."""

    def __init__(self, *filters: Filter, logic: str = "and"):
        self.groups = [Group(list(filters), logic)]

    def Or(self, *filters: Filter, logic: str = "and") -> "Where":
        self.groups.append(Group(list(filters), logic))
        return self

    def expr(self) -> Column:
        out = self.groups[0].expr()
        for g in self.groups[1:]:
            out = out | g.expr()
        return out
