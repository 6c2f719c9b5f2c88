"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

At 100 TB the data LAYOUT is an operator: parquet keeps min/max stats
per row group, so sorting by a single column prunes scans on that column
only. Writing `df.repartitionByRange(zorder_key(...)).sortWithinPartitions
(zorder_key(...))` interleaves the bits of several columns into one sort
key, so row-group min/max ranges stay bounded in EVERY participating
dimension — predicates on any of them skip files (the technique behind
Delta/Iceberg OPTIMIZE ZORDER; Morton 1966 is public domain).

The key is pure integer bit algebra — whole-stage codegen, no shuffle of
its own, and identical arithmetic in DuckDB, so layouts are
oracle-checkable like every other operator here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_key_sql"]


def zorder_key(cols: list[Column], *, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column: bit ``i`` of column ``j`` lands at position ``i*ncols + j``.
    With 2 columns and bits=8 the key is 16 bits wide."""
    n = len(cols)
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cc = c.cast("bigint")
        for i in range(bits):
            bit = F.shiftright(cc, i).bitwiseAND(1)
            key = key + F.shiftleft(bit, i * n + j)
    return key


def zorder_key_sql(col_names: list[str], *, bits: int = 8) -> str:
    """The DuckDB twin of :func:`zorder_key` as a SQL expression string
    (used by the oracle queries — same bit positions, same arithmetic)."""
    n = len(col_names)
    terms = []
    for j, c in enumerate(col_names):
        for i in range(bits):
            terms.append(f"((({c}::BIGINT >> {i}) & 1) << {i * n + j})")
    return " + ".join(terms)
