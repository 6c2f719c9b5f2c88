"""Top-k operators designed for cluster scale.

Global top-k is always expressed as ``ORDER BY … LIMIT k`` so Catalyst
plans ``TakeOrderedAndProject`` — each task keeps a size-k heap and the
driver merges k·P rows; this is the distributed analog of the reference's
pooled min-heap top-k (reference ``bm25_index_search.go:358-396``).

Per-group top-k is a ``row_number()`` window + rank filter. Spark's
rank-limit pushdown (``WindowGroupLimit``, 3.5+) turns that into a
two-stage plan automatically: a *partial* group-limit runs in each input
partition before the exchange (only k rows per group per partition
shuffle), then the final window ranks the k·P survivors — verified in
``tests/test_plans.py``. Hand-rolled salting would add a second exchange
for nothing, so we deliberately emit the plain window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["topk", "topk_per_group"]


def topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: ORDER BY … LIMIT k (TakeOrderedAndProject).

    ``order`` must be a total order (include a unique id as tie-break) so
    results are deterministic. k <= 0 means "all rows, sorted"
    (reference ``limiter.go:12-17`` sanitizeK).
    """
    out = df.orderBy(*order)
    return out if k <= 0 else out.limit(k)


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Deterministic top-k rows per group; optional 0-based ``rank_col``.

    ``order`` must totally order rows within a group (include the id).
    """
    if not group_cols:
        out = topk(df, order, k)
        if rank_col:
            # bounded-rows: out is already limited to k rows
            w = Window.orderBy(*order)
            out = out.withColumn(rank_col, F.row_number().over(w) - 1)
        return out

    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w))
    if k > 0:
        out = out.filter(F.col("__rn") <= k)
    if rank_col:
        out = out.withColumn(rank_col, F.col("__rn") - 1)
    return out.drop("__rn")
