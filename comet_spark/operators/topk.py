"""Top-k operators designed for cluster scale.

Global top-k is always expressed as ``ORDER BY … LIMIT k`` so Catalyst
plans ``TakeOrderedAndProject`` — each task keeps a size-k heap and the
driver merges k·P rows; this is the distributed analog of the reference's
pooled min-heap top-k (reference ``bm25_index_search.go:358-396``).

Per-group top-k with few groups (e.g. 3 query vectors over 10^9 docs) would
naively shuffle *every* row to one reducer per group. ``topk_per_group``
avoids that with a two-stage plan: a local top-k per (group, input
partition) — the window partition key includes ``spark_partition_id()``, so
stage 1 is evenly spread across the cluster — followed by a global window
over at most k·P survivors per group.
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
    local_prefilter: bool = True,
) -> DataFrame:
    """Deterministic top-k rows per group; optional 0-based ``rank_col``.

    Stage 1 (when ``local_prefilter``) cuts each group to k rows per input
    partition without a data-dependent shuffle key imbalance; stage 2 ranks
    the survivors. ``order`` must totally order rows within a group.
    """
    if not group_cols:
        out = topk(df, order, k)
        if rank_col:
            w = Window.orderBy(*order)
            out = out.withColumn(rank_col, F.row_number().over(w) - 1)
        return out

    if local_prefilter and k > 0:
        local = Window.partitionBy(*group_cols, F.spark_partition_id()).orderBy(*order)
        df = (
            df.withColumn("__local_rn", F.row_number().over(local))
            .filter(F.col("__local_rn") <= k)
            .drop("__local_rn")
        )

    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w))
    if k > 0:
        out = out.filter(F.col("__rn") <= k)
    if rank_col:
        out = out.withColumn(rank_col, F.col("__rn") - 1)
    return out.drop("__rn")
