"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

``asof_join(left, right, ...)`` attaches to every left row the latest right
row with the same key and ``right_time <= left_time`` (LEFT semantics:
unmatched left rows keep NULLs) — the standard point-in-time lookup for
feature backfills ("most recent order before this event").

Implementation is the scalable union+window trick, NOT a range cross join:
tag both sides, union, sort within each key by (time, side) with right
rows first on ties (inclusive semantics), then ``last(value,
ignorenulls=True)`` over the running window carries the most recent right
payload onto each left row. One shuffle on the key, linear work — survives
arbitrarily large sides, unlike an inequality join which Catalyst can only
plan as a broadcast nested loop.

Right rows must be unique per (key, time) for deterministic output —
pre-aggregate the right side if needed (the oracle, DuckDB's native
``ASOF JOIN``, has the same requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """LEFT as-of join; returns left columns + carried right_cols.

    ``right_tiebreak`` (r14) names right payload columns that totally
    order DUPLICATE right rows at the same (key, time): the carried row
    is then the one sorting LAST among them (e.g. ``["order_id"]`` ⇒
    max order_id — exactly what a ``groupBy(key, time).agg(max(...))``
    pre-aggregation produced, without its extra Exchange+HashAggregate
    pass: the dedup rides the window sort the as-of already pays
    (guide §2.4)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(right.dtypes)[c]}" for c in right_cols
            ) + ">"
        ).alias("__rpay"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType.simpleString()).alias("__lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rpay"),
    )
    # right rows sort before left rows at equal time → inclusive (<=) match;
    # tiebreak columns order duplicate right rows so last() is
    # deterministic (left rows' NULL payload sorts first within its
    # __is_left group and never affects which right row is carried)
    order = [F.col("__t").asc(), F.col("__is_left").asc()] + [
        F.col(f"__rpay.{c}").asc() for c in (right_tiebreak or [])
    ]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tagged.unionByName(r_tagged).withColumn(
        "__carried", F.last("__rpay", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__carried.{c}").alias(c) for c in right_cols],
    )
    return out
