"""Autocut — elbow-detection result truncation.

Reference algorithm (``limiter.go:81-118``): over the *ordered* result
scores y_0..y_{n-1}, compute
``diff_i = (y_i - y_0)/(y_{n-1} - y_0) - i/(n-1)`` (score curve normalized
against the ideal linear ramp), scan for local maxima of ``diff`` (the last
element uses diff[i-1] and diff[i-2] as neighbors), and cut *before* the
``cutoff``-th maximum. ``cutoff = -1`` disables; fewer maxima → keep all.

Autocut applies after top-k, so n ≤ k (small): a single-partition window is
acceptable — this never sees table-scale data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["autocut"]


def autocut(results: DataFrame, *, cutoff: int = 1, ascending: bool = True) -> DataFrame:
    """Truncate ``(id, score)`` results at the reference's autocut point.

    ``ascending`` must match the ordering of the result list (True for
    distances, False for relevance scores).
    """
    if cutoff == -1:
        return results

    order = [F.col("score").asc() if ascending else F.col("score").desc(), F.col("id").asc()]
    # bounded-rows: autocut input is a ≤k search-result list (reference
    # semantics, autocut.go) — single-partition windows are fine
    w = Window.orderBy(*order)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    rn = F.row_number().over(w)
    n = F.count("*").over(full)
    y0 = F.first("score").over(full)
    yn = F.last("score").over(full)

    d = results.select(
        "*",
        rn.alias("__rn"),
        n.alias("__n"),
        (
            F.try_divide(F.col("score") - y0, yn - y0)
            - F.try_divide((rn - F.lit(1)).cast("double"), (n - F.lit(1)).cast("double"))
        ).alias("__diff"),
    )

    wr = Window.orderBy("__rn")  # bounded-rows: same ≤k result list
    prev1 = F.lag("__diff", 1).over(wr)
    prev2 = F.lag("__diff", 2).over(wr)
    nxt = F.lead("__diff", 1).over(wr)
    is_ext = F.when(
        F.col("__rn") == 1, F.lit(False)
    ).when(
        F.col("__rn") == F.col("__n"),
        (F.col("__n") > 1) & (F.col("__diff") > prev1) & (F.col("__diff") > prev2),
    ).otherwise((F.col("__diff") > prev1) & (F.col("__diff") > nxt))

    d = d.withColumn("__ext", F.coalesce(is_ext, F.lit(False)))
    d = d.withColumn(
        "__cum", F.sum(F.col("__ext").cast("int")).over(wr.rowsBetween(Window.unboundedPreceding, 0))
    )
    # the cut row as a FULL-FRAME window min over the same ≤k rows (r14):
    # the previous aggregate + crossJoin(broadcast(cut)) made the cut a
    # separate 1-row subtree over d, and Spark re-executed the ENTIRE
    # upstream pipeline (search + top-k + these windows) a second time to
    # produce it — guide §2.4. min() skips NULLs, so this is exactly
    # min(__rn) over the qualifying rows, NULL (keep all) when none
    # qualify — the identical predicate either way.
    cut_rn = F.min(
        F.when(F.col("__ext") & (F.col("__cum") == cutoff), F.col("__rn"))
    ).over(wr.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    d = d.withColumn("__cut", cut_rn)
    out = d.filter(F.col("__cut").isNull() | (F.col("__rn") < F.col("__cut")))
    return out.drop("__rn", "__n", "__diff", "__ext", "__cum", "__cut")
