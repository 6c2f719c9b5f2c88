"""Deterministic distinct-count sketch (HyperLogLog, Flajolet et al. 2007).

Spark's ``approx_count_distinct`` and DuckDB's ``approx_count_distinct``
are both HLL but with different hash functions, so their estimates can
never hash-match. This operator implements HLL from first principles
with an md5-derived hash that both engines compute identically, making
the *approximate* answer exactly reproducible — the sketch itself
becomes oracle-checkable, not just "close to exact".

Determinism details:
- hash = first 8 hex chars of md5 (32 bits), as everywhere in this repo
- bucket = low ``b`` bits (``h & (m-1)``), remaining W = 32 − b bits form
  the rho stream; rho = W − bitlength(w) + 1 via ``length(bin(w))``
  (both engines print binary without leading zeros)
- the register sum Σ 2^−M_j is computed in EXACT integer arithmetic
  (Σ 2^(30−M_j), then one float division) so summation order cannot
  change the result across engines
- small-range linear-counting correction (E ≤ 2.5m, V > 0) per the paper

Scale shape: ONE aggregation pass — duplicates never shuffle (max(rho)
is insensitive to multiplicity, so no distinct-before-sketch), register
state is m rows per group, and merging partial sketches is the same
max() — this is exactly how a 1000-executor cluster counts distincts
over 100 TB with constant memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comet_spark.operators.dedup import _hash32

__all__ = ["hll_distinct"]

_SHIFT = 30  # Σ 2^(30 − M_j) stays an exact BIGINT for rho ≤ 27


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    b: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Per-group HLL distinct estimate of ``value_col``.

    Returns ``(*group_cols, est_distinct)``; ``m = 2^b`` registers
    (default 64 → ~13% standard error).
    """
    m = 1 << b
    w_bits = 32 - b
    h = _hash32(F.col(value_col))
    bucket = h.bitwiseAND(m - 1)
    w = F.shiftright(h, b)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    reg = (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    s = reg.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_SHIFT} - mj)")).alias("s_hit"),
        F.count("*").alias("nb"),
    )
    two30 = float(1 << _SHIFT)
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    s_total = (F.col("s_hit") + (F.lit(m) - F.col("nb")) * F.lit(1 << _SHIFT)).cast(
        "double"
    )
    e_raw = alpha * m * m * two30 / s_total
    v = F.lit(m) - F.col("nb")  # zero registers
    est = F.when(
        (e_raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(e_raw)
    return s.select(*group_cols, F.round(est, round_to).alias("est_distinct"))
