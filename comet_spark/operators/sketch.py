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

__all__ = [
    "hll_distinct",
    "hll_distinct_exact",
    "hll_registers",
    "hll_estimate",
    "hll_merge",
    "hll_set_estimates_exact",
    "cms_sketch",
    "cms_estimate",
    "cms_merge",
]

_SHIFT = 30  # Σ 2^(30 − M_j) stays an exact BIGINT for rho ≤ 27


def _check_b(b: int) -> None:
    # max rho is (32 − b) + 1, and the exact-integer register sum shifts by
    # (30 − mj): b ≤ 2 would make that shift negative, which the JVM masks
    # mod 64 into a huge bogus term. b > 16 is past any useful precision
    # and leaves too few rho bits for the 32-bit hash.
    if not 3 <= b <= 16:
        raise ValueError(f"hll b must be in [3, 16], got {b}")


def _bucket_rho(value: Column, b: int) -> tuple[Column, Column]:
    """The (bucket, rho) pair for one hashed value — shared by
    :func:`hll_registers` and the one-pass set-report so the two can
    never drift."""
    m = 1 << b
    w_bits = 32 - b
    h = _hash32(value)
    bucket = h.bitwiseAND(m - 1)
    w = F.shiftright(h, b)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    return bucket, rho


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, *, b: int = 6
) -> DataFrame:
    """The sketch STATE: per-group register table ``(*group_cols,
    bucket, mj)`` — at most ``2^b`` rows per group regardless of input
    size. This is what executors emit, streams checkpoint, and
    :func:`hll_merge` combines."""
    _check_b(b)
    bucket, rho = _bucket_rho(F.col(value_col), b)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("mj"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge partial sketches (e.g. per-day, per-partition, or streaming
    micro-batch states): union + max per register — HLL's merge is
    lossless, so merge-of-parts == sketch-of-whole exactly."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c not in ("mj",)]
    return out.groupBy(*keys).agg(F.max("mj").alias("mj"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str], *, b: int = 6, round_to: int = 6
) -> DataFrame:
    """Register table → ``(*group_cols, est_distinct)`` (harmonic mean +
    linear-counting small-range correction)."""
    _check_b(b)
    m = 1 << b
    s = registers.groupBy(*group_cols).agg(
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


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    b: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Per-group HLL distinct estimate of ``value_col`` in one call.

    Returns ``(*group_cols, est_distinct)``; ``m = 2^b`` registers
    (default 64 → ~13% standard error).
    """
    return hll_estimate(
        hll_registers(df, group_cols, value_col, b=b),
        group_cols,
        b=b,
        round_to=round_to,
    )


def hll_distinct_exact(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    b: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """One-pass twin of :func:`hll_distinct` + an exact
    ``count(DISTINCT value)`` per group → ``(*group_cols, est_distinct,
    exact_distinct)``.

    The composite ran TWO full passes over the stream (register build,
    countDistinct) and joined the one-row-per-group results. This plan
    is linear: one groupBy(group, value) distinct pass (the only
    full-stream shuffle — and the md5 register hash is then computed
    once per distinct value, not once per occurrence), one
    ≤2^b-rows-per-group bucket aggregation carrying the per-bucket
    distinct-value count alongside ``max(rho)``, one per-group fold
    summing both. Value-exact leg by leg: ``max(rho)`` is
    multiplicity-insensitive, so registers over distinct values equal
    registers over the raw stream; the float estimate below is
    :func:`hll_estimate`'s expression verbatim (the register sum is
    exact integer arithmetic, so summation order is irrelevant); the
    buckets partition the distinct set, so per-bucket counts sum to the
    exact distinct count.
    """
    _check_b(b)
    m = 1 << b
    vals = df.select(*group_cols, value_col).distinct()
    bucket, rho = _bucket_rho(F.col(value_col), b)
    per_bucket = (
        vals.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("mj"), F.count("*").alias("nv"))
    )
    s = per_bucket.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_SHIFT} - mj)")).alias("s_hit"),
        F.count("*").alias("nb"),
        F.sum("nv").alias("exact_distinct"),
    )
    # float expressions below mirror hll_estimate verbatim
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
    return s.select(
        *group_cols,
        F.round(est, round_to).alias("est_distinct"),
        "exact_distinct",
    )


# --- count-min sketch (Cormode & Muthukrishnan 2005) ------------------------
#
# Same determinism contract as hll_distinct: md5-derived base hash +
# the repo's pinned universal-hash coefficients (dedup.minhash_coeffs),
# so Spark and DuckDB materialize byte-identical counter tables and the
# *approximate* frequency estimates hash-match. Estimates are one-sided
# (est >= true count, within eN/w with prob 1-(1/2)^d).
#
# Scale shape: the sketch is ONE aggregation to d*w counter rows
# (constant size regardless of corpus); merging partial sketches is
# counter addition — the standard distributed frequency sketch at 100 TB
# where exact per-term counts would shuffle the full token stream.

def _cms_hashes(value: Column, d: int, w: int) -> list[Column]:
    from comet_spark.operators.dedup import MINHASH_P, minhash_coeffs

    h = _hash32(value)
    return [((F.lit(a) * h + F.lit(b)) % MINHASH_P) % w for a, b in minhash_coeffs(d)]


def cms_sketch(
    df: DataFrame, value_col: str, *, d: int = 4, w: int = 256
) -> DataFrame:
    """Counter table ``(i, bucket, c)`` of the d×w count-min sketch over
    every occurrence in ``value_col``."""
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("i"), b.alias("bucket"))
            for i, b in enumerate(_cms_hashes(F.col(value_col), d, w))
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.i").alias("i"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    counters: DataFrame, probes: DataFrame, *, value_col: str = "term",
    d: int = 4, w: int = 256,
) -> DataFrame:
    """Point-query the sketch: min over the d counters each probe value
    hashes to → ``(value_col, est_count)``. The probe side is tiny and
    broadcast; missing buckets count 0."""
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("i"), b.alias("bucket"))
            for i, b in enumerate(_cms_hashes(F.col(value_col), d, w))
        ]
    )
    probe_cells = probes.select(
        value_col, F.explode(cells).alias("cell")
    ).select(value_col, F.col("cell.i").alias("i"), F.col("cell.bucket").alias("bucket"))
    return (
        probe_cells.join(counters, ["i", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_count"))
    )


def cms_merge(*counters: DataFrame) -> DataFrame:
    """Merge partial CMS counter tables: union + per-cell addition —
    lossless, so merge-of-parts == sketch-of-whole exactly."""
    out = counters[0]
    for c in counters[1:]:
        out = out.unionByName(c)
    return out.groupBy("i", "bucket").agg(F.sum("c").alias("c"))


def hll_set_estimates(
    reg_a: DataFrame,
    reg_b: DataFrame,
    *,
    b: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Set algebra on two UNGROUPED register tables ``(bucket, mj)``:
    |A|, |B|, |A∪B| (lossless register merge) and |A∩B| by
    inclusion–exclusion — the classic sketch trick for "how many
    distinct items do these two corpora share?" without ever joining
    the raw data. Returns one row ``(est_a, est_b, est_union,
    est_intersect)``; intersection error compounds (|ε| ≲ 3σ·|A∪B|),
    which is the documented trade for constant-size state."""
    one = F.lit(1)
    ea = hll_estimate(reg_a.select(one.alias("g"), "bucket", "mj"), ["g"], b=b,
                      round_to=round_to).select(F.col("est_distinct").alias("est_a"))
    eb = hll_estimate(reg_b.select(one.alias("g"), "bucket", "mj"), ["g"], b=b,
                      round_to=round_to).select(F.col("est_distinct").alias("est_b"))
    merged = hll_merge(
        reg_a.select(one.alias("g"), "bucket", "mj"),
        reg_b.select(one.alias("g"), "bucket", "mj"),
    )
    eu = hll_estimate(merged, ["g"], b=b, round_to=round_to).select(
        F.col("est_distinct").alias("est_union")
    )
    out = ea.crossJoin(eb).crossJoin(eu)
    return out.select(
        "est_a", "est_b", "est_union",
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), round_to).alias(
            "est_intersect"
        ),
    )


def hll_set_estimates_exact(
    df: DataFrame,
    value_col: str,
    flag_a: Column,
    flag_b: Column,
    *,
    b: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """One-PASS twin of ``hll_registers``×2 + :func:`hll_set_estimates`
    + an exact ``distinct∩distinct`` count, for the case where both
    sides come from one flagged stream: ``(value, flag_a, flag_b)`` rows
    (duplicates fine) → one row ``(est_a, est_b, est_union,
    est_intersect, exact_intersect)``.

    The composite formulation branches the input stream 5+ ways (two
    register passes, the union merge re-reading both, the exact
    intersect re-reading both) and Spark recomputes each branch —
    column pruning specializes the consumers' aggregates so not even
    ReuseExchange can deduplicate them. This plan is LINEAR: one
    groupBy(value) membership pass (the only full-stream shuffle), one
    ≤2^b-row bucket aggregation, one global fold.

    Value-exact equivalence with the composite, leg by leg:
    - registers: rho/bucket are functions of the value (shared
      ``_bucket_rho``) and ``max(rho)`` is multiplicity-insensitive, so
      max over flagged distinct values == max over the raw stream;
      ``count(mj_side)`` counts buckets with ≥1 flagged value == the
      side's register-row count.
    - union: per-bucket ``greatest(mja, mjb)`` (null-skipping) == the
      merge's ``max`` over the unioned register rows, present exactly
      for buckets either side populates.
    - estimates: the register sum is EXACT integer arithmetic (Σ
      2^(30−mj)), so summation order is irrelevant; the float
      expressions below are copied from :func:`hll_estimate` verbatim.
    - exact intersect: membership is distinct by value, so summing
      per-bucket both-flag counts == ``count(distinct∩distinct)``.
    - degenerate inputs: the composite returns ZERO rows when either
      side is empty (its estimate leg vanishes before the cross join);
      the ``nb > 0`` guard reproduces that.
    """
    _check_b(b)
    m = 1 << b
    membership = df.groupBy(value_col).agg(
        F.max(flag_a).alias("__a"), F.max(flag_b).alias("__b")
    )
    bucket, rho = _bucket_rho(F.col(value_col), b)
    both = (F.col("__a") == 1) & (F.col("__b") == 1)
    per_bucket = (
        membership.select(bucket.alias("bucket"), rho.alias("rho"), "__a", "__b")
        .groupBy("bucket")
        .agg(
            F.max(F.when(F.col("__a") == 1, F.col("rho"))).alias("mja"),
            F.max(F.when(F.col("__b") == 1, F.col("rho"))).alias("mjb"),
            F.sum(both.cast("int")).alias("nboth"),
        )
    )

    def s_nb(mj_sql: str, name: str) -> list[Column]:
        s = F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_SHIFT} - ({mj_sql}))"))
        return [s.alias(f"s_{name}"), F.count(F.expr(mj_sql)).alias(f"nb_{name}")]

    row = per_bucket.agg(
        *s_nb("mja", "a"),
        *s_nb("mjb", "b"),
        *s_nb("greatest(mja, mjb)", "u"),
        F.sum("nboth").alias("__exact"),
    )

    # float expressions below mirror hll_estimate verbatim
    two30 = float(1 << _SHIFT)
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))

    def est(name: str) -> Column:
        s_hit, nb = F.col(f"s_{name}"), F.col(f"nb_{name}")
        s_total = (s_hit + (F.lit(m) - nb) * F.lit(1 << _SHIFT)).cast("double")
        e_raw = alpha * m * m * two30 / s_total
        v = F.lit(m) - nb
        e = F.when(
            (e_raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
        ).otherwise(e_raw)
        return F.round(e, round_to)

    out = (
        row.where((F.col("nb_a") > 0) & (F.col("nb_b") > 0))
        .select(
            est("a").alias("est_a"),
            est("b").alias("est_b"),
            est("u").alias("est_union"),
            F.col("__exact").alias("exact_intersect"),
        )
    )
    return out.select(
        "est_a", "est_b", "est_union",
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), round_to).alias(
            "est_intersect"
        ),
        "exact_intersect",
    )
