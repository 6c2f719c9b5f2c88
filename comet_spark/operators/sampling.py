"""Deterministic sampling and sequence packing for training-data pipelines.

Both operators are driven by content hashes, not RNG, so runs are exactly
reproducible across engines, retries, and cluster sizes — the property a
100 TB data pipeline needs (a re-run after a failed stage must sample the
SAME rows) and the property that makes a DuckDB oracle possible.

- ``hash_sample``: stratified Bernoulli sampling by hashed id. Each row's
  bucket is ``md5(salt || id) % denom``; a row is kept when its bucket is
  below its stratum's rate. Changing ``salt`` yields an independent draw
  (train/holdout splits are the special case of one stratum). Pure
  per-row predicate fused into the scan's codegen stage (plan-asserted:
  no Exchange, no Python) — zero shuffles, scales linearly.
- ``pack_sequences``: greedy contiguous sequence packing — assign each
  document to a token-budget bin by the running token count within its
  shard (the classic "pack examples into fixed-length training sequences"
  step). The window runs PER SHARD (source file / partition key), never
  globally: each shard packs independently in parallel, so there is no
  global-ordering bottleneck at scale; a bin may overflow its budget by
  at most one document (standard first-token-position semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from comet_spark.operators.dedup import _tok

__all__ = [
    "hash_bucket",
    "hash_sample",
    "mixture_rates",
    "top_fraction_per_group",
    "pack_sequences",
]


def hash_bucket(id_col: Column, *, salt: str = "", denom: int = 100) -> Column:
    """Deterministic bucket in [0, denom): first 8 md5 hex chars of
    (salt || id) as a 32-bit int, mod denom. DuckDB twin:
    ('0x' || substr(md5(salt || id::VARCHAR), 1, 8))::BIGINT % denom."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string")).cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % denom


def hash_sample(
    df: DataFrame,
    *,
    id_col: str,
    rates: dict[str, int] | int,
    stratum_col: str | None = None,
    salt: str = "",
    denom: int = 100,
    default_rate: int = 0,
) -> DataFrame:
    """Keep rows whose hash bucket < their stratum's rate (out of denom).

    ``rates`` is either a single int rate (uniform sampling) or a
    {stratum_value: rate} dict keyed by ``stratum_col`` values; strata not
    listed fall back to ``default_rate``. Adds a ``bucket`` column so
    downstream stages (and the oracle) can audit the draw.
    """
    bucket = hash_bucket(F.col(id_col), salt=salt, denom=denom)
    out = df.withColumn("bucket", bucket)
    if isinstance(rates, bool) or isinstance(rates, float):
        # a float would silently fall into the dict branch and raise a
        # misleading "stratum_col is required" — say what's actually wrong
        raise ValueError(
            f"rates must be an integer count out of denom ({denom}) or a "
            "{stratum: count} dict — for a 30% sample use rates=30, denom=100"
        )
    if isinstance(rates, int):
        return out.filter(F.col("bucket") < rates)
    if stratum_col is None:
        raise ValueError("stratum_col is required when rates is a dict")
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(r)).otherwise(rate)
    return out.filter(F.col("bucket") < rate)


def mixture_rates(
    counts: dict[str, int], *, temperature: float = 0.5,
    target_total: int, denom: int = 1_000_000,
) -> dict[str, int]:
    """Temperature-smoothed mixture rates (the multilingual-pretraining
    standard, mBERT/XLM-R exponential smoothing: sample source s with
    probability ∝ n_s^τ): integer per-source keep rates out of
    ``denom``, sized so the expected kept total ≈ ``target_total``.
    τ=1 keeps natural proportions, τ→0 equalizes sources; oversampled
    heads are cut, undersampled tails are capped at ``denom`` (kept
    whole — this operator never duplicates rows, so a tail that the
    formula would UPsample is kept at rate 1 and the epoch multiplier
    belongs to the training loader).

    Driver-side math over the tiny per-source count table (one
    ``groupBy(source).count()``); pair with :func:`hash_sample`
    (``rates=..., denom=...``) for the deterministic zero-shuffle draw.
    Iteration is in sorted-source order so the float sum — and thus
    every rate — is reproducible run to run."""
    import math

    if not counts:
        return {}
    ps = {s: float(n) ** temperature for s, n in sorted(counts.items())}
    z = sum(ps[s] for s in sorted(ps))
    rates = {}
    for s in sorted(counts):
        n = counts[s]
        target_s = target_total * (ps[s] / z)
        rates[s] = min(denom, int(math.floor(denom * (target_s / n))))
    return rates


def top_fraction_per_group(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_cols: list[Column],
    frac: float,
) -> DataFrame:
    """Quality-quantile selection (the FineWeb-Edu-style 'keep the top
    X% by score per language/source' step): rank rows within each group
    by ``order_cols`` (include a unique tiebreaker — a partial order
    makes the cut nondeterministic) and keep rank ≤ ceil(frac · group
    size).

    Scale shape: ONE shuffle on the group key; both windows share the
    partitioning, and Spark's rank-limit pushdown cannot apply (the
    limit depends on the group count) so the group's rows do colocate —
    at 100 TB, group by (source, shard) rather than a handful of
    giant language groups to keep partitions bounded, exactly like
    ``pack_sequences``."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    wn = Window.partitionBy(*group_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(wn))
        .filter(F.col("__rn") <= F.ceil(F.lit(float(frac)) * F.col("__n")))
        .drop("__rn", "__n")
    )


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    budget: int = 256,
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy contiguous packing -> (shard, bin, n_docs, total_tokens, fill).

    Documents are ordered by (id, n_toks) within each shard — ids are
    expected unique per shard; the n_toks tie-break keeps the packing
    deterministic across retries even when they are not (equal-id,
    equal-length rows are interchangeable). A document's bin is
    ``floor(tokens_before_it / budget)`` — it lands in the bin where its
    first token would fall. fill = total_tokens / budget rounded to 6.
    Null/token-less documents count as 0 tokens.
    """
    sized = docs.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("id"),
        F.coalesce(F.size(_tok(text_col, tokens_col)), F.lit(0)).alias("n_toks"),
    )
    binned = sized.withColumn(
        "bin",
        F.floor((F.sum("n_toks").over(
            Window.partitionBy("shard").orderBy("id", "n_toks")
            .rowsBetween(Window.unboundedPreceding, 0)
        ) - F.col("n_toks")) / budget),
    )
    return (
        binned.groupBy("shard", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.round(F.sum("n_toks") / budget, 6).alias("fill"),
        )
    )
