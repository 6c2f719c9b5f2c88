"""Vector distance / norm expressions as native Catalyst array expressions.

Semantics follow the reference distance kernels (reference:
``distance.go:114-290``): L2 ``sqrt(sum((a-b)^2))``, squared L2 (order
preserving, no sqrt), cosine distance ``1 - dot(a,b)/(|a||b|)`` clamped to
[-1, 1], dot/inner product, and unit-norm preprocessing with zero-vector
rejection (``distance.go:241-264``).

Everything here is a pure Column expression built from
``zip_with``/``aggregate``/``transform`` — it stays inside whole-stage
codegen on the JVM, vectorizes for free over columnar batches, and never
crosses into Python. All math is promoted to DOUBLE so a DuckDB oracle
computing the same formula bit-matches after a ROUND(…, 6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "to_double_array",
    "dot",
    "l2_sq",
    "l2",
    "cosine_distance",
    "norm",
    "normalize",
    "distance",
    "DISTANCE_KINDS",
]


def to_double_array(col: Column | str) -> Column:
    """Cast ARRAY<FLOAT> → ARRAY<DOUBLE> (exact widening)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Inner product; sequential left-to-right sum like the scalar loop."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (reference ``distance.go:158-165``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def l2(a: Column, b: Column) -> Column:
    """Euclidean distance (reference ``distance.go:114-121``)."""
    return F.sqrt(l2_sq(a, b))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def normalize(a: Column) -> Column:
    """Scale to unit L2 norm; zero vector → NULL (reference raises,
    ``distance.go:252-255`` — NULL is the relational rendering)."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n))


def cosine_distance(a: Column, b: Column) -> Column:
    """``1 - cos_sim`` with the similarity clamped to [-1, 1]
    (reference ``distance.go:201-216``). Inputs need not be pre-normalized;
    the reference normalizes at insert time, which is equivalent. A zero
    vector yields NULL (try_divide — ANSI mode would otherwise raise),
    mirroring the reference's zero-vector rejection."""
    sim = F.try_divide(dot(a, b), norm(a) * norm(b))
    # greatest/least skip NULLs in Spark — propagate NULL explicitly
    clamped = F.when(sim.isNotNull(), F.greatest(F.lit(-1.0), F.least(F.lit(1.0), sim)))
    return F.lit(1.0) - clamped


def dot_distance(a: Column, b: Column) -> Column:
    """Inner-product DISTANCE = −dot(a, b): every search path sorts score
    ascending, so the most-similar (largest-dot) vector must have the
    smallest score. Raw dot under ascending order would return the k
    LEAST similar documents."""
    return -dot(a, b)


DISTANCE_KINDS = {
    "l2": l2,
    "l2sq": l2_sq,
    "cosine": cosine_distance,
    "dot": dot_distance,
}


def distance(kind: str, a: Column, b: Column) -> Column:
    try:
        return DISTANCE_KINDS[kind](a, b)
    except KeyError:
        raise ValueError(f"unknown distance kind {kind!r}; one of {sorted(DISTANCE_KINDS)}")
