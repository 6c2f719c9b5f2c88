"""Scalar vector quantizers (reference ``quantizer.go``).

- int8 symmetric (H9): train = global ``max(abs(x))`` over the corpus
  (``quantizer.go:184-195``), quantize = ``round(v/absMax·127)`` clamped to
  [−127, 127], dequantize = ``q/127·absMax`` (``quantizer.go:201-233``).
  Rounding is half-away-from-zero in Go, Spark, and DuckDB alike, so the
  whole round-trip is oracle-checkable as native column expressions.
- float16 (H8): IEEE 754 half via numpy (Arrow-batched pandas UDF) — Spark
  and DuckDB have no 16-bit float type, so this one is validated by unit
  tests rather than a SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comet_spark.functions.vector import to_double_array

__all__ = [
    "int8_absmax",
    "int8_quantize",
    "int8_dequantize",
    "float16_roundtrip",
]


def int8_absmax(df: DataFrame, vec_col: str = "vector") -> float:
    """Trainer: global max(abs(element)) (``quantizer.go:184-195``)."""
    row = df.select(
        F.max(
            F.aggregate(
                to_double_array(vec_col),
                F.lit(0.0),
                lambda s, x: F.greatest(s, F.abs(x)),
            )
        ).alias("m")
    ).first()
    return float(row["m"])


def int8_quantize(vec: Column, abs_max: float) -> Column:
    """→ ARRAY<TINYINT>, symmetric round(v/absMax·127), clamped ±127."""
    scale = 127.0 / abs_max
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.round(x * scale).cast("int"))
        ).cast("tinyint"),
    )


def int8_dequantize(qvec: Column, abs_max: float) -> Column:
    inv = abs_max / 127.0
    return F.transform(qvec, lambda q: q.cast("double") * inv)


def float16_roundtrip(df: DataFrame, *, id_col: str = "id", vec_col: str = "vector") -> DataFrame:
    """→ (id, vector_f16 ARRAY<FLOAT>): values squeezed through IEEE half
    (``quantizer.go:136-157``); Arrow-batched numpy, no per-row Python."""

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [
                np.asarray(v, dtype=np.float64).astype(np.float16).astype(np.float32)
                for v in pdf["v"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "vector_f16": [list(a) for a in arrs]})

    e = df.select(F.col(id_col).cast("bigint").alias("id"), to_double_array(vec_col).alias("v"))
    return e.mapInPandas(conv, "id bigint, vector_f16 array<float>")
