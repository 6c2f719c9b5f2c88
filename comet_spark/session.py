"""SparkSession factory + testdata table loader."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "comet-spark", cpus: str | None = None) -> SparkSession:
    """Build a local SparkSession tuned for the test harness.

    The settings mirror what we'd set on a real cluster: AQE on (runtime
    re-planning, skew-join handling), modest shuffle partitions for local
    mode, Arrow enabled for any pandas-UDF path.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # when events.parquet stores TIMESTAMP(NANOS), read as int64 nanos
        # so time arithmetic is timezone-independent (no-op for MICROS
        # testdata — see __spark_entry__._t's read-side normalization)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata parquet table under ``sf_dir``."""
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}
