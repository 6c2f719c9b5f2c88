"""Durable document store — the LSM-parity layer (SURVEY.md §2.J).

Reference architecture (``storage.go:11-148``): active memtable → frozen
memtables → gzip segments on disk; background flush + compaction; queries
fan out over memtables + segments and dedup by max score; deletes are
soft (bitmap) until compaction hard-deletes.

Spark rendering:
- a *segment* is a parquet subdirectory (``segment=N``); appending a batch
  writes a new segment — exactly the immutable-file append the LSM does
  (J1-J3). Parquet already compresses (snappy), so no gzip layer.
- *soft deletes* (J6/B15) are rows in a ``_deletes`` table; every read
  anti-joins them (the industry deletion-vector pattern).
- *compaction* (J4) rewrites all segments into one and drops the deletion
  rows it applied — implemented correctly, not like the reference's
  stubbed merge (``storage_compaction.go:68-70`` writes empty segments).
- the *merged read view* (J5) is ``union_all(segments) → anti-join deletes
  → dedup by newest segment per id`` (the reference deduped search results
  by max score; for the storage layer we dedup documents by recency —
  newest version of a doc wins, which is what an LSM read gives you).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["DocumentStore"]


class DocumentStore:
    def __init__(self, spark: SparkSession, path: str, id_col: str = "id"):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.data_path = os.path.join(path, "data")
        self.deletes_path = os.path.join(path, "_deletes")

    # -- write path ----------------------------------------------------------

    def _next_segment(self) -> int:
        try:
            segs = [
                int(d.split("=")[1])
                for d in os.listdir(self.data_path)
                if d.startswith("segment=")
            ]
            return max(segs) + 1 if segs else 0
        except FileNotFoundError:
            return 0

    def append(self, batch: DataFrame) -> int:
        """Write one immutable segment (memtable flush, J1-J3)."""
        seg = self._next_segment()
        batch.withColumn("segment", F.lit(seg)).write.mode("append").partitionBy(
            "segment"
        ).parquet(self.data_path)
        return seg

    def delete(self, ids: DataFrame) -> None:
        """Soft delete (J6): record ids; reads anti-join them."""
        ids.select(F.col(self.id_col)).write.mode("append").parquet(self.deletes_path)

    # -- read path -----------------------------------------------------------

    def _segments(self) -> DataFrame:
        if not os.path.isdir(self.data_path):
            raise FileNotFoundError(
                f"store at {self.path} has no segments yet — append() first"
            )
        return self.spark.read.option("basePath", self.data_path).parquet(self.data_path)

    def _deletes(self) -> DataFrame | None:
        if not os.path.isdir(self.deletes_path) or not any(
            f.endswith(".parquet") for f in os.listdir(self.deletes_path)
        ):
            return None
        return self.spark.read.parquet(self.deletes_path)

    def read(self) -> DataFrame:
        """Merged view (J5): newest segment wins per id, deletes hidden."""
        df = self._segments()
        w = Window.partitionBy(self.id_col).orderBy(F.col("segment").desc())
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        dels = self._deletes()
        if dels is not None:
            df = df.join(dels, self.id_col, "left_anti")
        return df.drop("segment")

    # -- maintenance ---------------------------------------------------------

    def compact(self) -> None:
        """Rewrite all segments into one, applying deletes (hard delete) and
        version dedup — the OPTIMIZE-style job (J4), implemented correctly
        unlike the reference's stub."""
        merged = self.read().cache()
        merged.count()  # materialize before we overwrite the source files
        tmp = self.data_path + ".compacting"
        merged.withColumn("segment", F.lit(0)).write.mode("overwrite").partitionBy(
            "segment"
        ).parquet(tmp)
        merged.unpersist()

        import shutil

        shutil.rmtree(self.data_path)
        os.rename(tmp, self.data_path)
        if os.path.isdir(self.deletes_path):
            shutil.rmtree(self.deletes_path)

    def segment_count(self) -> int:
        try:
            return len([d for d in os.listdir(self.data_path) if d.startswith("segment=")])
        except FileNotFoundError:
            return 0
