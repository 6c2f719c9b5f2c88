"""End-to-end training-data curation on comet-spark — the 100 TB
pipeline shape, runnable on the sf0.001 sample.

Stages (each a lazy DataFrame transform; one Catalyst plan per stage):
  1. exact dedup            (md5 content hash, first-wins)
  2. near-dup dedup         (MinHash band signatures, bucketed LSH)
  3. benchmark decontam     (broadcast eval shingles, drop-on-any-hit)
  4. PII redaction          (typed placeholders, audit counts)
  5. quality-quantile cut   (top 60% by uniq-token ratio per lang)
  6. mixture resampling     (temperature-smoothed per-lang rates)
  7. sequence packing       (per-shard token-budget bins)

Run: python examples/curation_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F

from comet_spark.functions.text import tokenize
from comet_spark.operators.dedup import minhash_band_signatures
from comet_spark.operators.redact import redact_pii
from comet_spark.operators.sampling import (
    hash_sample,
    mixture_rates,
    pack_sequences,
    top_fraction_per_group,
)
from comet_spark.session import get_spark
from comet_spark.streaming.ingest import decontam_ingest, pin_eval_shingles

SF = "/root/testdata/sf0.001"


def stage(name, df, prev_n):
    n = df.count()
    kept = f"{n}/{prev_n}" if prev_n else str(n)
    print(f"  {name:<28s} -> {kept} docs")
    return df, n


def main() -> None:
    spark = get_spark("comet-spark-curation", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = "/tmp/curation_demo"

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. exact dedup: one md5 per doc, keep the smallest doc_id per hash
    hashed = docs.withColumn("__h", F.md5(F.col("text").cast("binary")))
    first = hashed.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    exact, n = stage(
        "exact dedup", docs.join(first, "doc_id", "left_semi"), n0
    )

    # 2. near-dup: any band-signature collision -> keep the smaller id
    sigs = minhash_band_signatures(exact, n=3, n_hashes=16, bands=4)
    a = sigs.select(F.col("band"), F.col("sig"), F.col("id").alias("a"))
    b = sigs.select(F.col("band"), F.col("sig"), F.col("id").alias("b"))
    losers = (
        a.join(b, ["band", "sig"]).filter(F.col("a") < F.col("b"))
        .select(F.col("b").alias("doc_id")).distinct()
    )
    neardup, n = stage("near-dup dedup (LSH)", exact.join(losers, "doc_id", "left_anti"), n)

    # 3. decontamination against a pinned "benchmark" (here: 5 sampled docs)
    ev_path = f"{tmp}/eval_shingles"
    pin_eval_shingles(docs.filter(F.col("doc_id") % 101 == 0), ev_path, n=5)
    clean, n = stage("benchmark decontam", decontam_ingest(neardup, ev_path, n=5), n)

    # 4. PII redaction (in place; row count unchanged, audit cols added)
    red = redact_pii(clean, text_col="text")
    n_pii = red.filter((F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0).count()
    print(f"  {'PII redaction':<28s} -> {n_pii} docs carried PII (redacted)")

    # 5. quality cut: keep the top 60% by uniq-token ratio per lang
    toks = F.size(tokenize("text"))
    scored = red.withColumn("n_toks", toks).filter(F.col("n_toks") > 0).withColumn(
        "uniq_ratio",
        F.size(F.array_distinct(tokenize("text"))) / F.col("n_toks"),
    )
    quality, n = stage(
        "quality top-60% per lang",
        top_fraction_per_group(
            scored, group_cols=["lang"],
            order_cols=[F.col("uniq_ratio").desc(), F.col("doc_id").asc()],
            frac=0.6,
        ),
        n,
    )

    # 6. temperature-smoothed mixture (tau=0.5, target half the survivors)
    counts = {r["lang"]: r["n"] for r in quality.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    rates = mixture_rates(counts, temperature=0.5, target_total=n // 2, denom=1_000_000)
    mixed, n = stage(
        "mixture resample (tau=0.5)",
        hash_sample(quality, id_col="doc_id", rates=rates, stratum_col="lang",
                    salt="cur1", denom=1_000_000),
        n,
    )

    # 7. pack into 256-token training sequences per source shard
    bins = pack_sequences(mixed, budget=256)
    stats = bins.agg(
        F.count("*").alias("n_bins"), F.round(F.avg("fill"), 3).alias("avg_fill")
    ).first()
    print(f"  {'sequence packing':<28s} -> {stats['n_bins']} bins, avg fill {stats['avg_fill']}")

    spark.stop()


if __name__ == "__main__":
    main()
