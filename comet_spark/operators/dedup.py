"""Document deduplication operators for training-data pipelines.

All hashes derive from md5 so a DuckDB oracle can recompute them exactly:
``h(s) = int(md5(s)[:8], 16)`` (32-bit), then universal hashing
``(a_i·h + b_i) mod p`` with pinned odd constants and p = 2^31−1. Every
operator is deterministic and integer-exact across engines.

- exact dedup: groupBy(md5(text)) — one shuffle, trivially scales
- n-gram jaccard: exact pairwise similarity via shared-shingle join;
  the verification step for every approximate method
- MinHash + LSH banding: signatures per doc (n_hashes · shingles min-agg),
  band buckets → candidate pairs → exact-jaccard verification. The classic
  near-dup pipeline: candidate generation is linear in corpus size, the
  quadratic join happens only inside buckets.
- SimHash: 60-bit tf-weighted fingerprint; near-dups = pairs with small
  Hamming distance (bit_count(xor)), candidates via pigeonhole banding —
  an equi-join on fingerprint segments, never an all-pairs cartesian.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comet_spark.functions.text import tokenize

__all__ = [
    "MINHASH_P",
    "minhash_coeffs",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_band_signatures",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_segments",
    "simhash_neardup_pairs",
]

MINHASH_P = 2147483647  # 2^31 − 1


def minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Pinned (a, b) pairs — the oracle inlines the same table."""
    return [(1 + 2 * i, 7 + 13 * i) for i in range(n_hashes)]


def _hash32(col: Column) -> Column:
    """First 8 hex chars of md5 → 32-bit int; identical in DuckDB via
    ('0x' || substr(md5(s),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("bigint")


def _hash60(col: Column) -> Column:
    """First 15 hex chars of md5 → 60-bit int (fits signed BIGINT);
    DuckDB twin: ('0x' || substr(md5(s),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("bigint")


def _tok(text_col: str, tokens_col: str | None) -> Column:
    """Token source: an already-materialized token-array column when the
    caller has one (the cached tokenize-once projection — computing the
    UAX#29 pipeline once per corpus instead of once per operator), else
    tokenize the text column in place."""
    return F.col(tokens_col) if tokens_col is not None else tokenize(text_col)


def shingles(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, tokens_col: str | None = None,
) -> DataFrame:
    """Distinct word n-gram shingles per doc → (id, shingle).

    Docs shorter than ``n`` tokens yield one truncated gram; docs with
    ZERO tokens yield NO rows — an empty-string sentinel would make every
    empty/punctuation-only doc a mutual jaccard-1.0 duplicate AND one hot
    join key (m empty docs → m² candidate rows on the '' shingle)."""
    toks = _tok(text_col, tokens_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, min_jaccard: float = 0.3, round_to: int = 6,
    candidates: DataFrame | None = None,
    shingles_df: DataFrame | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Exact jaccard over shingle sets → (a_id, b_id, jaccard).

    Without ``candidates`` this is the exact O(pairs-sharing-a-shingle)
    join; with a candidate DataFrame (from LSH) it verifies only those.
    ``shingles_df`` lets a caller reuse an already-computed (cached)
    shingle table.
    """
    sh = shingles_df if shingles_df is not None else shingles(
        docs, id_col=id_col, text_col=text_col, n=n, tokens_col=tokens_col
    )
    cnt = sh.groupBy("id").agg(F.count("*").alias("n_sh"))

    if candidates is None:
        a = sh.select(F.col("id").alias("a_id"), "shingle")
        b = sh.select(F.col("id").alias("b_id"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a_id") < F.col("b_id"))
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("c"))
        )
    else:
        a = sh.select(F.col("id").alias("a_id"), "shingle")
        b = sh.select(F.col("id").alias("b_id"), "shingle")
        inter = (
            candidates.join(a, "a_id")
            .join(b, ["b_id", "shingle"])
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("c"))
        )

    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    out = (
        inter.join(cnt.select(F.col("id").alias("a_id"), F.col("n_sh").alias("na")), "a_id")
        .join(cnt.select(F.col("id").alias("b_id"), F.col("n_sh").alias("nb")), "b_id")
        .select("a_id", "b_id", F.round(jac, round_to).alias("jaccard"))
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def minhash_signatures(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, n_hashes: int = 16, shingles_df: DataFrame | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """→ (id, i, mh): minhash value per doc per hash function."""
    sh = shingles_df if shingles_df is not None else shingles(
        docs, id_col=id_col, text_col=text_col, n=n, tokens_col=tokens_col
    )
    h = sh.select("id", (_hash32(F.col("shingle")) % MINHASH_P).alias("h"))
    # all n_hashes minima in ONE aggregation (no n_hashes× row blowup;
    # map-side combine applies), then unpivot the wide row to (id, i, mh)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
    ]
    wide = h.groupBy("id").agg(*aggs)
    stack = ", ".join(f"{i}, mh{i}" for i in range(n_hashes))
    return wide.selectExpr("id", f"stack({n_hashes}, {stack}) AS (i, mh)")


def minhash_band_signatures(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, n_hashes: int = 16, bands: int = 4,
    shingles_df: DataFrame | None = None, tokens_col: str | None = None,
) -> DataFrame:
    """→ (id, band, sig): md5 band signature over the ordered minhash
    values of each band — the LSH bucketing key. Shared by the batch
    pair-mining path (:func:`minhash_lsh_pairs`) and the incremental
    ingest-dedup path (streaming/ingest.py neardup_ingest)."""
    if bands <= 0 or n_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must evenly divide n_hashes ({n_hashes})")
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(
        docs, id_col=id_col, text_col=text_col, n=n, n_hashes=n_hashes,
        shingles_df=shingles_df, tokens_col=tokens_col,
    )
    banded = sig.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
    return banded.groupBy("id", "band").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "mh"))),
                    lambda s: s["mh"].cast("string"),
                ),
            ).cast("binary")
        ).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, n_hashes: int = 16, bands: int = 4,
    min_jaccard: float = 0.3, round_to: int = 6,
    shingles_df: DataFrame | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """LSH banding → candidates → exact-jaccard verification.

    With 4 bands × 4 rows a pair at jaccard j collides with prob
    1 − (1 − j⁴)⁴ (≈ 0.93 at j = 0.7, ≈ 0.03 at j = 0.2)."""
    if bands <= 0 or n_hashes % bands != 0:
        # a runt band (e.g. 16 hashes / 3 bands -> one single-hash band)
        # collides with probability j instead of j^rows — the S-curve
        # silently collapses and candidate generation degrades toward
        # all-pairs
        raise ValueError(
            f"bands ({bands}) must evenly divide n_hashes ({n_hashes})"
        )
    # the shingle table feeds both signature generation and the exact
    # verification — compute once, cache across the two passes (or reuse
    # a caller-cached ``shingles_df``, whose lifecycle the caller owns).
    # The internal cache lives until the returned plan is garbage-
    # collected or the session's cache is cleared; callers looping over
    # many corpora should spark.catalog.clearCache() between iterations
    sh = (
        shingles_df
        if shingles_df is not None
        else shingles(
            docs, id_col=id_col, text_col=text_col, n=n, tokens_col=tokens_col
        ).cache()
    )
    bsig = minhash_band_signatures(
        docs, id_col=id_col, text_col=text_col, n=n, n_hashes=n_hashes,
        bands=bands, shingles_df=sh,
    )
    a = bsig.select(F.col("band").alias("ba"), F.col("sig").alias("sa"), F.col("id").alias("a_id"))
    b = bsig.select(F.col("band").alias("bb"), F.col("sig").alias("sb"), F.col("id").alias("b_id"))
    cand = (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("sa") == F.col("sb")) & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id")
        .distinct()
    )
    return ngram_jaccard_pairs(
        docs, id_col=id_col, text_col=text_col, n=n,
        min_jaccard=min_jaccard, round_to=round_to, candidates=cand,
        shingles_df=sh,
    )


def simhash_fingerprints(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", bits: int = 60,
    tokens_col: str | None = None,
) -> DataFrame:
    """tf-weighted SimHash over 60 hash bits → (id, simhash BIGINT).

    All ``bits`` signed tf-weights are computed in ONE aggregation over the
    (id, term) tf table — no per-bit explode, so the shuffle carries the tf
    rows once instead of ``bits`` times (map-side combine applies)."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(_tok(text_col, tokens_col)).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    th = tf.select("id", "tf", _hash60(F.col("term")).alias("h"))
    signed = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"w{b}")
        for b in range(bits)
    ]
    wide = th.groupBy("id").agg(*signed)
    fp: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        fp = fp + F.when(F.col(f"w{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return wide.select("id", fp.alias("simhash"))


def simhash_segments(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """Pigeonhole banding layout: split ``bits`` into ``max_hamming + 1``
    contiguous segments, sizes as even as possible → [(start, width), ...].
    Any pair within Hamming ≤ max_hamming must match exactly on ≥1 segment."""
    nseg = max_hamming + 1
    sizes = [bits // nseg + (1 if s < bits % nseg else 0) for s in range(nseg)]
    out, start = [], 0
    for w in sizes:
        out.append((start, w))
        start += w
    return out


def simhash_neardup_pairs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 60, max_hamming: int = 8,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming → (a_id, b_id, hamming).

    Pigeonhole banding (the exact-cover analog of MinHash-LSH banding): the
    fingerprint splits into ``max_hamming + 1`` segments; a pair within the
    Hamming budget must agree exactly on at least one segment, so candidates
    come from an EQUI-join on (segment_index, segment_value) — never an
    all-pairs cartesian — then the full-fingerprint Hamming verifies. Exact
    (recall 1.0 by pigeonhole), and the join is linear in bucket sizes.
    Reference validates its approximate search the same
    candidates-then-verify way (hnsw_index_search_test.go:992-1150)."""
    fp = (
        fingerprints
        if fingerprints is not None
        else simhash_fingerprints(docs, id_col=id_col, text_col=text_col, bits=bits)
    )
    segs = F.array(
        *[
            F.struct(
                F.lit(s).alias("seg"),
                F.shiftright(F.col("simhash"), start)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("segval"),
            )
            for s, (start, width) in enumerate(simhash_segments(bits, max_hamming))
        ]
    )
    keyed = fp.select("id", "simhash", F.explode(segs).alias("s")).select(
        "id", "simhash", F.col("s.seg").alias("seg"), F.col("s.segval").alias("segval")
    )
    a = keyed.select("seg", "segval", F.col("id").alias("a_id"), F.col("simhash").alias("fa"))
    b = keyed.select("seg", "segval", F.col("id").alias("b_id"), F.col("simhash").alias("fb"))
    ham = F.expr("bit_count(fa ^ fb)")
    return (
        a.join(b, ["seg", "segval"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
