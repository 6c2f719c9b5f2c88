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
    "shingle_array",
    "shingle_sets",
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


def shingle_array(toks: Column, n: int) -> Column:
    """Distinct word n-gram shingles of a token-array column, in-row —
    the set-valued twin of :func:`shingles` (same truncation and
    empty-string conventions, identical shingle strings; only the
    representation differs: one array per doc instead of exploded
    rows). The r13 minhash path computes signatures from these arrays
    entirely inside the row, so the corpus is never exploded or
    shuffled for signature generation."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(F.filter(grams, lambda s: s != F.lit("")))


def shingle_sets(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, tokens_col: str | None = None,
) -> DataFrame:
    """→ (id, sh_set): each doc's distinct shingle set as an array.
    Docs with zero shingles yield NO row (matching :func:`shingles`'
    exploded table, where such docs simply have no rows)."""
    return docs.select(
        F.col(id_col).alias("id"),
        shingle_array(_tok(text_col, tokens_col), n).alias("sh_set"),
    ).filter(F.size("sh_set") > 0)


def _minhash_wide(sets: DataFrame, n_hashes: int) -> DataFrame:
    """(id, sh_set) → (id, mh0..mh{n-1}), all in-row: hash each shingle
    once (a projected column, so the md5 pass runs once per row, not per
    hash function), then one ``array_min`` per universal-hash function.
    Integer-exact twin of the exploded groupBy formulation."""
    hs = sets.select(
        "id",
        F.transform("sh_set", lambda s: _hash32(s) % MINHASH_P).alias("__h"),
    )
    return hs.select(
        "id",
        *[
            F.array_min(
                F.transform("__h", lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P)
            ).alias(f"mh{i}")
            for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
        ],
    )


def ngram_jaccard_pairs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, min_jaccard: float = 0.3, round_to: int = 6,
    candidates: DataFrame | None = None,
    shingles_df: DataFrame | None = None,
    tokens_col: str | None = None,
    sets_df: DataFrame | None = None,
) -> DataFrame:
    """Exact jaccard over shingle sets → (a_id, b_id, jaccard).

    Without ``candidates`` this is the exact O(pairs-sharing-a-shingle)
    join; with a candidate DataFrame (from LSH) it verifies only those.
    ``shingles_df`` lets a caller reuse an already-computed (cached)
    shingle table. ``sets_df`` (r14) is the per-doc set-array twin: its
    ``size(sh_set)`` IS the per-doc distinct-shingle count (the exploded
    table is distinct per (id, shingle) by construction), so the per-doc
    size aggregation over the whole exploded table is skipped — one full
    (corpus-sized at scale) shuffle less per run.
    """
    sh = shingles_df if shingles_df is not None else shingles(
        docs, id_col=id_col, text_col=text_col, n=n, tokens_col=tokens_col
    )
    cnt = (
        sets_df.select("id", F.size("sh_set").alias("n_sh"))
        if sets_df is not None
        else sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    )

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
    tokens_col: str | None = None, sets_df: DataFrame | None = None,
) -> DataFrame:
    """→ (id, i, mh): minhash value per doc per hash function.

    Default (r13): fully IN-ROW — per-doc shingle sets, one hash pass,
    ``n_hashes`` array-minima, no explode and no shuffle at all (the
    textbook per-document signature computation; integer-exact twin of
    the exploded groupBy it replaced). ``sets_df`` reuses a cached
    (id, sh_set) table; ``shingles_df`` (a cached EXPLODED table) keeps
    the aggregation formulation for callers that only have that shape."""
    if shingles_df is not None:
        h = shingles_df.select(
            "id", (_hash32(F.col("shingle")) % MINHASH_P).alias("h")
        )
        # all n_hashes minima in ONE aggregation (no n_hashes× row
        # blowup; map-side combine applies)
        aggs = [
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
            for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
        ]
        wide = h.groupBy("id").agg(*aggs)
    else:
        sets = sets_df if sets_df is not None else shingle_sets(
            docs, id_col=id_col, text_col=text_col, n=n, tokens_col=tokens_col
        )
        wide = _minhash_wide(sets, n_hashes)
    stack = ", ".join(f"{i}, mh{i}" for i in range(n_hashes))
    return wide.selectExpr("id", f"stack({n_hashes}, {stack}) AS (i, mh)")


def minhash_band_signatures(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, n_hashes: int = 16, bands: int = 4,
    shingles_df: DataFrame | None = None, tokens_col: str | None = None,
    sets_df: DataFrame | None = None,
) -> DataFrame:
    """→ (id, band, sig): md5 band signature over the ordered minhash
    values of each band — the LSH bucketing key. Shared by the batch
    pair-mining path (:func:`minhash_lsh_pairs`) and the incremental
    ingest-dedup path (streaming/ingest.py neardup_ingest).

    Default (r13): signatures AND band digests are computed in-row
    (``_minhash_wide`` + per-band ``md5(concat_ws(','))`` over the same
    i-ordered value strings the collect_list formulation produced —
    byte-identical digests), so a per-micro-batch signature pass costs
    zero shuffles. ``shingles_df`` keeps the exploded-aggregation path."""
    if bands <= 0 or n_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must evenly divide n_hashes ({n_hashes})")
    rows_per_band = n_hashes // bands
    if shingles_df is not None:
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
    sets = sets_df if sets_df is not None else shingle_sets(
        docs, id_col=id_col, text_col=text_col, n=n, tokens_col=tokens_col
    )
    wide = _minhash_wide(sets, n_hashes)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{b * rows_per_band + j}").cast("string")
                            for j in range(rows_per_band)
                        ],
                    ).cast("binary")
                ).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    return wide.select("id", F.explode(band_structs).alias("__bs")).select(
        "id", F.col("__bs.band").alias("band"), F.col("__bs.sig").alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, n_hashes: int = 16, bands: int = 4,
    min_jaccard: float = 0.3, round_to: int = 6,
    shingles_df: DataFrame | None = None,
    tokens_col: str | None = None,
    sets_df: DataFrame | None = None,
) -> DataFrame:
    """LSH banding → candidates → exact-jaccard verification.

    With 4 bands × 4 rows a pair at jaccard j collides with prob
    1 − (1 − j⁴)⁴ (≈ 0.93 at j = 0.7, ≈ 0.03 at j = 0.2).

    Default (r13): signatures come from the in-row path and the exact
    verification joins the candidate pairs to per-doc shingle SETS —
    ``size(array_intersect(sa, sb))`` replaces the candidate×shingle
    explode join, so the only shuffles left are the band self-join and
    the candidate distinct. Integer-exact: the intersection size, set
    sizes, and jaccard operands are the same integers the exploded
    formulation produced. ``shingles_df`` keeps the exploded path."""
    if bands <= 0 or n_hashes % bands != 0:
        # a runt band (e.g. 16 hashes / 3 bands -> one single-hash band)
        # collides with probability j instead of j^rows — the S-curve
        # silently collapses and candidate generation degrades toward
        # all-pairs
        raise ValueError(
            f"bands ({bands}) must evenly divide n_hashes ({n_hashes})"
        )
    if shingles_df is not None:
        # exploded-table path (caller owns the cached shingle table)
        bsig = minhash_band_signatures(
            docs, id_col=id_col, text_col=text_col, n=n, n_hashes=n_hashes,
            bands=bands, shingles_df=shingles_df,
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
            shingles_df=shingles_df,
        )
    # cache an INTERNALLY built sets table (ADVICE r13): it feeds
    # signature generation plus both verify joins, so an external caller
    # without sets_df would otherwise re-tokenize and re-shingle the
    # corpus three times per run. A caller-supplied sets_df keeps its
    # caller-owned lifecycle (the entry point passes its session cache).
    sets = sets_df if sets_df is not None else shingle_sets(
        docs, id_col=id_col, text_col=text_col, n=n, tokens_col=tokens_col
    ).cache()
    bsig = minhash_band_signatures(
        docs, id_col=id_col, text_col=text_col, n=n, n_hashes=n_hashes,
        bands=bands, sets_df=sets,
    )
    # r13: bucket expansion instead of a band-table self-join — the
    # self-join derived the in-row signature pipeline TWICE (identical
    # subplans don't reuse across join sides) and shuffled the band
    # table once per side. One groupBy(band, sig) ships it once. The
    # expansion is two-step (posexplode the bucket, then explode each
    # member's i<j tail) so per-row memory stays O(bucket), never
    # O(bucket²) — a degenerate bucket (mass duplicates collide on all
    # bands) streams its pairs as rows exactly like the join did.
    # Sorted ids ⇒ a_id < b_id; one row per shared band, deduped by the
    # same distinct. NOT applied to simhash_neardup_pairs: its
    # pigeonhole buckets on the dup-heavy corpus are large (83k
    # surviving pairs), and the measured expansion was catastrophically
    # slower there — the self-join streams those pairs instead.
    ids = F.array_sort(F.col("ids"))
    cand = (
        bsig.groupBy("band", "sig")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.posexplode(ids).alias("i", "a_id"), ids.alias("__ids"))
        .select(
            "a_id",
            F.explode(
                F.slice(F.col("__ids"), F.col("i") + F.lit(2), F.size("__ids"))
            ).alias("b_id"),
        )
        .distinct()
    )
    pairs = cand.join(
        sets.select(F.col("id").alias("a_id"), F.col("sh_set").alias("__sa")), "a_id"
    ).join(
        sets.select(F.col("id").alias("b_id"), F.col("sh_set").alias("__sb")), "b_id"
    )
    c = F.size(F.array_intersect("__sa", "__sb"))
    jac = c.cast("double") / (F.size("__sa") + F.size("__sb") - c)
    out = (
        pairs.select(
            "a_id", "b_id", c.alias("__c"), F.round(jac, round_to).alias("jaccard")
        )
        # the exploded formulation only ever emitted pairs sharing ≥1
        # shingle (inner join); keep that row set exactly
        .filter(F.col("__c") > 0)
        .drop("__c")
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


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
