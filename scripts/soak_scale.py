"""10x-local scale soak for the dedup/ANN families (SCALE.md evidence).

Generates a deterministic sf1-equivalent corpus (50k docs / 20k vectors —
10x the sf0.1 tables, same schema, same vocabulary style, with an
injected ~6% near-dup rate so the dedup operators have real work), then
runs the headline dedup/ANN queries at sf0.1 AND at the soak scale and
prints the per-query times side by side. Sub-quadratic growth at 10x
data means the banded/bucketed designs hold; an all-pairs design would
show ~100x.

Usage: python scripts/soak_scale.py  [writes .artifacts/soak/sf1/*.parquet
and SCALE_SOAK.json at the repo root]
"""

from __future__ import annotations

import json
import os
import random
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys  # noqa: E402

if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
SOAK_DIR = os.path.join(ROOT, ".artifacts", "soak", "sf1")
SF01 = "/root/testdata/sf0.1"

N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
NEARDUP_FRAC = 0.06

QUERIES = [
    "minhash_lsh_pairs",
    "simhash_neardup_pairs",
    "winnow_neardup_pairs",
    "dedup_clusters",
    "ngram_jaccard_pairs",
    "lsh_ann_topk",
    "hnsw_dist_topk",  # incl. the distributed per-partition graph build
    "knn_batch100",
    "token_stats",
    "repetition_metrics",
    # r05: the round-4 additions, absent from the first soak
    "semantic_dedup_pairs",  # expected ~sum(|c|^2) growth within clusters
    "pii_redaction",         # pure projection: should track row count ~10x
    "hybrid_adc_rrf",        # prefilter -> ADC -> BM25 -> RRF chain
    "bm25_batch50",          # 50-query batch over 10x postings
    # r05 round additions
    "lsh_multiprobe_topk",   # multi-probe: same one-scan plan as lsh
    "hybrid_hnsw_rrf",       # incl. the 10x distributed graph build
    "mixture_sample_lang",   # pushdown predicate: ~linear in rows
    "quality_top_frac",      # one hash shuffle on the group key
    "image_resize_audit",    # per-row decode/resample kernel: ~linear
    # r06: the maintenance pipelines END TO END (train + drifted store +
    # refresh + compact(recluster) + export + query) — growth tracks the
    # train/rewrite cost, which is the point: maintenance is corpus-linear
    "ivf_recluster_knn",
    "hnsw_addbatch_topk",    # incl. the 10x base build + add_batch
    # r07: text-side maintenance end to end (build quarter + append x3 +
    # BM25.compact + score) and the hybrid over the maintained IVFPQ store
    "bm25_compact_score",
    "hybrid_reencode_rrf",
]


def _generate_customer() -> None:
    """10x customer (pii_redaction's input): replicate the sf0.1 table
    with shifted keys — the synthesized PII text derives from c_custkey,
    so shifted copies carry fresh (not identical) redaction work."""
    if os.path.exists(os.path.join(SOAK_DIR, "customer.parquet")):
        return
    cust = pq.read_table(f"{SF01}/customer.parquet")
    n = cust.num_rows
    parts = []
    for rep in range(10):
        t = cust.to_pydict()
        t["c_custkey"] = [k + rep * n for k in t["c_custkey"]]
        parts.append(pa.table(t, schema=cust.schema))
    pq.write_table(pa.concat_tables(parts), os.path.join(SOAK_DIR, "customer.parquet"))
    print(f"wrote {10 * n} customers to {SOAK_DIR}")


def generate() -> None:
    if os.path.exists(os.path.join(SOAK_DIR, "embeddings.parquet")):
        _generate_customer()  # added in r05; older soak dirs lack it
        print(f"soak corpus already at {SOAK_DIR}")
        return
    os.makedirs(SOAK_DIR, exist_ok=True)
    rng = random.Random(1729)

    # vocabulary + doc-length distribution bootstrapped from the real corpus
    seed_docs = pq.read_table(f"{SF01}/documents.parquet").to_pylist()
    vocab = sorted({w for r in seed_docs for w in r["text"].split()})
    lengths = [len(r["text"].split()) for r in seed_docs]
    langs = [r["lang"] for r in seed_docs]
    sources = [f"src{i}" for i in range(20)]

    texts: list[str] = []
    for i in range(N_DOCS):
        if texts and rng.random() < NEARDUP_FRAC:
            # near-dup of an earlier doc: copy + mutate a few tokens
            base = texts[rng.randrange(len(texts))].split()
            for _ in range(max(1, len(base) // 15)):
                base[rng.randrange(len(base))] = rng.choice(vocab)
            texts.append(" ".join(base))
        else:
            n = rng.choice(lengths)
            texts.append(" ".join(rng.choice(vocab) for _ in range(n)))

    docs = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([rng.choice(langs) for _ in range(N_DOCS)], pa.string()),
            "source": pa.array(
                [sources[i % len(sources)] for i in range(N_DOCS)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(SOAK_DIR, "documents.parquet"))

    nprng = np.random.default_rng(1729)
    centers = nprng.normal(0, 1, (10, DIM)).astype(np.float32)
    labels = nprng.integers(0, 10, N_VECS)
    vecs = (centers[labels] + nprng.normal(0, 0.35, (N_VECS, DIM))).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(labels.tolist(), pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(SOAK_DIR, "embeddings.parquet"))
    _generate_customer()
    print(f"wrote {N_DOCS} docs / {N_VECS} vecs to {SOAK_DIR}")


def _soak_compact(spark, sf_dir: str) -> dict:
    """compact() vs compact(recluster=ivf) on identical two-segment
    stores (VERDICT r06 #7): both rewrite every surviving row; the
    recluster variant adds the assignment projection PLUS the
    cluster_id co-location shuffle before the write. The refresh
    training itself happens before the clock starts — the claim under
    test is the REWRITE overhead, not the (separately priced) retrain."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from comet_spark.operators.ann import IVFIndex
    from comet_spark.storage.store import DocumentStore

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vector"),
    )
    first = emb.filter(F.col("id") % 3 == 0)
    rest = emb.filter(F.col("id") % 3 != 0)
    ivf = IVFIndex.train(first, 8, max_iter=10)
    out = {}
    for mode in ("plain", "recluster", "tiered"):
        path = tempfile.mkdtemp(prefix="soak_compact_")
        store = DocumentStore(spark, f"{path}/s")
        store.append(first)
        store.append(rest)
        if mode == "tiered":
            # the tiered policy merges the sub-tier tail behind the big
            # base (the post-full-compact ingest shape). The appends
            # must be DECISIVELY sub-tier (<< base/4, parquet overhead
            # included) or the measurement silently times a no-op —
            # assert the merge actually ran.
            store.compact()
            small = emb.filter(F.col("id") % 3 == 1).limit(100)
            store.append(small.withColumn("id", F.col("id") + F.lit(10_000_000)))
            store.append(small.withColumn("id", F.col("id") + F.lit(20_000_000)))
            n_before = store.segment_count()
            t0 = time.perf_counter()
            store.compact(tiered=True)
            out[mode] = {"sec": round(time.perf_counter() - t0, 2)}
            assert store.segment_count() < n_before, "tiered merge did not run"
        else:
            refreshed = (
                ivf.refresh(store.read(), max_iter=10)
                if mode == "recluster" else None
            )
            t0 = time.perf_counter()
            store.compact(recluster=refreshed)
            out[mode] = {"sec": round(time.perf_counter() - t0, 2)}
        shutil.rmtree(path, ignore_errors=True)
    return out


def _soak_bm25_append(spark, sf_dir: str) -> dict:
    """BM25.append is O(batch), not O(corpus): appending the SAME
    1000-doc batch onto a 10x-bigger persisted index should cost about
    the same, while the full build+write grows with the corpus. The
    append runs with the default duplicate-id probe on (its doc_len
    semi-join is id-column-sized; the measured number prices the honest
    default path)."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from comet_spark.operators.bm25 import BM25

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = tempfile.mkdtemp(prefix="soak_bm25_append_")
    try:
        t0 = time.perf_counter()
        BM25(docs, id_col="doc_id", text_col="text").write(f"{path}/ix", buckets=16)
        build = round(time.perf_counter() - t0, 2)
        batch = docs.filter(F.col("doc_id") < 1000).withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000_000)
        )
        t0 = time.perf_counter()
        BM25.append(spark, f"{path}/ix", batch, id_col="doc_id", text_col="text")
        append = round(time.perf_counter() - t0, 2)
        # compact consolidates the appended segments in an INDEX-sized
        # rewrite — the claim (VERDICT r06 #1) is that its cost tracks
        # the index, never the corpus tokenize the full build pays; the
        # honest comparison is compact vs the build on the same corpus
        def _du(sub: str) -> int:
            import os as _os

            total = 0
            for root, _dirs, files in _os.walk(f"{path}/ix/{sub}"):
                total += sum(
                    _os.path.getsize(_os.path.join(root, f))
                    for f in files if f.startswith("part-")
                )
            return total

        full_rewrites = _du("postings") + _du("doc_len")
        t0 = time.perf_counter()
        BM25.compact(spark, f"{path}/ix")
        compact = round(time.perf_counter() - t0, 2)
        # tiered compact after ANOTHER small append: only the appended
        # segment files merge, the consolidated base moves by rename.
        # At local scales BOTH compacts are fixed-overhead-bound (~10
        # driver jobs around a ~1s shuffle), so wall-clock alone
        # undersells the difference; bytes_rewritten is the
        # overhead-independent scale signal — full rewrites the whole
        # index, tiered only the appended batch, and the gap widens
        # linearly with index size.
        batch2 = docs.filter(F.col("doc_id") < 1000).withColumn(
            "doc_id", F.col("doc_id") + F.lit(20_000_000)
        )
        BM25.append(spark, f"{path}/ix", batch2, id_col="doc_id", text_col="text")
        import glob as _glob
        import os as _os
        import re as _re

        from comet_spark.storage.store import _pick_tier_merge

        # the tiered rewrite's data volume, computed with the REAL tier
        # policy (sub-top-tier files per bucket / per dir)
        by_bucket: dict[str, list[tuple[str, int]]] = {}
        for f in _glob.glob(f"{path}/ix/postings/part-*"):
            b = _re.search(r"_(\d{5})\.c\d+", f).group(1)
            by_bucket.setdefault(b, []).append((f, _os.path.getsize(f)))
        dl = [
            (f, _os.path.getsize(f))
            for f in _glob.glob(f"{path}/ix/doc_len/part-*")
        ]
        tiered_rewrites = sum(
            dict(grp)[n]
            for grp in list(by_bucket.values()) + [dl]
            for mset in _pick_tier_merge(grp)[1]
            for n in mset
        )
        t0 = time.perf_counter()
        BM25.compact(spark, f"{path}/ix", tiered=True)
        tiered = round(time.perf_counter() - t0, 2)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return {
        "build": {"sec": build},
        "append_1k": {"sec": append},
        "compact": {"sec": compact, "bytes_rewritten": full_rewrites},
        "tiered_compact": {"sec": tiered, "bytes_rewritten": tiered_rewrites},
    }


# pseudo-Thai generator: Line_Break=SA scripts have no word boundaries the
# run-based native tokenizer can segment, so EVERY row routes to the Arrow
# leg — the worst case VERDICT r06 Missing #2 asks to price
_THAI_CONS = [chr(c) for c in range(0x0E01, 0x0E2F)]
_THAI_VOWS = [chr(c) for c in range(0x0E30, 0x0E3A)] + [chr(c) for c in range(0x0E40, 0x0E45)]


def _soak_sa_script(spark, n_docs: int) -> dict:
    """Arrow-leg cost on an SA-script-heavy corpus: build the BM25 index
    over (a) an all-ASCII corpus and (b) a 90%-Thai corpus of the SAME
    shape (doc/word/char counts), and record the routed row fraction
    plus both build throughputs. The ratio IS the per-row price of the
    Arrow tokenizer where the reference pays native-speed segmentation
    (bm25_index.go:158-166) — bounded and batched, not per-row Python."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from comet_spark.functions.text import NONNATIVE_TOKEN_RE
    from comet_spark.operators.bm25 import BM25

    def corpus(th_frac: float):
        # fresh identically-seeded RNG per corpus: both labels then make
        # the SAME draw sequence (doc/word/char counts, route decisions),
        # so only the alphabet differs and the throughput ratio is
        # like-for-like (one rng.choice per character in either branch)
        rng = random.Random(1729)

        def word(th: bool) -> str:
            n = rng.randint(3, 8)
            if th:
                return "".join(
                    rng.choice(_THAI_CONS if i % 2 == 0 else _THAI_CONS + _THAI_VOWS)
                    for i in range(n)
                )
            return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))

        rows = []
        for i in range(n_docs):
            th = rng.random() < th_frac
            rows.append((i, " ".join(word(th) for _ in range(rng.randint(15, 40)))))
        return spark.createDataFrame(rows, "doc_id bigint, text string").repartition(16)

    out = {}
    for label, th_frac in (("ascii", 0.0), ("thai90", 0.9)):
        docs = corpus(th_frac).cache()
        n = docs.count()  # materialize before the clock
        frac = docs.filter(
            F.coalesce(F.col("text").rlike(NONNATIVE_TOKEN_RE), F.lit(False))
        ).count() / n
        path = tempfile.mkdtemp(prefix="soak_sa_")
        try:
            t0 = time.perf_counter()
            BM25(docs, id_col="doc_id", text_col="text").write(f"{path}/ix", buckets=16)
            dt = time.perf_counter() - t0
        finally:
            shutil.rmtree(path, ignore_errors=True)
            docs.unpersist()
        out[label] = {
            "sec": round(dt, 2),
            "arrow_frac": round(frac, 3),
            "docs_per_sec": round(n / dt),
        }
    return out


def _soak_tier_ladder_sim(
    appends: int = 10_000, batch_bytes: int = 4 << 20
) -> dict:
    """Pure-policy simulation of continued ingest with per-append tiered
    compaction and NO full compact (VERDICT r07 #3 'Done' evidence): one
    batch_bytes file lands per append, every merge set collapses into a
    sum-sized file, and we track the file-count bound + total write
    amplification. The real constants (64 MB cap, 1 GB ladder terminal)
    apply — at 10k × 4 MB this ingests 40 GB, far past what a local
    integration test can touch, which is exactly why the policy is a
    pure function. The 'without_ladder' twin replays the r07 policy
    (above-cap class sets never merge) to show the unbounded growth the
    ladder removes."""
    from comet_spark.storage.store import _pick_tier_merge

    def run(ladder: bool, compact_every: int) -> dict:
        nxt = 0
        sizes: dict[str, int] = {}
        rewritten = 0
        max_files = 0
        cap = 64 << 20
        for i in range(appends):
            sizes[f"f{(nxt := nxt + 1)}"] = batch_bytes
            if (i + 1) % compact_every:
                max_files = max(max_files, len(sizes))
                continue
            kept, sets = _pick_tier_merge(list(sizes.items()))
            for s in sets:
                if not ladder and all(sizes[n] >= cap for n in s):
                    continue  # r07 behavior: above-cap sets never merge
                total = sum(sizes.pop(n) for n in s)
                sizes[f"f{(nxt := nxt + 1)}"] = total
                rewritten += total
            max_files = max(max_files, len(sizes))
        return {
            "max_files": max_files,
            "final_files": len(sizes),
            "write_amplification": round(
                rewritten / (appends * batch_bytes), 2
            ),
        }

    # compact_every=4 mirrors the in-stream tiered_compact_every usage;
    # every=1 is the worst-case tail churn
    out = {
        "appends": appends,
        "batch_mb": batch_bytes >> 20,
        "every_4": run(True, 4),
        "every_1": run(True, 1),
        "final_files_without_ladder": run(False, 4)["final_files"],
    }
    return out


def _soak_tier_ladder_real(
    spark, appends: int = 300, compact_every: int = 4
) -> dict:
    """REAL-file ladder soak (VERDICT r08 #3): drive the above-cap
    size-class ladder through ACTUAL DocumentStore segment writes +
    in-loop tiered compacts with patched tiny constants (the same
    patching the integration tests use) — max/final file counts,
    ingested bytes, and bytes_rewritten all come from
    ``os.path.getsize`` on real part files, never the policy function.
    ``tier_ladder_sim`` stays as the 40 GB-scale pure-policy twin; this
    row is the evidence that the real merge machinery (contiguous-run
    selection, rename swaps, newest-wins re-reads) reproduces the sim's
    boundedness on disk. Kept segments move across each swap by RENAME
    (identical relative path), so a file that appears after a compact
    under a path absent before it is a merge OUTPUT by construction —
    that is what ``bytes_rewritten`` sums."""
    import glob
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from comet_spark.storage import store as store_mod
    from comet_spark.storage.store import DocumentStore

    path = tempfile.mkdtemp(prefix="soak_ladder_real_")
    saved = (store_mod._TIER_CAP, store_mod._TIER_LADDER_MAX)
    # tiny constants: ~10 KB batches climb the whole ladder (below-cap
    # tail -> 16 KB cap -> 4x classes -> 256 KB terminal) within a few
    # hundred appends
    store_mod._TIER_CAP, store_mod._TIER_LADDER_MAX = 16 << 10, 256 << 10
    try:
        st = DocumentStore(spark, path, id_col="id")

        def snapshot() -> dict[str, int]:
            return {
                f: os.path.getsize(f)
                for f in glob.glob(f"{path}/data/segment=*/part-*")
            }

        ingested = rewritten = max_files = 0
        t0 = time.perf_counter()
        cur: dict[str, int] = {}
        for i in range(appends):
            batch = (
                spark.range(i * 1000, i * 1000 + 150)
                .select(
                    F.col("id"),
                    F.sha2(F.col("id").cast("string"), 512).alias("text"),
                )
                .repartition(1)
            )
            st.append(batch)
            after = snapshot()
            ingested += sum(sz for f, sz in after.items() if f not in cur)
            cur = after
            if (i + 1) % compact_every == 0:
                st.compact(tiered=True)
                after = snapshot()
                rewritten += sum(sz for f, sz in after.items() if f not in cur)
                cur = after
            max_files = max(max_files, len(cur))
        wall = round(time.perf_counter() - t0, 1)
        terminal = sum(1 for sz in cur.values() if sz >= store_mod._TIER_LADDER_MAX)
        out = {
            "appends": appends,
            "compact_every": compact_every,
            "cap_kb": store_mod._TIER_CAP >> 10,
            "ladder_max_kb": store_mod._TIER_LADDER_MAX >> 10,
            "ingested_mb": round(ingested / 1e6, 2),
            "bytes_rewritten_mb": round(rewritten / 1e6, 2),
            "write_amplification": round(rewritten / ingested, 2) if ingested else 0,
            "max_files": max_files,
            "final_files": len(cur),
            "terminal_files": terminal,
            "sec": wall,
        }
        # the boundedness claims, asserted on the REAL files: the count
        # never grows with the append count, and the ladder actually
        # promoted segments all the way to terminals
        assert max_files < appends // 4, out
        assert terminal >= 1, out
        return out
    finally:
        store_mod._TIER_CAP, store_mod._TIER_LADDER_MAX = saved
        shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    generate()

    from comet_spark.session import get_spark

    spark = get_spark("comet-spark-soak")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", SF01), ("soak10x", SOAK_DIR)):
        for name in QUERIES:
            t0 = time.perf_counter()
            n = len(qs[name](spark, sf_dir).collect())
            dt = round(time.perf_counter() - t0, 2)
            results.setdefault(name, {})[sf_label] = {"sec": dt, "rows": n}
            print(f"{sf_label:8s} {name:24s} {dt:8.2f}s  {n} rows", flush=True)
        cmp = _soak_compact(spark, sf_dir)
        results.setdefault("compact_vs_recluster", {})[sf_label] = cmp
        print(
            f"{sf_label:8s} compact plain {cmp['plain']['sec']}s vs "
            f"recluster {cmp['recluster']['sec']}s", flush=True,
        )
        ap = _soak_bm25_append(spark, sf_dir)
        results.setdefault("bm25_build_vs_append", {})[sf_label] = ap
        print(
            f"{sf_label:8s} bm25 build {ap['build']['sec']}s vs "
            f"append(1k docs) {ap['append_1k']['sec']}s vs "
            f"compact {ap['compact']['sec']}s vs "
            f"tiered {ap['tiered_compact']['sec']}s", flush=True,
        )
        sa = _soak_sa_script(spark, 5_000 if sf_label == "sf0.1" else 50_000)
        results.setdefault("bm25_sa_script_build", {})[sf_label] = sa
        print(
            f"{sf_label:8s} sa-script build: ascii {sa['ascii']['sec']}s "
            f"({sa['ascii']['docs_per_sec']}/s) vs thai90 {sa['thai90']['sec']}s "
            f"({sa['thai90']['docs_per_sec']}/s, arrow_frac {sa['thai90']['arrow_frac']})",
            flush=True,
        )

    real = _soak_tier_ladder_real(spark)
    results["tier_ladder_real"] = real
    print(
        f"ladder real: {real['appends']} appends "
        f"({real['ingested_mb']}MB real files) -> max {real['max_files']} / "
        f"final {real['final_files']} files ({real['terminal_files']} "
        f"terminal), rewrote {real['bytes_rewritten_mb']}MB "
        f"({real['write_amplification']}x) in {real['sec']}s", flush=True,
    )

    lad = _soak_tier_ladder_sim()
    results["tier_ladder_sim"] = lad
    print(
        f"ladder sim: {lad['appends']} appends x {lad['batch_mb']}MB, no full "
        f"compact -> max {lad['every_4']['max_files']} files / write amp "
        f"{lad['every_4']['write_amplification']}x at compact_every=4 "
        f"(every=1: {lad['every_1']['max_files']} files, "
        f"{lad['every_1']['write_amplification']}x; without the ladder: "
        f"{lad['final_files_without_ladder']} files)", flush=True,
    )

    print(f"\n{'query':26s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>7s}")
    for name, r in results.items():
        if name == "compact_vs_recluster":
            for sc in ("sf0.1", "soak10x"):
                p, rc = r[sc]["plain"]["sec"], r[sc]["recluster"]["sec"]
                r[sc]["overhead"] = round(rc / p, 2) if p > 0 else float("inf")
                tr = r[sc].get("tiered", {}).get("sec")
                print(f"compact+recluster {sc}: {p:.2f}s -> {rc:.2f}s "
                      f"({r[sc]['overhead']}x of the plain rewrite)"
                      + (f"; tiered tail merge {tr:.2f}s" if tr else ""))
            continue
        if name == "bm25_build_vs_append":
            for sc in ("sf0.1", "soak10x"):
                b, a = r[sc]["build"]["sec"], r[sc]["append_1k"]["sec"]
                c = r[sc].get("compact", {}).get("sec")
                tc = r[sc].get("tiered_compact", {}).get("sec")
                cb = r[sc].get("compact", {}).get("bytes_rewritten")
                tb = r[sc].get("tiered_compact", {}).get("bytes_rewritten")
                print(
                    f"bm25 {sc}: full build {b:.2f}s vs append(1k) {a:.2f}s"
                    + (f" vs compact {c:.2f}s" if c is not None else "")
                    + (f" vs tiered {tc:.2f}s" if tc is not None else "")
                    + (
                        f" | bytes rewritten {cb/1e6:.1f}MB vs {tb/1e6:.2f}MB"
                        if cb is not None and tb is not None else ""
                    )
                )
            continue
        if name == "bm25_sa_script_build":
            for sc in ("sf0.1", "soak10x"):
                a, t = r[sc]["ascii"], r[sc]["thai90"]
                print(
                    f"sa-script {sc}: ascii {a['sec']:.2f}s vs thai90 "
                    f"{t['sec']:.2f}s ({round(t['sec']/a['sec'],2)}x, "
                    f"arrow_frac {t['arrow_frac']})"
                )
            continue
        if "sf0.1" not in r or "soak10x" not in r:
            continue  # scale-free rows (tier_ladder_sim) have no ratio
        a, b = r["sf0.1"]["sec"], r["soak10x"]["sec"]
        ratio = round(b / a, 1) if a > 0 else float("inf")
        r["ratio"] = ratio
        print(f"{name:26s} {a:8.2f} {b:8.2f} {ratio:>6.1f}x")

    with open(os.path.join(ROOT, "SCALE_SOAK.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
