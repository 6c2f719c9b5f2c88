"""Property-based checks: Spark operators vs pure-Python models of the
reference semantics (small example counts — each example is a Spark job)."""

from hypothesis import given, settings, strategies as st

from comet_spark.operators.autocut import autocut
from comet_spark.operators.metadata import Ne, NotIn, Field, NumField


def autocut_model(ys: list[float], cutoff: int) -> int:
    """Direct model of the reference algorithm (limiter.go:81-118)."""
    n = len(ys)
    if n <= 1:
        return n
    step = 1.0 / (n - 1)
    diff = [(ys[i] - ys[0]) / (ys[-1] - ys[0]) - i * step for i in range(n)]
    count = 0
    for i in range(1, n):
        if i == n - 1:
            ext = n > 1 and diff[i] > diff[i - 1] and diff[i] > diff[i - 2]
        else:
            ext = diff[i] > diff[i - 1] and diff[i] > diff[i + 1]
        if ext:
            count += 1
            if count >= cutoff:
                return i
    return n


scores = st.lists(
    st.floats(min_value=0.0, max_value=10.0, allow_nan=False, width=32),
    min_size=2,
    max_size=12,
    unique=True,
)


@settings(max_examples=12, deadline=None)
@given(ys=scores, cutoff=st.integers(min_value=1, max_value=3))
def test_autocut_matches_model(spark, ys, cutoff):
    ys = sorted(ys)
    if ys[-1] == ys[0]:
        return
    df = spark.createDataFrame(list(enumerate(ys)), "id bigint, score double")
    got = autocut(df, cutoff=cutoff, ascending=True).count()
    assert got == autocut_model(ys, cutoff)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.one_of(st.none(), st.sampled_from(["a", "b", "c"])), min_size=1, max_size=12),
    target=st.sampled_from(["a", "b"]),
)
def test_categorical_ne_model(spark, vals, target):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, cat string")
    got = sorted(r["id"] for r in df.filter(Ne(Field("cat"), target).expr()).collect())
    # allDocs ANDNOT eq: NULLs match
    want = sorted(i for i, v in rows if v is None or v != target)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
        min_size=1,
        max_size=12,
    ),
    target=st.floats(min_value=-100, max_value=100, allow_nan=False),
)
def test_numeric_ne_model(spark, vals, target):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, price double")
    got = sorted(r["id"] for r in df.filter(Ne(NumField("price"), target).expr()).collect())
    # existence ANDNOT eq under int64(v*100) truncation: NULLs never match
    want = sorted(i for i, v in rows if v is not None and int(v * 100) != int(target * 100))
    assert got == want


def zorder_model(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1, max_size=20, unique=True,
    )
)
def test_zorder_matches_model_and_is_injective(spark, pts):
    from pyspark.sql import functions as F

    from comet_spark.operators.layout import zorder_key

    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
        ).collect()
    }
    want = {(x, y): zorder_model(x, y, 8) for x, y in pts}
    assert got == want
    assert len(set(got.values())) == len(pts)  # injective on the domain


def cms_model(values: list[str], probe: str, d: int, w: int) -> int:
    import hashlib

    from comet_spark.operators.dedup import MINHASH_P, minhash_coeffs

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    counters: dict[tuple[int, int], int] = {}
    for v in values:
        for i, (a, b) in enumerate(minhash_coeffs(d)):
            k = (i, ((a * h32(v) + b) % MINHASH_P) % w)
            counters[k] = counters.get(k, 0) + 1
    return min(
        counters.get((i, ((a * h32(probe) + b) % MINHASH_P) % w), 0)
        for i, (a, b) in enumerate(minhash_coeffs(d))
    )


@settings(max_examples=6, deadline=None)
@given(
    values=st.lists(st.sampled_from([f"t{i}" for i in range(12)]), min_size=1, max_size=40),
    probe=st.sampled_from([f"t{i}" for i in range(12)]),
)
def test_cms_matches_python_model(spark, values, probe):
    from comet_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.createDataFrame([(v,) for v in values], "term string")
    probes = spark.createDataFrame([(probe,)], "term string")
    counters = cms_sketch(df, "term", d=2, w=16)
    got = cms_estimate(counters, probes, d=2, w=16).first()["est_count"]
    assert got == cms_model(values, probe, 2, 16)
    assert got >= values.count(probe)  # one-sided error


# -- mixture_rates (pure Python: cheap to fuzz hard) --------------------------

mix_counts = st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=3),
    st.integers(min_value=1, max_value=100_000),
    min_size=1,
    max_size=8,
)


@given(counts=mix_counts, tau=st.floats(0.0, 1.0), target_frac=st.floats(0.05, 1.5))
@settings(max_examples=300, deadline=None)
def test_mixture_rates_invariants(counts, tau, target_frac):
    """Pure-math invariants of the temperature smoothing:
    rates stay in [0, denom]; the EXPECTED kept total (sum of n_s*rate/denom)
    never exceeds the target beyond the per-source cap effect and is within
    len(sources) floor-roundings below min(target, achievable); tau=1 gives
    every source the same rate (natural proportions); insertion order of the
    counts dict never changes a rate."""
    from comet_spark.operators.sampling import mixture_rates

    denom = 1_000_000
    total = sum(counts.values())
    target = max(1, int(total * target_frac))
    rates = mixture_rates(counts, temperature=tau, target_total=target, denom=denom)

    assert set(rates) == set(counts)
    assert all(0 <= r <= denom for r in rates.values())

    expected_keep = sum(counts[s] * rates[s] / denom for s in counts)
    # never over-sample the target by more than rounding slack; capped
    # sources can only LOWER the expected total
    assert expected_keep <= target + len(counts)
    # floor-rounding loses < 1/denom of each source's mass
    achievable = sum(
        min(counts[s], target * (counts[s] ** tau) / sum(c ** tau for c in counts.values()))
        for s in counts
    )
    assert expected_keep >= achievable - len(counts) * (1 + total / denom)

    if tau == 1.0:
        # natural proportions: every source targets the same keep
        # fraction target/total. Float division makes per-source rates
        # wobble by one integer step of denom (1 ppm) around it —
        # e.g. 237*(1/237) = 0.999... floors differently than
        # 237*(235/237)/235 — so equality holds within that step.
        assert max(rates.values()) - min(rates.values()) <= 1

    reordered = mixture_rates(
        dict(reversed(list(counts.items()))), temperature=tau,
        target_total=target, denom=denom,
    )
    assert reordered == rates


@given(
    sizes=st.lists(
        st.integers(min_value=200, max_value=(8 << 30)), min_size=0, max_size=40
    )
)
@settings(max_examples=300, deadline=None)
def test_pick_tier_merge_invariants(sizes):
    """The tier policy as algebra, for ARBITRARY file populations:
    partition correctness (kept ∪ merge-sets == all files, disjoint),
    every merge set has ≥2 members, above-cap class sets are
    single-class with ≥ min_uniform members and produce outputs that
    PROMOTE (sum lands in a strictly higher class — the no-rewrite-
    forever invariant), and terminals are never selected."""
    from comet_spark.storage.store import (
        _TIER_CAP,
        _TIER_LADDER_MAX,
        _TIER_MIN_UNIFORM,
        _pick_tier_merge,
        _size_class,
    )

    files = [(f"f{i}", s) for i, s in enumerate(sizes)]
    by_name = dict(files)
    kept, sets = _pick_tier_merge(files)

    flat = [n for s in sets for n in s]
    assert sorted(kept + flat) == sorted(n for n, _ in files)
    assert len(flat) == len(set(flat))
    for s in sets:
        assert len(s) >= 2
    mx = max(sizes) if sizes else 0
    if mx >= _TIER_CAP:  # ladder regime
        for s in sets:
            classes = {_size_class(by_name[n]) for n in s}
            if classes == {-1}:
                continue  # the below-cap tail set
            # a class set: uniform, filled, and PROMOTING
            assert len(classes) == 1
            c = classes.pop()
            assert len(s) >= _TIER_MIN_UNIFORM
            assert _size_class(sum(by_name[n] for n in s)) > c
        # terminals are never merged
        for s in sets:
            assert all(by_name[n] < _TIER_LADDER_MAX for n in s)


@given(
    batch=st.integers(min_value=1 << 20, max_value=64 << 20),
    steps=st.integers(min_value=50, max_value=400),
    every=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_tier_ladder_bounds_file_count(batch, steps, every):
    """Continued ingest with periodic tiered compaction and NO full
    compact keeps the file count bounded by the ladder's structural
    limit: one tail straggler + (min_uniform-1) per occupied class +
    terminals (which grow only with total bytes — subtracted here)."""
    from comet_spark.storage.store import (
        _TIER_LADDER_MAX,
        _TIER_MIN_UNIFORM,
        _pick_tier_merge,
    )

    sizes: dict[str, int] = {}
    nxt = 0
    for i in range(steps):
        nxt += 1
        sizes[f"f{nxt}"] = batch
        if (i + 1) % every:
            continue
        _, sets = _pick_tier_merge(list(sizes.items()))
        for s in sets:
            total = sum(sizes.pop(n) for n in s)
            nxt += 1
            sizes[f"f{nxt}"] = total
        n_terminal = sum(1 for v in sizes.values() if v >= _TIER_LADDER_MAX)
        live = len(sizes) - n_terminal
        # occupied classes ≤ log_4(ladder_max / min(batch,cap)) + tail
        assert live <= (_TIER_MIN_UNIFORM - 1) * 16 + every, (
            i, live, sorted(sizes.values())[-5:]
        )
    # and the end state DRAINS: repeated passes terminate in O(#rungs)
    # steps (consuming a class's set may legitimately fill the NEXT class
    # — cascading promotion — but each cascade strictly climbs the
    # ladder, so it cannot loop; a rewrite-forever bug would exceed the
    # bound)
    for _ in range(12):
        _, sets = _pick_tier_merge(list(sizes.items()))
        if not sets:
            break
        for s in sets:
            total = sum(sizes.pop(n) for n in s)
            nxt += 1
            sizes[f"f{nxt}"] = total
    else:
        raise AssertionError(
            f"ladder did not drain: {sorted(sizes.values())[-8:]}"
        )
