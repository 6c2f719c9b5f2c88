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
