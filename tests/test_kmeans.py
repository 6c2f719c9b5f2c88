"""Distributed k-means path + unbounded-window guard.

The small-corpus tests elsewhere exercise the driver-side Lloyd fast
path; these force the distributed path (DRIVER_TRAIN_CELLS=0) and check
it against the driver path on the same fixture — init row selection is
exact (two-pass global rank), centroid values agree to float tolerance
(accumulation order differs between the paths; see the module comment in
training/kmeans.py).
"""

from __future__ import annotations

import pathlib
import re

import numpy as np
import pytest

from comet_spark.training import kmeans as km


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    mat = rng.rand(200, 4).round(3)  # .round → fewer float-merge ULP wobbles
    rows = [(i, [float(x) for x in mat[i]]) for i in range(200)]
    return spark.createDataFrame(rows, "id bigint, vector array<double>")


def test_distributed_init_matches_driver(vec_df, monkeypatch):
    driver = km.kmeans_train(vec_df, 8, max_iter=20)
    monkeypatch.setattr(km, "DRIVER_TRAIN_CELLS", 0)
    dist = km.kmeans_train(vec_df, 8, max_iter=20)
    assert driver.shape == dist.shape == (8, 4)
    np.testing.assert_allclose(dist, driver, rtol=0, atol=1e-9)


def test_distributed_init_rows_exact(vec_df, monkeypatch):
    # iteration 0 only → output IS the init centroids; the two-pass rank
    # must select exactly the same rows as the driver path's sorted slice
    driver = km.kmeans_train(vec_df, 8, max_iter=0)
    monkeypatch.setattr(km, "DRIVER_TRAIN_CELLS", 0)
    dist = km.kmeans_train(vec_df, 8, max_iter=0)
    np.testing.assert_array_equal(dist, driver)


def test_no_unbounded_window_sort():
    """Every Window.orderBy without partitionBy in comet_spark/ is a
    single-task global sort — forbidden unless annotated `bounded-rows`
    (a window over a by-construction ≤k-row result list)."""
    root = pathlib.Path(km.__file__).resolve().parents[1]
    offenders = []
    for py in root.rglob("*.py"):
        lines = py.read_text().splitlines()
        for i, line in enumerate(lines):
            if re.search(r"Window\.orderBy\(", line) and not line.lstrip().startswith("#"):
                ctx = "\n".join(lines[max(0, i - 3): i + 1])
                if "bounded-rows" not in ctx:
                    offenders.append(f"{py.relative_to(root)}:{i + 1}")
    assert not offenders, (
        f"unannotated global-sort windows: {offenders} — use a two-pass "
        "rank (see training/kmeans.py) or annotate '# bounded-rows' with "
        "the row-count argument"
    )
