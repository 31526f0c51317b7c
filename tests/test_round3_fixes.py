"""Round-3 verdict/ADVICE items: vectorized shapes tile kernel,
adaptive cross-tile merge, connected-components convergence warning,
persist hygiene, neardup cluster cap."""

from __future__ import annotations

import time
import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rasterio_spark.operators.shapes import KEY_SHIFT, _local_components


def _old_dict_kernel(pdf: pd.DataFrame, connectivity: int) -> pd.DataFrame:
    """The r2 kernel (dict probe per cell per offset) — kept here only
    as the timing/correctness baseline for the vectorized rewrite."""
    rows = pdf["row"].values.astype(np.int64)
    cols = pdf["col"].values.astype(np.int64)
    vals = pdf["value"].values
    keys = (rows << KEY_SHIFT) | cols
    order = np.argsort(keys)
    rows, cols, vals, keys = rows[order], cols[order], vals[order], keys[order]
    offsets = [(0, 1), (1, 0)] + ([(1, 1), (1, -1)] if connectivity == 8 else [])
    parent = np.arange(len(keys), dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != i:
            parent[i], i = root, parent[i]
        return root

    key_to_pos = {int(k): i for i, k in enumerate(keys)}
    for dr, dc in offsets:
        nkeys = ((rows + dr) << KEY_SHIFT) | (cols + dc)
        for i, nk in enumerate(nkeys):
            j = key_to_pos.get(int(nk))
            if j is not None and vals[i] == vals[j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    if ri < rj:
                        parent[rj] = ri
                    else:
                        parent[ri] = rj
    roots = np.array([find(i) for i in range(len(keys))], dtype=np.int64)
    return pd.DataFrame({"row": rows, "col": cols, "value": vals, "label": keys[roots]})


@pytest.mark.parametrize("connectivity", [4, 8])
def test_local_components_vectorized_matches_old(connectivity):
    rng = np.random.default_rng(7)
    n = 128
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    for vals in (
        np.ones(n * n),
        rng.integers(0, 4, n * n).astype(float),
        rng.integers(0, 50, n * n).astype(float),
    ):
        pdf = pd.DataFrame({"row": rr.ravel(), "col": cc.ravel(), "value": vals})
        a = _old_dict_kernel(pdf, connectivity).sort_values(["row", "col"])
        b = _local_components(pdf, connectivity).sort_values(["row", "col"])
        assert (a.label.values == b.label.values).all()


def test_local_components_sparse_and_empty():
    # empty tile
    empty = pd.DataFrame({"row": [], "col": [], "value": []})
    assert len(_local_components(empty, 4)) == 0
    # sparse scatter: every cell isolated
    pdf = pd.DataFrame({"row": [0, 5, 9], "col": [0, 5, 9], "value": [1.0, 1.0, 1.0]})
    out = _local_components(pdf, 4)
    assert out.label.nunique() == 3


def test_local_components_speedup_dense_tile():
    """Verdict item 3: measured per-tile kernel speedup on a dense
    256x256 uniform tile (the hot worst case — one giant component)."""
    n = 256
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    pdf = pd.DataFrame({"row": rr.ravel(), "col": cc.ravel(), "value": np.ones(n * n)})
    # warm both once (numpy/pandas allocator effects)
    _old_dict_kernel(pdf.head(1000), 4)
    _local_components(pdf.head(1000), 4)
    t0 = time.perf_counter()
    _old_dict_kernel(pdf, 4)
    t_old = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = _local_components(pdf, 4)
    t_new = time.perf_counter() - t0
    assert out.label.nunique() == 1
    # measured ~10x locally; 2x keeps the assert robust on noisy hosts
    assert t_new < t_old / 2, f"vectorized kernel not faster: old {t_old:.3f}s new {t_new:.3f}s"


def test_cross_tile_merge_adaptive_equivalence(spark, monkeypatch):
    """Verdict item 4: shapes' cross-tile merge now routes through the
    adaptive component finder; driver path == distributed path."""
    import functools

    from rasterio_spark.operators import dedup
    from rasterio_spark.operators.shapes import connected_components

    # checkerboard of 2 values + a long line crossing every tile
    # (disjoint cell coordinates: rows 10-17 vs line row 5)
    rows = [(1, 5, c, 7.0, True) for c in range(40)]
    rows += [(1, r, c, float((r + c) % 2), True) for r in range(10, 18) for c in range(8)]
    cells = spark.createDataFrame(
        rows, "band int, row int, col int, value double, valid boolean"
    )
    got_driver = (
        connected_components(cells, connectivity=4, tile_shape=(4, 4))
        .toPandas()
        .sort_values(["row", "col"])
    )
    orig = dedup.connected_components_pairs
    monkeypatch.setattr(
        dedup,
        "connected_components_pairs",
        functools.partial(orig, driver_threshold=0),
    )
    got_dist = (
        connected_components(cells, connectivity=4, tile_shape=(4, 4))
        .toPandas()
        .sort_values(["row", "col"])
    )
    assert (got_driver.label.values == got_dist.label.values).all()
    # the line is one component labeled by its min cell key
    line = got_driver[got_driver.value == 7.0]
    assert line.label.nunique() == 1 and line.label.iloc[0] == (5 << 32) | 0


def test_cc_pairs_nonconvergence_warns(spark):
    """ADVICE: hitting max_iter with changes pending must warn, not
    silently return fragmented labels."""
    from rasterio_spark.operators.dedup import connected_components_pairs

    # path graph 0-1-2-...-9: diameter 9 > max_iter 2
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components_pairs(pairs, max_iter=2, driver_threshold=0).collect()
    assert any("did not converge" in str(x.message) for x in w)
    # enough iterations: no warning, exact labels
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        labels = connected_components_pairs(pairs, max_iter=25, driver_threshold=0).toPandas()
    assert not any("did not converge" in str(x.message) for x in w)
    assert set(labels.label) == {0}

    from rasterio_spark.plans.cache import release_persisted

    release_persisted()


def test_neardup_max_cluster_cap(spark):
    """Verdict item 5: a degenerate hot cluster is dropped before the
    O(cluster^2) self-join; small clusters still pair up."""
    from rasterio_spark.operators.similarity import neardup_pairs

    rows = [(i, 0, [1.0, 0.0]) for i in range(50)]  # hot cluster: 50 vecs
    rows += [(100, 1, [0.0, 1.0]), (101, 1, [0.0, 1.0])]  # small cluster
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    capped = neardup_pairs(emb, tau=0.5, max_cluster=10).toPandas()
    # hot cluster contributes nothing; the small pair survives
    assert len(capped) == 1
    assert (capped.vec_a.iloc[0], capped.vec_b.iloc[0]) == (100, 101)
    uncapped = neardup_pairs(emb, tau=0.5).toPandas()
    assert len(uncapped) == 50 * 49 // 2 + 1


def test_persist_hygiene_released(spark, sf_dir):
    """Verdict item 8: after release_persisted(), the queries leave no
    additional persisted RDDs behind (delta-based: the shared session
    may carry unrelated state from other tests)."""
    from rasterio_spark.operators.dedup import dedup_groups
    from rasterio_spark.operators.shapes import shapes_summary, sieve
    from rasterio_spark.plans.cache import release_persisted
    from rasterio_spark.sources.layers import cells_from_documents

    release_persisted()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dedup_groups(docs, n=3, threshold=0.2, max_bucket=50).count()
    cells = cells_from_documents(spark, sf_dir).withColumn(
        "value", (F.col("value") > 128).cast("double")
    )
    shapes_summary(cells, connectivity=4).count()
    sieve(cells, size=3, connectivity=4).count()
    sieve(cells, size=3, connectivity=4, mode="gdal").count()

    released = release_persisted()
    assert released > 0
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before, f"leaked persisted RDDs: {before} -> {after}"
