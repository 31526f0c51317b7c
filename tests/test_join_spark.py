"""Spatial join operators: pip_join strategy equivalence + rect oracle,
kNN vs brute force, sample_points, asof_latest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasterio_spark.grid.affine import Affine
from rasterio_spark.operators.join import asof_latest, knn_join, pip_join, sample_points
from rasterio_spark.sources.pages import pages_from_documents, with_geocode
from rasterio_spark.sources.polygons import RECTS, rect_polygons, synth_polygons


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return pages_from_documents(spark, sf_dir)


def test_pip_join_rects_matches_range_predicate(spark, pages):
    """Engine PIP (generic machinery) over rectangles == closed-open
    range predicate (the SQL oracle's form)."""
    got = (
        pip_join(pages, rect_polygons())
        .select("url", "polygon_id")
        .collect()
    )
    got_set = {(r["url"], r["polygon_id"]) for r in got}

    geo = with_geocode(pages).select("url", "lon", "lat").collect()
    expected = set()
    for r in geo:
        for pid, x0, y0, x1, y1 in RECTS:
            if x0 <= r["lon"] < x1 and y0 <= r["lat"] < y1:
                expected.add((r["url"], pid))
    assert got_set == expected
    assert len(got) == len(got_set)  # no duplicate pairs


def test_pip_join_strategies_agree(spark, pages):
    polys = rect_polygons()
    base = {
        (r["url"], r["polygon_id"])
        for r in pip_join(pages, polys, strategy="broadcast").select("url", "polygon_id").collect()
    }
    for strategy in ("sort_merge", "rtree"):
        got = {
            (r["url"], r["polygon_id"])
            for r in pip_join(pages, polys, strategy=strategy).select("url", "polygon_id").collect()
        }
        assert got == base, strategy
    salted = {
        (r["url"], r["polygon_id"])
        for r in pip_join(pages, polys, salt_buckets=8).select("url", "polygon_id").collect()
    }
    assert salted == base


def test_pip_join_generic_polygons(spark, pages):
    """Generic convex polygons: engine == pure-NumPy oracle."""
    polys = [p for p in synth_polygons(n=30) if p["polygon_id"] < 30]
    with pytest.warns(UserWarning):
        # layer with degenerate shapes warns + skips them
        all_polys = synth_polygons(n=30)
        got = {
            (r["url"], r["polygon_id"])
            for r in pip_join(pages, all_polys).select("url", "polygon_id").collect()
        }

    from rasterio_spark.grid.geometry import points_in_rings, polygon_rings

    geo = with_geocode(pages).select("url", "lon", "lat").toPandas()
    expected = set()
    for p in all_polys:
        from rasterio_spark.grid.geometry import is_valid_geom

        if not is_valid_geom(p["geom"]):
            continue
        inside = points_in_rings(geo.lon.values, geo.lat.values, polygon_rings(p["geom"]))
        for u in geo.url.values[inside]:
            expected.add((u, p["polygon_id"]))
    assert got == expected


def test_knn_matches_bruteforce(spark, pages):
    queries = [(0, 10.0, 10.0), (1, -170.0, 80.0), (2, 100.5, 40.5)]
    k = 5
    got = knn_join(pages, queries, k=k).toPandas()

    geo = with_geocode(pages).select("url", "lon", "lat").toPandas()
    for qid, qlon, qlat in queries:
        d2 = (geo.lon.values - qlon) ** 2 + (geo.lat.values - qlat) ** 2
        order = sorted(zip(d2, geo.url.values))[:k]
        expect_urls = [u for _, u in order]
        got_q = got[got.query_id == qid].sort_values("rank")
        assert got_q.url.tolist() == expect_urls, qid
        np.testing.assert_allclose(got_q.dist2.values, [d for d, _ in order], rtol=0, atol=0)


def test_sample_points(spark):
    cells = spark.range(0, 100).select(
        F.lit(1).alias("band"),
        F.expr("CAST(id DIV 10 AS INT)").alias("row"),
        (F.col("id") % 10).cast("int").alias("col"),
        F.col("id").cast("double").alias("value"),
        (F.col("id") % 10 != 9).alias("valid"),
    )
    t = Affine.identity()
    pts = [(0, 2.5, 3.5), (1, 0.0, 0.0), (2, 99.0, 99.0), (3, 9.5, 0.5)]
    got = {r["pt_id"]: r["value"] for r in sample_points(cells, pts, t, nodata=-1.0).collect()}
    assert got[0] == 32.0  # row 3, col 2
    assert got[1] == 0.0
    assert got[2] == -1.0  # out of bounds -> nodata
    assert got[3] == -1.0  # invalid cell (col 9) -> nodata


def test_asof_latest(spark, pages):
    got = asof_latest(pages).toPandas()
    assert got.cell_id.is_unique
    # spot-check one cell against a window-free computation
    from rasterio_spark.operators.tile import tile_pages

    tiled = tile_pages(pages).select("cell_id", "url", "warc_ts").toPandas()
    cell = got.cell_id.iloc[0]
    grp = tiled[tiled.cell_id == cell].sort_values(["warc_ts", "url"], ascending=False)
    assert got[got.cell_id == cell].url.iloc[0] == grp.url.iloc[0]
