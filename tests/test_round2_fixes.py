"""Round-2 regression tests for the ADVICE findings:

1. multiband reproject (bilinear cross-band mixing, average dropping
   bands >= 2);
2. pip_join layer-cache key must include geometry;
3. merge_sources mixed-resolution sources are nearest-resampled onto
   the output grid (reference merge.py:488-494 out_shape read);
4. knn planar metric / non-wrapped expansion near the antimeridian;
5. sieve mode='gdal': iterative largest-neighbor merge (clusters of
   adjacent small regions that jointly exceed the threshold DO merge).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasterio_spark.grid.affine import Affine


def _two_band_cells(spark, size=8, v1=10.0, v2=100.0):
    rows = []
    for b, v in ((1, v1), (2, v2)):
        for r in range(size):
            for c in range(size):
                rows.append((b, r, c, v, True))
    return spark.createDataFrame(
        rows, "band int, row int, col int, value double, valid boolean"
    )


def test_reproject_bilinear_multiband_no_cross_mix(spark):
    """Constant 10.0 band-1 / 100.0 band-2 input must reproject to
    exactly those constants per band (the r1 bug returned 55.0)."""
    from rasterio_spark.operators.warp import reproject

    cells = _two_band_cells(spark)
    out = reproject(
        cells,
        src_transform=Affine.identity(),
        src_crs="EPSG:4326",
        dst_transform=Affine(2.0, 0.0, 0.0, 0.0, 2.0, 0.0),
        dst_crs="EPSG:4326",
        dst_width=4,
        dst_height=4,
        resampling="bilinear",
        src_nodata=0.0,
    ).toPandas()
    assert set(out["band"]) == {1, 2}
    b1 = out[out["band"] == 1]
    b2 = out[out["band"] == 2]
    assert len(b1) == 16 and len(b2) == 16
    assert (b1["value"] == 10.0).all(), b1
    assert (b2["value"] == 100.0).all(), b2


def test_reproject_average_multiband_keeps_band2(spark):
    from rasterio_spark.operators.warp import reproject

    cells = _two_band_cells(spark)
    out = reproject(
        cells,
        src_transform=Affine.identity(),
        src_crs="EPSG:4326",
        dst_transform=Affine(2.0, 0.0, 0.0, 0.0, 2.0, 0.0),
        dst_crs="EPSG:4326",
        dst_width=4,
        dst_height=4,
        resampling="average",
        src_nodata=0.0,
    ).toPandas()
    b2 = out[out["band"] == 2]
    assert len(b2) == 16
    assert (b2["value"] == 100.0).all()


def test_reproject_nearest_multiband(spark):
    from rasterio_spark.operators.warp import reproject

    cells = _two_band_cells(spark)
    out = reproject(
        cells,
        src_transform=Affine.identity(),
        src_crs="EPSG:4326",
        dst_transform=Affine(2.0, 0.0, 0.0, 0.0, 2.0, 0.0),
        dst_crs="EPSG:4326",
        dst_width=4,
        dst_height=4,
        resampling="nearest",
        src_nodata=0.0,
    ).toPandas()
    assert len(out) == 32  # 16 cells x 2 bands
    assert (out[out["band"] == 2]["value"] == 100.0).all()


def _pages_at(spark, pts):
    """Minimal pages table already carrying lon/lat via geocode bypass:
    build urls only; the pip path geocodes with sha2 — so instead test
    via the layer-cache directly."""
    return None


def test_layer_cache_distinguishes_geometry(spark):
    """Two layers with identical ids/values but different rings must
    produce different cache entries (r1: silent stale-broadcast reuse)."""
    from rasterio_spark.operators.join import _LAYER_CACHE, _layer_index

    def layer(x1):
        return [
            {
                "polygon_id": 0,
                "geom": {
                    "type": "Polygon",
                    "coordinates": [[(0, 0), (0, 10), (x1, 10), (x1, 0), (0, 0)]],
                },
                "value": 1.0,
            }
        ]

    before = len(_LAYER_CACHE)
    _layer_index(spark, layer(10.0), cover_res=6)
    mid = len(_LAYER_CACHE)
    _layer_index(spark, layer(20.0), cover_res=6)
    after = len(_LAYER_CACHE)
    assert mid == before + 1
    assert after == mid + 1  # different geometry -> new entry


def test_merge_sources_mixed_resolution(spark):
    """A 0.5-res source composited onto a 1.0-res output grid must be
    nearest-resampled (each output cell takes the src cell containing
    its center), not placed by integer offset."""
    from rasterio_spark.operators.merge import merge_sources
    from rasterio_spark.sources.layers import LayerDescriptor

    # coarse source: 4x4 grid at res 1.0 covering [0,4]x[0,4], value 1
    coarse_desc = LayerDescriptor(
        width=4, height=4, count=1, dtype="float64", crs="EPSG:4326",
        transform=Affine(1.0, 0.0, 0.0, 0.0, -1.0, 4.0), nodata=0.0,
    )
    coarse = spark.createDataFrame(
        [(1, r, c, 1.0, True) for r in range(4) for c in range(4)],
        "band int, row int, col int, value double, valid boolean",
    )
    # fine source: 4x4 grid at res 0.5 covering [2,4]x[2,4], value = row*10+col
    fine_desc = LayerDescriptor(
        width=4, height=4, count=1, dtype="float64", crs="EPSG:4326",
        transform=Affine(0.5, 0.0, 2.0, 0.0, -0.5, 4.0), nodata=0.0,
    )
    fine = spark.createDataFrame(
        [(1, r, c, float(r * 10 + c), True) for r in range(4) for c in range(4)],
        "band int, row int, col int, value double, valid boolean",
    )
    # output grid = coarse grid (res 1.0); method=last -> fine wins on overlap
    out = merge_sources(
        [(coarse_desc, coarse), (fine_desc, fine)], method="last", dense=True
    ).toPandas()
    got = {(int(r.row), int(r.col)): r.value for r in out.itertuples()}
    # output cell (0,2) center = (2.5, 3.5) -> fine cell row=1? no:
    # fine row = floor((3.5 - 4.0) / -0.5) = 1, col = floor((2.5-2)/0.5) = 1
    assert got[(0, 2)] == 11.0
    # output cell (1,3) center = (3.5, 2.5) -> fine row=3, col=3 -> 33
    assert got[(1, 3)] == 33.0
    # non-overlapped cells keep the coarse value
    assert got[(2, 0)] == 1.0
    assert got[(3, 1)] == 1.0


def test_knn_planar_near_antimeridian(spark):
    """A query near lon=-170 must rank by PLANAR distance: pages at
    lon=+170 are ~340 degrees away, not 20 — expansion must not wrap."""
    from rasterio_spark.operators.join import knn_join

    # synthetic pages: cluster of 3 near (+170, 0), 3 sparser near (-150, 0)
    pts = [(-150.0 + i * 0.5, 0.0) for i in range(3)] + [
        (170.0 + i * 0.1, 0.0) for i in range(3)
    ]
    rows = [(f"u{i}", x, y) for i, (x, y) in enumerate(pts)]
    pages = spark.createDataFrame(rows, "url string, plon double, plat double")
    # knn_join geocodes from url; instead check the metric directly via
    # cells.ring wrap=False behavior + brute-force comparison
    from rasterio_spark.grid import cells as C

    r, c = C.rowcol_of(-179.0, 0.0, 7)
    ring_wrapped = C.ring(int(r), int(c), 3, 7, wrap=True)
    ring_planar = C.ring(int(r), int(c), 3, 7, wrap=False)
    ny, nx = C.grid_shape(7)
    assert (ring_wrapped[:, 1] >= nx - 10).any()  # wraps to far east
    assert (ring_planar[:, 1] <= 10).all()  # clipped, no far-side cells


def test_sieve_gdal_merges_small_cluster(spark):
    """Two adjacent small regions (values 1 and 2, each 2 cells) inside
    a big value-0 sea, threshold 5: longest_border keeps them (no >=5
    neighbor among themselves... they do have the big sea neighbor), but
    GDAL mode merges them into the sea step by step."""
    from rasterio_spark.operators.shapes import _sieve_region_graph, sieve

    # region graph unit test: A(val 1, n=2) - B(val 2, n=2), both adjacent
    # to SEA(val 0, n=50), threshold 5
    regions = {10: (0.0, 50), 20: (1.0, 2), 30: (2.0, 2)}
    edges = [(10, 20), (10, 30), (20, 30)]
    root_of, val = _sieve_region_graph(regions, edges, 5)
    assert root_of[20] == 10 and root_of[30] == 10
    assert val[10] == 0.0

    # end-to-end: 8x8 sea of 0 with a 2x1 island of 1 and adjacent 2x1 of 2
    rows = []
    for r in range(8):
        for c in range(8):
            v = 0.0
            if r == 3 and c in (3, 4):
                v = 1.0
            if r == 4 and c in (3, 4):
                v = 2.0
            rows.append((1, r, c, v, True))
    cells = spark.createDataFrame(
        rows, "band int, row int, col int, value double, valid boolean"
    )
    out = sieve(cells, size=5, connectivity=4, mode="gdal").toPandas()
    assert (out["value"] == 0.0).all()  # everything merged into the sea

    # longest_border mode: islands each have the sea as their only >=5
    # neighbor -> also replaced; use a jointly-big cluster to see the
    # documented divergence: threshold 3, each island is 2 cells
    out2 = sieve(cells, size=3, connectivity=4, mode="longest_border").toPandas()
    got2 = {(int(r.row), int(r.col)): r.value for r in out2.itertuples()}
    assert got2[(3, 3)] == 0.0  # small islands -> sea value under both rules


def test_pip_probe_strategy_equivalent(spark, sf_dir):
    """strategy='probe' (worker-resident cover, literal prefilter) must
    emit exactly the broadcast strategy's (url, polygon_id) pairs."""
    from rasterio_spark.operators.join import pip_join
    from rasterio_spark.sources.pages import pages_from_documents
    from rasterio_spark.sources.polygons import rect_polygons

    pages = pages_from_documents(spark, sf_dir)
    cols = ["url", "polygon_id", "poly_value"]
    a = sorted(pip_join(pages, rect_polygons(), strategy="broadcast").select(*cols).collect())
    b = sorted(pip_join(pages, rect_polygons(), strategy="probe").select(*cols).collect())
    assert a == b and len(a) > 0
