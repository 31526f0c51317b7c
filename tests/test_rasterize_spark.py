"""Rasterize operator vs the reference's conftest golden arrays
(reference tests/conftest.py:285-375, tests/test_features.py rasterize
suite): center-rule 2x2, all_touched 3x3, merge_alg add, points, lines,
multipolygon/geomcollection explode, invalid-shape skipping."""

import numpy as np
import pytest

from rasterio_spark.grid.affine import Affine
from rasterio_spark.operators.rasterize import geometry_mask, mask_cells, rasterize

BASIC_GEOMETRY = {
    "type": "Polygon",
    "coordinates": [[(2, 2), (2, 4.25), (4.25, 4.25), (4.25, 2), (2, 2)]],
}
SHAPE = (10, 10)


def to_array(df, shape=SHAPE, fill=0.0):
    arr = np.full(shape, fill)
    for r in df.collect():
        arr[r["row"], r["col"]] = r["value"]
    return arr


def test_rasterize_center_rule_2x2(spark):
    """basic_image_2x2: center-inside marks exactly [2:4, 2:4]
    (conftest.py:304-320)."""
    arr = to_array(rasterize(spark, [BASIC_GEOMETRY], SHAPE))
    expected = np.zeros(SHAPE)
    expected[2:4, 2:4] = 1.0
    np.testing.assert_array_equal(arr, expected)


def test_rasterize_all_touched_3x3(spark):
    """basic_image: all_touched marks [2:5, 2:5] (conftest.py:285-301)."""
    arr = to_array(rasterize(spark, [BASIC_GEOMETRY], SHAPE, all_touched=True))
    expected = np.zeros(SHAPE)
    expected[2:5, 2:5] = 1.0
    np.testing.assert_array_equal(arr, expected)


def test_rasterize_value_and_replace(spark):
    """Later shapes win under replace (features.py REPLACE)."""
    s1 = {"type": "Polygon", "coordinates": [[(1, 1), (1, 5), (5, 5), (5, 1), (1, 1)]]}
    s2 = {"type": "Polygon", "coordinates": [[(3, 3), (3, 7), (7, 7), (7, 3), (3, 3)]]}
    arr = to_array(rasterize(spark, [(s1, 5.0), (s2, 9.0)], SHAPE))
    assert arr[2, 2] == 5.0
    assert arr[4, 4] == 9.0  # overlap: last wins
    assert arr[6, 6] == 9.0


def test_rasterize_merge_alg_add(spark):
    """basic_image_2x2x2: same square burned twice with add -> 2
    (conftest.py:323-340)."""
    square = {"type": "Polygon", "coordinates": [[(2, 2), (2, 4.25), (4.25, 4.25), (4.25, 2), (2, 2)]]}
    arr = to_array(rasterize(spark, [(square, 1.0), (square, 1.0)], SHAPE, merge_alg="add"))
    expected = np.zeros(SHAPE)
    expected[2:4, 2:4] = 2.0
    np.testing.assert_array_equal(arr, expected)


def test_rasterize_point_and_multipoint(spark):
    pt = {"type": "Point", "coordinates": (2, 2)}
    mpt = {"type": "MultiPoint", "coordinates": [(5, 5), (7, 7)]}
    arr = to_array(rasterize(spark, [(pt, 3.0), (mpt, 4.0)], SHAPE))
    assert arr[2, 2] == 3.0 and arr[5, 5] == 4.0 and arr[7, 7] == 4.0
    assert arr.sum() == 11.0


def test_rasterize_line_diagonal(spark):
    """geojson_line (2,2)->(4,4) burns the diagonal cells
    (conftest.py:173-183 + diagonal_image:362-375)."""
    line = {"type": "LineString", "coordinates": [(2, 2), (4, 4)]}
    arr = to_array(rasterize(spark, [line], SHAPE))
    assert arr[2, 2] == 1.0 and arr[3, 3] == 1.0 and arr[4, 4] == 1.0
    assert arr.sum() == 3.0


def test_rasterize_multipolygon_explode(spark):
    mp = {
        "type": "MultiPolygon",
        "coordinates": [
            [[(2, 2), (2, 4.25), (4.25, 4.25), (4.25, 2), (2, 2)]],
            [[(0, 0), (0, 1.5), (1.5, 1.5), (1.5, 0), (0, 0)]],
        ],
    }
    arr = to_array(rasterize(spark, [mp], SHAPE))
    assert arr[2:4, 2:4].sum() == 4.0
    assert arr[0, 0] == 1.0


def test_rasterize_skips_invalid(spark):
    bad = {"type": "Polygon", "coordinates": [[(0, 0), (0, 1), (1, 1)]]}
    with pytest.warns(UserWarning):
        arr = to_array(rasterize(spark, [bad, BASIC_GEOMETRY], SHAPE))
    assert arr[2:4, 2:4].sum() == 4.0
    with pytest.raises(ValueError):
        rasterize(spark, [bad], SHAPE, skip_invalid=False)


def test_rasterize_all_invalid_raises(spark):
    with pytest.raises(ValueError):
        with pytest.warns(UserWarning):
            rasterize(spark, [{"type": "Polygon", "coordinates": [[]]}], SHAPE)


def test_geometry_mask_default_and_invert(spark):
    mask = {(r["row"], r["col"]): r["mask"] for r in geometry_mask(spark, [BASIC_GEOMETRY], SHAPE).collect()}
    assert mask[(2, 2)] is False  # inside shapes -> unmasked=False means excluded? see reference
    assert mask[(0, 0)] is True
    inv = {(r["row"], r["col"]): r["mask"] for r in geometry_mask(spark, [BASIC_GEOMETRY], SHAPE, invert=True).collect()}
    assert inv[(2, 2)] is True and inv[(0, 0)] is False


def test_mask_cells_semi_and_anti(spark):
    from pyspark.sql import functions as F

    cells = (
        spark.range(0, 100)
        .select(
            F.lit(1).alias("band"),
            F.expr("CAST(id DIV 10 AS INT)").alias("row"),
            (F.col("id") % 10).cast("int").alias("col"),
            (F.col("id") % 7).cast("double").alias("value"),
            F.lit(True).alias("valid"),
        )
    )
    kept = mask_cells(cells, spark, [BASIC_GEOMETRY], Affine.identity(), SHAPE)
    coords = {(r["row"], r["col"]) for r in kept.collect()}
    assert coords == {(2, 2), (2, 3), (3, 2), (3, 3)}
    inv = mask_cells(cells, spark, [BASIC_GEOMETRY], Affine.identity(), SHAPE, invert=True)
    assert inv.count() == 96
    filled = mask_cells(
        cells, spark, [BASIC_GEOMETRY], Affine.identity(), SHAPE, fill_nodata=0.0
    )
    assert filled.count() == 100
    invalid = filled.where("NOT valid")
    assert invalid.count() == 96


def test_rasterize_per_shape_dedup_skip_equivalence(spark):
    """r6 pin: per_shape skips the dedup aggregation only when every
    shape is single-part; the skip path must equal the aggregated form,
    and multi-part double covers must still come out deduplicated."""
    from pyspark.sql import functions as F

    # single-part list -> skip path fires; compare against the generic
    # aggregated form computed from the same cover relation
    singles = [(BASIC_GEOMETRY, 2.0), ({"type": "Polygon",
        "coordinates": [[(5, 5), (5, 8.25), (8.25, 8.25), (8.25, 5), (5, 5)]]}, 3.0)]
    skip = rasterize(spark, singles, SHAPE, per_shape=True)
    agg = (
        skip.groupBy("shape_id", "row", "col")
        .agg(F.max("value").alias("value"))
    )
    got = {tuple(r) for r in skip.collect()}
    want = {tuple(r) for r in agg.collect()}
    assert got == want
    assert len(got) == len({(r[0], r[1], r[2]) for r in got})  # unique keys

    # multi-part shape whose parts OVERLAP -> double cover must dedup
    mp = {
        "type": "MultiPolygon",
        "coordinates": [
            [[(2, 2), (2, 4.25), (4.25, 4.25), (4.25, 2), (2, 2)]],
            [[(3, 3), (3, 6.25), (6.25, 6.25), (6.25, 3), (3, 3)]],  # overlaps (3,3)
        ],
    }
    cover = rasterize(spark, [(mp, 1.0)], SHAPE, per_shape=True).collect()
    keys = [(r["shape_id"], r["row"], r["col"]) for r in cover]
    assert len(keys) == len(set(keys))  # (3,3) burned by both parts, one row out
    assert (0, 3, 3) in set(keys)
