"""focal_filter: distributed map-algebra convolution — engine ==
independent numpy correlation == DuckDB twin (test-level oracle; the
driver registry is at its 50-query cap)."""

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F


LAPLACIAN = [[0, 1, 0], [1, -4, 1], [0, 1, 0]]
BOX = [[1, 1, 1], [1, 1, 1], [1, 1, 1]]
SOBEL_X = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]  # asymmetric: pins orientation


def _grid(spark, arr, valid_mask=None):
    h, w = arr.shape
    rows = [
        (1, r, c, float(arr[r, c]), bool(valid_mask[r, c]) if valid_mask is not None else True)
        for r in range(h)
        for c in range(w)
    ]
    return spark.createDataFrame(rows, "band int, row int, col int, value double, valid boolean")


def _numpy_focal(arr, valid, kernel, normalize):
    """Independent gather-rule reference: out(r,c) = sum k[i][j] *
    v(r+i-cy, c+j-cx) over valid in-bounds contributors."""
    k = np.asarray(kernel, dtype="float64")
    kh, kw = k.shape
    cy, cx = kh // 2, kw // 2
    h, w = arr.shape
    out = {}
    for r in range(-cy, h + cy):
        for c in range(-cx, w + cx):
            s = wsum = 0.0
            any_hit = False
            for i in range(kh):
                for j in range(kw):
                    if k[i, j] == 0.0:
                        continue
                    rr, cc = r + i - cy, c + j - cx
                    if 0 <= rr < h and 0 <= cc < w and valid[rr, cc]:
                        s += k[i, j] * arr[rr, cc]
                        wsum += k[i, j]
                        any_hit = True
            if any_hit:
                out[(r, c)] = round(s / wsum if normalize else s, 6)
    return out


@pytest.mark.parametrize(
    "kernel,normalize",
    [(LAPLACIAN, False), (BOX, True), (SOBEL_X, False)],
)
def test_focal_filter_matches_numpy_and_duckdb(spark, kernel, normalize):
    from rasterio_spark.operators.fill import focal_filter, focal_filter_sql

    rng = np.random.RandomState(8)
    arr = rng.randint(0, 50, (9, 9)).astype(float)
    valid = rng.rand(9, 9) > 0.2  # holes exercise the valid-only rule
    cells = _grid(spark, arr, valid)

    got = {
        (r["row"], r["col"]): r["value"]
        for r in focal_filter(cells, kernel, normalize=normalize).collect()
    }
    exp = _numpy_focal(arr, valid, kernel, normalize)
    assert set(got) == set(exp)
    for key in exp:
        assert abs(got[key] - exp[key]) < 1e-9, (key, got[key], exp[key])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW cells AS "
        + " UNION ALL ".join(
            f"SELECT 1 AS band, {r} AS row, {c} AS col, "
            f"{float(arr[r, c])!r} AS value, {bool(valid[r, c])} AS valid"
            for r in range(9)
            for c in range(9)
        )
    )
    ora = {
        (r[1], r[2]): r[3]
        for r in con.execute(focal_filter_sql(kernel, normalize=normalize)).fetchall()
    }
    assert ora == {k: v for k, v in got.items()}


def test_focal_filter_rejects_ragged_kernel(spark):
    from rasterio_spark.operators.fill import focal_filter

    cells = _grid(spark, np.zeros((2, 2)))
    with pytest.raises(ValueError, match="rectangular"):
        focal_filter(cells, [[1, 2], [3]])
