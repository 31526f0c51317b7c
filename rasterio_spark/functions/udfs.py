"""Vectorized pandas/Arrow UDFs — the only places Python touches rows.

Every UDF here is Arrow-batched and internally pure NumPy (input_hint:
"no per-row Python"). Broadcast variables carry the small spatial
structures (polygon rings, R-tree) to executors once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, IntegerType, StructField, StructType

from rasterio_spark.grid.affine import Affine
from rasterio_spark.grid.geometry import points_in_rings


def make_pip_udf(rings_bcast):
    """Point-in-polygon refine: (polygon_id, x, y) -> bool.

    ``rings_bcast`` is a SparkContext.broadcast of
    {polygon_id: [ring ndarray, ...]}. Batches are grouped by polygon id
    and ray-cast in one vectorized pass per group — the residual filter
    of the filter-and-refine join (SURVEY.md §2.3).
    """

    @F.pandas_udf(BooleanType())
    def pip(polygon_id: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        rings_by_id = rings_bcast.value
        out = np.zeros(len(polygon_id), dtype=bool)
        pid = polygon_id.values
        xs = x.values.astype("float64")
        ys = y.values.astype("float64")
        for p in pd.unique(pid):
            rings = rings_by_id.get(p)
            if rings is None:
                continue
            m = pid == p
            out[m] = points_in_rings(xs[m], ys[m], rings)
        return pd.Series(out)

    return pip


def make_rowcol_udf(transform: Affine):
    """Generic (possibly rotated) affine (x, y) -> (row, col) via the
    linear-solve reverse path (grid.transform.rowcol_arrays). For
    axis-aligned transforms prefer functions.cell_exprs.affine_rowcol_cols
    (pure JVM)."""
    from rasterio_spark.grid.transform import rowcol_arrays

    schema = StructType(
        [StructField("row", IntegerType()), StructField("col", IntegerType())]
    )

    @F.pandas_udf(schema)
    def rowcol(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        rows, cols = rowcol_arrays(transform, x.values, y.values)
        return pd.DataFrame({"row": rows, "col": cols})

    return rowcol
