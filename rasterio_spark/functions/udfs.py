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


def make_pip_udf(flat_bcast):
    """Point-in-polygon refine: (polygon_id, x, y) -> bool.

    ``flat_bcast`` is a SparkContext.broadcast of a
    geometry.FlatPolygons (all rings concatenated). The whole batch is
    ray-cast in ONE flat vectorized pass — no per-polygon Python loop —
    the residual filter of the filter-and-refine join (SURVEY.md §2.3).
    """

    @F.pandas_udf(BooleanType())
    def pip(polygon_id: pd.Series, x: pd.Series, y: pd.Series, interior: pd.Series) -> pd.Series:
        flat = flat_bcast.value
        known = interior.values.astype(bool)
        out = known.copy()  # interior cells are inside by construction
        m = ~known
        if m.any():
            out[m] = flat.contains(
                polygon_id.values[m],
                x.values[m].astype("float64"),
                y.values[m].astype("float64"),
            )
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
