"""Rasterize / geometry_mask / mask — vector -> raster as a broadcast
PIP join (SURVEY.md §2.3; reference /root/reference/rasterio/features.py:200-421
+ _features.pyx:302-423).

Semantics mirrored from the reference:
- a cell is burned iff its CENTER is inside the polygon (default), or
  iff the cell is touched at all (``all_touched=True``,
  _features.pyx:367-370);
- lines burn their Bresenham cells; points burn their containing cell;
- ``merge_alg='replace'`` = last shape wins in input order
  (explicit shape_idx ordering, never partition order);
  ``'add'`` = sum of burned values (features.py merge_alg);
- invalid/empty geometries are skipped with a warning
  (features.py:366-377); GeometryCollection / MultiPolygon exploded one
  level (features.py:355-365);
- output dtype inference from values uses grid.dtypes-free minimal rule
  (the engine emits double and lets the writer narrow).

Plan shape: shapes (small, driver-side) -> candidate cells
(sequence+explode over each shape's window — bbox-pruned like
geometry_window, features.py:457-547) -> PIP/touch refine in an
Arrow-batched UDF -> REPLACE/ADD resolution. One narrow explode + one
aggregation; polygon rings travel once via broadcast.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql.types import BooleanType

from rasterio_spark.grid.affine import Affine
from rasterio_spark.grid.geometry import (
    cells_touched_by_polygon,
    explode_geometries,
    geom_bounds,
    is_valid_geom,
    line_cells,
    points_in_rings,
    polygon_rings,
)
from rasterio_spark.grid.transform import rowcol
from rasterio_spark.grid.windows import Window, crop, from_bounds


def _shape_window(geom, transform: Affine, height: int, width: int) -> Window | None:
    """bbox -> cropped candidate window (geometry_window semantics)."""
    left, bottom, right, top = geom_bounds(geom)
    if transform.e < 0:
        w = from_bounds(left, bottom, right, top, transform)
    else:  # south-up
        w = from_bounds(left, top, right, bottom, transform)
    w = crop(Window(w.col_off, w.row_off, w.width + 1e-9, w.height + 1e-9), height, width)
    rs, cs = w.toslices()
    if rs.stop <= rs.start or cs.stop <= cs.start:
        return None
    return w


def rasterize(
    spark: SparkSession,
    shapes: list,
    out_shape: tuple[int, int],
    transform: Affine = Affine.identity(),
    all_touched: bool = False,
    merge_alg: str = "replace",
    fill: float = 0.0,
    skip_invalid: bool = True,
    dense: bool = False,
    per_shape: bool = False,
) -> DataFrame:
    """Burn (geometry, value) pairs into a grid.

    shapes: iterable of geometry dicts or (geometry, value) pairs
    (default value 1.0, like the reference's default_value).
    Returns (row, col, value) for burned cells, or the dense grid with
    ``fill`` when ``dense=True``.

    ``per_shape=True`` skips the REPLACE/ADD resolution and returns the
    raw cover relation (shape_id, row, col, value) — one row per input
    shape per burned cell (multi-part shapes deduplicated) — the input
    zonal_stats and mask-style semi-joins consume.
    """
    height, width = out_shape
    # --- driver-side validation + explode (shapes are the small side) ---
    flat: list[tuple[int, dict, float]] = []  # (shape_idx, geom, value)
    idx = 0
    for item in shapes:
        geom, value = item if isinstance(item, (tuple, list)) else (item, 1.0)
        geom = getattr(geom, "__geo_interface__", None) or geom
        if not is_valid_geom(geom):
            if skip_invalid:
                warnings.warn(f"skipping invalid geometry at index {idx}")
                idx += 1
                continue
            raise ValueError(f"invalid geometry at index {idx}")
        for part in explode_geometries(geom):
            flat.append((idx, part, float(value)))
        idx += 1
    if not flat:
        raise ValueError("no valid geometry objects found for rasterize")

    rows_out: list[pd.DataFrame] = []
    poly_entries = []
    rings_by_sid: dict[int, list[np.ndarray]] = {}
    # sid = exploded-part index in input order; REPLACE orders by it
    # (parts of one shape share a value, so part order == shape order),
    # ADD contributes once per part per cell (GDAL burns per geometry).
    for sid, (shape_idx, geom, value) in enumerate(flat):
        gtype = geom["type"]
        if gtype in ("Point", "MultiPoint"):
            pts = np.atleast_2d(np.asarray(geom["coordinates"], dtype="float64"))[:, :2]
            rr, cc = rowcol(transform, pts[:, 0], pts[:, 1])
            rows_out.append(
                pd.DataFrame(
                    {"shape_idx": sid, "orig_idx": shape_idx, "row": rr, "col": cc, "value": value}
                )
            )
        elif gtype in ("LineString", "MultiLineString", "LinearRing"):
            lines = geom["coordinates"]
            if gtype != "MultiLineString":
                lines = [lines]
            for line in lines:
                pts = np.asarray(line, dtype="float64")[:, :2]
                # to grid coords via reverse transform (fractional)
                cols_f, rows_f = transform.reverse(pts[:, 0], pts[:, 1])
                cells = line_cells(np.stack([cols_f, rows_f], axis=1))
                rows_out.append(
                    pd.DataFrame(
                        {
                            "shape_idx": sid,
                            "orig_idx": shape_idx,
                            "row": cells[:, 0],
                            "col": cells[:, 1],
                            "value": value,
                        }
                    )
                )
        elif gtype == "Polygon":
            win = _shape_window(geom, transform, height, width)
            if win is None:
                continue
            poly_entries.append((sid, shape_idx, value, win))
            # rings in GRID coordinates (so the UDF is transform-free)
            rings = []
            for ring in polygon_rings(geom):
                cols_f, rows_f = transform.reverse(ring[:, 0], ring[:, 1])
                rings.append(np.stack([cols_f, rows_f], axis=1))
            rings_by_sid[sid] = rings
        else:
            warnings.warn(f"geometry type {gtype} not burnable; skipped")

    parts: list[DataFrame] = []

    if poly_entries:
        from rasterio_spark.grid.geometry import FlatPolygons

        flat_bc = spark.sparkContext.broadcast(FlatPolygons(rings_by_sid))
        rings_bc = spark.sparkContext.broadcast(rings_by_sid)
        touch = all_touched

        @F.pandas_udf(BooleanType())
        def burn_test(sid_s: pd.Series, row_s: pd.Series, col_s: pd.Series) -> pd.Series:
            sids = sid_s.values
            rr = row_s.values.astype("float64")
            cc = col_s.values.astype("float64")
            if not touch:
                # center rule: one flat vectorized PIP pass
                return pd.Series(flat_bc.value.contains(sids, cc + 0.5, rr + 0.5))
            by_sid = rings_bc.value
            out = np.zeros(len(sids), dtype=bool)
            for s in pd.unique(sids):
                rings = by_sid.get(s)
                if rings is None:
                    continue
                m = sids == s
                out[m] = cells_touched_by_polygon(rr[m], cc[m], rings)
            return pd.Series(out)

        cand = spark.createDataFrame(
            [
                (sid, orig_idx, value, *[int(v) for s in w.toslices() for v in (s.start, s.stop)])
                for sid, orig_idx, value, w in poly_entries
            ],
            "sid long, orig_idx long, value double, r0 int, r1 int, c0 int, c1 int",
        )
        cand = (
            cand.withColumn("row", F.explode(F.sequence(F.col("r0"), F.col("r1") - 1)))
            .withColumn("col", F.explode(F.sequence(F.col("c0"), F.col("c1") - 1)))
            .where(burn_test(F.col("sid"), F.col("row"), F.col("col")))
            .select(F.col("sid").alias("shape_idx"), "orig_idx", "row", "col", "value")
        )
        parts.append(cand)

    if rows_out:
        pdf = pd.concat(rows_out, ignore_index=True)
        pdf = pdf[(pdf.row >= 0) & (pdf.row < height) & (pdf.col >= 0) & (pdf.col < width)]
        sdf = spark.createDataFrame(
            pdf.astype({"shape_idx": "int64", "orig_idx": "int64", "row": "int64", "col": "int64"})
        )
        parts.append(sdf.select("shape_idx", "orig_idx", "row", "col", "value"))

    burned = parts[0]
    for p in parts[1:]:
        burned = burned.unionByName(p)

    if per_shape:
        # cover relation: dedup multi-part double covers per input shape.
        # When every input shape exploded to a single part (the common
        # case — no MultiPolygon/GeometryCollection), each (shape, row,
        # col) is already unique, so the dedup aggregation (a full
        # Exchange of the cover) is a no-op; skip it (r6, guide §2.4
        # "a distinct on data that is already unique").
        orig_counts: dict[int, int] = {}
        for shape_idx, _, _ in flat:
            orig_counts[shape_idx] = orig_counts.get(shape_idx, 0) + 1
        if all(c == 1 for c in orig_counts.values()):
            return burned.select(
                F.col("orig_idx").alias("shape_id"), "row", "col", "value"
            )
        return burned.groupBy(
            F.col("orig_idx").alias("shape_id"), "row", "col"
        ).agg(F.max("value").alias("value"))

    if merge_alg == "replace":
        w = W.partitionBy("row", "col").orderBy(F.col("shape_idx").desc())
        result = (
            burned.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("row", "col", "value")
        )
    elif merge_alg == "add":
        # ADD sums each shape's contribution once per cell on top of fill
        per_shape = burned.groupBy("shape_idx", "row", "col").agg(F.max("value").alias("value"))
        result = per_shape.groupBy("row", "col").agg((F.sum("value") + F.lit(fill)).alias("value"))
    else:
        raise ValueError(f"unknown merge_alg {merge_alg!r}")

    if dense:
        dom = (
            spark.range(0, height)
            .select(F.col("id").cast("int").alias("row"))
            .withColumn("col", F.explode(F.sequence(F.lit(0), F.lit(width - 1))))
        )
        result = (
            dom.join(result, ["row", "col"], "left")
            .select("row", "col", F.coalesce("value", F.lit(fill)).alias("value"))
        )
    return result


def geometry_mask(
    spark: SparkSession,
    shapes: list,
    out_shape: tuple[int, int],
    transform: Affine = Affine.identity(),
    all_touched: bool = False,
    invert: bool = False,
) -> DataFrame:
    """Boolean mask from shapes (reference features.py:41-85): by default
    cells inside shapes are masked (mask=True means EXCLUDED, like
    numpy masked arrays); invert flips it. Dense (row, col, mask)."""
    burned = rasterize(
        spark, [(s, 1.0) for s in shapes], out_shape, transform, all_touched, "replace", dense=True
    )
    mask_col = (F.col("value") == 0.0) if not invert else (F.col("value") != 0.0)
    # geometry_mask default: True where NOT covered... reference default:
    # mask = ~rasterize(...) i.e. True outside shapes
    return burned.select("row", "col", mask_col.alias("mask"))


def mask_cells(
    cells: DataFrame,
    spark: SparkSession,
    shapes: list,
    transform: Affine,
    out_shape: tuple[int, int],
    invert: bool = False,
    all_touched: bool = False,
    fill_nodata: float | None = None,
) -> DataFrame:
    """rasterio.mask.mask as a spatial semi/anti join: keep cells inside
    shapes (or outside when invert), others -> invalid/nodata
    (reference rasterio/mask.py:15-230)."""
    burned = rasterize(
        spark, [(s, 1.0) for s in shapes], out_shape, transform, all_touched, "replace"
    ).select("row", "col")
    how = "left_semi" if not invert else "left_anti"
    kept = cells.join(burned, ["row", "col"], how)
    if fill_nodata is None:
        return kept
    # full-extent variant: unkept cells carry nodata + invalid
    anti = cells.join(burned, ["row", "col"], "left_anti" if not invert else "left_semi")
    filled = anti.select(
        "band", "row", "col", F.lit(fill_nodata).alias("value"), F.lit(False).alias("valid")
    )
    return kept.select("band", "row", "col", "value", "valid").unionByName(filled)
