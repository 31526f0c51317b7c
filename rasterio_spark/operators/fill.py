"""fillnodata — IDW interpolation into invalid cells
(SURVEY.md §2.9; reference /root/reference/rasterio/fill.py:11-74 wrapping
GDALFillNodata: inverse-distance-weighted values from valid pixels
within ``max_search_distance``, then ``smoothing_iterations`` 3x3 mean
passes over the filled cells).

Engine form: the neighbor gather is a bounded stencil join — invalid
cells explode a (2d+1)^2 offset stencil (minus origin) and equi-join
valid cells; IDW weights 1/euclidean(offset). Smoothing is the same
3x3 stencil join applied to filled cells. Aggregates round to 6
decimals (summation-order noise).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stencil(spark, d: int, include_origin: bool = False):
    rows = []
    for dr in range(-d, d + 1):
        for dc in range(-d, d + 1):
            if not include_origin and dr == 0 and dc == 0:
                continue
            rows.append((dr, dc, 1.0 / math.hypot(dr, dc) if (dr or dc) else 1.0))
    return spark.createDataFrame(rows, "dr int, dc int, w double")


def fillnodata(
    cells: DataFrame,
    max_search_distance: int = 4,
    smoothing_iterations: int = 0,
) -> DataFrame:
    """Fill invalid cells from valid neighbors within the search
    distance (Chebyshev stencil, IDW weights); cells with no valid
    neighbor stay invalid. Returns the full cell set."""
    spark = cells.sparkSession
    sten = _stencil(spark, max_search_distance)
    invalid = cells.where(~F.col("valid")).select("band", "row", "col")
    valid = cells.where(F.col("valid")).select(
        "band", F.col("row").alias("vrow"), F.col("col").alias("vcol"), F.col("value").alias("vval")
    )
    probes = invalid.crossJoin(F.broadcast(sten)).select(
        "band",
        "row",
        "col",
        (F.col("row") + F.col("dr")).alias("vrow"),
        (F.col("col") + F.col("dc")).alias("vcol"),
        "w",
    )
    gathered = probes.join(valid, ["band", "vrow", "vcol"])
    filled = gathered.groupBy("band", "row", "col").agg(
        F.round(F.sum(F.col("w") * F.col("vval")) / F.sum("w"), 6).alias("value")
    )
    out = (
        cells.join(filled.withColumnRenamed("value", "_fv"), ["band", "row", "col"], "left")
        .select(
            "band",
            "row",
            "col",
            F.when(F.col("valid"), F.col("value")).otherwise(F.col("_fv")).alias("value"),
            (F.col("valid") | F.col("_fv").isNotNull()).alias("valid"),
        )
    )
    for _ in range(smoothing_iterations):
        out = _smooth3x3(out)
    return out


def _smooth3x3(cells: DataFrame) -> DataFrame:
    """One 3x3 mean pass over valid cells (GDALFillNodata smoothing)."""
    spark = cells.sparkSession
    sten = _stencil(spark, 1, include_origin=True)
    valid = cells.where(F.col("valid")).select(
        "band", F.col("row").alias("vrow"), F.col("col").alias("vcol"), F.col("value").alias("vval")
    )
    probes = cells.where(F.col("valid")).select("band", "row", "col").crossJoin(
        F.broadcast(sten)
    ).select(
        "band", "row", "col", (F.col("row") + F.col("dr")).alias("vrow"), (F.col("col") + F.col("dc")).alias("vcol")
    )
    sm = probes.join(valid, ["band", "vrow", "vcol"]).groupBy("band", "row", "col").agg(
        F.round(F.avg("vval"), 6).alias("_sv")
    )
    return (
        cells.join(sm, ["band", "row", "col"], "left")
        .select(
            "band",
            "row",
            "col",
            F.when(F.col("valid"), F.coalesce("_sv", "value")).otherwise(F.col("value")).alias("value"),
            "valid",
        )
    )


def fillnodata_sql(max_search_distance: int = 4, cells_cte: str = "cells") -> str:
    """DuckDB oracle twin (no smoothing). Emits CTE-continuation form:
    prepend 'WITH <cells_cte> AS (...),' (see __spark_entry__)."""
    d = max_search_distance
    return f"""
        sten AS (
          SELECT r.range AS dr, c2.range AS dc,
                 1.0 / sqrt(r.range * r.range + c2.range * c2.range) AS w
          FROM range(-{d}, {d + 1}) r, range(-{d}, {d + 1}) c2
          WHERE NOT (r.range = 0 AND c2.range = 0)
        ),
        filled AS (
          SELECT i.band, i.row, i.col,
                 round(sum(s.w * v.value) / sum(s.w), 6) AS fv
          FROM {cells_cte} i
          CROSS JOIN sten s
          JOIN {cells_cte} v
            ON v.band = i.band AND v.valid
           AND v.row = i.row + s.dr AND v.col = i.col + s.dc
          WHERE NOT i.valid
          GROUP BY 1, 2, 3
        )
        SELECT c.band, c.row, c.col,
               CASE WHEN c.valid THEN c.value ELSE f.fv END AS value,
               (c.valid OR f.fv IS NOT NULL) AS valid
        FROM {cells_cte} c LEFT JOIN filled f
          ON f.band = c.band AND f.row = c.row AND f.col = c.col
    """


def focal_filter(
    cells: DataFrame,
    kernel: list,
    normalize: bool = False,
) -> DataFrame:
    """Generic distributed focal (map-algebra) convolution: the output
    cell at (r, c) is sum(kernel[i][j] * value[r+i-cy, c+j-cx]) over
    the kernel footprint, valid contributors only.

    ``normalize=False``: raw weighted sum (missing/invalid neighbors
    contribute 0) — the right semantics for difference kernels
    (laplacian, sobel). ``normalize=True``: divide by the sum of
    weights of the VALID contributors — the edge-renormalization rule
    the warp kernels use (GDAL warper nodata convention), right for
    smoothing kernels (box, gaussian).

    Plan: each valid cell scatters its k*k weighted contributions
    (one explode over a literal offset/weight array — no join against
    a stencil table), then ONE groupBy (band, row, col) reduces them.
    Shuffle volume is k^2 * cells with map-side partial aggregation;
    zero Python. Output rows exist wherever any contributor landed;
    valid mirrors contributor presence.
    """
    k = [[float(w) for w in row] for row in kernel]
    kh, kw = len(k), len(k[0])
    if any(len(r) != kw for r in k):
        raise ValueError("kernel must be rectangular")
    cy, cx = kh // 2, kw // 2
    # scatter form of the GATHER rule out(r,c) = sum k[i][j] *
    # v(r+i-cy, c+j-cx): the source cell at (r+i-cy, ...) contributes
    # to (r, c), so its scatter offset is the NEGATED kernel offset
    # (matters for asymmetric kernels like sobel)
    contribs = [
        (cy - i, cx - j, k[i][j])
        for i in range(kh)
        for j in range(kw)
        if k[i][j] != 0.0
    ]
    offs = F.array(
        *[
            F.struct(
                F.lit(dr).alias("dr"), F.lit(dc).alias("dc"), F.lit(w).alias("w")
            )
            for dr, dc, w in contribs
        ]
    )
    scattered = (
        cells.where(F.col("valid"))
        .select("band", "row", "col", "value", F.explode(offs).alias("o"))
        .select(
            "band",
            (F.col("row") + F.col("o.dr")).alias("row"),
            (F.col("col") + F.col("o.dc")).alias("col"),
            (F.col("value") * F.col("o.w")).alias("wv"),
            F.col("o.w").alias("w"),
        )
    )
    if normalize and abs(sum(w for _, _, w in contribs)) < 1e-12:
        # a zero-sum kernel (e.g. a difference/edge kernel) normalizes
        # to 0/0 everywhere — reject up front rather than emit NULLs
        raise ValueError("normalize=True requires a kernel with nonzero weight sum")
    agg = scattered.groupBy("band", "row", "col").agg(
        F.sum("wv").alias("_s"), F.sum("w").alias("_wsum")
    )
    if normalize:
        # edge cells can still see a zero contributor-weight sum even
        # for a nonzero-sum kernel (only the cancelling taps landed);
        # those cells have no defined normalized value — drop them so
        # valid=TRUE never rides with value=NULL
        agg = agg.where(F.col("_wsum") != 0)
        value = F.col("_s") / F.col("_wsum")
    else:
        value = F.col("_s")
    return agg.select(
        "band", "row", "col", F.round(value, 6).alias("value"), F.lit(True).alias("valid")
    )


def focal_filter_sql(
    kernel: list, normalize: bool = False, cells_cte: str = "cells"
) -> str:
    """DuckDB twin of focal_filter (same offsets, rounding, semantics)."""
    k = [[float(w) for w in row] for row in kernel]
    kh, kw = len(k), len(k[0])
    cy, cx = kh // 2, kw // 2
    rows = ", ".join(
        f"({cy - i}, {cx - j}, {k[i][j]!r})"
        for i in range(kh)
        for j in range(kw)
        if k[i][j] != 0.0
    )
    val = "sum(value * w) / sum(w)" if normalize else "sum(value * w)"
    having = "HAVING sum(w) <> 0" if normalize else ""
    return f"""
        SELECT band, row + dr AS row, col + dc AS col,
               round({val}, 6) AS value, TRUE AS valid
        FROM {cells_cte}, (VALUES {rows}) AS k(dr, dc, w)
        WHERE valid
        GROUP BY 1, 2, 3
        {having}
    """
