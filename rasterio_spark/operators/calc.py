"""Band math — the engine's `rio calc` (SURVEY.md §2.8).

The reference evaluates a lisp-like snuggs expression over band arrays
(/root/reference/rasterio/rio/calc.py:59-217). Here Spark SQL `expr()`
replaces the whole interpreter: bands pivot to columns ``b1..bN``, the
expression is any SQL scalar expression over them, and the result
returns to long form. Catalyst does constant folding and codegen — the
interpreter is free.

    calc(cells, "0.95 * b1 + 10")        # rio calc "(+ (* 0.95 (read 1)) 10)"
    calc(cells, "greatest(b1, b2, b3)")  # multi-band
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_wide(cells: DataFrame, bands: list[int]) -> DataFrame:
    """(band,row,col,value,valid) -> (row, col, b1..bN[, v1..vN])."""
    aggs = []
    for b in bands:
        aggs.append(
            F.max(F.when(F.col("band") == b, F.col("value"))).alias(f"b{b}")
        )
        aggs.append(
            F.max(F.when(F.col("band") == b, F.col("valid").cast("int")))
            .cast("boolean")
            .alias(f"v{b}")
        )
    return cells.groupBy("row", "col").agg(*aggs)


def calc(
    cells: DataFrame,
    expression: str,
    bands: list[int] | None = None,
    out_band: int = 1,
    nodata: float | None = None,
    require_valid: bool = True,
) -> DataFrame:
    """Evaluate a SQL expression over band columns b1..bN per cell.

    ``require_valid``: cells where any referenced band is invalid become
    nodata/invalid (mirrors masked-array propagation in rio calc).
    Returns (band, row, col, value, valid).
    """
    if bands is None:
        bands = [r["band"] for r in cells.select("band").distinct().orderBy("band").collect()]
    wide = to_wide(cells, bands)
    value = F.expr(expression)
    used = [b for b in bands if f"b{b}" in expression]
    if require_valid and used:
        all_valid = None
        for b in used:
            v = F.col(f"v{b}")
            all_valid = v if all_valid is None else (all_valid & v)
        valid = F.coalesce(all_valid, F.lit(False))
    else:
        valid = F.lit(True)
    out_value = F.when(valid, value)
    if nodata is not None:
        out_value = F.coalesce(out_value, F.lit(nodata))
    return wide.select(
        F.lit(out_band).alias("band"),
        "row",
        "col",
        out_value.cast("double").alias("value"),
        valid.alias("valid"),
    )


def calc_sql(expression: str, bands: list[int], out_band: int = 1, nodata: float | None = None, cells_cte: str = "cells") -> str:
    """DuckDB oracle twin of calc (require_valid semantics)."""
    band_cols = []
    for b in bands:
        band_cols.append(f"max(CASE WHEN band = {b} THEN value END) AS b{b}")
        band_cols.append(f"bool_or(band = {b} AND valid) AS v{b}")
    used = [b for b in bands if f"b{b}" in expression]
    valid = " AND ".join(f"COALESCE(v{b}, FALSE)" for b in used) or "TRUE"
    val = f"CASE WHEN {valid} THEN CAST({expression} AS DOUBLE) END"
    if nodata is not None:
        val = f"COALESCE({val}, {nodata!r})"
    return f"""
        SELECT {out_band} AS band, row, col,
               {val} AS value,
               ({valid}) AS valid
        FROM (
          SELECT row, col, {", ".join(band_cols)}
          FROM {cells_cte} GROUP BY row, col
        )
    """
