"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2,
run over the driver's parquet tables (plus the deterministic pages
table derived from ``documents`` — see
rasterio_spark/sources/pages.py). ``oracle_sql()`` carries the exact
DuckDB twin; floats that depend on engine-specific summation order are
rounded to 6 decimals on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TILE_RES = 7


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.sources.pages import pages_from_documents

    return pages_from_documents(spark, sf_dir)


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.sources.layers import cells_from_documents

    return cells_from_documents(spark, sf_dir)


_PAGES_CTE = None


def _pages_cte() -> str:
    from rasterio_spark.sources.pages import pages_sql

    return f"WITH pages AS ({pages_sql()})"


def _cells_cte() -> str:
    from rasterio_spark.sources.layers import doc_cells_sql

    return f"WITH cells AS ({doc_cells_sql()})"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.operators.tile import tile_counts

    return tile_counts(_pages(spark, sf_dir), res=TILE_RES)


def q_tile_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.operators.tile import tile_counts_salted

    return tile_counts_salted(_pages(spark, sf_dir), res=TILE_RES)


def q_cell_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.operators.tile import cell_histogram

    return cell_histogram(_pages(spark, sf_dir), res=TILE_RES)


def q_window_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.grid.windows import Window
    from rasterio_spark.operators.window_read import read

    return read(_cells(spark, sf_dir), Window(4, 2, 10, 6))


def q_window_read_masked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.grid.windows import Window
    from rasterio_spark.operators.window_read import read

    return read(_cells(spark, sf_dir), Window(0, 0, 20, 10), masked=True)


def q_boundless_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.grid.windows import Window
    from rasterio_spark.operators.window_read import read_boundless

    return read_boundless(_cells(spark, sf_dir), Window(-2, -2, 10, 10), fill_value=0.0)


def _merge_query(method: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from rasterio_spark.operators.merge import merge
        from rasterio_spark.sources.layers import source_layers_from_documents

        return merge(source_layers_from_documents(spark, sf_dir), method=method)

    return q


def q_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.operators.stats import band_stats

    return band_stats(_cells(spark, sf_dir))


def q_data_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rasterio_spark.operators.stats import get_data_window_df

    return get_data_window_df(_cells(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tiling + per-cell language histogram at sf0.001."""
    return q_cell_histogram(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "tile_counts": q_tile_counts,
        "tile_counts_salted": q_tile_counts_salted,
        "cell_histogram": q_cell_histogram,
        "window_read": q_window_read,
        "window_read_masked": q_window_read_masked,
        "boundless_read": q_boundless_read,
        "band_stats": q_band_stats,
        "data_window": q_data_window,
    }
    for m in ("first", "last", "min", "max", "sum", "count"):
        qs[f"merge_{m}"] = _merge_query(m)
    return qs


def oracle_sql() -> dict[str, str]:
    from rasterio_spark.operators.merge import merge_sql
    from rasterio_spark.operators.stats import band_stats_sql, get_data_window_sql
    from rasterio_spark.operators.tile import tile_counts_sql
    from rasterio_spark.sources.layers import source_layers_sql
    from rasterio_spark.sources.pages import geocode_sql

    from rasterio_spark.functions.cell_exprs import encode_sql

    lon_sql, lat_sql = geocode_sql()
    cell = encode_sql(lon_sql, lat_sql, TILE_RES)

    sqls: dict[str, str] = {}
    sqls["tile_counts"] = f"{_pages_cte()} {tile_counts_sql(TILE_RES)}"
    sqls["tile_counts_salted"] = sqls["tile_counts"]
    sqls["cell_histogram"] = f"""
        {_pages_cte()}
        SELECT {cell} AS cell_id, lang,
               COUNT(*) AS n_pages, MAX(warc_ts) AS latest_ts
        FROM pages GROUP BY 1, 2
    """
    sqls["window_read"] = f"""
        {_cells_cte()}
        SELECT band, row, col, value, valid FROM cells
        WHERE row >= 2 AND row < 8 AND col >= 4 AND col < 14
    """
    sqls["window_read_masked"] = f"""
        {_cells_cte()}
        SELECT band, row, col,
               CASE WHEN valid THEN value END AS value, valid
        FROM cells
        WHERE row >= 0 AND row < 10 AND col >= 0 AND col < 20
    """
    sqls["boundless_read"] = f"""
        {_cells_cte()}
        SELECT 1 AS band, d.row, d.col,
               COALESCE(CASE WHEN c.valid THEN c.value END, 0.0) AS value,
               COALESCE(c.valid, FALSE) AS valid
        FROM (SELECT r.range AS row, c2.range AS col
              FROM range(-2, 8) r, range(-2, 8) c2) d
        LEFT JOIN cells c ON c.row = d.row AND c.col = d.col
    """
    for m in ("first", "last", "min", "max", "sum", "count"):
        sqls[f"merge_{m}"] = merge_sql(m, source_layers_sql())
    sqls["band_stats"] = f"{_cells_cte()} {band_stats_sql()}"
    sqls["data_window"] = f"{_cells_cte()} {get_data_window_sql()}"
    return sqls
