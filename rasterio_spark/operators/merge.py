"""Multi-source merge — the engine's rasterio.merge
(/root/reference/rasterio/merge.py; SURVEY.md §2.4).

Reference semantics: sources are composited in input order into an
output grid; per pixel, the method decides among valid contributions:

    first -> value of the lowest src_idx that is valid   (merge.py:29-34)
    last  -> highest src_idx valid                        (merge.py:37-41)
    min/max/sum -> over all valid                         (merge.py:44-74)
    count -> number of valid contributions                (merge.py:77-85)

Pixels with no valid contribution stay nodata. The chunked mem_limit
loop of the reference (merge.py:399-405) is replaced by Spark's own
partitioning: the whole merge is ONE shuffle — groupBy(band, row, col)
with partial (map-side) aggregation, so at 100 TB the shuffle carries
one pre-aggregated record per (source x cell), not per input row.

Determinism: contributions within one source are pre-reduced with
max(value) per cell (documented engine rule — the reference reads one
value per pixel per source by construction), and first/last use
explicit min_by/max_by over src_idx — never partition order
(SURVEY.md §7.3 #5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_METHODS = ("first", "last", "min", "max", "sum", "count")


def _pre_reduce(layers: DataFrame) -> DataFrame:
    """One value per (src_idx, band, row, col): max over valid rows."""
    return (
        layers.where(F.col("valid"))
        .groupBy("src_idx", "band", "row", "col")
        .agg(F.max("value").alias("value"))
    )


def merge(layers: DataFrame, method: str = "first", nodata: float = 0.0) -> DataFrame:
    """Merge overlapping source layers.

    layers: (src_idx int, band int, row int, col int, value double,
    valid boolean). Returns (band, row, col, value) for every cell with
    at least one valid contribution; callers wanting the full domain
    left-join against it and coalesce(nodata) — same as the reference's
    nodata-initialized destination.
    """
    if method not in MERGE_METHODS:
        raise ValueError(f"unknown merge method {method!r}; choose from {MERGE_METHODS}")
    per_source = _pre_reduce(layers)
    g = per_source.groupBy("band", "row", "col")
    if method == "first":
        agg = F.min_by("value", "src_idx")
    elif method == "last":
        agg = F.max_by("value", "src_idx")
    elif method == "min":
        agg = F.min("value")
    elif method == "max":
        agg = F.max("value")
    elif method == "sum":
        agg = F.sum("value")
    else:  # count
        agg = F.count("value").cast("double")
    return g.agg(agg.alias("value"))


def merge_sql(method: str, layers_sql: str) -> str:
    """DuckDB oracle twin: same pre-reduce + aggregation; ``layers_sql``
    is a SELECT producing the layers columns (inlined as a subquery)."""
    if method not in MERGE_METHODS:
        raise ValueError(method)
    agg = {
        "first": "arg_min(value, src_idx)",
        "last": "arg_max(value, src_idx)",
        "min": "min(value)",
        "max": "max(value)",
        "sum": "sum(value)",
        "count": "CAST(count(value) AS DOUBLE)",
    }[method]
    return f"""
        SELECT band, row, col, {agg} AS value
        FROM (
          SELECT src_idx, band, row, col, max(value) AS value
          FROM ({layers_sql}) WHERE valid
          GROUP BY 1, 2, 3, 4
        )
        GROUP BY band, row, col
    """


def stack(layer_dfs: list[DataFrame]) -> DataFrame:
    """Concatenate sources as consecutive bands on a common grid —
    rasterio.stack semantics (/root/reference/rasterio/stack.py:26-362):
    output band order = input order.

    Each input: (band, row, col, value, valid). unionByName keeps the
    plan shuffle-free; band renumbering is a running offset.
    """
    out = None
    offset = 0
    for df in layer_dfs:
        n_bands = 1
        renumbered = df.withColumn("band", F.col("band") + F.lit(offset))
        out = renumbered if out is None else out.unionByName(renumbered)
        offset += n_bands
    if out is None:
        raise ValueError("stack requires at least one layer")
    return out
