"""Windowed reads over cell tables — the engine's DatasetReader.read
(SURVEY.md §2.1; reference semantics /root/reference/rasterio/_io.pyx:356-662).

- ``read``: window predicate pushed into the scan (Catalyst shows it
  under PushedFilters for parquet sources); optional masked semantics
  (invalid -> NULL) or nodata fill.
- ``read_boundless``: windows beyond the extent are composited against
  a generated fill domain (reference builds an in-memory VRT,
  _io.pyx:596-657; here it's domain LEFT JOIN data + coalesce).
- ``dataset_mask``: OR of band masks (reference _io.pyx:903-995
  precedence; engine has explicit ``valid`` so only the OR remains).

All pure built-ins; the domain generator is ``sequence + explode``
which Spark evaluates without Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rasterio_spark.grid.windows import Window, crop


def window_filter(window: Window):
    """Column predicate selecting exactly the cells of a window
    (toslices discretization: floor start / ceil stop, clamped at 0)."""
    rs, cs = window.toslices()
    return (
        (F.col("row") >= rs.start)
        & (F.col("row") < rs.stop)
        & (F.col("col") >= cs.start)
        & (F.col("col") < cs.stop)
    )


def read(
    cells: DataFrame,
    window: Window | None = None,
    height: int | None = None,
    width: int | None = None,
    masked: bool = False,
    fill_nodata: float | None = None,
    bands: list[int] | None = None,
) -> DataFrame:
    """Windowed scan. Non-boundless windows are cropped to the extent
    first (parity: _io.pyx:505-519). ``masked=True`` nulls out invalid
    cells; ``fill_nodata`` writes the nodata value into them instead.
    """
    out = cells
    if bands is not None:
        out = out.where(F.col("band").isin(bands))
    if window is not None:
        if height is not None and width is not None:
            window = crop(window, height, width)
        out = out.where(window_filter(window))
    if masked:
        out = out.withColumn("value", F.when(F.col("valid"), F.col("value")))
    elif fill_nodata is not None:
        out = out.withColumn(
            "value", F.when(F.col("valid"), F.col("value")).otherwise(F.lit(fill_nodata))
        )
    return out


def window_domain(spark, window: Window, bands: list[int] | None = None) -> DataFrame:
    """All (band, row, col) triples of a window — the boundless fill
    domain. sequence+explode stays in the JVM and parallelizes by rows."""
    import math

    # boundless windows keep negative offsets (no clamping, unlike toslices)
    r0 = int(math.floor(window.row_off))
    r1 = int(math.ceil(window.row_off + window.height))
    c0 = int(math.floor(window.col_off))
    c1 = int(math.ceil(window.col_off + window.width))
    rows = spark.range(r0, r1).select(F.col("id").cast("int").alias("row"))
    dom = rows.withColumn(
        "col", F.explode(F.sequence(F.lit(c0), F.lit(c1 - 1)))
    )
    if bands:
        dom = dom.withColumn("band", F.explode(F.array(*[F.lit(b) for b in bands])))
    else:
        dom = dom.withColumn("band", F.lit(1))
    return dom.select("band", "row", "col")


def read_boundless(
    cells: DataFrame,
    window: Window,
    fill_value: float = 0.0,
    bands: list[int] | None = None,
) -> DataFrame:
    """Boundless read: full window domain LEFT JOIN data, fill misses.

    Matches reference fill semantics (_io.pyx:596-657): cells outside
    the dataset extent (or invalid) read as ``fill_value`` and invalid.
    The join broadcasts the smaller side automatically; for big windows
    both sides shuffle-hash on (band, row, col).
    """
    spark = cells.sparkSession
    dom = window_domain(spark, window, bands)
    data = cells if bands is None else cells.where(F.col("band").isin(bands))
    joined = dom.join(data, ["band", "row", "col"], "left")
    return joined.select(
        "band",
        "row",
        "col",
        F.coalesce(
            F.when(F.col("valid"), F.col("value")), F.lit(fill_value)
        ).alias("value"),
        F.coalesce(F.col("valid"), F.lit(False)).alias("valid"),
    )


def dataset_mask(
    cells: DataFrame,
    alpha_band: int | None = None,
    dataset_valid: DataFrame | None = None,
) -> DataFrame:
    """Per-cell validity with the reference's precedence
    (_io.pyx:903-995): per-dataset mask > alpha band > OR over band
    masks. With the engine's explicit valid columns that is:

    - ``dataset_valid`` given (a (row, col, valid) DataFrame — the
      analogue of an external .msk sidecar): it wins outright;
    - else ``alpha_band`` given: that band's valid column IS the mask;
    - else: OR over the bands' valid flags (the default r1 behavior).
    """
    if dataset_valid is not None:
        return dataset_valid.select("row", "col", F.col("valid").cast("boolean").alias("valid"))
    if alpha_band is not None:
        return cells.where(F.col("band") == alpha_band).select("row", "col", "valid")
    return cells.groupBy("row", "col").agg(F.max(F.col("valid").cast("int")).cast("boolean").alias("valid"))


def pad(
    cells: DataFrame,
    descriptor,
    pad_width: int,
    fill_value: float = 0.0,
    bands: list[int] | None = None,
    mode: str = "constant",
):
    """rasterio.pad (reference __init__.py:458-488): grow the layer by
    ``pad_width`` cells on every side. Returns (padded_descriptor,
    padded_cells) where the cells are re-origined so (0, 0) is the new
    padded corner, and the transform shifts by -pad_width pixels on
    both axes (c -= pad*a, f -= pad*e — the reference's exact rule).

    ``bands`` defaults to all of the descriptor's bands (1..count) so a
    multiband layer pads every band; reference pad() operates on the
    full array stack, not band 1.

    ``mode``: 'constant' fills the border with ``fill_value``
    (numpy.pad constant); 'edge' replicates the nearest edge cell (the
    mode the reference's own test uses, tests/test_pad.py:7-13) — a
    clamp on the source coordinates turns it into the same equi-join.
    """
    import dataclasses

    from rasterio_spark.grid.affine import Affine

    if bands is None:
        bands = list(range(1, descriptor.count + 1))
    w = Window(
        -pad_width, -pad_width, descriptor.width + 2 * pad_width, descriptor.height + 2 * pad_width
    )
    if mode == "edge":
        dom = window_domain(cells.sparkSession, w, bands=bands)
        h, wd = descriptor.height, descriptor.width
        dom = dom.withColumn(
            "_sr", F.greatest(F.lit(0), F.least(F.lit(h - 1), F.col("row"))).cast("int")
        ).withColumn(
            "_sc", F.greatest(F.lit(0), F.least(F.lit(wd - 1), F.col("col"))).cast("int")
        )
        src = cells.select(
            "band", F.col("row").alias("_sr"), F.col("col").alias("_sc"), "value", "valid"
        )
        out = dom.join(src, ["band", "_sr", "_sc"], "left").select(
            "band",
            "row",
            "col",
            F.coalesce(F.when(F.col("valid"), F.col("value")), F.lit(fill_value)).alias("value"),
            F.coalesce("valid", F.lit(False)).alias("valid"),
        )
    elif mode == "constant":
        out = read_boundless(cells, w, fill_value=fill_value, bands=bands)
    else:
        raise ValueError(f"unsupported pad mode {mode!r} (constant | edge)")
    out = out.select(
        "band",
        (F.col("row") + pad_width).cast("long").alias("row"),
        (F.col("col") + pad_width).cast("long").alias("col"),
        "value",
        "valid",
    )
    t = descriptor.transform
    new_desc = dataclasses.replace(
        descriptor,
        width=descriptor.width + 2 * pad_width,
        height=descriptor.height + 2 * pad_width,
        transform=Affine(t.a, t.b, t.c - pad_width * t.a, t.d, t.e, t.f - pad_width * t.e),
    )
    return new_desc, out
