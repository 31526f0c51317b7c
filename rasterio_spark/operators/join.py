"""Spatial joins — the north-rule core (BASELINE.json north_star).

- ``pip_join``: pages x polygons point-in-polygon join via
  filter-and-refine: polygon cover cells (driver-side, R-tree-pruned,
  broadcast) -> equi-join on cell_id -> ray-casting refine in an
  Arrow UDF. The spatial theta-join becomes an equi-join Catalyst can
  broadcast or sort-merge (SURVEY.md §2.3).
- ``knn_join``: k nearest pages per query point by cell-ring expansion:
  rings grow until every query holds >= k candidates AND the expansion
  radius covers the k-th distance bound, then window row_number <= k.
- ``sample_points``: rasterio.sample as a point->cell equi-join
  (reference rasterio/sample.py:44-99): out-of-bounds -> nodata.
- ``asof_latest``: latest page per (cell) by warc_ts — the as-of
  resolution used on (cell_id, warc_ts) sorted runs.

Scale notes: the polygon side is broadcast (small); the pages side
never collects. ``strategy='sort_merge'`` repartitions by range on
cell_id and sorts (cell_id, warc_ts) within partitions — the
north_star's sort-merge layout — useful when the cover is too big to
broadcast; output is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from rasterio_spark.grid import cells as C
from rasterio_spark.grid.geometry import STRtree
from rasterio_spark.operators.tile import DEFAULT_RES, tile_pages
from rasterio_spark.sources.polygons import prepare_layer


def _polygon_cover(entries, res: int, rings_by_id=None) -> pd.DataFrame:
    """(cell_id, polygon_id, value, interior) for every cell whose
    extent overlaps a polygon's bbox — the join's build side.

    ``interior`` marks cells FULLY contained in the polygon: pages in
    those cells are accepted without the ray-casting refine (classic
    filter-and-refine with an interior shortcut — only the O(perimeter)
    boundary cells pay the UDF, not the O(area) interior). Pure NumPy:
    runs driver-side for small layers, executor-side per batch inside
    :func:`_polygon_cover_distributed` above COVER_DISTRIBUTED_THRESHOLD
    polygons. Size is O(total bbox area in cells), independent of page
    count.
    """
    from rasterio_spark.grid.geometry import _segments_intersect_rects, points_in_rings

    ny, nx = C.grid_shape(res)
    cell_w = C.LON_SPAN / nx
    cell_h = C.LAT_SPAN / ny
    out_cells = []
    out_pid = []
    out_val = []
    out_int = []
    for pid, value, (left, bottom, right, top) in entries:
        r_lo, c_lo = C.rowcol_of(left, top, res)
        r_hi, c_hi = C.rowcol_of(right, bottom, res)
        rr = np.arange(min(r_lo, r_hi), max(r_lo, r_hi) + 1, dtype=np.int64)
        cc = np.arange(min(c_lo, c_hi), max(c_lo, c_hi) + 1, dtype=np.int64)
        grid_r, grid_c = np.meshgrid(rr, cc, indexing="ij")
        flat_r = grid_r.ravel()
        flat_c = grid_c.ravel()
        ids = C.cell_id_from_rowcol(flat_r, flat_c, res)
        if rings_by_id is not None and pid in rings_by_id:
            rings = rings_by_id[pid]
            # cell bbox in lon/lat (north-up grid: row 0 at LAT_MAX)
            x0 = C.LON_MIN + flat_c * cell_w
            x1 = x0 + cell_w
            y1 = C.LAT_MAX - flat_r * cell_h
            y0 = y1 - cell_h
            center_in = points_in_rings((x0 + x1) / 2.0, (y0 + y1) / 2.0, rings)
            rects = np.stack([x0, y0, x1, y1], axis=1)
            p0 = np.concatenate([r[:-1] for r in rings])
            p1 = np.concatenate([r[1:] for r in rings])
            crossed = _segments_intersect_rects(p0, p1, rects)
            interior = center_in & ~crossed
        else:
            interior = np.zeros(ids.shape, dtype=bool)
        out_cells.append(ids)
        out_pid.append(np.full(ids.shape, pid, dtype=np.int64))
        out_val.append(np.full(ids.shape, value, dtype="float64"))
        out_int.append(interior)
    return pd.DataFrame(
        {
            "cell_id": np.concatenate(out_cells),
            "polygon_id": np.concatenate(out_pid),
            "poly_value": np.concatenate(out_val),
            "interior": np.concatenate(out_int),
        }
    )


_LAYER_CACHE: dict = {}
_COVER_ARRAY_CACHE: dict = {}

# Above this many polygons the cover is built distributed (mapInPandas
# over polygon batches) instead of a serial driver loop: at 10^5-10^6
# shapes the serial build is minutes of driver time, while the batched
# build is O(P / cores) wall-clock with the identical per-polygon NumPy.
COVER_DISTRIBUTED_THRESHOLD = 10_000

# Default cover-cell budget for the res+3 refinement loop (r6, guide
# §2.4/§3.1): every pip_join action pays a BroadcastExchange that is
# SERIAL in cover rows (measured ~4 s/1.2M rows per action on this
# host), while the ray-casting refine the finer cover avoids is a
# parallel Arrow batch filter (~0.2 s for the same layer). The old 2M
# cap optimized the wrong side of that trade at every scale we can
# measure; 150k cells keeps the per-action broadcast ~0.3 s. Jobs whose
# refine really dominates (hour-long scans over 10^10+ pages) should
# raise the budget via env or pass cover_res explicitly — the cover is
# a pure performance parameter, output is identical at any resolution.
COVER_CELL_BUDGET = int(__import__("os").environ.get("RASTERIO_SPARK_COVER_CELLS", "150000"))


def _polygon_cover_distributed(spark, polygons: list[dict], res: int, batch_rows: int = 512) -> DataFrame:
    """Cover build for large layers: the same per-polygon NumPy as
    :func:`_polygon_cover`, run executor-side over polygon batches via
    mapInPandas. Geometry ships inside the batch rows (geom json), so
    nothing polygon-sized stays on the driver during the build; the
    result is a DataFrame with the cover's exact schema."""
    import json as _json

    def _np_default(o):
        # ring coordinates may be numpy arrays OR numpy scalars
        # (np.float32/np.int64 aren't iterable, so plain default=list
        # would raise); tolist() covers both
        return o.tolist() if hasattr(o, "tolist") else list(o)

    rows = [
        (int(p["polygon_id"]), float(p["value"]), _json.dumps(p["geom"], default=_np_default))
        for p in polygons
    ]
    n_part = max(
        1,
        min(len(rows) // batch_rows + 1, spark.sparkContext.defaultParallelism * 2),
    )
    src = spark.createDataFrame(
        rows, "polygon_id long, value double, geom string"
    ).repartition(n_part, "polygon_id")

    def build(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            polys = [
                {"polygon_id": int(pid), "value": float(v), "geom": _json.loads(g)}
                for pid, v, g in zip(
                    pdf["polygon_id"].values, pdf["value"].values, pdf["geom"].values
                )
            ]
            entries, rings_by_id = prepare_layer(polys)
            if entries:
                yield _polygon_cover(entries, res, rings_by_id)

    return src.mapInPandas(
        build,
        schema="cell_id long, polygon_id long, poly_value double, interior boolean",
    )


def _cover_arrays(spark, polygons: list[dict], cover_res: int, prepared=None) -> dict:
    """Worker-resident cover index for strategy='probe': the cover
    table as sorted flat numpy arrays (unique cells + per-cell slices
    of (polygon_id, interior, value)), shipped via a Python broadcast —
    sent to each executor ONCE per session and reused by every job,
    unlike a per-action JVM BroadcastExchange."""
    import hashlib
    import json as _json

    key = (
        hashlib.sha256(
            _json.dumps(
                [(p["polygon_id"], p.get("value"), p.get("geom")) for p in polygons],
                sort_keys=True,
                default=list,
            ).encode()
        ).hexdigest(),
        cover_res,
        "arrays",
    )
    hit = _COVER_ARRAY_CACHE.get(key)
    if hit is not None:
        return hit
    if len(polygons) > COVER_DISTRIBUTED_THRESHOLD:
        # large layer: build executor-side, collect only the capped
        # cover (bounded by the 2M-cell cap upstream) into the index
        pdf = _polygon_cover_distributed(spark, polygons, cover_res).toPandas()
    else:
        entries, rings_by_id = prepared if prepared is not None else prepare_layer(polygons)
        pdf = _polygon_cover(entries, cover_res, rings_by_id)
    order = np.argsort(pdf["cell_id"].values, kind="stable")
    cells = pdf["cell_id"].values[order]
    pids = pdf["polygon_id"].values[order].astype(np.int64)
    inter = pdf["interior"].values[order].astype(bool)
    vals = pdf["poly_value"].values[order].astype("float64")
    uniq, starts = np.unique(cells, return_index=True)
    ends = np.append(starts[1:], len(cells))
    bc = spark.sparkContext.broadcast((uniq, starts, ends, pids, inter, vals))
    out = {"cells": uniq, "bc": bc}
    _COVER_ARRAY_CACHE[key] = out
    return out


def _coarse_prefilter_cells(cover_cells: np.ndarray, cover_res: int, max_lit: int = 8192):
    """Coarsen the covered-cell set until it fits a codegen'd literal
    IN-set (<= max_lit entries): returns (prefilter_res, cell ids)."""
    res = cover_res
    _, rows, cols = C.decode(cover_cells)
    while res > 0:
        ids = np.unique(C.cell_id_from_rowcol(rows, cols, res))
        if len(ids) <= max_lit:
            return res, ids
        res -= 1
        rows, cols = rows >> 1, cols >> 1
    return 0, np.unique(C.cell_id_from_rowcol(rows, cols, 0))


def _layer_index(spark, polygons: list[dict], cover_res: int | None, prepared=None):
    """Driver-side layer index (entries, rings, flat broadcast, cover
    DF) — built once per (layer, resolution) and memoized: this is the
    'open the polygon layer' step a real deployment does once and
    reuses across every job against it. ``cover_res=None`` skips the
    cover build entirely (the R-tree probe strategy never joins it)."""
    import hashlib
    import json as _json

    # the key must cover the full geometry, not just ids/values — two
    # layers with identical ids but different rings must not collide
    key = (
        hashlib.sha256(
            _json.dumps(
                [
                    (p["polygon_id"], p.get("value"), p.get("geom"))
                    for p in polygons
                ],
                sort_keys=True,
                default=list,
            ).encode()
        ).hexdigest(),
        len(polygons),
        cover_res,
    )
    hit = _LAYER_CACHE.get(key)
    if hit is not None:
        return hit
    from rasterio_spark.grid.geometry import FlatPolygons

    entries, rings_by_id = prepared if prepared is not None else prepare_layer(polygons)
    bcast = spark.sparkContext.broadcast(FlatPolygons(rings_by_id))
    cover = None
    if cover_res is not None:
        if len(polygons) > COVER_DISTRIBUTED_THRESHOLD:
            # large layer: executor-side batched build; localCheckpoint
            # materializes it once so every cached reuse joins the
            # stored cover instead of re-running the build
            cover = _polygon_cover_distributed(
                spark, polygons, cover_res
            ).withColumnRenamed("cell_id", "_cover_cell").localCheckpoint()
        else:
            # localCheckpoint (eager) materializes the cover into executor
            # blocks ONCE per layer: without it the cover stays a driver
            # LocalTableScan and EVERY downstream action re-serializes all
            # rows through the driver before its BroadcastExchange
            # (measured: ~4 s/action at 1.2M rows, ~0.2 s checkpointed).
            cover_pdf = _polygon_cover(entries, cover_res, rings_by_id)
            cover = (
                spark.createDataFrame(cover_pdf)
                .withColumnRenamed("cell_id", "_cover_cell")
                .localCheckpoint()
            )
        cover = F.broadcast(cover)
    val = (entries, rings_by_id, bcast, cover)
    _LAYER_CACHE[key] = val
    return val


def pip_join(
    pages: DataFrame,
    polygons: list[dict],
    res: int = DEFAULT_RES,
    skew: bool = False,
    strategy: str = "auto",
    salt_buckets: int = 0,
    cover_res: int | None = None,
    geocode: str = "auto",
) -> DataFrame:
    """Join pages to the polygons containing them.

    Returns pages columns + (polygon_id, poly_value). A page inside k
    polygons appears k times; pages in none are dropped (inner).

    ``cover_res`` (default res + 3, capped by cover size): the cover is
    built at a FINER resolution than the working tiling so most covered
    cells are fully interior — those candidates skip the ray-casting
    refine entirely; only the O(perimeter) boundary sliver pays the
    Arrow UDF. The working ``cell_id``/tile columns stay at ``res``.

    ``strategy='auto'``: broadcast cover unless the layer's bbox area
    exceeds the cover cap even at the WORKING resolution (a cover that
    can't be built/broadcast at any useful res). Rationale (measured,
    BENCH r1 vs r2): the cover join transfers only the ~f*n candidate
    rows to Python, while the R-tree probe pays Arrow for every row —
    once the cover build is amortized by the layer cache, broadcast
    wins at every f < 1 (24M pages, f~0.65: 8.7 s vs 17.6 s). R-tree
    remains the right call for one-shot jobs against huge ad-hoc
    layers (no cover build at all); 'sort_merge' for covers too big to
    broadcast but still enumerable.
    """
    spark = pages.sparkSession
    tiled = tile_pages(pages, res=res, skew=skew, geocode=geocode)

    # ONE serial prepare per invocation (r4 verdict: the auto estimate,
    # the cover-res cap loop, and _layer_index each re-prepared the
    # layer — three O(polygons) driver passes before any work started).
    # Prepared entries thread through every consumer below.
    prepared = prepare_layer(polygons)
    probe_entries = prepared[0]

    def _bbox_cells_at(r_est: int) -> int:
        ny, nx = C.grid_shape(r_est)
        return sum(
            max(1, int((r - l) / (C.LON_SPAN / nx)) + 1)
            * max(1, int((t - b) / (C.LAT_SPAN / ny)) + 1)
            for _, _, (l, b, r, t) in probe_entries
        )

    if strategy == "auto":
        strategy = "rtree" if _bbox_cells_at(res) > 2_000_000 else "broadcast"

    if strategy != "rtree" and cover_res is None:
        cover_res = res + 3
        # cap the cover size: total bbox area in cells at cover_res
        # (budget rationale at COVER_CELL_BUDGET above)
        while cover_res > res and _bbox_cells_at(cover_res) > COVER_CELL_BUDGET:
            cover_res -= 1

    entries, rings_by_id, bcast, cover = _layer_index(
        spark, polygons, None if strategy == "rtree" else cover_res, prepared=prepared
    )

    if strategy == "rtree":
        # broadcast STR R-tree over polygon bboxes; one mapInPandas pass
        # does candidate lookup + ray-cast refine — no cover join at all.
        # Blob columns (html/text) never enter the Python stage (r6):
        # a mapInPandas Arrow-transfers every projected column BOTH
        # ways, so the probe ships join keys + metadata only — the same
        # contract as strategy='probe' (rejoin by url when the payload
        # is needed; at scale you never move blobs through a spatial
        # join). Guide §4.1: pass only the columns the function needs.
        boxes = np.array([e[2] for e in entries], dtype="float64")
        ids = np.array([e[0] for e in entries], dtype=np.int64)
        values = {e[0]: e[1] for e in entries}
        tree_bc = spark.sparkContext.broadcast((STRtree(boxes, ids), values))

        from pyspark.sql.types import DoubleType, LongType, StructField, StructType

        slim = tiled.drop("html", "text")
        out_schema = StructType(
            list(slim.schema.fields)
            + [StructField("polygon_id", LongType()), StructField("poly_value", DoubleType())]
        )

        def probe(batches):
            tree, vals = tree_bc.value
            flat = bcast.value
            for pdf in batches:
                if not len(pdf):
                    continue
                pts = np.stack(
                    [pdf["lon"].values, pdf["lat"].values, pdf["lon"].values, pdf["lat"].values],
                    axis=1,
                )
                qi, pid = tree.query(pts)
                if not len(qi):
                    continue
                keep = flat.contains(pid, pdf["lon"].values[qi], pdf["lat"].values[qi])
                qi, pid = qi[keep], pid[keep]
                out = pdf.iloc[qi].reset_index(drop=True)
                out["polygon_id"] = pid.astype("int64")
                out["poly_value"] = pd.Series(pid).map(vals).astype("float64")
                yield out

        return slim.mapInPandas(probe, schema=out_schema)

    if strategy == "probe":
        # Cover-probe: the same filter-and-refine candidates as the
        # broadcast strategy, but the cover lives as a WORKER-RESIDENT
        # index (Python broadcast, shipped once per session) instead of
        # a per-action BroadcastExchange, and a coarse literal IN-set
        # prefilter prunes non-candidate pages JVM-side before Arrow.
        # Plan: scan -> codegen'd IN filter -> one mapInPandas. No JVM
        # join, no exchange, nothing serial per run — the layout that
        # keeps 8->32-core scaling at the host ceiling (BENCH r2).
        from rasterio_spark.functions import cell_exprs as CE

        entries, rings_by_id, bcast, _ = _layer_index(
            spark, polygons, None, prepared=prepared
        )
        cov = _cover_arrays(spark, polygons, cover_res, prepared=prepared)
        pre_res, pre_cells = _coarse_prefilter_cells(cov["cells"], cover_res)
        pre_col = CE.encode_cols(F.col("lon"), F.col("lat"), pre_res)
        # blob columns (html/text) never enter the Python stage: a
        # mapInPandas must Arrow-transfer every input column, so the
        # probe emits join KEYS + metadata only (rejoin by url when the
        # payload is needed — at scale you never move blobs through a
        # spatial join). The broadcast strategy keeps full columns
        # because its UDF is a narrow 4-column filter.
        slim = tiled.drop("html", "text")
        pre = slim.where(pre_col.isin([int(x) for x in pre_cells]))

        from pyspark.sql.types import DoubleType, LongType, StructField, StructType

        out_schema = StructType(
            list(slim.schema.fields)
            + [StructField("polygon_id", LongType()), StructField("poly_value", DoubleType())]
        )
        cov_bc = cov["bc"]

        def probe_cover(batches):
            cc, cs, ce, cpid, cint, cval = cov_bc.value
            flat = bcast.value
            for pdf in batches:
                if not len(pdf):
                    continue
                lon = pdf["lon"].values
                lat = pdf["lat"].values
                r, c = C.rowcol_of(lon, lat, cover_res)
                cells = C.cell_id_from_rowcol(r, c, cover_res)
                idx = np.searchsorted(cc, cells)
                idx[idx >= len(cc)] = 0
                hit = cc[idx] == cells
                rows = np.nonzero(hit)[0]
                if not len(rows):
                    continue
                s = cs[idx[rows]]
                cnt = ce[idx[rows]] - s
                rep = np.repeat(rows, cnt)
                within = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                ppos = np.repeat(s, cnt) + within
                pids = cpid[ppos]
                inter = cint[ppos]
                vals = cval[ppos]
                bnd = ~inter
                ok = flat.contains(pids[bnd], lon[rep[bnd]], lat[rep[bnd]])
                keep_rows = np.concatenate([rep[inter], rep[bnd][ok]])
                keep_pids = np.concatenate([pids[inter], pids[bnd][ok]])
                keep_vals = np.concatenate([vals[inter], vals[bnd][ok]])
                if not len(keep_rows):
                    continue
                out = pdf.iloc[keep_rows].reset_index(drop=True)
                out["polygon_id"] = keep_pids.astype("int64")
                out["poly_value"] = keep_vals.astype("float64")
                yield out

        out = pre.mapInPandas(probe_cover, schema=out_schema)
        if salt_buckets:
            out = out.repartition(
                spark.sparkContext.defaultParallelism,
                F.col("cell_id"),
                F.pmod(F.hash("url"), F.lit(salt_buckets)),
            )
        return out

    from rasterio_spark.functions import cell_exprs as CE

    tiled = tiled.withColumn(
        "_cover_cell", CE.encode_cols(F.col("lon"), F.col("lat"), cover_res)
    )

    if strategy == "broadcast":
        cand = tiled.join(cover, "_cover_cell")
    elif strategy == "sort_merge":
        # north_star layout: range partition + in-partition sort on
        # (cell_id, warc_ts); merge-join hint avoids broadcast.
        lhs = (
            tiled.repartitionByRange(F.col("cell_id"))
            .sortWithinPartitions("cell_id", "warc_ts")
        )
        cand = lhs.join(cover.hint("merge"), "_cover_cell")
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    cand = cand.drop("_cover_cell")

    from rasterio_spark.functions.udfs import make_pip_udf

    pip = make_pip_udf(bcast)
    # interior shortcut: cover rows of fully-interior cells accept
    # without ray casting — the flag rides INTO the UDF so the numpy
    # pass only touches boundary-cell rows. One scan, one filter
    # (measured best vs two-branch union, which re-scans + re-geocodes
    # the pages side).
    out = cand.where(
        pip(F.col("polygon_id"), F.col("lon"), F.col("lat"), F.col("interior"))
    ).drop("interior")

    if salt_buckets:
        # Cell-prefix + salt layout for downstream keyed stages (hot
        # cells split across salt_buckets tasks). Applied AFTER the
        # refine: the refine is a narrow filter that needs no shuffle,
        # and the refined output is the smaller side to move. No-op on
        # output content.
        out = out.repartition(
            spark.sparkContext.defaultParallelism,
            F.col("cell_id"),
            F.pmod(F.hash("url"), F.lit(salt_buckets)),
        )
    return out


def pip_join_count(pages: DataFrame, polygons: list[dict], res: int = DEFAULT_RES, **kw) -> DataFrame:
    """Pages per polygon — the aggregate headline of the join."""
    j = pip_join(pages, polygons, res=res, **kw)
    return j.groupBy("polygon_id").agg(F.count(F.lit(1)).alias("n_pages"))


def _query_disk_cells(qdf: DataFrame, res: int, radius_col: str = "_r") -> DataFrame:
    """(query_id, qrow, qcol, radius) -> (query_id, cell_id): each
    query's disk cells up to its own radius, generated executor-side in
    Arrow batches — the driver never materializes per-query cell lists
    (the large-query-set complement to knn_join's list path)."""

    def gen(batches):
        for pdf in batches:
            out_q, out_c = [], []
            for qid, r0, c0, rad in zip(
                pdf["query_id"].values, pdf["qrow"].values, pdf["qcol"].values, pdf[radius_col].values
            ):
                d = C.disk(int(r0), int(c0), int(rad), res, wrap=False)
                if d.size:
                    ids = np.unique(C.cell_id_from_rowcol(d[:, 0], d[:, 1], res))
                    out_q.append(np.full(ids.shape, qid, dtype="int64"))
                    out_c.append(ids.astype("int64"))
            if out_q:
                yield pd.DataFrame(
                    {"query_id": np.concatenate(out_q), "cell_id": np.concatenate(out_c)}
                )

    return qdf.mapInPandas(gen, "query_id long, cell_id long")


def _knn_join_df(
    pages: DataFrame, queries: DataFrame, k: int, res: int, max_rings: int
) -> DataFrame:
    """knn_join for a queries DataFrame (query_id, qlon, qlat): the
    ring expansion runs as doubling-radius passes with the per-query
    state (resolved radius) in a DataFrame — driver traffic is one
    scalar emptiness probe per pass, never O(queries x cells). Ranking
    arithmetic and (dist2, url) ordering are identical to the list
    path, so both satisfy the same oracle."""
    from rasterio_spark.functions.cell_exprs import rowcol_cols
    from rasterio_spark.plans.cache import scoped_persist

    ny, nx = C.grid_shape(res)
    cell_w = C.LON_SPAN / nx
    cell_h = C.LAT_SPAN / ny
    min_side = min(cell_w, cell_h)

    qrow, qcol = rowcol_cols(F.col("qlon"), F.col("qlat"), res)
    state = (
        queries.select("query_id", "qlon", "qlat")
        .withColumn("qrow", qrow)
        .withColumn("qcol", qcol)
        .withColumn("base_r", F.lit(None).cast("int"))
        .localCheckpoint()
    )
    # prune the page scan to the union of maximal disks (O(search area),
    # like the list path) — built executor-side, distinct'd before the
    # semi-join so the build side stays |cells|, not |queries x cells|
    max_cells = (
        _query_disk_cells(state.withColumn("_r", F.lit(max_rings)), res)
        .select("cell_id")
        .distinct()
    )
    tiled = scoped_persist(
        tile_pages(pages, res=res)
        .select("url", "lon", "lat", "cell_id")
        .join(max_cells, "cell_id", "left_semi")
    )

    R, j = 0, 0
    while R < max_rings - 1:
        active = state.where(F.col("base_r").isNull())
        if active.isEmpty():
            break
        R = min(2 ** (j + 1) - 1, max_rings - 1)
        j += 1
        dc = _query_disk_cells(active.withColumn("_r", F.lit(R)), res)
        enough = (
            tiled.join(dc, "cell_id")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") >= k)
            .select("query_id", F.lit(R).alias("_newr"))
        )
        state = (
            state.join(enough, "query_id", "left")
            .withColumn("base_r", F.coalesce("base_r", "_newr"))
            .drop("_newr")
            .localCheckpoint()
        )

    # same guarantee radius as the list path: the found radius bounds the
    # k-th distance by (base_r+1) cell diagonals; expand so the disk
    # covers that distance in min-side units
    diag = float(np.hypot(cell_w, cell_h))
    final = state.withColumn("base_r", F.coalesce("base_r", F.lit(max(R, 0))))
    safe_r = F.least(
        (F.ceil((F.col("base_r") + 1) * F.lit(diag) / F.lit(min_side)) + 1).cast("int"),
        F.lit(max_rings),
    )
    cells_df = _query_disk_cells(final.withColumn("_r", safe_r), res)
    cand = tiled.join(cells_df, "cell_id").join(
        final.select("query_id", "qlon", "qlat"), "query_id"
    )
    dist2 = (F.col("lon") - F.col("qlon")) * (F.col("lon") - F.col("qlon")) + (
        F.col("lat") - F.col("qlat")
    ) * (F.col("lat") - F.col("qlat"))
    w = W.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("url").asc())
    return (
        cand.withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "url", "lon", "lat", "dist2", "rank")
    )


# list inputs above this size silently get the distributed DF path —
# the driver ring loop's per-band bookkeeping is fine for dozens of
# query points but is a serial scale-killer at 10^5+ (r4 verdict #2)
KNN_LIST_DF_THRESHOLD = 1000


def knn_join(
    pages: DataFrame,
    queries: list[tuple[int, float, float]] | DataFrame,
    k: int,
    res: int = DEFAULT_RES,
    max_rings: int = 64,
) -> DataFrame:
    """k nearest pages per query point (planar lon/lat distance).

    ``queries`` may be a list of (query_id, qlon, qlat) tuples (small
    query sets; ring bookkeeping on the driver) or a DataFrame with
    those columns (large query sets; fully distributed state — see
    ``_knn_join_df``).

    Ring expansion (north_star): candidate cells grow ring by ring;
    a radius R is sufficient once every query has >= k candidates
    inside ring R AND (k-th candidate distance) <= R * min_cell_side —
    the cheapest correct stopping rule for a grid index. The driver
    loop only moves cell ids (tiny); pages are touched via equi-joins.

    Returns (query_id, url, lon, lat, dist2, rank) with rank <= k,
    ties broken by url.
    """
    if isinstance(queries, DataFrame):
        return _knn_join_df(pages, queries, k, res, max_rings)
    if len(queries) > KNN_LIST_DF_THRESHOLD:
        # large list: the driver ring loop is O(queries) serial Python
        # with per-band collects — route through the fully distributed
        # DF path instead (identical results; see equivalence pytest)
        qdf = pages.sparkSession.createDataFrame(
            [(int(q), float(x), float(y)) for q, x, y in queries],
            "query_id long, qlon double, qlat double",
        )
        return _knn_join_df(pages, qdf, k, res, max_rings)
    spark = pages.sparkSession
    ny, nx = C.grid_shape(res)
    cell_w = C.LON_SPAN / nx
    cell_h = C.LAT_SPAN / ny
    min_side = min(cell_w, cell_h)

    qrows = {qid: C.rowcol_of(qlon, qlat, res) for qid, qlon, qlat in queries}

    # cache ONLY the pages inside the maximal search area (union of the
    # max_rings disks), not the whole table: at 100 TB the semi-join
    # against the broadcast cell list prunes the scan to O(search area)
    # and the cache holds the candidate subset every band job reuses.
    # The expansion is non-wrapping (wrap=False) so the candidate
    # topology matches the planar dist2 ranking metric below.
    max_ids = np.unique(
        np.concatenate(
            [
                C.cell_id_from_rowcol(d[:, 0], d[:, 1], res)
                for d in (
                    C.disk(int(r), int(c), max_rings, res, wrap=False)
                    for r, c in qrows.values()
                )
            ]
        )
    )
    tiled = tile_pages(pages, res=res).select("url", "lon", "lat", "cell_id")
    # Prune + cache only when the maximal disks actually prune: when
    # they cover most of the grid (dense/low-res case) the semi-join
    # keeps ~everything, so the broadcast build + join + cache write
    # are pure overhead vs re-running the narrow projected scan per
    # band job (measured ~2 s saved at the bench shape, coverage 0.68).
    coverage = len(max_ids) / float(ny * nx)
    if coverage <= 0.5:
        max_df = spark.createDataFrame(
            pd.DataFrame({"cell_id": max_ids.astype("int64")})
        )
        tiled = tiled.join(F.broadcast(max_df), "cell_id", "left_semi").cache()
    need = {qid for qid, _, _ in queries}
    counts: dict[int, int] = {qid: 0 for qid in need}
    sufficient_radius: dict[int, int] = {}
    # expand radii in geometrically-growing bands: one Spark job per
    # band instead of per ring, so sparse regions cost O(log R) jobs
    band_start, band_size = 0, 1
    radius = 0
    while need and band_start < max_rings:
        band_end = min(band_start + band_size, max_rings)
        ring_rows = []
        for qid in need:
            r, c = qrows[qid]
            for rad in range(band_start, band_end):
                ring = C.ring(int(r), int(c), rad, res, wrap=False)
                if ring.size:
                    ids = C.cell_id_from_rowcol(ring[:, 0], ring[:, 1], res)
                    ring_rows.extend((qid, int(i)) for i in ids)
        if ring_rows:
            ring_df = spark.createDataFrame(
                pd.DataFrame(ring_rows, columns=["query_id", "cell_id"]).astype("int64")
            )
            got = (
                tiled.join(F.broadcast(ring_df), "cell_id")
                .groupBy("query_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            for row in got:
                counts[row["query_id"]] += row["n"]
        done = {qid for qid in need if counts[qid] >= k}
        for qid in done:
            sufficient_radius[qid] = band_end - 1
        need -= done
        band_start, band_size = band_end, band_size * 2
        radius = band_start

    # guarantee: expand each query's disk so it covers its k-th distance
    # upper bound ((R+1) rings cover distance R*min_side at least)
    final_rows = []
    for qid, qlon, qlat in queries:
        r, c = qrows[qid]
        base_r = sufficient_radius.get(qid, radius - 1)
        # distance to any point in ring base_r is at most (base_r+1) * max diag
        max_d = (base_r + 1) * float(np.hypot(cell_w, cell_h))
        safe_r = int(np.ceil(max_d / min_side)) + 1
        disk = C.disk(int(r), int(c), min(safe_r, max_rings), res, wrap=False)
        ids = C.cell_id_from_rowcol(disk[:, 0], disk[:, 1], res)
        final_rows.extend((int(qid), int(i)) for i in np.unique(ids))
    cells_df = spark.createDataFrame(
        pd.DataFrame(final_rows, columns=["query_id", "cell_id"]).astype("int64")
    )
    qdf = spark.createDataFrame(list(queries), "query_id long, qlon double, qlat double")

    cand = tiled.join(F.broadcast(cells_df), "cell_id").join(F.broadcast(qdf), "query_id")
    dist2 = (F.col("lon") - F.col("qlon")) * (F.col("lon") - F.col("qlon")) + (
        F.col("lat") - F.col("qlat")
    ) * (F.col("lat") - F.col("qlat"))
    w = W.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("url").asc())
    return (
        cand.withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "url", "lon", "lat", "dist2", "rank")
    )


def knn_sql(queries: list[tuple[int, float, float]], k: int) -> str:
    """Brute-force DuckDB oracle over the pages CTE: exact same dist2
    arithmetic and (dist2, url) ordering."""
    from rasterio_spark.sources.pages import geocode_sql

    lon_sql, lat_sql = geocode_sql()
    qvals = ", ".join(f"({qid}, {qlon!r}, {qlat!r})" for qid, qlon, qlat in queries)
    return f"""
        WITH geo AS (
          SELECT url, {lon_sql} AS lon, {lat_sql} AS lat FROM pages
        ), q(query_id, qlon, qlat) AS (VALUES {qvals}),
        scored AS (
          SELECT q.query_id, g.url, g.lon, g.lat,
                 (g.lon - q.qlon) * (g.lon - q.qlon)
                   + (g.lat - q.qlat) * (g.lat - q.qlat) AS dist2,
                 row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY (g.lon - q.qlon) * (g.lon - q.qlon)
                              + (g.lat - q.qlat) * (g.lat - q.qlat) ASC,
                            g.url ASC
                 ) AS rank
          FROM geo g CROSS JOIN q
        )
        SELECT query_id, url, lon, lat, dist2, CAST(rank AS INT) AS rank
        FROM scored WHERE rank <= {k}
    """


def sample_points(
    cells: DataFrame,
    points: list[tuple[int, float, float]],
    transform,
    nodata: float = 0.0,
    bands: list[int] | None = None,
) -> DataFrame:
    """Point probe: nearest-cell values per (x, y); misses -> nodata
    (reference sample.py:44-99: out-of-bounds yields the nodata vector).

    Plan: broadcast INNER join of the cell table against the (tiny)
    point set — one shuffle-free scan — then a left join of the point
    list against those O(points) hit rows fills misses with nodata.
    (A broadcast hint on the PRESERVED side of a left join is
    unsupported — Spark would drop it and sort-merge-shuffle the whole
    cell table.)"""
    from rasterio_spark.functions.cell_exprs import affine_rowcol_cols

    spark = cells.sparkSession
    pts = spark.createDataFrame(list(points), "pt_id long, x double, y double")
    row, col = affine_rowcol_cols(F.col("x"), F.col("y"), transform)
    pts = pts.withColumn("row", row).withColumn("col", col)
    data = cells if bands is None else cells.where(F.col("band").isin(bands))
    matched = data.join(F.broadcast(pts), ["row", "col"]).select(
        "pt_id",
        "band",
        F.coalesce(F.when(F.col("valid"), F.col("value")), F.lit(nodata)).alias("value"),
    )
    return pts.select("pt_id").join(matched, "pt_id", "left").select(
        "pt_id",
        F.coalesce("band", F.lit(1)).alias("band"),
        F.coalesce("value", F.lit(nodata)).alias("value"),
    )


def asof_latest(pages: DataFrame, res: int | None = None) -> DataFrame:
    """Latest page per cell by (warc_ts, url) — deterministic as-of top-1
    over runs sorted by (cell_id, warc_ts).

    Inputs already carrying ``cell_id`` (the bucketed ingest layout,
    sources/bucketed.py) use the stored column as-is: over a table
    bucketed by cell_id the window's required distribution is satisfied
    by the layout, so the whole query runs with ZERO Exchange — the
    once-at-ingest-shuffle architecture (benched: asof_latest_bucketed).

    ``res`` defaults to a None sentinel (ADVICE r5): passing it
    explicitly against a table that already carries ``cell_id`` is a
    contradiction — the stored tiling wins silently otherwise — so that
    combination raises instead of returning latest-per-stored-cell."""
    if "cell_id" in pages.columns:
        if res is not None:
            raise ValueError(
                "asof_latest: input already carries a cell_id column; an "
                "explicit res cannot be applied to a pre-tiled table "
                "(drop the res argument to use the stored tiling, or "
                "re-tile from lon/lat upstream)"
            )
        tiled = pages
    else:
        tiled = tile_pages(pages, res=DEFAULT_RES if res is None else res)
    w = W.partitionBy("cell_id").orderBy(F.col("warc_ts").desc(), F.col("url").desc())
    return (
        tiled.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("cell_id", "url", "warc_ts", "lang")
    )
