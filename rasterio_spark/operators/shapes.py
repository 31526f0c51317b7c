"""shapes / sieve — raster -> vector via distributed connected
components (SURVEY.md §2.3; reference /root/reference/rasterio/features.py:88-197
+ _features.pyx:35-300).

Reference semantics mirrored:
- regions = maximal sets of same-value valid cells connected under 4-
  or 8-connectivity (GDALPolygonize / GDALSieveFilter);
- ``shapes`` streams (geometry, value) per region — here the geometry
  is the exact rectilinear boundary (exterior + hole rings) traced from
  the region's cells, as GeoJSON-style nested lists;
- ``sieve`` removes regions smaller than ``size`` cells, replacing them
  with the value of the neighboring region with the largest shared
  border (ties -> smaller label), like GDALSieveFilter.

Scale design (SURVEY.md §7.3 #3): one ``applyInPandas`` pass computes
per-tile local components with an array-based union-find (no per-row
Python); only tile-boundary adjacencies (O(perimeter), not O(area))
leave the executors; the driver unions the tiny cross-tile edge graph
and broadcasts the relabel map. Exactly one shuffle over the cells.
Labels are deterministic: the minimum cell key (row * 2^32 + col) of
the component.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_SHIFT = 32  # cell key = (row << 32) | col — fits int64 for grids < 2^31


def _local_components(pdf: pd.DataFrame, connectivity: int) -> pd.DataFrame:
    """Fully vectorized per-tile connected components: neighbor matching
    via np.searchsorted over the sorted cell keys, then Shiloach-Vishkin
    style min-label propagation with pointer jumping — zero per-cell
    Python (round-3 fix; the r2 kernel probed a dict per cell per
    offset). O(E log N) vectorized passes; labels = min cell key."""
    rows = pdf["row"].values.astype(np.int64)
    cols = pdf["col"].values.astype(np.int64)
    vals = pdf["value"].values
    keys = (rows << KEY_SHIFT) | cols
    order = np.argsort(keys)
    rows, cols, vals, keys = rows[order], cols[order], vals[order], keys[order]
    n = len(keys)
    if n == 0:
        return pd.DataFrame({"row": rows, "col": cols, "value": vals, "label": keys})

    # neighbor offsets (only "forward" ones; edges are made symmetric below)
    offsets = [(0, 1), (1, 0)]
    if connectivity == 8:
        offsets += [(1, 1), (1, -1)]

    ei_parts, ej_parts = [], []
    for dr, dc in offsets:
        nkeys = ((rows + dr) << KEY_SHIFT) | (cols + dc)
        pos = np.searchsorted(keys, nkeys)
        pos_c = np.minimum(pos, n - 1)
        hit = (keys[pos_c] == nkeys) & (vals == vals[pos_c])
        ii = np.nonzero(hit)[0]
        ei_parts.append(ii)
        ej_parts.append(pos_c[ii])
    ii = np.concatenate(ei_parts) if ei_parts else np.empty(0, dtype=np.int64)
    jj = np.concatenate(ej_parts) if ej_parts else np.empty(0, dtype=np.int64)
    # symmetric edge arrays so min labels flow both ways
    ei = np.concatenate([ii, jj])
    ej = np.concatenate([jj, ii])

    labels = np.arange(n, dtype=np.int64)
    while True:
        # hook: every endpoint takes the min label across its edges
        new = labels.copy()
        np.minimum.at(new, ei, labels[ej])
        # pointer jumping: collapse label chains to their roots
        while True:
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, labels):
            break
        labels = new
    # labels are positions; position order == key order, so the min
    # position in a component is its min cell key
    return pd.DataFrame(
        {"row": rows, "col": cols, "value": vals, "label": keys[labels]}
    )


def connected_components(
    cells: DataFrame,
    connectivity: int = 4,
    tile_shape: tuple[int, int] = (256, 256),
) -> DataFrame:
    """(row, col, value, label) with globally-consistent component labels.

    Input: (row, col, value, valid) single band; invalid cells are not
    labeled (excluded), mirroring shapes' mask semantics
    (features.py:124-129).
    """
    th, tw = tile_shape
    src = cells.where(F.col("valid")).select("row", "col", "value")
    tiled = src.withColumn("_ti", F.expr(f"row DIV {th}")).withColumn(
        "_tj", F.expr(f"col DIV {tw}")
    )

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        return _local_components(pdf, connectivity)

    from rasterio_spark.plans.cache import scoped_persist

    local = tiled.groupBy("_ti", "_tj").applyInPandas(
        per_tile, schema="row long, col long, value double, label long"
    )
    local = scoped_persist(local)

    # boundary cells: at any tile edge (their neighbors may be in another tile)
    on_edge = (
        (F.col("row") % th == 0)
        | (F.col("row") % th == th - 1)
        | (F.col("col") % tw == 0)
        | (F.col("col") % tw == tw - 1)
    )
    edge_cells = local.where(on_edge).select("row", "col", "value", "label")

    offsets = [(0, 1), (1, 0)] + ([(1, 1), (1, -1)] if connectivity == 8 else [])
    a = edge_cells.alias("a")
    b = edge_cells.alias("b")
    pair_frames = []
    for dr, dc in offsets:
        cross_tile = F.expr(f"(a.row DIV {th}) != (b.row DIV {th})") | F.expr(
            f"(a.col DIV {tw}) != (b.col DIV {tw})"
        )
        pair_frames.append(
            a.join(
                b,
                (F.col("b.row") == F.col("a.row") + dr)
                & (F.col("b.col") == F.col("a.col") + dc)
                & (F.col("a.value") == F.col("b.value"))
                & cross_tile,
            ).select(F.col("a.label").alias("la"), F.col("b.label").alias("lb"))
        )
    pairs = pair_frames[0]
    for pf in pair_frames[1:]:
        pairs = pairs.unionByName(pf)
    # cross-tile label graph is O(tile-boundary adjacencies) — usually
    # tiny, but a continent-sized same-value region makes it grow with
    # total boundary length. Route it through the adaptive component
    # finder (round-3 fix): exact driver union-find under its 1M-edge
    # threshold, distributed min-label propagation above — never an
    # unconditional collect.
    from rasterio_spark.operators.dedup import connected_components_pairs

    roots = connected_components_pairs(
        pairs.distinct()
        .select(F.col("la").alias("doc_a"), F.col("lb").alias("doc_b"))
    )
    map_df = (
        roots.where(F.col("node") != F.col("label"))
        .select(F.col("node").alias("label"), F.col("label").alias("root"))
    )
    # no explicit broadcast hint: the driver path yields a local
    # relation (auto-broadcast), the distributed path lets AQE decide
    out = local.join(map_df, "label", "left").select(
        "row", "col", "value", F.coalesce("root", "label").alias("label")
    )
    return out


def shapes_summary(cells: DataFrame, connectivity: int = 4) -> DataFrame:
    """(label, value, n_cells, min_row, min_col, max_row, max_col) per
    region — the relational face of shapes()."""
    cc = connected_components(cells, connectivity)
    return cc.groupBy("label", "value").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("row").alias("min_row"),
        F.min("col").alias("min_col"),
        F.max("row").alias("max_row"),
        F.max("col").alias("max_col"),
    )


def cc_label_sql(cells_select: str, connectivity: int = 4) -> str:
    """DuckDB CTE chain labelling connected components by recursive
    min-label propagation — the oracle twin of connected_components.
    ``cells_select`` must yield (row, col, value) for valid cells.
    Defines ``labeled(row, col, value, label)`` with label = min cell
    key (row * 2^32 + col) of the component, exactly the engine's
    deterministic label rule. Embed after WITH RECURSIVE.

    Correctness: a component's minimum key is smaller than every other
    member's key, so the propagation condition label < k lets it reach
    every member along same-value adjacency; min() at the end picks it.
    """
    if connectivity == 8:
        adj = "greatest(abs(c.row - r.row), abs(c.col - r.col)) = 1"
    else:
        adj = "(abs(c.row - r.row) + abs(c.col - r.col)) = 1"
    return f"""
        cellsk AS (
          SELECT row, col, value, row * 4294967296 + col AS k
          FROM ({cells_select})
        ),
        reach(row, col, k, value, label) AS (
          SELECT row, col, k, value, k FROM cellsk
          UNION
          SELECT c.row, c.col, c.k, c.value, r.label
          FROM reach r JOIN cellsk c
            ON c.value = r.value AND {adj} AND r.label < c.k
        ),
        labeled AS (
          SELECT row, col, value, min(label) AS label
          FROM reach GROUP BY 1, 2, 3
        )
    """


def shapes_summary_sql(cells_select: str, connectivity: int = 4) -> str:
    """DuckDB oracle of shapes_summary over the same valid-cell input."""
    return f"""
        WITH RECURSIVE {cc_label_sql(cells_select, connectivity)}
        SELECT CAST(label AS BIGINT) AS label, value,
               count(*) AS n_cells,
               CAST(min(row) AS BIGINT) AS min_row,
               CAST(min(col) AS BIGINT) AS min_col,
               CAST(max(row) AS BIGINT) AS max_row,
               CAST(max(col) AS BIGINT) AS max_col
        FROM labeled GROUP BY 1, 2
    """


def sieve_sql(cells_select: str, size: int, connectivity: int = 4) -> str:
    """DuckDB oracle of sieve(mode='longest_border'): same CC labels,
    same longest-shared-border vote (ties -> smaller neighbor label)."""
    if connectivity == 8:
        adj = "greatest(abs(s.row - b.row), abs(s.col - b.col)) = 1"
    else:
        adj = "(abs(s.row - b.row) + abs(s.col - b.col)) = 1"
    return f"""
        WITH RECURSIVE {cc_label_sql(cells_select, connectivity)},
        sizes AS (SELECT label, count(*) AS n FROM labeled GROUP BY 1),
        lab2 AS (
          SELECT l.row, l.col, l.value, l.label, s.n
          FROM labeled l JOIN sizes s USING (label)
        ),
        small AS (SELECT row, col, label FROM lab2 WHERE n < {size}),
        big AS (
          SELECT row, col, label AS nlabel, value AS nvalue
          FROM lab2 WHERE n >= {size}
        ),
        votes AS (
          SELECT s.label, b.nlabel, b.nvalue, count(*) AS shared
          FROM small s JOIN big b ON {adj}
          GROUP BY 1, 2, 3
        ),
        repl AS (
          SELECT label, nvalue AS new_value FROM (
            SELECT label, nvalue,
                   row_number() OVER (
                     PARTITION BY label ORDER BY shared DESC, nlabel ASC
                   ) AS rk
            FROM votes
          ) WHERE rk = 1
        )
        SELECT CAST(l.row AS BIGINT) AS row, CAST(l.col AS BIGINT) AS col,
               CASE WHEN l.n < {size} AND r.new_value IS NOT NULL
                    THEN r.new_value ELSE l.value END AS value,
               TRUE AS valid
        FROM lab2 l LEFT JOIN repl r USING (label)
    """


def _trace_rings(rows: np.ndarray, cols: np.ndarray) -> list[list[tuple[float, float]]]:
    """Exact rectilinear boundary of a cell set: edge-cancellation +
    ring walking. Returns rings as (x, y) lists; first ring is the
    exterior (largest area), the rest are holes."""
    cell_set = set(zip(rows.tolist(), cols.tolist()))
    # boundary edges as directed segments, region kept to the left:
    # top edge -> rightward, right -> down, bottom -> leftward, left -> up
    segs: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(p, q):
        segs.setdefault(p, []).append(q)

    for r, c in cell_set:
        if (r - 1, c) not in cell_set:
            add((c, r), (c + 1, r))
        if (r, c + 1) not in cell_set:
            add((c + 1, r), (c + 1, r + 1))
        if (r + 1, c) not in cell_set:
            add((c + 1, r + 1), (c, r + 1))
        if (r, c - 1) not in cell_set:
            add((c, r + 1), (c, r))
    rings = []
    while segs:
        start = min(segs)
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            nxts = segs[cur]
            # prefer the left-most turn for consistent hole separation
            nxt = nxts.pop()
            if not nxts:
                del segs[cur]
            ring.append(nxt)
            cur = nxt
            if cur == start:
                break
        rings.append([(float(x), float(y)) for x, y in ring])

    def area(ring):
        s = 0.0
        for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
            s += x0 * y1 - x1 * y0
        return abs(s) / 2.0

    rings.sort(key=area, reverse=True)
    return rings


def shapes(cells: DataFrame, connectivity: int = 4) -> DataFrame:
    """(label, value, geometry_json): exact region polygons — the
    engine's features.shapes. Ring tracing runs per component inside
    applyInPandas (one task per component batch)."""
    import json

    cc = connected_components(cells, connectivity)

    def trace(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for label, grp in pdf.groupby("label"):
            rings = _trace_rings(grp["row"].values.astype(np.int64), grp["col"].values.astype(np.int64))
            geom = {"type": "Polygon", "coordinates": [[list(p) for p in ring] for ring in rings]}
            out.append((int(label), float(grp["value"].iloc[0]), json.dumps(geom)))
        return pd.DataFrame(out, columns=["label", "value", "geometry_json"])

    return cc.groupBy("label").applyInPandas(
        trace, schema="label long, value double, geometry_json string"
    )


def _sieve_region_graph(
    regions: dict[int, tuple[float, int]], edges: list[tuple[int, int]], size: int
) -> tuple[dict[int, int], dict[int, float]]:
    """Iterative GDALSieveFilter merge over the region graph.

    ``regions``: {label: (value, n_cells)}; ``edges``: adjacency pairs.
    GDAL rule (reference features.py:146-197 -> GDALSieveFilter): every
    polygon under the threshold merges into its LARGEST neighbor (which
    may itself be small), iterating until no under-threshold region has
    a neighbor. Determinism: passes process regions ascending
    (n_cells, label); target ties break to the smaller label; when an
    absorbed region bridges two same-value regions they fuse.

    Returns ({label: final_root_label}, {root: final_value}).
    """
    parent = {l: l for l in regions}
    val = {l: regions[l][0] for l in regions}
    cnt = {l: regions[l][1] for l in regions}
    adj: dict[int, set[int]] = {l: set() for l in regions}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union_into(a: int, b: int) -> None:
        """Absorb region a into b; b keeps its label and value."""
        parent[a] = b
        cnt[b] += cnt[a]
        adj[b] |= adj.pop(a, set())

    def live_neighbors(l: int) -> list[int]:
        ns = {find(n) for n in adj.get(l, ())} - {l}
        adj[l] = set(ns)  # compact stale entries
        return sorted(ns)

    changed = True
    while changed:
        changed = False
        order = sorted(
            (l for l in regions if find(l) == l and cnt[l] < size),
            key=lambda l: (cnt[l], l),
        )
        for l in order:
            if find(l) != l or cnt[l] >= size:
                continue
            nbrs = live_neighbors(l)
            if not nbrs:
                continue
            tgt = max(nbrs, key=lambda n: (cnt[n], -n))
            union_into(l, tgt)
            changed = True
            # the absorbed cells take tgt's value: any neighbor with the
            # same value is now one connected polygon -> fuse (repeat
            # until no same-value neighbor remains)
            fused = True
            while fused:
                fused = False
                for n in live_neighbors(tgt):
                    if val[n] == val[tgt]:
                        union_into(n, tgt)
                        fused = True
    root_of = {l: find(l) for l in regions}
    return root_of, val


def _sieve_region_graph_distributed(
    reg: DataFrame, edges: DataFrame, size: int, max_rounds: int = 50
) -> DataFrame:
    """Distributed GDAL-sieve merge over the region graph — the fallback
    when the graph exceeds the driver threshold.

    Round-synchronous schedule of the same rule as
    :func:`_sieve_region_graph`: each round, every under-threshold
    region that is a strict local minimum by (n_cells, label) among the
    currently-merging candidates merges into its largest live neighbor
    (ties -> smaller label); merged values then fuse adjacent same-value
    regions exactly (adaptive connected components). Local-minima-only
    merging makes each round's merge set an independent set — no two
    merging sources are adjacent, and every target is stable within the
    round — so the schedule is deterministic and always progresses (the
    global minimum is always a local minimum). It coincides with the
    sequential driver order whenever concurrently-merging regions don't
    contend (isolated small regions — the common sparse-noise case);
    under contention the merge ORDER may differ while the merge RULE is
    identical. The exact-sequential driver path remains the default
    whenever the region graph fits (see :func:`sieve`).

    ``reg``: (label, value, n); ``edges``: (la, lb) distinct, la != lb.
    Returns (label, new_value): final value for every original label.
    All state (mapping, live regions, edges) stays region-graph-sized
    and distributed; each round localCheckpoints to keep plans O(1).
    """
    import warnings

    from rasterio_spark.operators.dedup import connected_components_pairs

    mapping = reg.select(
        F.col("label").alias("node"), F.col("label").alias("root")
    ).localCheckpoint()
    live = reg.select(F.col("label").alias("root"), "value", "n").localCheckpoint()
    e = (
        edges.select(
            F.least("la", "lb").alias("la"), F.greatest("la", "lb").alias("lb")
        )
        .where(F.col("la") != F.col("lb"))
        .distinct()
        .localCheckpoint()
    )

    def _remap(df, col, delta):
        d = delta.select(F.col("old_root").alias(col), F.col("new_root").alias(f"_n_{col}"))
        return df.join(d, col, "left").withColumn(
            col, F.coalesce(f"_n_{col}", col)
        ).drop(f"_n_{col}")

    converged = False
    for _ in range(max_rounds):
        nbr = e.select(F.col("la").alias("src"), F.col("lb").alias("dst")).unionByName(
            e.select(F.col("lb").alias("src"), F.col("la").alias("dst"))
        )
        small = live.where(F.col("n") < size).select(
            F.col("root").alias("src"), F.col("n").alias("n_src")
        )
        cand = nbr.join(small, "src").join(
            live.select(F.col("root").alias("dst"), F.col("n").alias("n_dst")), "dst"
        )
        # target = largest live neighbor, ties -> smaller label
        choice = cand.groupBy("src", "n_src").agg(
            F.min(F.struct((-F.col("n_dst")).alias("k"), F.col("dst"))).getField("dst").alias("tgt")
        ).select("src", "n_src", "tgt")
        mergers_all = choice.localCheckpoint()
        if mergers_all.limit(1).count() == 0:
            converged = True  # no small region has a live neighbor
            break
        # local-minimum filter: src merges iff no merging neighbor has a
        # strictly smaller (n, label) key
        s_keys = mergers_all.select("src", "n_src")
        both = (
            nbr.join(s_keys, "src")
            .join(
                s_keys.select(
                    F.col("src").alias("dst"), F.col("n_src").alias("n_dst_s")
                ),
                "dst",
            )
        )
        blocked = both.where(
            F.struct(F.col("n_dst_s").alias("n"), F.col("dst").alias("l"))
            < F.struct(F.col("n_src").alias("n"), F.col("src").alias("l"))
        ).select("src").distinct()
        mergers = mergers_all.join(blocked, "src", "left_anti").localCheckpoint()

        delta = mergers.select(
            F.col("src").alias("old_root"), F.col("tgt").alias("new_root")
        )
        mapping = _remap(mapping, "root", delta).localCheckpoint()
        gains = mergers.groupBy("tgt").agg(F.sum("n_src").alias("gain"))
        live = (
            live.join(mergers.select(F.col("src").alias("root")), "root", "left_anti")
            .join(gains.select(F.col("tgt").alias("root"), "gain"), "root", "left")
            .withColumn("n", F.col("n") + F.coalesce("gain", F.lit(0)))
            .drop("gain")
            .localCheckpoint()
        )
        e = (
            _remap(_remap(e, "la", delta), "lb", delta)
            .select(F.least("la", "lb").alias("la"), F.greatest("la", "lb").alias("lb"))
            .where(F.col("la") != F.col("lb"))
            .distinct()
            .localCheckpoint()
        )

        # fuse adjacent same-value regions (absorbed cells took the
        # target's value; neighbors sharing it are now one polygon)
        ev = (
            e.join(live.select(F.col("root").alias("la"), F.col("value").alias("va")), "la")
            .join(live.select(F.col("root").alias("lb"), F.col("value").alias("vb")), "lb")
        )
        same = ev.where(F.col("va") == F.col("vb")).select("la", "lb").localCheckpoint()
        if same.limit(1).count() > 0:
            fused = connected_components_pairs(
                same.select(F.col("la").alias("doc_a"), F.col("lb").alias("doc_b"))
            )
            fdelta = fused.where(F.col("node") != F.col("label")).select(
                F.col("node").alias("old_root"), F.col("label").alias("new_root")
            )
            mapping = _remap(mapping, "root", fdelta).localCheckpoint()
            live = (
                _remap(live, "root", fdelta)
                .groupBy("root")
                .agg(F.first("value").alias("value"), F.sum("n").alias("n"))
                .localCheckpoint()
            )
            e = (
                _remap(_remap(e, "la", fdelta), "lb", fdelta)
                .select(F.least("la", "lb").alias("la"), F.greatest("la", "lb").alias("lb"))
                .where(F.col("la") != F.col("lb"))
                .distinct()
                .localCheckpoint()
            )
    if not converged:
        warnings.warn(
            f"sieve: distributed region merge did not converge in "
            f"{max_rounds} rounds; small regions may remain. Raise max_rounds.",
            RuntimeWarning,
            stacklevel=2,
        )
    return mapping.join(live.select("root", "value"), "root").select(
        F.col("node").alias("label"), F.col("value").alias("new_value")
    )


def sieve(
    cells: DataFrame,
    size: int,
    connectivity: int = 4,
    mode: str = "longest_border",
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Remove regions smaller than ``size`` cells
    (reference features.py:146-197 / GDALSieveFilter). Returns
    (row, col, value, valid).

    mode='longest_border' (default; documented engine divergence): ONE
    distributed pass — each small region takes the value of the >= size
    neighbor sharing the longest border (ties -> smaller label); small
    regions with no qualifying neighbor keep their value, so clusters
    of adjacent small regions that jointly exceed the threshold
    survive. Fully SQL-expressible (the DuckDB oracle runs the same
    rule) and fully distributed.

    mode='gdal': GDAL parity — iterative merge into the LARGEST
    neighbor polygon (which may itself be small) until stable, run on
    the REGION GRAPH (labels, sizes, adjacency). Adaptive: when the
    graph fits under ``driver_threshold`` edges+regions (region graphs
    are perimeter-bounded, so this is the overwhelmingly common case)
    an exact sequential union-find runs on the driver and the relabel
    map is broadcast back; above it, a round-synchronous distributed
    merge (:func:`_sieve_region_graph_distributed`) applies the same
    rule with nothing driver-side. ``driver_threshold=0`` forces the
    distributed path (tests pin its equivalence to the driver path).
    """
    from rasterio_spark.plans.cache import scoped_persist

    if mode == "gdal":
        cc = scoped_persist(connected_components(cells, connectivity))
        reg = scoped_persist(
            cc.groupBy("label").agg(
                F.first("value").alias("value"), F.count(F.lit(1)).alias("n")
            )
        )
        offsets = [(0, 1), (1, 0)] + ([(1, 1), (1, -1)] if connectivity == 8 else [])
        a = cc.alias("a")
        b = cc.alias("b")
        edge_frames = []
        for dr, dc in offsets:
            edge_frames.append(
                a.join(
                    b,
                    (F.col("b.row") == F.col("a.row") + dr)
                    & (F.col("b.col") == F.col("a.col") + dc)
                    & (F.col("a.label") != F.col("b.label")),
                ).select(
                    F.least(F.col("a.label"), F.col("b.label")).alias("la"),
                    F.greatest(F.col("a.label"), F.col("b.label")).alias("lb"),
                )
            )
        ef = edge_frames[0]
        for x in edge_frames[1:]:
            ef = ef.unionByName(x)
        ef = scoped_persist(ef.distinct())

        # probe-then-threshold (same hybrid as connected_components_pairs):
        # limit(N+1) caps driver transfer; persist above makes the probe
        # and any fallback share one computation of the edge set
        edge_rows = reg_rows = None
        if driver_threshold:
            edge_rows = ef.limit(driver_threshold + 1).collect()
            if len(edge_rows) <= driver_threshold:
                reg_rows = reg.limit(driver_threshold + 1).collect()
                if len(reg_rows) > driver_threshold:
                    reg_rows = None
        if reg_rows is not None:
            regions = {
                int(r["label"]): (float(r["value"]), int(r["n"])) for r in reg_rows
            }
            edges = [(r["la"], r["lb"]) for r in edge_rows]
            root_of, val = _sieve_region_graph(regions, edges, size)
            spark = cells.sparkSession
            relabel = F.broadcast(
                spark.createDataFrame(
                    [(l, float(val[r])) for l, r in root_of.items()],
                    "label long, new_value double",
                )
            )
        else:
            relabel = _sieve_region_graph_distributed(reg, ef, size)
        return cc.join(relabel, "label", "left").select(
            "row",
            "col",
            F.coalesce("new_value", "value").alias("value"),
            F.lit(True).alias("valid"),
        )
    if mode != "longest_border":
        raise ValueError(f"unknown sieve mode {mode!r}")
    cc = scoped_persist(connected_components(cells, connectivity))
    sizes = cc.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    cc2 = cc.join(F.broadcast(sizes), "label")
    small = cc2.where(F.col("n") < size).select("row", "col", "label")
    big = cc2.where(F.col("n") >= size).select(
        "row", "col", F.col("label").alias("nlabel"), F.col("value").alias("nvalue")
    )
    offsets = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if connectivity == 8:
        offsets += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    adj_frames = []
    for dr, dc in offsets:
        adj_frames.append(
            small.alias("s")
            .join(
                big.alias("g"),
                (F.col("g.row") == F.col("s.row") + dr)
                & (F.col("g.col") == F.col("s.col") + dc),
            )
            .select(F.col("s.label").alias("label"), "nlabel", "nvalue")
        )
    adj = adj_frames[0]
    for af in adj_frames[1:]:
        adj = adj.unionByName(af)
    votes = adj.groupBy("label", "nlabel", "nvalue").agg(F.count(F.lit(1)).alias("shared"))
    from pyspark.sql import Window as W

    w = W.partitionBy("label").orderBy(F.col("shared").desc(), F.col("nlabel").asc())
    repl = (
        votes.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("label", F.col("nvalue").alias("new_value"))
    )
    out = cc2.join(F.broadcast(repl), "label", "left").select(
        "row",
        "col",
        F.when(
            (F.col("n") < size) & F.col("new_value").isNotNull(), F.col("new_value")
        )
        .otherwise(F.col("value"))
        .alias("value"),
        F.lit(True).alias("valid"),
    )
    return out
