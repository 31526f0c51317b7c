"""GeoJSON-dict geometry utilities: validation, bounds, explode, PIP, R-tree.

Geometries are plain dicts (``{"type": ..., "coordinates": ...}``),
matching the reference's structural model
(/root/reference/rasterio/features.py:550-644). In DataFrames a polygon
layer is ``(polygon_id long, rings array<array<array<double>>>, value
double)``; the driver materializes small layers, builds an STR-packed
R-tree over the bboxes, and broadcasts it to the PIP pandas UDF.

The point-in-polygon test is even-odd ray casting with rasterio's
rasterize inclusion rule: a cell is burned iff its **center** is inside
the polygon (features.py:200-236 "pixel center" doc). Points exactly on
a lower/left edge count as inside (half-open), matching GDAL's scanline
convention closely enough to reproduce the conftest golden arrays
(tests/conftest.py:304-320 basic_image_2x2).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np

GEOM_TYPES = {
    "Point",
    "MultiPoint",
    "LineString",
    "LinearRing",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
}


def is_valid_geom(geom) -> bool:
    """Structural GeoJSON validation (parity: features.py:550-644).

    Non-empty, >= 2-coordinate points, >= 4-coordinate rings; only the
    first coordinate of each level is checked, like the reference.
    """
    geom = getattr(geom, "__geo_interface__", None) or geom
    try:
        geom_type = geom["type"]
    except (KeyError, TypeError):
        return False
    if geom_type not in GEOM_TYPES | {"GeometryCollection"}:
        return False

    if geom_type in GEOM_TYPES:
        if "coordinates" not in geom:
            return False
        c = geom["coordinates"]
        try:
            if geom_type == "Point":
                return len(c) >= 2
            if geom_type == "MultiPoint":
                return len(c) > 0 and len(c[0]) >= 2
            if geom_type == "LineString":
                return len(c) >= 2 and len(c[0]) >= 2
            if geom_type == "LinearRing":
                return len(c) >= 4 and len(c[0]) >= 2
            if geom_type == "MultiLineString":
                return len(c) > 0 and len(c[0]) >= 2 and len(c[0][0]) >= 2
            if geom_type == "Polygon":
                return len(c) > 0 and len(c[0]) >= 4 and len(c[0][0]) >= 2
            if geom_type == "MultiPolygon":
                return (
                    len(c) > 0
                    and len(c[0]) > 0
                    and len(c[0][0]) >= 4
                    and len(c[0][0][0]) >= 2
                )
        except (TypeError, IndexError):
            return False

    if geom_type == "GeometryCollection":
        geoms = geom.get("geometries")
        if not geoms:
            return False
        return all(is_valid_geom(g) for g in geoms)

    return True


def _coords_iter(obj) -> Iterator[tuple[float, float]]:
    """Flatten any nesting of coordinate lists into (x, y) pairs."""
    if isinstance(obj, (list, tuple)):
        if obj and isinstance(obj[0], (int, float)):
            yield obj[0], obj[1]
        else:
            for sub in obj:
                yield from _coords_iter(sub)


def geom_bounds(geometry) -> tuple[float, float, float, float]:
    """(left, bottom, right, top) of any GeoJSON-like object
    (parity: features.py:424-454 — honors an existing 'bbox')."""
    geometry = getattr(geometry, "__geo_interface__", None) or geometry
    if "bbox" in geometry:
        return tuple(geometry["bbox"])
    geom = geometry.get("geometry") or geometry
    if "geometries" in geom:
        boxes = [geom_bounds(g) for g in geom["geometries"]]
        return (
            min(b[0] for b in boxes),
            min(b[1] for b in boxes),
            max(b[2] for b in boxes),
            max(b[3] for b in boxes),
        )
    if "features" in geom:
        boxes = [geom_bounds(f) for f in geom["features"]]
        return (
            min(b[0] for b in boxes),
            min(b[1] for b in boxes),
            max(b[2] for b in boxes),
            max(b[3] for b in boxes),
        )
    if "coordinates" not in geom:
        raise ValueError(
            "geometry must be a GeoJSON-like geometry, GeometryCollection, "
            "or FeatureCollection"
        )
    pts = list(_coords_iter(geom["coordinates"]))
    if not pts:
        raise ValueError("geometry has no coordinates")
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def explode_geometries(geom) -> Iterator[dict]:
    """Explode GeometryCollection and MultiPolygon one level, like
    rasterize does to avoid interior-ring artifacts
    (parity: features.py:355-365)."""
    gtype = geom.get("type")
    if gtype == "GeometryCollection":
        for g in geom["geometries"]:
            yield from explode_geometries(g)
    elif gtype == "MultiPolygon":
        for poly in geom["coordinates"]:
            yield {"type": "Polygon", "coordinates": poly}
    else:
        yield geom


def polygon_rings(geom) -> list[np.ndarray]:
    """Polygon dict -> list of (n, 2) float64 ring arrays (first =
    exterior, rest = holes)."""
    if geom.get("type") != "Polygon":
        raise ValueError(f"expected Polygon, got {geom.get('type')}")
    return [np.asarray(ring, dtype="float64")[:, :2] for ring in geom["coordinates"]]


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Vectorized even-odd ray casting: for each point, count crossings
    of a ray to +x against every ring edge; odd total = inside.

    Holes flip parity naturally. Fully NumPy (points x edges broadcast),
    no per-row Python — this is the hot path of the PIP join UDF.
    """
    px = np.asarray(px, dtype="float64")
    py = np.asarray(py, dtype="float64")
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        x0 = ring[:-1, 0][None, :]
        y0 = ring[:-1, 1][None, :]
        x1 = ring[1:, 0][None, :]
        y1 = ring[1:, 1][None, :]
        pyc = py[:, None]
        pxc = px[:, None]
        # Half-open in y: edge spans [min, max) so a vertex is counted once.
        straddles = (y0 <= pyc) != (y1 <= pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at_y = x0 + (pyc - y0) * (x1 - x0) / (y1 - y0)
        crossings = straddles & (pxc < x_at_y)
        inside ^= (crossings.sum(axis=1) % 2).astype(bool)
    return inside


class FlatPolygons:
    """All polygons' ring edges concatenated into flat arrays, for
    batch PIP with NO per-polygon Python loop.

    Layout: edges of polygon k occupy [starts[k], starts[k] + counts[k])
    in (x0, y0, x1, y1); ``index`` maps polygon_id -> k. Built once on
    the driver, broadcast to executors.
    """

    __slots__ = ("index", "starts", "counts", "x0", "y0", "x1", "y1")

    def __init__(self, rings_by_id: dict):
        self.index = {}
        xs0, ys0, xs1, ys1 = [], [], [], []
        starts, counts = [], []
        pos = 0
        for pid, rings in rings_by_id.items():
            self.index[pid] = len(starts)
            n = 0
            for ring in rings:
                xs0.append(ring[:-1, 0])
                ys0.append(ring[:-1, 1])
                xs1.append(ring[1:, 0])
                ys1.append(ring[1:, 1])
                n += len(ring) - 1
            starts.append(pos)
            counts.append(n)
            pos += n
        self.starts = np.asarray(starts, dtype=np.int64)
        self.counts = np.asarray(counts, dtype=np.int64)
        self.x0 = np.concatenate(xs0) if xs0 else np.zeros(0)
        self.y0 = np.concatenate(ys0) if ys0 else np.zeros(0)
        self.x1 = np.concatenate(xs1) if xs1 else np.zeros(0)
        self.y1 = np.concatenate(ys1) if ys1 else np.zeros(0)

    def contains(self, pid: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even-odd PIP for (pid_i, x_i, y_i) triples — one flat
        vectorized pass: each candidate row is repeated once per edge of
        ITS polygon, crossings are ray-cast in bulk, and parity is
        reduced per row with np.add.reduceat."""
        n = len(pid)
        if n == 0:
            return np.zeros(0, dtype=bool)
        k = np.array([self.index.get(p, -1) for p in pid], dtype=np.int64)
        known = k >= 0
        out = np.zeros(n, dtype=bool)
        if not known.any():
            return out
        ki = k[known]
        cnt = self.counts[ki]
        total = int(cnt.sum())
        if total == 0:
            return out
        row_rep = np.repeat(np.arange(len(ki)), cnt)
        # edge indices: starts[ki] repeated + within-row offset
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        within = np.arange(total) - np.repeat(cum, cnt)
        e = np.repeat(self.starts[ki], cnt) + within
        ex0, ey0, ex1, ey1 = self.x0[e], self.y0[e], self.x1[e], self.y1[e]
        pxk = np.asarray(px, dtype="float64")[known]
        pyk = np.asarray(py, dtype="float64")[known]
        rx = pxk[row_rep]
        ry = pyk[row_rep]
        straddles = (ey0 <= ry) != (ey1 <= ry)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at_y = ex0 + (ry - ey0) * (ex1 - ex0) / (ey1 - ey0)
        crossings = (straddles & (rx < x_at_y)).astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        sums = np.add.reduceat(crossings, bounds)
        out[np.nonzero(known)[0]] = (sums % 2).astype(bool)
        return out


def _segments_intersect_rects(p0: np.ndarray, p1: np.ndarray, rects: np.ndarray) -> np.ndarray:
    """For each rect (n, 4 = x0,y0,x1,y1), does ANY segment (m, 2)->(m, 2)
    intersect it? Liang-Barsky clip test, vectorized (rects x segments)."""
    x0 = rects[:, 0][:, None]
    y0 = rects[:, 1][:, None]
    x1 = rects[:, 2][:, None]
    y1 = rects[:, 3][:, None]
    ax = p0[None, :, 0]
    ay = p0[None, :, 1]
    dx = (p1 - p0)[None, :, 0]
    dy = (p1 - p0)[None, :, 1]

    t0 = np.zeros_like(ax + x0)
    t1 = np.ones_like(t0)
    ok = np.ones(t0.shape, dtype=bool)
    for dcoord, lo, hi, a in ((dx, x0, x1, ax), (dy, y0, y1, ay)):
        with np.errstate(divide="ignore", invalid="ignore"):
            tlo = (lo - a) / dcoord
            thi = (hi - a) / dcoord
        tmin = np.minimum(tlo, thi)
        tmax = np.maximum(tlo, thi)
        parallel = dcoord == 0
        inside_band = (a >= lo) & (a <= hi)
        t0 = np.where(parallel, t0, np.maximum(t0, tmin))
        t1 = np.where(parallel, t1, np.minimum(t1, tmax))
        ok &= ~parallel | inside_band
    ok &= t0 <= t1
    return ok.any(axis=1)


def cells_touched_by_polygon(
    rows: np.ndarray, cols: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """all_touched test in grid coordinates: a cell [col, col+1) x
    [row, row+1) is touched iff its center is inside OR any ring edge
    intersects the cell rectangle (mirrors GDAL's ALL_TOUCHED behavior
    used by rasterize, reference rasterio/_features.pyx:367-370)."""
    rows = np.asarray(rows, dtype="float64")
    cols = np.asarray(cols, dtype="float64")
    inside = points_in_rings(cols + 0.5, rows + 0.5, rings)
    rects = np.stack([cols, rows, cols + 1.0, rows + 1.0], axis=1)
    p0 = np.concatenate([r[:-1] for r in rings])
    p1 = np.concatenate([r[1:] for r in rings])
    touched = _segments_intersect_rects(p0, p1, rects)
    return inside | touched


def line_cells(coords: np.ndarray) -> np.ndarray:
    """Cells crossed by a polyline (grid coordinates) via integer
    Bresenham per segment — the line-burning rule of rasterize
    (reference features.py:200-236: pixels on a Bresenham line).
    Returns unique (row, col) int64 pairs."""
    coords = np.asarray(coords, dtype="float64")[:, :2]
    out = []
    for (x0, y0), (x1, y1) in zip(coords[:-1], coords[1:]):
        c0, r0 = int(np.floor(x0)), int(np.floor(y0))
        c1, r1 = int(np.floor(x1)), int(np.floor(y1))
        dc, dr = abs(c1 - c0), abs(r1 - r0)
        n = max(dc, dr)
        if n == 0:
            out.append(np.array([[r0, c0]], dtype=np.int64))
            continue
        t = np.arange(n + 1, dtype="float64") / n
        rr = np.round(r0 + t * (r1 - r0)).astype(np.int64)
        cc = np.round(c0 + t * (c1 - c0)).astype(np.int64)
        out.append(np.stack([rr, cc], axis=1))
    return np.unique(np.concatenate(out), axis=0)


# ---- STR-packed R-tree (driver-built, broadcast to executors) -------------

class STRtree:
    """Sort-Tile-Recursive packed R-tree over bounding boxes.

    Built once on the driver from the polygon layer's bboxes, then
    broadcast; each PIP-join batch queries it to get candidate polygon
    ids before the exact ray-casting refine (the classic filter-and-
    refine spatial join; see SURVEY.md §2.3).

    Pure NumPy, pickle-friendly. Query is vectorized over a batch of
    boxes: returns (box_idx, item_id) candidate pairs.
    """

    __slots__ = ("node_boxes", "leaf_items", "_item_boxes", "ids", "_leaf_cap")

    def __init__(self, boxes: np.ndarray, ids: np.ndarray | None = None, leaf_capacity: int = 16):
        boxes = np.asarray(boxes, dtype="float64").reshape(-1, 4)
        n = len(boxes)
        self.ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids, dtype=np.int64)
        self._leaf_cap = leaf_capacity
        if n == 0:
            self.node_boxes = np.zeros((0, 4))
            self.leaf_items = []
            self._item_boxes = []
            return
        # STR packing: sort by center-x, slice into vertical strips,
        # sort each strip by center-y, chunk into leaves.
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        order = np.argsort(cx, kind="stable")
        n_leaves = max(1, -(-n // leaf_capacity))
        n_strips = max(1, int(np.ceil(np.sqrt(n_leaves))))
        strip_size = -(-n // n_strips)
        leaves: list[np.ndarray] = []
        for s in range(0, n, strip_size):
            strip = order[s : s + strip_size]
            strip = strip[np.argsort(cy[strip], kind="stable")]
            for t in range(0, len(strip), leaf_capacity):
                leaves.append(strip[t : t + leaf_capacity])
        self.leaf_items = [self.ids[leaf] for leaf in leaves]
        self._item_boxes = [boxes[leaf] for leaf in leaves]
        self.node_boxes = np.stack(
            [
                np.concatenate(
                    [boxes[leaf, :2].min(axis=0), boxes[leaf, 2:].max(axis=0)]
                )
                for leaf in leaves
            ]
        )

    def query(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch query: (m, 4) boxes -> (query_idx, item_id) overlap pairs."""
        qboxes = np.asarray(qboxes, dtype="float64").reshape(-1, 4)
        if len(self.node_boxes) == 0 or len(qboxes) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        nb = self.node_boxes
        # leaf-level overlap: (m, n_leaves)
        hit = (
            (qboxes[:, None, 0] <= nb[None, :, 2])
            & (qboxes[:, None, 2] >= nb[None, :, 0])
            & (qboxes[:, None, 1] <= nb[None, :, 3])
            & (qboxes[:, None, 3] >= nb[None, :, 1])
        )
        q_idx_out: list[np.ndarray] = []
        item_out: list[np.ndarray] = []
        # iterate LEAVES (few), vectorize over the queries hitting each
        for li in range(len(self.leaf_items)):
            q_hit = np.nonzero(hit[:, li])[0]
            if not q_hit.size:
                continue
            ib = self._item_boxes[li]
            qb = qboxes[q_hit]
            m = (
                (qb[:, None, 0] <= ib[None, :, 2])
                & (qb[:, None, 2] >= ib[None, :, 0])
                & (qb[:, None, 1] <= ib[None, :, 3])
                & (qb[:, None, 3] >= ib[None, :, 1])
            )
            qi2, ii = np.nonzero(m)
            if qi2.size:
                q_idx_out.append(q_hit[qi2])
                item_out.append(self.leaf_items[li][ii])
        if not q_idx_out:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        return np.concatenate(q_idx_out), np.concatenate(item_out)
