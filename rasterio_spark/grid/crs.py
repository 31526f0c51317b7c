"""CRS support: the two fixed projections the engine ships
(SURVEY.md §1.1 CRS row: only equality checks and a fixed projection
pair need logic).

EPSG:4326 (lon/lat degrees, WGS84) <-> EPSG:3857 (Web Mercator). Pure
NumPy, the public spherical-Mercator formulas; also emitted as Spark
column expressions and DuckDB SQL so the whole warp stays JVM-side.

Reference behavior mirrored: warp.transform vectorized point transform
(/root/reference/rasterio/warp.py:26-61), transform_bounds with 21-point
edge densification (warp.py:111-148).
"""

from __future__ import annotations

import numpy as np

R = 6378137.0  # WGS84 semi-major axis used by EPSG:3857
MAX_X = 20037508.342789244
MERC_MAX_LAT = 85.051128779806589


def normalize_crs(crs) -> str:
    s = str(crs).upper().replace(" ", "")
    if s in ("EPSG:4326", "WGS84", "CRS84", "OGC:CRS84"):
        return "EPSG:4326"
    if s in ("EPSG:3857", "EPSG:900913", "WEBMERCATOR"):
        return "EPSG:3857"
    return s


def crs_equal(a, b) -> bool:
    return normalize_crs(a) == normalize_crs(b)


def is_geographic(crs) -> bool:
    return normalize_crs(crs) == "EPSG:4326"


def transform_points(src_crs: str, dst_crs: str, xs, ys):
    """Vectorized point transform between the supported CRS pair."""
    xs = np.asarray(xs, dtype="float64")
    ys = np.asarray(ys, dtype="float64")
    s, d = normalize_crs(src_crs), normalize_crs(dst_crs)
    if s == d:
        return xs, ys
    if (s, d) == ("EPSG:4326", "EPSG:3857"):
        x = xs * np.pi / 180.0 * R
        y = np.log(np.tan(np.pi / 4.0 + ys * np.pi / 360.0)) * R
        return x, y
    if (s, d) == ("EPSG:3857", "EPSG:4326"):
        lon = xs / R * 180.0 / np.pi
        lat = (2.0 * np.arctan(np.exp(ys / R)) - np.pi / 2.0) * 180.0 / np.pi
        return lon, lat
    raise ValueError(f"unsupported CRS pair {s} -> {d} (engine ships EPSG:4326 <-> EPSG:3857)")


def transform_bounds(src_crs, dst_crs, left, bottom, right, top, densify_pts: int = 21):
    """Outermost bbox after transforming 21-point-densified edges
    (parity: warp.py:111-148; 21 is the GDAL default)."""
    if densify_pts < 0:
        raise ValueError("densify_pts must be non-negative")
    n = densify_pts + 2
    xs_edge = np.linspace(left, right, n)
    ys_edge = np.linspace(bottom, top, n)
    xs = np.concatenate(
        [xs_edge, xs_edge, np.full(n, left), np.full(n, right)]
    )
    ys = np.concatenate(
        [np.full(n, bottom), np.full(n, top), ys_edge, ys_edge]
    )
    if normalize_crs(src_crs) == "EPSG:4326":
        ys = np.clip(ys, -MERC_MAX_LAT, MERC_MAX_LAT)
    tx, ty = transform_points(src_crs, dst_crs, xs, ys)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())


def _shift_lons(coords):
    """Shift a coordinate sequence into continuous [0, 360) longitude
    space when it crosses the antimeridian; returns (shifted, crossed)."""
    lons = [c[0] for c in coords]
    crossed = any(abs(b - a) > 180.0 for a, b in zip(lons[:-1], lons[1:])) or any(
        l > 180.0 or l < -180.0 for l in lons
    )
    if not crossed:
        return coords, False
    return [((x + 360.0) if x < 0 else x, y) for x, y in coords], True


def _clip_ring(coords, keep_left: bool):
    """Sutherland-Hodgman clip of a closed ring against lon <= 180
    (keep_left) or lon >= 180, in shifted [0, 360) space."""
    out = []
    for (x0, y0), (x1, y1) in zip(coords[:-1], coords[1:]):
        in0 = (x0 <= 180.0) if keep_left else (x0 >= 180.0)
        in1 = (x1 <= 180.0) if keep_left else (x1 >= 180.0)
        if in0:
            out.append((x0, y0))
        if in0 != in1:
            t = (180.0 - x0) / (x1 - x0)
            out.append((180.0, y0 + t * (y1 - y0)))
    if out and out[0] != out[-1]:
        out.append(out[0])
    return out if len(out) >= 4 else None


def _split_line(coords):
    """Split an open coordinate path at lon = 180 (shifted space);
    returns the list of parts."""
    parts = []
    cur = [coords[0]]
    for (x0, y0), (x1, y1) in zip(coords[:-1], coords[1:]):
        side0, side1 = x0 > 180.0, x1 > 180.0
        if side0 == side1 or x1 == 180.0 or x0 == 180.0:
            cur.append((x1, y1))
        else:
            t = (180.0 - x0) / (x1 - x0)
            mid = (180.0, y0 + t * (y1 - y0))
            cur.append(mid)
            parts.append(cur)
            cur = [mid, (x1, y1)]
    parts.append(cur)
    return [p for p in parts if len(p) >= 2]


def _unshift(coords):
    """Map an east-side part (shifted space, all lon >= 180) back to
    [-180, 180]: the shared boundary becomes -180, not +180."""
    if any(x > 180.0 for x, _ in coords):
        return [((x - 360.0) if x >= 180.0 else x, y) for x, y in coords]
    return coords


def cut_geometry_antimeridian(geom: dict) -> dict:
    """Cut a geographic (EPSG:4326) GeoJSON geometry at the +/-180
    meridian (reference warp.py:84 + _warp.pyx:107-141: OGR
    WRAPDATELINE, always on when the target is geographic). Polygons
    split into a MultiPolygon (left part + right part shifted by -360),
    LineStrings into a MultiLineString. Non-straddling geometries pass
    through unchanged. Holes are clipped against the same half-planes
    (a simplification of OGR's full topology repair, documented)."""
    gtype = geom.get("type")
    if gtype == "Polygon":
        shifted_rings = []
        crossed_any = False
        for ring in geom["coordinates"]:
            shifted, crossed = _shift_lons(list(ring))
            shifted_rings.append(shifted)
            crossed_any = crossed_any or crossed
        if not crossed_any:
            return geom
        west_poly = [r for r in (_clip_ring(ring, True) for ring in shifted_rings) if r]
        east_poly = [
            r
            for r in (_clip_ring(ring, False) for ring in shifted_rings)
            if r
        ]
        polys = []
        if west_poly:
            polys.append([[list(p) for p in ring] for ring in west_poly])
        if east_poly:
            polys.append([[list(p) for p in _unshift(ring)] for ring in east_poly])
        return {"type": "MultiPolygon", "coordinates": polys}
    if gtype == "LineString":
        shifted, crossed = _shift_lons(list(geom["coordinates"]))
        if not crossed:
            return geom
        parts = [_unshift(p) for p in _split_line(shifted)]
        return {
            "type": "MultiLineString",
            "coordinates": [[list(p) for p in part] for part in parts],
        }
    if gtype in ("MultiPolygon", "MultiLineString"):
        sub = "Polygon" if gtype == "MultiPolygon" else "LineString"
        cut = [
            cut_geometry_antimeridian({"type": sub, "coordinates": c})
            for c in geom["coordinates"]
        ]
        out_coords = []
        for g in cut:
            if g["type"] == sub:
                out_coords.append(g["coordinates"])
            else:
                out_coords.extend(g["coordinates"])
        return {"type": gtype, "coordinates": out_coords}
    return geom


def transform_geom(
    src_crs, dst_crs, geom: dict, precision: float = -1, antimeridian_cutting: bool = True
) -> dict:
    """Reproject a GeoJSON dict coordinate-by-coordinate
    (reference warp.py:64-108). When the target CRS is geographic,
    geometries straddling +/-180 are cut into Multi* parts — always on
    in the reference (warp.py:84); pass antimeridian_cutting=False to
    opt out."""

    def conv(coords):
        if coords and isinstance(coords[0], (int, float)):
            x, y = transform_points(src_crs, dst_crs, [coords[0]], [coords[1]])
            return (float(x[0]), float(y[0]))
        return [conv(c) for c in coords]

    def rounded(coords):
        if coords and isinstance(coords[0], (int, float)):
            return (round(coords[0], int(precision)), round(coords[1], int(precision)))
        return [rounded(c) for c in coords]

    out = dict(geom)
    if geom.get("type") == "GeometryCollection":
        out["geometries"] = [
            transform_geom(src_crs, dst_crs, g, precision, antimeridian_cutting)
            for g in geom["geometries"]
        ]
        return out
    out["coordinates"] = conv(list(geom["coordinates"]))
    if antimeridian_cutting and is_geographic(dst_crs):
        out = cut_geometry_antimeridian(out)
    if precision >= 0:
        out = dict(out)
        out["coordinates"] = rounded(out["coordinates"])
    return out


# ---- Spark / DuckDB expression twins --------------------------------------

def forward_3857_sql(lon_sql: str, lat_sql: str) -> tuple[str, str]:
    """DuckDB (x, y) Web-Mercator expressions (double)."""
    x = f"(({lon_sql}) * pi() / 180.0 * {R!r})"
    y = f"(ln(tan(pi() / 4.0 + ({lat_sql}) * pi() / 360.0)) * {R!r})"
    return x, y


def forward_3857_cols(lon, lat):
    """Spark Column (x, y) Web-Mercator expressions."""
    import math

    from pyspark.sql import functions as F

    x = lon * math.pi / 180.0 * R
    y = F.log(F.tan(math.pi / 4.0 + lat * math.pi / 360.0)) * R
    return x, y
