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


def transform_geom(src_crs, dst_crs, geom: dict, precision: float = -1) -> dict:
    """Reproject a GeoJSON dict coordinate-by-coordinate
    (reference warp.py:64-108; antimeridian cutting is out of scope for
    the linear pair supported here — straddlers pass through)."""

    def conv(coords):
        if coords and isinstance(coords[0], (int, float)):
            x, y = transform_points(src_crs, dst_crs, [coords[0]], [coords[1]])
            px, py = float(x[0]), float(y[0])
            if precision >= 0:
                px, py = round(px, int(precision)), round(py, int(precision))
            return (px, py)
        return [conv(c) for c in coords]

    out = dict(geom)
    if geom.get("type") == "GeometryCollection":
        out["geometries"] = [transform_geom(src_crs, dst_crs, g, precision) for g in geom["geometries"]]
    else:
        out["coordinates"] = conv(list(geom["coordinates"]))
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
