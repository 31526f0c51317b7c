"""Coordinate <-> grid transforms (pure, vectorized).

Behavioral parity with /root/reference/rasterio/transform.py:
- ``xy``      (row, col) -> (x, y) with offset in {center, ul, ur, ll, lr};
              center adds (+0.5, +0.5) (transform.py:462-473 via the
              identity-translation trick).
- ``rowcol``  (x, y) -> (row, col); default op is floor with int32 result
              (transform.py:407-428) — **floor-to-int32 is oracle-critical**.
- constructors from_origin / from_bounds / array_bounds
              (transform.py:174-217).

The same functions run driver-side (planning) and inside pandas UDFs
(vectorized over Arrow batches — zero per-row Python).
"""

from __future__ import annotations

import numpy as np

from rasterio_spark.grid.affine import Affine, guard_transform


def from_origin(west: float, north: float, xsize: float, ysize: float) -> Affine:
    """Affine from upper-left corner + pixel sizes (north-up)."""
    return Affine.translation(west, north) * Affine.scale(xsize, -ysize)


def from_bounds(west, south, east, north, width, height) -> Affine:
    """Affine from a bbox and grid dimensions."""
    return Affine.translation(west, north) * Affine.scale(
        (east - west) / width, (south - north) / height
    )


def array_bounds(height: int, width: int, transform: Affine):
    """(west, south, east, north) of a grid; rotated grids use the
    4-corner min/max (parity: transform.py:198-217)."""
    a, b, c, d, e, f = guard_transform(transform)
    if b == d == 0:
        return c, f + e * height, c + a * width, f
    t = guard_transform(transform)
    corners = [t * (0, 0), t * (0, height), t * (width, height), t * (width, 0)]
    xs = [p[0] for p in corners]
    ys = [p[1] for p in corners]
    return min(xs), min(ys), max(xs), max(ys)


_OFFSETS = {
    "center": (0.5, 0.5),
    "ul": (0.0, 0.0),
    "ur": (1.0, 0.0),
    "ll": (0.0, 1.0),
    "lr": (1.0, 1.0),
}


def xy(transform: Affine, rows, cols, offset: str = "center"):
    """Grid (row, col) -> world (x, y). Scalar in, scalar out; array in,
    ndarray out."""
    t = guard_transform(transform)
    if offset not in _OFFSETS:
        raise ValueError(f"Invalid offset: {offset!r}")
    coff, roff = _OFFSETS[offset]
    scalar = np.isscalar(rows) and np.isscalar(cols)
    rows_a = np.atleast_1d(np.asarray(rows, dtype="float64")) + roff
    cols_a = np.atleast_1d(np.asarray(cols, dtype="float64")) + coff
    xs, ys = t.forward(cols_a, rows_a)
    if scalar:
        return float(xs[0]), float(ys[0])
    return xs, ys


def rowcol(transform: Affine, xs, ys, op=None):
    """World (x, y) -> grid (row, col).

    ``op=None`` (default) floors and casts to int32, matching the
    reference default (transform.py:416-417). ``op=float`` returns the
    fractional coordinates (used by windows.from_bounds).
    """
    t = guard_transform(transform)
    scalar = np.isscalar(xs) and np.isscalar(ys)
    xs_a = np.atleast_1d(np.asarray(xs, dtype="float64"))
    ys_a = np.atleast_1d(np.asarray(ys, dtype="float64"))
    fcols, frows = t.reverse(xs_a, ys_a)
    if op is None:
        rows = np.floor(frows).astype(np.int32)
        cols = np.floor(fcols).astype(np.int32)
    elif isinstance(op, np.ufunc):
        rows = op(frows)
        cols = op(fcols)
    else:
        rows = np.array([op(v) for v in frows])
        cols = np.array([op(v) for v in fcols])
    if scalar:
        return rows[0].item(), cols[0].item()
    return rows, cols


def rowcol_arrays(transform: Affine, xs: np.ndarray, ys: np.ndarray):
    """Bulk rowcol for UDF hot path: float64 in, int32 out, no branching."""
    t = guard_transform(transform)
    fcols, frows = t.reverse(xs, ys)
    return np.floor(frows).astype(np.int32), np.floor(fcols).astype(np.int32)
