"""Minimal affine transform algebra for 2-D grids.

Semantics follow the 6-coefficient affine model used by the reference
engine (see /root/reference/rasterio/transform.py:160-171 for the
guard/validation behavior and the `affine.Affine` coefficient order):

    | x |   | a  b  c | | col |
    | y | = | d  e  f | | row |
    | 1 |   | 0  0  1 | |  1  |

This is a fresh implementation (the reference delegates to the external
`affine` package); only the behavior is mirrored, and only the subset the
engine needs: composition, point mapping, translation/scale constructors,
inversion, and vectorized forward/reverse application via NumPy
(forward = 3x3 matmul, reverse = `np.linalg.solve`, matching the numeric
path of rasterio's AffineTransformer, transform.py:518-541).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np


class Affine(NamedTuple):
    """Affine transform with row-major coefficients (a, b, c, d, e, f)."""

    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    # ---- constructors -------------------------------------------------
    @classmethod
    def identity(cls) -> "Affine":
        return cls(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    @classmethod
    def translation(cls, tx: float, ty: float) -> "Affine":
        return cls(1.0, 0.0, float(tx), 0.0, 1.0, float(ty))

    @classmethod
    def scale(cls, sx: float, sy: float | None = None) -> "Affine":
        if sy is None:
            sy = sx
        return cls(float(sx), 0.0, 0.0, 0.0, float(sy), 0.0)

    # ---- algebra -------------------------------------------------------
    def __mul__(self, other):  # type: ignore[override]
        """Compose with another Affine, or map a (x, y) point."""
        if isinstance(other, Affine):
            sa, sb, sc, sd, se, sf = self
            oa, ob, oc, od, oe, of = other
            return Affine(
                sa * oa + sb * od,
                sa * ob + sb * oe,
                sa * oc + sb * of + sc,
                sd * oa + se * od,
                sd * ob + se * oe,
                sd * oc + se * of + sf,
            )
        x, y = other
        sa, sb, sc, sd, se, sf = self
        return (sa * x + sb * y + sc, sd * x + se * y + sf)

    def __invert__(self) -> "Affine":
        a, b, c, d, e, f = self
        det = a * e - b * d
        if det == 0:
            raise ValueError("Cannot invert degenerate transform")
        ia, ib = e / det, -b / det
        id_, ie = -d / det, a / det
        ic = -(ia * c + ib * f)
        if_ = -(id_ * c + ie * f)
        return Affine(ia, ib, ic, id_, ie, if_)

    @property
    def determinant(self) -> float:
        return self.a * self.e - self.b * self.d

    def to_matrix(self) -> np.ndarray:
        return np.array(
            [[self.a, self.b, self.c], [self.d, self.e, self.f], [0.0, 0.0, 1.0]],
            dtype="float64",
        )

    # ---- vectorized application ----------------------------------------
    def forward(self, cols, rows) -> tuple[np.ndarray, np.ndarray]:
        """(col, row)* -> (x, y)* via 3x3 matmul (vectorized)."""
        cols = np.asarray(cols, dtype="float64")
        rows = np.asarray(rows, dtype="float64")
        m = np.empty((3, cols.size))
        m[0] = cols.ravel()
        m[1] = rows.ravel()
        m[2] = 1.0
        out = np.matmul(self.to_matrix(), m)
        return out[0].reshape(cols.shape), out[1].reshape(rows.shape)

    def reverse(self, xs, ys) -> tuple[np.ndarray, np.ndarray]:
        """(x, y)* -> fractional (col, row)* via linear solve (vectorized).

        Uses np.linalg.solve rather than an explicit inverse so the
        floating-point result bit-matches the reference's
        AffineTransformer reverse path (transform.py:530-541).
        """
        xs = np.asarray(xs, dtype="float64")
        ys = np.asarray(ys, dtype="float64")
        m = np.empty((3, xs.size))
        m[0] = xs.ravel()
        m[1] = ys.ravel()
        m[2] = 1.0
        out = np.linalg.solve(self.to_matrix(), m)
        return out[0].reshape(xs.shape), out[1].reshape(ys.shape)


IDENTITY = Affine.identity()

_GDAL_IDENTITY = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def tastes_like_gdal(seq: Sequence[float]) -> bool:
    """True when a 6-sequence matches the GDAL geotransform coefficient
    order (c, a, b, f, d, e) rather than ours — mirrors
    rasterio/transform.py:153-157."""
    t = tuple(seq)
    return t == _GDAL_IDENTITY or (t[2] == t[4] == 0.0 and t[1] > 0 and t[5] < 0)


def guard_transform(transform) -> Affine:
    """Coerce to Affine; reject GDAL-style sequences
    (mirrors rasterio/transform.py:160-171)."""
    if isinstance(transform, Affine):
        return transform
    if tastes_like_gdal(transform):
        raise TypeError(
            "GDAL-style transforms are not supported; pass (a, b, c, d, e, f)"
        )
    return Affine(*transform)
