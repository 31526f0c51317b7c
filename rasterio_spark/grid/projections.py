"""Non-UTM projected CRSs: EPSG:3395 (World Mercator) and the
Universal Polar Stereographic pair EPSG:32661/32761.

The reference hands any CRS pair to PROJ (reference rasterio/warp.py:
151-409 via WarpedVRT, CRS surface in rasterio/crs.pyx); this engine
ships closed-form WGS84 projections instead, built on the SAME public
machinery as :mod:`rasterio_spark.grid.utm` (Karney 2011 series):

- **EPSG:3395** — ellipsoidal Mercator, k0=1, natural origin. Forward
  is the isometric latitude ``psi = asinh(tan phi) - e*atanh(e*sin
  phi)`` scaled by ``a``; inverse recovers the conformal latitude
  ``chi = atan(sinh(y/a))`` and applies utm's CHI_TO_PHI series.
- **EPSG:32661 (UPS North) / 32761 (UPS South)** — polar stereographic
  variant A (EPSG Guidance Note 7-2), k0=0.994, FE=FN=2,000,000 m.
  Both directions are closed-form through the identity
  ``tan(pi/4 - chi/2) = exp(-psi)``: forward radius
  ``rho = 2*a*k0*exp(-psi)/C`` with
  ``C = sqrt((1+e)^(1+e) * (1-e)^(1-e))``; inverse is
  ``psi = -ln(rho*C/(2*a*k0))`` then the same CHI_TO_PHI series.

Like utm.py, ONE set of constants generates three agreeing forms:
vectorized NumPy, Spark Column expressions (pure JVM, whole-stage
codegen), and DuckDB SQL twins (hyperbolics via exp/ln identities).

The conic / equal-area family — EPSG:2154 (Lambert-93, LCC 2SP),
EPSG:5070 (Conus Albers), EPSG:3035 (LAEA Europe) — lives in
:mod:`rasterio_spark.grid.conic`; every entry point here delegates to
it so the crs.py hub needs a single dispatch module.
"""

from __future__ import annotations

import math

import numpy as np

from rasterio_spark.grid.utm import (
    A_WGS84,
    CHI_TO_PHI,
    D2R,
    E_ECC,
    _asinh,
    _atanh,
    _cosh,
    _sinh,
)

UPS_K0 = 0.994
UPS_FE = 2000000.0
UPS_FN = 2000000.0
# C = sqrt((1+e)^(1+e) * (1-e)^(1-e)) — EPSG GN7-2 polar stereographic
_UPS_C = math.sqrt((1.0 + E_ECC) ** (1.0 + E_ECC) * (1.0 - E_ECC) ** (1.0 - E_ECC))
# rho = RHO_SCALE * exp(-psi)
_RHO_SCALE = 2.0 * A_WGS84 * UPS_K0 / _UPS_C

MERC_3395 = 3395
UPS_NORTH = 32661
UPS_SOUTH = 32761


def is_supported(code: int) -> bool:
    from rasterio_spark.grid import conic

    return code in (MERC_3395, UPS_NORTH, UPS_SOUTH) or conic.is_supported(code)


# ----------------------------------------------------------------- numpy


def _psi_np(lat_deg):
    """Isometric latitude from geographic latitude (degrees)."""
    phi = np.asarray(lat_deg, dtype="float64") * D2R
    return np.arcsinh(np.tan(phi)) - E_ECC * np.arctanh(E_ECC * np.sin(phi))


from rasterio_spark.grid.utm import chi_to_phi_np as _chi_to_phi_np


def forward(lon, lat, code: int):
    """(lon, lat) degrees -> projected (x, y) meters."""
    from rasterio_spark.grid import conic

    if conic.is_supported(code):
        return conic.forward(lon, lat, code)

    lon = np.asarray(lon, dtype="float64")
    lat = np.asarray(lat, dtype="float64")
    if code == MERC_3395:
        return lon * D2R * A_WGS84, A_WGS84 * _psi_np(lat)
    if code in (UPS_NORTH, UPS_SOUTH):
        sgn = 1.0 if code == UPS_NORTH else -1.0
        rho = _RHO_SCALE * np.exp(-_psi_np(sgn * lat))
        lam = lon * D2R
        # north: y decreases away from the pole along lon 0; south mirrors
        return UPS_FE + rho * np.sin(lam), UPS_FN - sgn * rho * np.cos(lam)
    raise ValueError(f"not a supported projection EPSG code: {code}")


def inverse(x, y, code: int):
    """Projected (x, y) meters -> (lon, lat) degrees."""
    from rasterio_spark.grid import conic

    if conic.is_supported(code):
        return conic.inverse(x, y, code)

    x = np.asarray(x, dtype="float64")
    y = np.asarray(y, dtype="float64")
    if code == MERC_3395:
        chi = np.arctan(np.sinh(y / A_WGS84))
        return x / A_WGS84 / D2R, _chi_to_phi_np(chi) / D2R
    if code in (UPS_NORTH, UPS_SOUTH):
        sgn = 1.0 if code == UPS_NORTH else -1.0
        dx = x - UPS_FE
        dy = (UPS_FN - y) * sgn
        rho = np.hypot(dx, dy)
        with np.errstate(divide="ignore"):  # rho == 0 is the exact pole
            psi = -np.log(rho / _RHO_SCALE)
        chi = np.arctan(np.sinh(psi))
        chi = np.where(rho == 0.0, np.pi / 2.0, chi)
        lam = np.arctan2(dx, dy)
        return lam / D2R, sgn * _chi_to_phi_np(chi) / D2R
    raise ValueError(f"not a supported projection EPSG code: {code}")


# ------------------------------------------------------------ Spark cols


def _psi_cols(lat):
    from pyspark.sql import functions as F

    phi = lat * D2R
    return F.asinh(F.tan(phi)) - E_ECC * F.atanh(F.sin(phi) * E_ECC)


def _chi_to_phi_cols(chi):
    from pyspark.sql import functions as F

    phi = chi
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = phi + F.lit(c) * F.sin(chi * (2 * j))
    return phi


def forward_cols(lon, lat, code: int):
    """Spark Column (x, y) — pure JVM expressions, zero Python."""
    from rasterio_spark.grid import conic

    if conic.is_supported(code):
        return conic.forward_cols(lon, lat, code)

    from pyspark.sql import functions as F

    if code == MERC_3395:
        return lon * (D2R * A_WGS84), _psi_cols(lat) * A_WGS84
    if code in (UPS_NORTH, UPS_SOUTH):
        sgn = 1.0 if code == UPS_NORTH else -1.0
        rho = F.exp(_psi_cols(lat * sgn) * -1.0) * _RHO_SCALE
        lam = lon * D2R
        return F.lit(UPS_FE) + rho * F.sin(lam), F.lit(UPS_FN) - rho * F.cos(lam) * sgn
    raise ValueError(f"not a supported projection EPSG code: {code}")


def inverse_cols(x, y, code: int):
    """Spark Column (lon, lat) from projected coordinates."""
    from rasterio_spark.grid import conic

    if conic.is_supported(code):
        return conic.inverse_cols(x, y, code)

    from pyspark.sql import functions as F

    if code == MERC_3395:
        chi = F.atan(F.sinh(y / A_WGS84))
        return x / (A_WGS84 * D2R), _chi_to_phi_cols(chi) / D2R
    if code in (UPS_NORTH, UPS_SOUTH):
        sgn = 1.0 if code == UPS_NORTH else -1.0
        dx = x - F.lit(UPS_FE)
        dy = (F.lit(UPS_FN) - y) * sgn
        rho = F.sqrt(dx * dx + dy * dy)
        # rho == 0 (the exact pole) -> +inf psi -> chi = pi/2, lat = 90
        chi = F.when(rho == 0.0, math.pi / 2.0).otherwise(
            F.atan(F.sinh(F.log(rho / _RHO_SCALE) * -1.0))
        )
        lam = F.atan2(dx, dy)
        return lam / D2R, _chi_to_phi_cols(chi) * (sgn / D2R)
    raise ValueError(f"not a supported projection EPSG code: {code}")


# ------------------------------------------------------------ DuckDB SQL


def _psi_sql(lat_sql: str) -> str:
    phi = f"(({lat_sql}) * {D2R!r})"
    return f"({_asinh(f'tan({phi})')} - {E_ECC!r} * {_atanh(f'{E_ECC!r} * sin({phi})')})"


def _chi_to_phi_sql(chi: str) -> str:
    phi = chi
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = f"({phi} + {c!r} * sin({2 * j} * ({chi})))"
    return phi


def forward_sql(lon_sql: str, lat_sql: str, code: int) -> tuple[str, str]:
    """DuckDB (x, y) expression strings — identical literal constants."""
    from rasterio_spark.grid import conic

    if conic.is_supported(code):
        return conic.forward_sql(lon_sql, lat_sql, code)

    if code == MERC_3395:
        return (
            f"(({lon_sql}) * {D2R * A_WGS84!r})",
            f"({A_WGS84!r} * {_psi_sql(lat_sql)})",
        )
    if code in (UPS_NORTH, UPS_SOUTH):
        sgn = 1.0 if code == UPS_NORTH else -1.0
        rho = f"({_RHO_SCALE!r} * exp(-{_psi_sql(f'({sgn!r} * ({lat_sql}))')}))"
        lam = f"(({lon_sql}) * {D2R!r})"
        return (
            f"({UPS_FE!r} + {rho} * sin({lam}))",
            f"({UPS_FN!r} - {sgn!r} * {rho} * cos({lam}))",
        )
    raise ValueError(f"not a supported projection EPSG code: {code}")


def inverse_sql(x_sql: str, y_sql: str, code: int) -> tuple[str, str]:
    """DuckDB (lon, lat) expression strings from projected coordinates."""
    from rasterio_spark.grid import conic

    if conic.is_supported(code):
        return conic.inverse_sql(x_sql, y_sql, code)

    if code == MERC_3395:
        chi = f"atan({_sinh(f'(({y_sql}) / {A_WGS84!r})')})"
        return (
            f"(({x_sql}) / {A_WGS84 * D2R!r})",
            f"({_chi_to_phi_sql(chi)} / {D2R!r})",
        )
    if code in (UPS_NORTH, UPS_SOUTH):
        sgn = 1.0 if code == UPS_NORTH else -1.0
        dx = f"(({x_sql}) - {UPS_FE!r})"
        dy = f"({sgn!r} * ({UPS_FN!r} - ({y_sql})))"
        rho = f"sqrt({dx} * {dx} + {dy} * {dy})"
        # no pole guard in the SQL twin: oracle inputs avoid the exact pole
        chi = f"atan({_sinh(f'(-ln({rho} / {_RHO_SCALE!r}))')})"
        return (
            f"(atan2({dx}, {dy}) / {D2R!r})",
            f"({sgn!r} * {_chi_to_phi_sql(chi)} / {D2R!r})",
        )
    raise ValueError(f"not a supported projection EPSG code: {code}")
