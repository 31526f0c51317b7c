"""Sinusoidal and Equidistant Cylindrical world grids.

Two more global raster grids the reference reaches through PROJ
(rasterio/warp.py:151-409, crs.pyx) and this engine ships closed-form:

- **Sinusoidal** (``+proj=sinu``) — the pseudocylindrical equal-area
  grid behind the MODIS land products. Two variants:

  * spherical, ``+R=r`` (MODIS uses R=6371007.181 m, the authalic
    sphere): ``x = R (lam - lam0) cos phi``, ``y = R phi`` — exact.
  * ellipsoidal (WGS84, Snyder 1987 eqs. 30-8/30-9):
    ``x = a cos phi / sqrt(1 - e^2 sin^2 phi) * (lam - lam0)``,
    ``y = M(phi)`` the meridian arc. M is evaluated through the
    rectifying latitude already shipped for transverse Mercator:
    ``M(phi) = A_CAP * mu(phi)`` with mu the Krueger xi series at
    lam = 0 (grid/utm.py ALPHA), and the inverse composes the BETA
    (rectifying -> conformal) and CHI_TO_PHI (conformal ->
    geographic) series — no new coefficients.

- **Equidistant Cylindrical** (``+proj=eqc``, EPSG method 1028;
  EPSG:4087 "WGS 84 / World Equidistant Cylindrical"):
  ``x = nu(lat_ts) cos(lat_ts) * (lam - lam0)``, ``y = M(phi)``.
  A nonzero ``+lat_0`` folds into an effective false northing
  ``fn_eff = y_0 - A_CAP * mu(lat_0)`` exactly like tmerc's.

Like grid/utm.py / grid/conic.py, ONE parameter set generates three
agreeing forms: vectorized NumPy, Spark Column expressions (pure JVM,
whole-stage codegen), and DuckDB SQL strings. Parameterized CRSs
normalize to a canonical "PROJ4:+proj=..." spec (crs.from_dict);
specs that spell a registry code (EPSG:4087) normalize home.
"""

from __future__ import annotations

import math

import numpy as np

from rasterio_spark.grid.utm import (
    A_CAP,
    A_WGS84,
    ALPHA,
    BETA,
    CHI_TO_PHI,
    D2R,
    E_ECC,
    _asinh,
    _atanh,
    _sinh,
    spec_dict,
    wrap_lon_cols,
    wrap_lon_np,
    wrap_lon_sql,
    wrap_rad_cols,
    wrap_rad_np,
    wrap_rad_sql,
)

E2 = E_ECC * E_ECC

EQC_4087 = 4087
MODIS_R = 6371007.181  # MODIS sinusoidal authalic sphere radius (m)


def sinu_canonical_spec(lon_0, x_0, y_0, r=None) -> str:
    """Deterministic "PROJ4:+proj=sinu ..." key; ``r`` is the sphere
    radius (None = WGS84 ellipsoidal)."""
    sphere = f"+r={float(r)!r} " if r is not None else ""
    return (
        f"PROJ4:+proj=sinu {sphere}+lon_0={float(lon_0)!r} "
        f"+x_0={float(x_0)!r} +y_0={float(y_0)!r}"
    )


def eqc_canonical_spec(lat_ts, lat_0, lon_0, x_0, y_0) -> str:
    return (
        f"PROJ4:+proj=eqc +lat_ts={float(lat_ts)!r} +lat_0={float(lat_0)!r} "
        f"+lon_0={float(lon_0)!r} +x_0={float(x_0)!r} +y_0={float(y_0)!r}"
    )


#: the MODIS land-grid CRS ("+proj=sinu +R=6371007.181"), normalized
MODIS_SINU = sinu_canonical_spec(0.0, 0.0, 0.0, MODIS_R)

_EQC_RAW: dict[int, tuple] = {
    EQC_4087: (0.0, 0.0, 0.0, 0.0, 0.0),  # lat_ts, lat_0, lon_0, x_0, y_0
}
_EQC_BY_CANON: dict[str, int] = {
    eqc_canonical_spec(*raw): code for code, raw in _EQC_RAW.items()
}


def eqc_epsg_for_spec(spec: str) -> int | None:
    """Registry EPSG code whose eqc parameters exactly match `spec`."""
    return _EQC_BY_CANON.get(spec)


# scalar rectifying latitude: the same series as utm's fn_eff fold
from rasterio_spark.grid.utm import _mu as _mu_scalar


def _eqc_consts(lat_ts, lat_0, lon_0, x_0, y_0) -> dict:
    phi1 = float(lat_ts) * D2R
    s1 = math.sin(phi1)
    return {
        "kind": "eqc",
        "nu1cos": A_WGS84 * math.cos(phi1) / math.sqrt(1.0 - E2 * s1 * s1),
        "lon0": float(lon_0) * D2R,
        "fe": float(x_0),
        "fn": float(y_0) - A_CAP * _mu_scalar(lat_0),
    }


_SPEC_CACHE: dict[str, dict] = {}


def _params(code) -> dict | None:
    """Derived constants for an EPSG code or canonical spec; None if
    the CRS is not a cylindrical/sinusoidal grid this module ships."""
    if isinstance(code, int):
        raw = _EQC_RAW.get(code)
        return _eqc_consts(*raw) if raw is not None else None
    if not isinstance(code, str) or not code.startswith("PROJ4:+proj="):
        return None
    hit = _SPEC_CACHE.get(code)
    if hit is not None:
        return hit
    try:
        kind, d = spec_dict(code)
    except (ValueError, KeyError):
        return None
    if kind == "sinu":
        r = d.get("r")
        if r is not None and r <= 0.0:
            return None
        out = {
            "kind": "sinu_sph" if r is not None else "sinu",
            "r": r,
            "lon0": d.get("lon_0", 0.0) * D2R,
            "fe": d.get("x_0", 0.0),
            "fn": d.get("y_0", 0.0),
        }
    elif kind == "eqc":
        if not abs(d.get("lat_ts", 0.0)) < 90.0:
            return None
        out = _eqc_consts(
            d.get("lat_ts", 0.0),
            d.get("lat_0", 0.0),
            d.get("lon_0", 0.0),
            d.get("x_0", 0.0),
            d.get("y_0", 0.0),
        )
    else:
        return None
    _SPEC_CACHE[code] = out
    return out


def is_supported(code) -> bool:
    return _params(code) is not None


# ----------------------------------------------------------------- numpy


def _mu_np(lat_deg):
    phi = np.asarray(lat_deg, dtype="float64") * D2R
    t = np.sinh(np.arcsinh(np.tan(phi)) - E_ECC * np.arctanh(E_ECC * np.sin(phi)))
    xi_p = np.arctan(t)
    mu = xi_p.copy()
    for j, a in enumerate(ALPHA, start=1):
        mu = mu + a * np.sin(2 * j * xi_p)
    return mu


def _mu_inv_np(mu):
    """Rectifying -> geographic latitude: BETA (rectifying ->
    conformal, the tmerc inverse at eta = 0) then CHI_TO_PHI."""
    chi = mu.copy()
    for j, b in enumerate(BETA, start=1):
        chi = chi - b * np.sin(2 * j * mu)
    phi = chi.copy()
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = phi + c * np.sin(2 * j * chi)
    return phi


def forward(lon, lat, code):
    """(lon, lat) degrees -> projected (x, y) meters."""
    p = _params(code)
    if p is None:
        raise ValueError(f"not a supported cylindrical CRS: {code}")
    lon = np.asarray(lon, dtype="float64")
    lat = np.asarray(lat, dtype="float64")
    phi = lat * D2R
    dlam = wrap_rad_np(lon * D2R - p["lon0"])
    if p["kind"] == "sinu_sph":
        return p["fe"] + p["r"] * dlam * np.cos(phi), p["fn"] + p["r"] * phi
    if p["kind"] == "sinu":
        s = np.sin(phi)
        nucos = A_WGS84 * np.cos(phi) / np.sqrt(1.0 - E2 * s * s)
        return p["fe"] + nucos * dlam, p["fn"] + A_CAP * _mu_np(lat)
    return p["fe"] + p["nu1cos"] * dlam, p["fn"] + A_CAP * _mu_np(lat)


def inverse(x, y, code):
    """Projected (x, y) meters -> (lon, lat) degrees."""
    p = _params(code)
    if p is None:
        raise ValueError(f"not a supported cylindrical CRS: {code}")
    x = np.asarray(x, dtype="float64")
    y = np.asarray(y, dtype="float64")
    dx = x - p["fe"]
    if p["kind"] == "sinu_sph":
        phi = (y - p["fn"]) / p["r"]
        cphi = np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = p["lon0"] + dx / (p["r"] * cphi)
        lam = np.where(np.abs(cphi) < 1e-12, p["lon0"], lam)  # exact pole
        return wrap_lon_np(lam / D2R), phi / D2R
    phi = _mu_inv_np((y - p["fn"]) / A_CAP)
    if p["kind"] == "sinu":
        s = np.sin(phi)
        nucos = A_WGS84 * np.cos(phi) / np.sqrt(1.0 - E2 * s * s)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = p["lon0"] + dx / nucos
        lam = np.where(np.abs(np.cos(phi)) < 1e-12, p["lon0"], lam)
        return wrap_lon_np(lam / D2R), phi / D2R
    return wrap_lon_np((p["lon0"] + dx / p["nu1cos"]) / D2R), phi / D2R


# ------------------------------------------------------------ Spark cols


def _mu_cols(lat):
    from pyspark.sql import functions as F

    phi = lat * D2R
    t = F.sinh(F.asinh(F.tan(phi)) - E_ECC * F.atanh(F.sin(phi) * E_ECC))
    xi_p = F.atan(t)
    mu = xi_p
    for j, a in enumerate(ALPHA, start=1):
        mu = mu + F.lit(a) * F.sin(xi_p * (2 * j))
    return mu


def _mu_inv_cols(mu):
    from pyspark.sql import functions as F

    chi = mu
    for j, b in enumerate(BETA, start=1):
        chi = chi - F.lit(b) * F.sin(mu * (2 * j))
    phi = chi
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = phi + F.lit(c) * F.sin(chi * (2 * j))
    return phi


def forward_cols(lon, lat, code):
    """Spark Column (x, y) — pure JVM expressions, zero Python."""
    from pyspark.sql import functions as F

    p = _params(code)
    if p is None:
        raise ValueError(f"not a supported cylindrical CRS: {code}")
    phi = lat * D2R
    dlam = wrap_rad_cols(lon * D2R - p["lon0"])
    if p["kind"] == "sinu_sph":
        return F.lit(p["fe"]) + dlam * F.cos(phi) * p["r"], F.lit(p["fn"]) + phi * p["r"]
    if p["kind"] == "sinu":
        s = F.sin(phi)
        nucos = F.cos(phi) / F.sqrt(F.lit(1.0) - s * s * E2) * A_WGS84
        return F.lit(p["fe"]) + nucos * dlam, F.lit(p["fn"]) + _mu_cols(lat) * A_CAP
    return (
        F.lit(p["fe"]) + dlam * p["nu1cos"],
        F.lit(p["fn"]) + _mu_cols(lat) * A_CAP,
    )


def inverse_cols(x, y, code):
    """Spark Column (lon, lat) from projected coordinates."""
    from pyspark.sql import functions as F

    p = _params(code)
    if p is None:
        raise ValueError(f"not a supported cylindrical CRS: {code}")
    dx = x - F.lit(p["fe"])
    if p["kind"] == "sinu_sph":
        phi = (y - F.lit(p["fn"])) / p["r"]
        cphi = F.cos(phi)
        lam = F.when(F.abs(cphi) < 1e-12, p["lon0"]).otherwise(
            F.lit(p["lon0"]) + dx / (cphi * p["r"])
        )
        return wrap_lon_cols(lam / D2R), phi / D2R
    phi = _mu_inv_cols((y - F.lit(p["fn"])) / A_CAP)
    if p["kind"] == "sinu":
        s = F.sin(phi)
        nucos = F.cos(phi) / F.sqrt(F.lit(1.0) - s * s * E2) * A_WGS84
        lam = F.when(F.abs(F.cos(phi)) < 1e-12, p["lon0"]).otherwise(
            F.lit(p["lon0"]) + dx / nucos
        )
        return wrap_lon_cols(lam / D2R), phi / D2R
    return wrap_lon_cols((F.lit(p["lon0"]) + dx / p["nu1cos"]) / D2R), phi / D2R


# ------------------------------------------------------------ DuckDB SQL


def _mu_sql(lat_sql: str) -> str:
    phi = f"(({lat_sql}) * {D2R!r})"
    t = _sinh(f"({_asinh(f'tan({phi})')} - {E_ECC!r} * {_atanh(f'{E_ECC!r} * sin({phi})')})")
    xi_p = f"atan({t})"
    mu = xi_p
    for j, a in enumerate(ALPHA, start=1):
        mu = f"({mu} + {a!r} * sin({2 * j} * ({xi_p})))"
    return mu


def _mu_inv_sql(mu: str) -> str:
    chi = mu
    for j, b in enumerate(BETA, start=1):
        chi = f"({chi} - {b!r} * sin({2 * j} * ({mu})))"
    phi = chi
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = f"({phi} + {c!r} * sin({2 * j} * ({chi})))"
    return phi


def forward_sql(lon_sql: str, lat_sql: str, code) -> tuple[str, str]:
    """DuckDB (x, y) expression strings — identical literal constants."""
    p = _params(code)
    if p is None:
        raise ValueError(f"not a supported cylindrical CRS: {code}")
    # CAST at derivation: DuckDB keeps DECIMAL literals DECIMAL through
    # pure +/-/* chains (overflowing DECIMAL(38) at full precision);
    # every downstream product must see a DOUBLE operand
    phi = f"CAST((({lat_sql}) * {D2R!r}) AS DOUBLE)"
    dlam = wrap_rad_sql(f"CAST((({lon_sql}) * {D2R!r} - {p['lon0']!r}) AS DOUBLE)")
    if p["kind"] == "sinu_sph":
        return (
            f"({p['fe']!r} + {p['r']!r} * {dlam} * cos({phi}))",
            f"({p['fn']!r} + {p['r']!r} * {phi})",
        )
    if p["kind"] == "sinu":
        s = f"sin({phi})"
        nucos = f"({A_WGS84!r} * cos({phi}) / sqrt(1.0 - {E2!r} * {s} * {s}))"
        return (
            f"({p['fe']!r} + {nucos} * {dlam})",
            f"({p['fn']!r} + {A_CAP!r} * {_mu_sql(lat_sql)})",
        )
    return (
        f"({p['fe']!r} + {p['nu1cos']!r} * {dlam})",
        f"({p['fn']!r} + {A_CAP!r} * {_mu_sql(lat_sql)})",
    )


def inverse_sql(x_sql: str, y_sql: str, code) -> tuple[str, str]:
    """DuckDB (lon, lat) expression strings from projected coordinates."""
    p = _params(code)
    if p is None:
        raise ValueError(f"not a supported cylindrical CRS: {code}")
    dx = f"CAST((({x_sql}) - {p['fe']!r}) AS DOUBLE)"
    if p["kind"] == "sinu_sph":
        # phi is pure linear arithmetic — same DECIMAL-literal hazard
        phi = f"CAST(((({y_sql}) - {p['fn']!r}) / {p['r']!r}) AS DOUBLE)"
        lam = (
            f"(CASE WHEN abs(cos({phi})) < 1e-12 THEN {p['lon0']!r} ELSE "
            f"{p['lon0']!r} + {dx} / ({p['r']!r} * cos({phi})) END)"
        )
        return wrap_lon_sql(f"({lam} / {D2R!r})"), f"({phi} / {D2R!r})"
    phi = _mu_inv_sql(f"((({y_sql}) - {p['fn']!r}) / {A_CAP!r})")
    if p["kind"] == "sinu":
        s = f"sin({phi})"
        nucos = f"({A_WGS84!r} * cos({phi}) / sqrt(1.0 - {E2!r} * {s} * {s}))"
        lam = (
            f"(CASE WHEN abs(cos({phi})) < 1e-12 THEN {p['lon0']!r} ELSE "
            f"{p['lon0']!r} + {dx} / {nucos} END)"
        )
        return wrap_lon_sql(f"({lam} / {D2R!r})"), f"({phi} / {D2R!r})"
    return (
        wrap_lon_sql(f"(({p['lon0']!r} + {dx} / {p['nu1cos']!r}) / {D2R!r})"),
        f"({phi} / {D2R!r})",
    )
