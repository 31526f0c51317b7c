"""UTM projection support: EPSG:326xx (north) / EPSG:327xx (south).

The reference's canonical dataset is EPSG:32618 (UTM 18N; profile
printed in reference rasterio/io.py:85-95) and its warp goldens run
4326<->32618/32633 (reference tests/test_warp.py:228-254,333-352).
This module supplies the transverse-Mercator math from the PUBLIC
Karney/Krueger 6th-order flattening series (Karney 2011, "Transverse
Mercator with an accuracy of a few nanometers" — the same series PROJ's
etmerc uses), sub-millimeter over the UTM domain.

Three implementations are generated from ONE coefficient table so they
agree bit-for-bit up to libm differences (~4e-9, CLAUDE.md rule —
oracle queries round):

- :func:`forward` / :func:`inverse` — vectorized NumPy (driver-side
  transform_points, bounds densification).
- :func:`forward_cols` / :func:`inverse_cols` — Spark Column
  expressions (native sinh/cosh/asinh/atanh): the reproject hot path
  stays inside whole-stage codegen, zero Python.
- :func:`forward_sql` / :func:`inverse_sql` — DuckDB twins (DuckDB has
  no hyperbolics, so they are emitted as exp/ln identities).
"""

from __future__ import annotations

import math

import numpy as np

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
K0 = 0.9996
FALSE_EASTING = 500000.0
FALSE_NORTHING_SOUTH = 10000000.0

_n = F_WGS84 / (2.0 - F_WGS84)
_n2, _n3, _n4, _n5, _n6 = _n**2, _n**3, _n**4, _n**5, _n**6

# rectifying radius
A_CAP = A_WGS84 / (1.0 + _n) * (1.0 + _n2 / 4.0 + _n4 / 64.0 + _n6 / 256.0)
E_ECC = math.sqrt(F_WGS84 * (2.0 - F_WGS84))  # first eccentricity

# Krueger alpha (geographic -> transverse mercator), Karney 2011 eq. 35
ALPHA = (
    _n / 2 - 2 * _n2 / 3 + 5 * _n3 / 16 + 41 * _n4 / 180 - 127 * _n5 / 288 + 7891 * _n6 / 37800,
    13 * _n2 / 48 - 3 * _n3 / 5 + 557 * _n4 / 1440 + 281 * _n5 / 630 - 1983433 * _n6 / 1935360,
    61 * _n3 / 240 - 103 * _n4 / 140 + 15061 * _n5 / 26880 + 167603 * _n6 / 181440,
    49561 * _n4 / 161280 - 179 * _n5 / 168 + 6601661 * _n6 / 7257600,
    34729 * _n5 / 80640 - 3418889 * _n6 / 1995840,
    212378941 * _n6 / 319334400,
)
# Krueger beta (inverse), Karney 2011 eq. 36
BETA = (
    _n / 2 - 2 * _n2 / 3 + 37 * _n3 / 96 - _n4 / 360 - 81 * _n5 / 512 + 96199 * _n6 / 604800,
    _n2 / 48 + _n3 / 15 - 437 * _n4 / 1440 + 46 * _n5 / 105 - 1118711 * _n6 / 3870720,
    17 * _n3 / 480 - 37 * _n4 / 840 - 209 * _n5 / 4480 + 5569 * _n6 / 90720,
    4397 * _n4 / 161280 - 11 * _n5 / 504 - 830251 * _n6 / 7257600,
    4583 * _n5 / 161280 - 108847 * _n6 / 3991680,
    20648693 * _n6 / 638668800,
)
# conformal latitude -> geographic latitude series (public inverse
# conformal-latitude expansion in the third flattening n)
CHI_TO_PHI = (
    2 * _n - 2 * _n2 / 3 - 2 * _n3 + 116 * _n4 / 45 + 26 * _n5 / 45 - 2854 * _n6 / 675,
    7 * _n2 / 3 - 8 * _n3 / 5 - 227 * _n4 / 45 + 2704 * _n5 / 315 + 2323 * _n6 / 945,
    56 * _n3 / 15 - 136 * _n4 / 35 - 1262 * _n5 / 105 + 73814 * _n6 / 2835,
    4279 * _n4 / 630 - 332 * _n5 / 35 - 399572 * _n6 / 14175,
    4174 * _n5 / 315 - 144838 * _n6 / 6237,
    601676 * _n6 / 22275,
)

D2R = math.pi / 180.0
TWO_PI = 2.0 * math.pi


# -------------------------------------------------- longitude wrapping
#
# PROJ adjusts longitudes around the central meridian (adjlon) before
# projecting, and inverse longitudes back into range. The floor
# identity here maps into [-pi, pi) — exactly +180 becomes -180 (same
# meridian; the round-trip convention is the west side). Forwards
# that are 2pi-periodic in lam (tmerc, polar stereographic, laea)
# need no input wrap — sin/cos absorb it — but conic th = n*dlam and
# the linear cylindrical x do, and every inverse with a nonzero lon_0
# must wrap its output (NZTM antimeridian points, EPSG:3413's
# lon_0=-45). Mercator (3857/3395) is also linear in lon but safe
# UNWRAPPED only because both ship with lon_0 = 0 — a future
# nonzero-lon_0 Mercator must wrap like the cylindricals. The floor
# identity keeps in-range values EXACTLY unchanged (subtracts 0.0) in
# all three forms, so existing oracle hashes are untouched.


def wrap_lon_np(lon_deg):
    return lon_deg - 360.0 * np.floor((lon_deg + 180.0) / 360.0)


def wrap_rad_np(lam):
    return lam - TWO_PI * np.floor((lam + math.pi) / TWO_PI)


def wrap_lon_cols(lon):
    from pyspark.sql import functions as F

    return lon - F.floor((lon + 180.0) / 360.0).cast("double") * 360.0


def wrap_rad_cols(lam):
    from pyspark.sql import functions as F

    return lam - F.floor((lam + math.pi) / TWO_PI).cast("double") * TWO_PI


def wrap_lon_sql(lon_sql: str) -> str:
    return f"(({lon_sql}) - 360.0 * floor((({lon_sql}) + 180.0) / 360.0))"


def wrap_rad_sql(lam_sql: str) -> str:
    return f"(({lam_sql}) - {TWO_PI!r} * floor((({lam_sql}) + {math.pi!r}) / {TWO_PI!r}))"


def utm_epsg_params(code: int) -> tuple[float, float] | None:
    """(central meridian lon0 degrees, false northing) for a UTM EPSG
    code, or None if the code is not UTM. WGS84 zones 1..60 (326xx
    north / 327xx south) plus the GRS80-family national series the
    engine transforms with a null datum shift (crs.py
    GEOGRAPHIC_WGS84_FAMILY note): NAD83 26901-26923, ETRS89
    25828-25838, GDA94 MGA 28348-28358 (south)."""
    if 32601 <= code <= 32660:
        return float((code - 32600) * 6 - 183), 0.0
    if 32701 <= code <= 32760:
        return float((code - 32700) * 6 - 183), FALSE_NORTHING_SOUTH
    if 26901 <= code <= 26923:  # NAD83 / UTM zone 1N..23N
        return float((code - 26900) * 6 - 183), 0.0
    if 25828 <= code <= 25838:  # ETRS89 / UTM zone 28N..38N
        return float((code - 25800) * 6 - 183), 0.0
    if 28348 <= code <= 28358:  # GDA94 / MGA zone 48..58 (south)
        return float((code - 28300) * 6 - 183), FALSE_NORTHING_SOUTH
    return None


def is_utm(code: int) -> bool:
    return isinstance(code, int) and utm_epsg_params(code) is not None


# ------------------------------------------------- generalized tmerc
#
# The Krueger series is parameterized by (lon0, k0, fe, fn_eff): any
# transverse-Mercator CRS is E = fe + k0*A*eta, N = fn_eff + k0*A*xi
# with fn_eff = y_0 - k0*A*mu(lat_0) folding the natural-origin
# latitude into a northing shift (mu = rectifying latitude = xi at
# lam=0, so the series needs no other change). UTM is the special case
# (zone meridian, 0.9996, 500000, 0 or 1e7).


def _mu(lat0_deg: float) -> float:
    """Rectifying latitude of lat_0 (the xi series at lam=0)."""
    phi = float(lat0_deg) * D2R
    t = math.sinh(math.asinh(math.tan(phi)) - E_ECC * math.atanh(E_ECC * math.sin(phi)))
    xi_p = math.atan(t)
    xi = xi_p
    for j, a in enumerate(ALPHA, start=1):
        xi += a * math.sin(2 * j * xi_p)
    return xi


def chi_to_phi_np(chi):
    """Conformal -> geographic latitude via the public CHI_TO_PHI
    series (shared by projections.py and conic.py)."""
    phi = chi.copy()
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = phi + c * np.sin(2 * j * chi)
    return phi


def spec_dict(spec: str) -> tuple[str, dict]:
    """Parse a canonical "PROJ4:+proj=... +k=v ..." spec into
    (proj, {param: float}) — the single parser behind utm._tm_params
    and conic._consts_for_spec."""
    proj = ""
    d: dict = {}
    for tok in spec[len("PROJ4:"):].split():
        key, _, val = tok.lstrip("+").partition("=")
        if key == "proj":
            proj = val
        else:
            d[key] = float(val)
    return proj, d


def tm_canonical_spec(lat_0, lon_0, k_0, x_0, y_0) -> str:
    """Deterministic "PROJ4:+proj=tmerc ..." key for a parameterized
    transverse-Mercator CRS (crs.from_dict normalization target)."""
    return (
        f"PROJ4:+proj=tmerc +lat_0={float(lat_0)!r} +lon_0={float(lon_0)!r} "
        f"+k_0={float(k_0)!r} +x_0={float(x_0)!r} +y_0={float(y_0)!r}"
    )


# named TM registry beyond the UTM series: EPSG:2193 NZGD2000 / New
# Zealand Transverse Mercator 2000 (NZGD2000 == GRS80 family)
_TM_RAW: dict[int, tuple] = {
    2193: (0.0, 173.0, 0.9996, 1600000.0, 10000000.0),
}
_TM_BY_CANON: dict[str, int] = {
    tm_canonical_spec(*raw): code for code, raw in _TM_RAW.items()
}
# UTM zones expressed as raw tmerc parameters also normalize home
for _z in range(1, 61):
    _TM_BY_CANON[tm_canonical_spec(0.0, _z * 6 - 183, 0.9996, 500000.0, 0.0)] = 32600 + _z
    _TM_BY_CANON[
        tm_canonical_spec(0.0, _z * 6 - 183, 0.9996, 500000.0, FALSE_NORTHING_SOUTH)
    ] = 32700 + _z

_TM_SPEC_CACHE: dict[str, tuple] = {}


def tm_epsg_for_spec(spec: str) -> int | None:
    """EPSG code whose tmerc parameters exactly match `spec`."""
    return _TM_BY_CANON.get(spec)


def _tm_params(code) -> tuple[float, float, float, float] | None:
    """(lon0, k0, fe, fn_eff) for a UTM/TM EPSG code or a canonical
    "PROJ4:+proj=tmerc ..." spec string; None if not TM."""
    if isinstance(code, str):
        if not code.startswith("PROJ4:+proj=tmerc"):
            return None
        hit = _TM_SPEC_CACHE.get(code)
        if hit is not None:
            return hit
        _, d = spec_dict(code)
        k0 = d["k_0"]
        out = (d["lon_0"], k0, d["x_0"], d["y_0"] - k0 * A_CAP * _mu(d["lat_0"]))
        _TM_SPEC_CACHE[code] = out
        return out
    raw = _TM_RAW.get(code)
    if raw is not None:
        lat_0, lon_0, k0, x_0, y_0 = raw
        return (lon_0, k0, x_0, y_0 - k0 * A_CAP * _mu(lat_0))
    p = utm_epsg_params(code) if isinstance(code, int) else None
    if p is not None:
        return (p[0], K0, FALSE_EASTING, p[1])
    return None


def is_tm(code) -> bool:
    """True for any transverse-Mercator CRS the engine resolves: UTM
    zone codes, the named TM registry, or a parameterized spec."""
    try:
        return _tm_params(code) is not None
    except (KeyError, ValueError):
        return False


# ----------------------------------------------------------------- numpy


def forward(lon, lat, code: int):
    """(lon, lat) degrees -> (easting, northing) meters for a UTM EPSG
    code. Vectorized; same series as the column/SQL twins."""
    params = _tm_params(code)
    if params is None:
        raise ValueError(f"not a UTM/TM EPSG code or tmerc spec: {code}")
    lon0, k0, fe, fn = params
    lam = (np.asarray(lon, dtype="float64") - lon0) * D2R
    phi = np.asarray(lat, dtype="float64") * D2R
    t = np.sinh(np.arcsinh(np.tan(phi)) - E_ECC * np.arctanh(E_ECC * np.sin(phi)))
    cl = np.cos(lam)
    xi_p = np.arctan2(t, cl)
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, cl))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return fe + k0 * A_CAP * eta, fn + k0 * A_CAP * xi


def inverse(x, y, code: int):
    """(easting, northing) meters -> (lon, lat) degrees."""
    params = _tm_params(code)
    if params is None:
        raise ValueError(f"not a UTM/TM EPSG code or tmerc spec: {code}")
    lon0, k0, fe, fn = params
    xi = (np.asarray(y, dtype="float64") - fn) / (k0 * A_CAP)
    eta = (np.asarray(x, dtype="float64") - fe) / (k0 * A_CAP)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(BETA, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = phi + c * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return wrap_lon_np(lon0 + lam / D2R), phi / D2R


# ------------------------------------------------------------ Spark cols


def forward_cols(lon, lat, code: int):
    """Spark Column (easting, northing) — pure JVM expressions, same
    series; keeps reproject/tiling inside whole-stage codegen."""
    from pyspark.sql import functions as F

    params = _tm_params(code)
    if params is None:
        raise ValueError(f"not a UTM/TM EPSG code or tmerc spec: {code}")
    lon0, k0, fe, fn = params
    lam = (lon - F.lit(lon0)) * D2R
    phi = lat * D2R
    t = F.sinh(F.asinh(F.tan(phi)) - E_ECC * F.atanh(F.sin(phi) * E_ECC))
    cl = F.cos(lam)
    xi_p = F.atan2(t, cl)
    eta_p = F.asinh(F.sin(lam) / F.sqrt(t * t + cl * cl))
    xi, eta = xi_p, eta_p
    for j, a in enumerate(ALPHA, start=1):
        xi = xi + F.lit(a) * F.sin(xi_p * (2 * j)) * F.cosh(eta_p * (2 * j))
        eta = eta + F.lit(a) * F.cos(xi_p * (2 * j)) * F.sinh(eta_p * (2 * j))
    return F.lit(fe) + eta * (k0 * A_CAP), F.lit(fn) + xi * (k0 * A_CAP)


def inverse_cols(x, y, code: int):
    """Spark Column (lon, lat) from UTM easting/northing."""
    from pyspark.sql import functions as F

    params = _tm_params(code)
    if params is None:
        raise ValueError(f"not a UTM/TM EPSG code or tmerc spec: {code}")
    lon0, k0, fe, fn = params
    xi = (y - F.lit(fn)) / (k0 * A_CAP)
    eta = (x - F.lit(fe)) / (k0 * A_CAP)
    xi_p, eta_p = xi, eta
    for j, b in enumerate(BETA, start=1):
        xi_p = xi_p - F.lit(b) * F.sin(xi * (2 * j)) * F.cosh(eta * (2 * j))
        eta_p = eta_p - F.lit(b) * F.cos(xi * (2 * j)) * F.sinh(eta * (2 * j))
    chi = F.asin(F.sin(xi_p) / F.cosh(eta_p))
    phi = chi
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = phi + F.lit(c) * F.sin(chi * (2 * j))
    lam = F.atan2(F.sinh(eta_p), F.cos(xi_p))
    return wrap_lon_cols(F.lit(lon0) + lam / D2R), phi / D2R


# ------------------------------------------------------------ DuckDB SQL

# DuckDB ships no hyperbolic functions — exp/ln identities instead.


def _sinh(s: str) -> str:
    return f"((exp({s}) - exp(-({s}))) / 2.0)"


def _cosh(s: str) -> str:
    return f"((exp({s}) + exp(-({s}))) / 2.0)"


def _asinh(s: str) -> str:
    return f"ln(({s}) + sqrt(({s}) * ({s}) + 1.0))"


def _atanh(s: str) -> str:
    return f"(0.5 * ln((1.0 + ({s})) / (1.0 - ({s}))))"


def forward_sql(lon_sql: str, lat_sql: str, code: int) -> tuple[str, str]:
    """DuckDB (easting, northing) expression strings. Verbose but
    mechanical: the identical literal coefficients as the engine.
    Compare with round(4) — libm vs JVM differ at ~1e-9 relative."""
    params = _tm_params(code)
    if params is None:
        raise ValueError(f"not a UTM/TM EPSG code or tmerc spec: {code}")
    lon0, k0, fe, fn = params
    lam = f"((({lon_sql}) - {lon0!r}) * {D2R!r})"
    phi = f"(({lat_sql}) * {D2R!r})"
    t = _sinh(f"({_asinh(f'tan({phi})')} - {E_ECC!r} * {_atanh(f'{E_ECC!r} * sin({phi})')})")
    cl = f"cos({lam})"
    xi_p = f"atan2({t}, {cl})"
    eta_p = _asinh(f"(sin({lam}) / sqrt(({t}) * ({t}) + ({cl}) * ({cl})))")
    xi = xi_p
    eta = eta_p
    for j, a in enumerate(ALPHA, start=1):
        xi = f"({xi} + {a!r} * sin({2 * j} * ({xi_p})) * {_cosh(f'{2 * j} * ({eta_p})')})"
        eta = f"({eta} + {a!r} * cos({2 * j} * ({xi_p})) * {_sinh(f'{2 * j} * ({eta_p})')})"
    return (
        f"({fe!r} + {k0 * A_CAP!r} * {eta})",
        f"({fn!r} + {k0 * A_CAP!r} * {xi})",
    )


def inverse_sql(x_sql: str, y_sql: str, code: int) -> tuple[str, str]:
    """DuckDB (lon, lat) expression strings from UTM easting/northing."""
    params = _tm_params(code)
    if params is None:
        raise ValueError(f"not a UTM/TM EPSG code or tmerc spec: {code}")
    lon0, k0, fe, fn = params
    xi = f"((({y_sql}) - {fn!r}) / {k0 * A_CAP!r})"
    eta = f"((({x_sql}) - {fe!r}) / {k0 * A_CAP!r})"
    xi_p = xi
    eta_p = eta
    for j, b in enumerate(BETA, start=1):
        xi_p = f"({xi_p} - {b!r} * sin({2 * j} * ({xi})) * {_cosh(f'{2 * j} * ({eta})')})"
        eta_p = f"({eta_p} - {b!r} * cos({2 * j} * ({xi})) * {_sinh(f'{2 * j} * ({eta})')})"
    chi = f"asin(sin({xi_p}) / {_cosh(eta_p)})"
    phi = chi
    for j, c in enumerate(CHI_TO_PHI, start=1):
        phi = f"({phi} + {c!r} * sin({2 * j} * ({chi})))"
    lam = f"atan2({_sinh(eta_p)}, cos({xi_p}))"
    return wrap_lon_sql(f"({lon0!r} + ({lam}) / {D2R!r})"), f"(({phi}) / {D2R!r})"
