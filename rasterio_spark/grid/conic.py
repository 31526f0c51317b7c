"""Conic and equal-area projected CRSs: Lambert Conformal Conic 2SP
(EPSG:2154 RGF93 / Lambert-93, EPSG:3347 NAD83 / Statistics Canada
Lambert), Albers Equal Area (EPSG:5070 NAD83 / Conus Albers, EPSG:3577
GDA94 / Australian Albers — southern hemisphere, n < 0), and Lambert
Azimuthal Equal Area (EPSG:3035 ETRS89-extended / LAEA Europe).

The reference hands these to PROJ (rasterio/warp.py:151-409,
rasterio/crs.pyx); this engine ships the closed-form EPSG Guidance
Note 7-2 formulas instead, on the same pattern as grid/utm.py and
grid/projections.py: ONE set of double-precision constants, derived
once per EPSG code at import, generates three agreeing forms —
vectorized NumPy, Spark Column expressions (pure JVM, whole-stage
codegen), and DuckDB SQL strings.

Datum note: 2154/5070/3035 are defined on GRS80 (RGF93/NAD83/ETRS89).
GRS80 and WGS84 share a and differ in 1/f at the 12th digit
(298.257222101 vs 298.257223563, < 0.1 mm anywhere on Earth); like
PROJ's default null datum shift for these pairs, the engine computes
on the WGS84 constants and documents the equivalence.

Math, all public (EPSG GN7-2 §3.1.1 / §3.1.3 / §3.2.2; Snyder 1987
eqs. 14-15..21, 3-11/3-12):

- **LCC 2SP** is conformal: t(phi) = exp(-psi) with psi the isometric
  latitude already shipped for Mercator/UPS; n, F, rho_F come from the
  two standard parallels; the inverse recovers psi = -ln t' and reuses
  utm.py's conformal-latitude series CHI_TO_PHI.
- **Albers / LAEA** are equal-area: q(phi) = (1-e^2)[sin phi /
  (1 - e^2 sin^2 phi) + atanh(e sin phi)/e], beta = asin(q/q_p). The
  inverse needs the authalic-to-geographic series phi = beta + sum
  c_j sin(2j beta); instead of transcribing tabulated coefficients,
  the c_j are computed AT IMPORT by projecting the exact residual
  phi(beta) - beta (Newton inversion of q) onto its sine basis — the
  same series PROJ/Karney ("On auxiliary latitudes", 2023) expand
  symbolically, here to machine precision for the one ellipsoid the
  engine ships.
"""

from __future__ import annotations

import math

import numpy as np

from rasterio_spark.grid.utm import (
    A_WGS84,
    CHI_TO_PHI,
    D2R,
    E_ECC,
    _atanh,
    _sinh,
    wrap_lon_cols,
    wrap_lon_np,
    wrap_lon_sql,
    wrap_rad_cols,
    wrap_rad_np,
    wrap_rad_sql,
)

E2 = E_ECC * E_ECC

LCC_2154 = 2154
ALBERS_5070 = 5070
LAEA_3035 = 3035


def _m(phi: float) -> float:
    """Parallel-radius factor m = cos phi / sqrt(1 - e^2 sin^2 phi)."""
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - E2 * s * s)


def _t(phi: float) -> float:
    """Conformal factor t = exp(-psi), psi the isometric latitude."""
    s = math.sin(phi)
    psi = math.asinh(math.tan(phi)) - E_ECC * math.atanh(E_ECC * s)
    return math.exp(-psi)


def _q(phi: float) -> float:
    """Authalic-latitude kernel q (GN7-2 / Snyder eq. 3-12)."""
    s = math.sin(phi)
    return (1.0 - E2) * (s / (1.0 - E2 * s * s) + math.atanh(E_ECC * s) / E_ECC)


_QP = _q(math.pi / 2.0)  # q at the pole


def _authalic_series(nterms: int = 6) -> tuple[float, ...]:
    """Coefficients c_j of phi = beta + sum_j c_j sin(2 j beta).

    beta(phi) = asin(q(phi)/q_p) is exact; phi(beta) is recovered by
    Newton (dq/dphi is closed-form), and the odd pi-periodic residual
    phi - beta is projected onto sin(2 j beta) by midpoint quadrature.
    Converges past float64 by j=5 for e ~ 0.08 (c_j ~ (e^2/3)^j)."""
    nsamp = 2048
    beta = (np.arange(nsamp) + 0.5) * (math.pi / 2.0) / nsamp
    q_target = _QP * np.sin(beta)
    phi = beta.copy()
    for _ in range(50):
        s = np.sin(phi)
        q_cur = (1.0 - E2) * (s / (1.0 - E2 * s * s) + np.arctanh(E_ECC * s) / E_ECC)
        # dq/dphi = 2 (1 - e^2) cos phi / (1 - e^2 sin^2 phi)^2 (exact)
        dq = 2.0 * (1.0 - E2) * np.cos(phi) / (1.0 - E2 * s * s) ** 2
        step = (q_target - q_cur) / dq
        phi = phi + step
        if np.max(np.abs(step)) < 1e-15:
            break
    resid = phi - beta
    # c_j = (4/pi) * integral_0^{pi/2} resid(beta) sin(2 j beta) dbeta
    w = (math.pi / 2.0) / nsamp
    return tuple(
        float((4.0 / math.pi) * np.sum(resid * np.sin(2.0 * j * beta)) * w)
        for j in range(1, nterms + 1)
    )


BETA_TO_PHI = _authalic_series()


def _lcc_consts(phi1_deg, phi2_deg, phif_deg, lamf_deg, fe, fn) -> dict:
    phi1, phi2, phif = phi1_deg * D2R, phi2_deg * D2R, phif_deg * D2R
    m1, m2 = _m(phi1), _m(phi2)
    t1, t2, tf = _t(phi1), _t(phi2), _t(phif)
    if phi1_deg == phi2_deg:
        # single-parallel limit (LCC 1SP with k0=1): n -> sin(phi1)
        n = math.sin(phi1)
    else:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    f_ = m1 / (n * t1**n)
    return {
        "kind": "lcc",
        "n": n,
        "aF": A_WGS84 * f_,
        "rho_f": A_WGS84 * f_ * tf**n,
        "lam_f": lamf_deg * D2R,
        "fe": float(fe),
        "fn": float(fn),
    }


def _albers_consts(phi1_deg, phi2_deg, phif_deg, lamf_deg, fe, fn) -> dict:
    phi1, phi2, phif = phi1_deg * D2R, phi2_deg * D2R, phif_deg * D2R
    m1, m2 = _m(phi1), _m(phi2)
    q1, q2, qf = _q(phi1), _q(phi2), _q(phif)
    if phi1_deg == phi2_deg:
        # single-parallel limit: n -> sin(phi1)
        n = math.sin(phi1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    return {
        "kind": "albers",
        "n": n,
        "c": c,
        "rho_f": A_WGS84 * math.sqrt(c - n * qf) / n,
        "lam_f": lamf_deg * D2R,
        "fe": float(fe),
        "fn": float(fn),
    }


def _laea_consts(phi0_deg, lam0_deg, fe, fn) -> dict:
    phi0 = phi0_deg * D2R
    q0 = _q(phi0)
    beta0 = math.asin(q0 / _QP)
    rq = A_WGS84 * math.sqrt(_QP / 2.0)
    d = A_WGS84 * _m(phi0) / (rq * math.cos(beta0))
    return {
        "kind": "laea",
        "rq": rq,
        "d": d,
        "sb0": math.sin(beta0),
        "cb0": math.cos(beta0),
        "lam_0": lam0_deg * D2R,
        "fe": float(fe),
        "fn": float(fn),
    }


# EPSG registry parameters (public): 2154 RGF93/Lambert-93,
# 5070 NAD83/Conus Albers, 3035 ETRS89-extended/LAEA Europe,
# 3347 NAD83/Statistics Canada Lambert, 3577 GDA94/Australian Albers
# (southern hemisphere: n < 0 — the inverse flips rho/theta signs).
PARAMS: dict[int, dict] = {
    LCC_2154: _lcc_consts(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0),
    ALBERS_5070: _albers_consts(29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    LAEA_3035: _laea_consts(52.0, 10.0, 4321000.0, 3210000.0),
    3347: _lcc_consts(49.0, 77.0, 63.390675, -91.0 - 52.0 / 60.0, 6200000.0, 3000000.0),
    3577: _albers_consts(-18.0, -36.0, 0.0, 132.0, 0.0, 0.0),
}


# raw parameters behind each registry code (kind, lat_1, lat_2, lat_0,
# lon_0, x_0, y_0; LAEA has no standard parallels) — used to normalize
# a parameterized PROJ4 CRS back to its EPSG code when it matches.
_RAW: dict[int, tuple] = {
    LCC_2154: ("lcc", 44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0),
    ALBERS_5070: ("aea", 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    LAEA_3035: ("laea", None, None, 52.0, 10.0, 4321000.0, 3210000.0),
    3347: ("lcc", 49.0, 77.0, 63.390675, -91.0 - 52.0 / 60.0, 6200000.0, 3000000.0),
    3577: ("aea", -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),
}


def canonical_spec(kind: str, lat_1, lat_2, lat_0, lon_0, x_0, y_0) -> str:
    """Deterministic "PROJ4:+proj=..." key for a parameterized conic /
    equal-area CRS — the normalized-CRS string for non-EPSG params."""
    parts = [f"+proj={kind}"]
    if kind in ("lcc", "aea"):
        parts.append(f"+lat_1={float(lat_1)!r} +lat_2={float(lat_2)!r}")
    parts.append(
        f"+lat_0={float(lat_0)!r} +lon_0={float(lon_0)!r} "
        f"+x_0={float(x_0)!r} +y_0={float(y_0)!r}"
    )
    return "PROJ4:" + " ".join(parts)


_BY_CANON: dict[str, int] = {canonical_spec(*raw): code for code, raw in _RAW.items()}
_SPEC_CACHE: dict[str, dict] = {}


def epsg_for_spec(spec: str) -> int | None:
    """Registry EPSG code whose parameters exactly match `spec`."""
    return _BY_CANON.get(spec)


def _consts_for_spec(spec: str) -> dict:
    """Derived projection constants for a canonical PROJ4 spec string
    (cached: constants are pure functions of the parameters)."""
    hit = _SPEC_CACHE.get(spec)
    if hit is not None:
        return hit
    from rasterio_spark.grid.utm import spec_dict

    kind, d = spec_dict(spec)
    if kind == "lcc":
        out = _lcc_consts(d["lat_1"], d["lat_2"], d["lat_0"], d["lon_0"], d["x_0"], d["y_0"])
    elif kind == "aea":
        out = _albers_consts(d["lat_1"], d["lat_2"], d["lat_0"], d["lon_0"], d["x_0"], d["y_0"])
    elif kind == "laea":
        out = _laea_consts(d["lat_0"], d["lon_0"], d["x_0"], d["y_0"])
    else:
        raise ValueError(f"not a supported parameterized projection: {spec!r}")
    _SPEC_CACHE[spec] = out
    return out


def _resolve(code) -> dict:
    """Constants for an EPSG code (registry) or canonical spec string."""
    if isinstance(code, str):
        return _consts_for_spec(code)
    return PARAMS[code]


def is_supported(code) -> bool:
    if isinstance(code, str):
        if not code.startswith("PROJ4:"):
            return False
        try:
            _consts_for_spec(code)
            return True
        except (ValueError, KeyError, ZeroDivisionError):
            # ZeroDivisionError: degenerate cone (n == 0) specs
            return False
    return code in PARAMS


# ----------------------------------------------------------------- numpy


def _psi_np(lat_deg):
    phi = np.asarray(lat_deg, dtype="float64") * D2R
    return np.arcsinh(np.tan(phi)) - E_ECC * np.arctanh(E_ECC * np.sin(phi))


def _q_np(lat_deg):
    s = np.sin(np.asarray(lat_deg, dtype="float64") * D2R)
    return (1.0 - E2) * (s / (1.0 - E2 * s * s) + np.arctanh(E_ECC * s) / E_ECC)


from rasterio_spark.grid.utm import chi_to_phi_np as _chi_to_phi_np


def _beta_to_phi_np(beta):
    phi = beta.copy()
    for j, c in enumerate(BETA_TO_PHI, start=1):
        phi = phi + c * np.sin(2 * j * beta)
    return phi


def forward(lon, lat, code):
    """(lon, lat) degrees -> projected (x, y) meters."""
    p = _resolve(code)
    lon = np.asarray(lon, dtype="float64")
    lat = np.asarray(lat, dtype="float64")
    if p["kind"] == "lcc":
        rho = p["aF"] * np.exp(-p["n"] * _psi_np(lat))
        th = p["n"] * wrap_rad_np(lon * D2R - p["lam_f"])
        return p["fe"] + rho * np.sin(th), p["fn"] + p["rho_f"] - rho * np.cos(th)
    if p["kind"] == "albers":
        rho = A_WGS84 * np.sqrt(p["c"] - p["n"] * _q_np(lat)) / p["n"]
        th = p["n"] * wrap_rad_np(lon * D2R - p["lam_f"])
        return p["fe"] + rho * np.sin(th), p["fn"] + p["rho_f"] - rho * np.cos(th)
    # laea
    beta = np.arcsin(np.clip(_q_np(lat) / _QP, -1.0, 1.0))
    dl = lon * D2R - p["lam_0"]
    sb, cb = np.sin(beta), np.cos(beta)
    b = p["rq"] * np.sqrt(
        2.0 / (1.0 + p["sb0"] * sb + p["cb0"] * cb * np.cos(dl))
    )
    x = p["fe"] + b * p["d"] * cb * np.sin(dl)
    y = p["fn"] + (b / p["d"]) * (p["cb0"] * sb - p["sb0"] * cb * np.cos(dl))
    return x, y


def inverse(x, y, code):
    """Projected (x, y) meters -> (lon, lat) degrees."""
    p = _resolve(code)
    x = np.asarray(x, dtype="float64")
    y = np.asarray(y, dtype="float64")
    if p["kind"] in ("lcc", "albers"):
        sgn = 1.0 if p["n"] > 0 else -1.0  # GN7-2: rho' takes the sign of n
        dx = x - p["fe"]
        dy = p["rho_f"] - (y - p["fn"])
        rho = sgn * np.hypot(dx, dy)
        th = np.arctan2(sgn * dx, sgn * dy)
        lam = th / p["n"] + p["lam_f"]
        lam = wrap_rad_np(lam)
        if p["kind"] == "lcc":
            with np.errstate(divide="ignore"):
                psi = -np.log(rho / p["aF"]) / p["n"]
            chi = np.arctan(np.sinh(psi))
            return lam / D2R, _chi_to_phi_np(chi) / D2R
        qq = (p["c"] - (rho * p["n"] / A_WGS84) ** 2) / p["n"]
        beta = np.arcsin(np.clip(qq / _QP, -1.0, 1.0))
        return lam / D2R, _beta_to_phi_np(beta) / D2R
    # laea
    dx = (x - p["fe"]) / p["d"]
    dy = (y - p["fn"]) * p["d"]
    rho = np.hypot(dx, dy)
    cc = 2.0 * np.arcsin(np.clip(rho / (2.0 * p["rq"]), -1.0, 1.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        qq = _QP * (np.cos(cc) * p["sb0"] + dy * np.sin(cc) * p["cb0"] / rho)
    qq = np.where(rho == 0.0, _QP * p["sb0"], qq)  # exact center
    beta = np.arcsin(np.clip(qq / _QP, -1.0, 1.0))
    lam = p["lam_0"] + np.arctan2(
        dx * np.sin(cc),
        rho * p["cb0"] * np.cos(cc) - dy * p["sb0"] * np.sin(cc),
    )
    lam = np.where(rho == 0.0, p["lam_0"], lam)
    return wrap_lon_np(lam / D2R), _beta_to_phi_np(beta) / D2R


# ------------------------------------------------------------ Spark cols


def _psi_cols(lat):
    from pyspark.sql import functions as F

    phi = lat * D2R
    return F.asinh(F.tan(phi)) - E_ECC * F.atanh(F.sin(phi) * E_ECC)


def _asin_cols(x):
    """asin with the domain clamp the NumPy form applies (np.clip):
    q/q_p can exceed 1 by an ulp at the poles, asin(NaN) otherwise."""
    from pyspark.sql import functions as F

    return F.asin(F.least(F.greatest(x, F.lit(-1.0)), F.lit(1.0)))


def _q_cols(lat):
    from pyspark.sql import functions as F

    s = F.sin(lat * D2R)
    return (
        (s / (F.lit(1.0) - s * s * E2) + F.atanh(s * E_ECC) / E_ECC) * (1.0 - E2)
    )


def _series_cols(x, coeffs):
    from pyspark.sql import functions as F

    out = x
    for j, c in enumerate(coeffs, start=1):
        out = out + F.lit(c) * F.sin(x * (2 * j))
    return out


def forward_cols(lon, lat, code):
    """Spark Column (x, y) — pure JVM expressions, zero Python."""
    from pyspark.sql import functions as F

    p = _resolve(code)
    if p["kind"] == "lcc":
        rho = F.exp(_psi_cols(lat) * (-p["n"])) * p["aF"]
        th = wrap_rad_cols(lon * D2R - p["lam_f"]) * p["n"]
        return F.lit(p["fe"]) + rho * F.sin(th), F.lit(p["fn"] + p["rho_f"]) - rho * F.cos(th)
    if p["kind"] == "albers":
        rho = F.sqrt(F.lit(p["c"]) - _q_cols(lat) * p["n"]) * (A_WGS84 / p["n"])
        th = wrap_rad_cols(lon * D2R - p["lam_f"]) * p["n"]
        return F.lit(p["fe"]) + rho * F.sin(th), F.lit(p["fn"] + p["rho_f"]) - rho * F.cos(th)
    beta = _asin_cols(_q_cols(lat) / _QP)
    dl = lon * D2R - p["lam_0"]
    sb, cb = F.sin(beta), F.cos(beta)
    b = F.sqrt(F.lit(2.0) / (F.lit(1.0) + sb * p["sb0"] + cb * F.cos(dl) * p["cb0"])) * p["rq"]
    x = F.lit(p["fe"]) + b * cb * F.sin(dl) * p["d"]
    y = F.lit(p["fn"]) + (b / p["d"]) * (sb * p["cb0"] - cb * F.cos(dl) * p["sb0"])
    return x, y


def inverse_cols(x, y, code):
    """Spark Column (lon, lat) from projected coordinates."""
    from pyspark.sql import functions as F

    p = _resolve(code)
    if p["kind"] in ("lcc", "albers"):
        sgn = 1.0 if p["n"] > 0 else -1.0  # GN7-2: rho' takes the sign of n
        dx = x - F.lit(p["fe"])
        dy = F.lit(p["rho_f"]) - (y - F.lit(p["fn"]))
        rho = F.sqrt(dx * dx + dy * dy) * sgn
        lam = wrap_rad_cols(F.atan2(dx * sgn, dy * sgn) / p["n"] + p["lam_f"])
        if p["kind"] == "lcc":
            psi = F.log(rho / p["aF"]) * (-1.0 / p["n"])
            chi = F.atan(F.sinh(psi))
            return lam / D2R, _series_cols(chi, CHI_TO_PHI) / D2R
        qq = (F.lit(p["c"]) - (rho * (p["n"] / A_WGS84)) * (rho * (p["n"] / A_WGS84))) / p["n"]
        beta = _asin_cols(qq / _QP)
        return lam / D2R, _series_cols(beta, BETA_TO_PHI) / D2R
    dx = (x - F.lit(p["fe"])) / p["d"]
    dy = (y - F.lit(p["fn"])) * p["d"]
    rho = F.sqrt(dx * dx + dy * dy)
    cc = _asin_cols(rho / (2.0 * p["rq"])) * 2.0
    # rho == 0 (the exact projection center) -> beta_0, lam_0
    qq = F.when(rho == 0.0, _QP * p["sb0"]).otherwise(
        (F.cos(cc) * p["sb0"] + dy * F.sin(cc) * (p["cb0"]) / rho) * _QP
    )
    beta = _asin_cols(qq / _QP)
    lam = F.when(rho == 0.0, p["lam_0"]).otherwise(
        F.lit(p["lam_0"])
        + F.atan2(dx * F.sin(cc), rho * F.cos(cc) * p["cb0"] - dy * F.sin(cc) * p["sb0"])
    )
    return wrap_lon_cols(lam / D2R), _series_cols(beta, BETA_TO_PHI) / D2R


# ------------------------------------------------------------ DuckDB SQL


def _psi_sql(lat_sql: str) -> str:
    phi = f"(({lat_sql}) * {D2R!r})"
    from rasterio_spark.grid.utm import _asinh

    return f"({_asinh(f'tan({phi})')} - {E_ECC!r} * {_atanh(f'{E_ECC!r} * sin({phi})')})"


def _q_sql(lat_sql: str) -> str:
    s = f"sin(({lat_sql}) * {D2R!r})"
    return (
        f"({1.0 - E2!r} * ({s} / (1.0 - {E2!r} * {s} * {s})"
        f" + {_atanh(f'{E_ECC!r} * {s}')} / {E_ECC!r}))"
    )


def _asin_sql(x: str) -> str:
    return f"asin(least(greatest({x}, -1.0), 1.0))"


def _series_sql(x: str, coeffs) -> str:
    out = x
    for j, c in enumerate(coeffs, start=1):
        out = f"({out} + {c!r} * sin({2 * j} * ({x})))"
    return out


def forward_sql(lon_sql: str, lat_sql: str, code) -> tuple[str, str]:
    """DuckDB (x, y) expression strings — identical literal constants."""
    # CAST at derivation (CLAUDE.md DECIMAL-literal rule): wrapped
    # dlam and th = n*dlam are pure +-* chains that overflow
    # DECIMAL(38) on full-precision literal inputs
    lon_sql = f"CAST(({lon_sql}) AS DOUBLE)"
    lat_sql = f"CAST(({lat_sql}) AS DOUBLE)"
    p = _resolve(code)
    if p["kind"] == "lcc":
        rho = f"({p['aF']!r} * exp(-{p['n']!r} * {_psi_sql(lat_sql)}))"
        dlam = wrap_rad_sql(f"(({lon_sql}) * {D2R!r} - {p['lam_f']!r})")
        th = f"({p['n']!r} * {dlam})"
        return (
            f"({p['fe']!r} + {rho} * sin({th}))",
            f"({p['fn'] + p['rho_f']!r} - {rho} * cos({th}))",
        )
    if p["kind"] == "albers":
        rho = f"({A_WGS84 / p['n']!r} * sqrt({p['c']!r} - {p['n']!r} * {_q_sql(lat_sql)}))"
        dlam = wrap_rad_sql(f"(({lon_sql}) * {D2R!r} - {p['lam_f']!r})")
        th = f"({p['n']!r} * {dlam})"
        return (
            f"({p['fe']!r} + {rho} * sin({th}))",
            f"({p['fn'] + p['rho_f']!r} - {rho} * cos({th}))",
        )
    beta = _asin_sql(f"{_q_sql(lat_sql)} / {_QP!r}")
    dl = f"(({lon_sql}) * {D2R!r} - {p['lam_0']!r})"
    b = (
        f"({p['rq']!r} * sqrt(2.0 / (1.0 + {p['sb0']!r} * sin({beta})"
        f" + {p['cb0']!r} * cos({beta}) * cos({dl}))))"
    )
    return (
        f"({p['fe']!r} + {b} * {p['d']!r} * cos({beta}) * sin({dl}))",
        f"({p['fn']!r} + ({b} / {p['d']!r}) * ({p['cb0']!r} * sin({beta})"
        f" - {p['sb0']!r} * cos({beta}) * cos({dl})))",
    )


def inverse_sql(x_sql: str, y_sql: str, code) -> tuple[str, str]:
    """DuckDB (lon, lat) expression strings from projected coordinates."""
    # CAST at derivation: dx*dx inside sqrt is a pure DECIMAL product
    # on literal inputs (CLAUDE.md DECIMAL-literal rule)
    x_sql = f"CAST(({x_sql}) AS DOUBLE)"
    y_sql = f"CAST(({y_sql}) AS DOUBLE)"
    p = _resolve(code)
    if p["kind"] in ("lcc", "albers"):
        sgn = 1.0 if p["n"] > 0 else -1.0  # GN7-2: rho' takes the sign of n
        dx = f"(({x_sql}) - {p['fe']!r})"
        dy = f"({p['rho_f']!r} - (({y_sql}) - {p['fn']!r}))"
        rho = f"({sgn!r} * sqrt({dx} * {dx} + {dy} * {dy}))"
        lam = wrap_rad_sql(
            f"(atan2({sgn!r} * {dx}, {sgn!r} * {dy}) / {p['n']!r} + {p['lam_f']!r})"
        )
        if p["kind"] == "lcc":
            psi = f"(-ln({rho} / {p['aF']!r}) / {p['n']!r})"
            chi = f"atan({_sinh(psi)})"
            return f"({lam} / {D2R!r})", f"({_series_sql(chi, CHI_TO_PHI)} / {D2R!r})"
        qq = f"(({p['c']!r} - ({rho} * {p['n'] / A_WGS84!r}) ^ 2) / {p['n']!r})"
        beta = _asin_sql(f"{qq} / {_QP!r}")
        return f"({lam} / {D2R!r})", f"({_series_sql(beta, BETA_TO_PHI)} / {D2R!r})"
    dx = f"((({x_sql}) - {p['fe']!r}) / {p['d']!r})"
    dy = f"((({y_sql}) - {p['fn']!r}) * {p['d']!r})"
    rho = f"sqrt({dx} * {dx} + {dy} * {dy})"
    two_rq = 2.0 * p["rq"]
    cc = f"(2.0 * {_asin_sql(f'{rho} / {two_rq!r}')})"
    # rho == 0 (the exact projection center) guarded like the other two
    # forms — without it the asin clamp would turn the 0/0 into -90
    qq = (
        f"(CASE WHEN {rho} = 0.0 THEN {_QP * p['sb0']!r} ELSE "
        f"{_QP!r} * (cos({cc}) * {p['sb0']!r} + {dy} * sin({cc}) * {p['cb0']!r} / {rho}) END)"
    )
    beta = _asin_sql(f"{qq} / {_QP!r}")
    # degree-space wrap to mirror the np/cols forms bit-for-bit
    lam = (
        f"(CASE WHEN {rho} = 0.0 THEN {p['lam_0']!r} ELSE "
        f"{p['lam_0']!r} + atan2({dx} * sin({cc}),"
        f" {rho} * cos({cc}) * {p['cb0']!r} - {dy} * sin({cc}) * {p['sb0']!r}) END)"
    )
    return wrap_lon_sql(f"({lam} / {D2R!r})"), f"({_series_sql(beta, BETA_TO_PHI)} / {D2R!r})"
