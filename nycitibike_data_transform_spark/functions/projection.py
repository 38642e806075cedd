"""Map projection as Column expressions — Lambert Conformal Conic.

The reference's latent geo dimension (``ref/2_DIM___AUX_NYC|
nyc_nta_zones.parquet``) stores WKB in the NY State Plane CRS
(EPSG:2263-style planar US-survey feet), while its point datasets
(restaurant inspections, evictions — see the ``ref/`` data
dictionaries) carry WGS84 ``Latitude``/``Longitude``. Joining them
point-in-polygon therefore needs a projection step. No geo library
ships in this container, so this module implements the ellipsoidal
Lambert Conformal Conic (2 standard parallels) from the public
closed-form equations (Snyder, "Map Projections — A Working Manual",
USGS PP 1395, pp. 107-109) two ways:

- **Column expressions** (``lcc_forward``): pure ``pyspark.sql.functions``
  trig — stays inside whole-stage codegen, no Python in the hot path.
  The forward direction (lat/lng → planar) is what a 100 TB point
  table needs before a planar spatial operation.
- **numpy** (``lcc_forward_np`` / ``lcc_inverse_np``): driver-side /
  fixture-generation use; the inverse uses the standard closed-form
  conformal-latitude series (no iteration).

Both are validated against each other and by round-trip closure in
``tests/test_projection.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact US survey foot in meters (1200/3937)
US_FOOT = 1200.0 / 3937.0


@dataclass(frozen=True)
class LccParams:
    """Lambert Conformal Conic (2SP) definition on an ellipsoid.

    Angles in degrees; false easting/northing and output coordinates
    in the CRS's native linear unit (``unit_m`` meters per unit).
    """

    lat_1: float  # first standard parallel
    lat_2: float  # second standard parallel
    lat_0: float  # latitude of origin
    lon_0: float  # central meridian
    false_e: float
    false_n: float
    a: float = 6378137.0  # GRS80 semi-major (meters)
    inv_f: float = 298.257222101  # GRS80 inverse flattening
    unit_m: float = US_FOOT  # meters per output unit

    @property
    def e(self) -> float:
        f = 1.0 / self.inv_f
        return math.sqrt(f * (2.0 - f))

    @property
    def a_units(self) -> float:
        return self.a / self.unit_m


#: NY State Plane Long Island zone (the CRS of the reference's NTA
#: zones parquet): standard parallels 40°40'/41°02', origin 40°10',
#: central meridian -74°, false easting 300000.3048006096 m expressed
#: in US survey feet.
EPSG_2263 = LccParams(
    lat_1=40.0 + 40.0 / 60.0,
    lat_2=41.0 + 2.0 / 60.0,
    lat_0=40.0 + 10.0 / 60.0,
    lon_0=-74.0,
    false_e=300000.3048006096 / US_FOOT,
    false_n=0.0,
)


def _consts(p: LccParams) -> dict[str, float]:
    """The projection constants n, F, ρ0 (unit-scaled) — closed-form,
    computed once at plan-build time (the Jinja-constant analogue:
    SURVEY.md §4 'constant folding')."""
    e = p.e

    def m(phi: float) -> float:
        return math.cos(phi) / math.sqrt(1.0 - (e * math.sin(phi)) ** 2)

    def t(phi: float) -> float:
        es = e * math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / ((1.0 - es) / (1.0 + es)) ** (e / 2.0)

    p1, p2, p0 = (math.radians(v) for v in (p.lat_1, p.lat_2, p.lat_0))
    n = (math.log(m(p1)) - math.log(m(p2))) / (math.log(t(p1)) - math.log(t(p2)))
    big_f = m(p1) / (n * t(p1) ** n)
    rho0 = p.a_units * big_f * t(p0) ** n
    return {"e": e, "n": n, "F": big_f, "rho0": rho0}


def lcc_forward(
    lat: Column | str, lon: Column | str, params: LccParams = EPSG_2263
) -> tuple[Column, Column]:
    """(lat°, lon°) → (x, y) planar Columns, pure built-in math — no
    UDF, codegen-eligible, linear per row. Returns the pair; alias and
    select on the caller's side."""
    c = _consts(params)
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    phi = F.radians(lat_c)
    e_sin = F.lit(c["e"]) * F.sin(phi)
    t = F.tan(F.lit(math.pi / 4.0) - phi / 2) / F.pow(
        (F.lit(1.0) - e_sin) / (F.lit(1.0) + e_sin), F.lit(c["e"] / 2.0)
    )
    rho = F.lit(params.a_units * c["F"]) * F.pow(t, F.lit(c["n"]))
    gamma = F.lit(c["n"]) * (F.radians(lon_c) - F.lit(math.radians(params.lon_0)))
    x = F.lit(params.false_e) + rho * F.sin(gamma)
    y = F.lit(params.false_n) + F.lit(c["rho0"]) - rho * F.cos(gamma)
    return x, y


def lcc_forward_np(
    lat: np.ndarray, lon: np.ndarray, params: LccParams = EPSG_2263
) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin of :func:`lcc_forward` (same equations, same
    constants) for driver-side use and cross-validation."""
    c = _consts(params)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    e_sin = c["e"] * np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - e_sin) / (1.0 + e_sin)) ** (c["e"] / 2.0)
    rho = params.a_units * c["F"] * t ** c["n"]
    gamma = c["n"] * (lam - math.radians(params.lon_0))
    return params.false_e + rho * np.sin(gamma), params.false_n + c["rho0"] - rho * np.cos(gamma)


def lcc_inverse_np(
    x: np.ndarray, y: np.ndarray, params: LccParams = EPSG_2263
) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) planar → (lat°, lon°), closed-form conformal-latitude
    series (Snyder eq. 3-5) — no iteration, vectorized."""
    c = _consts(params)
    e = c["e"]
    dx = np.asarray(x, dtype=np.float64) - params.false_e
    dy = c["rho0"] - (np.asarray(y, dtype=np.float64) - params.false_n)
    rho = np.sign(c["n"]) * np.sqrt(dx * dx + dy * dy)
    t = (rho / (params.a_units * c["F"])) ** (1.0 / c["n"])
    theta = np.arctan2(np.sign(c["n"]) * dx, np.sign(c["n"]) * dy)
    lam = theta / c["n"] + math.radians(params.lon_0)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)
    e2, e4, e6, e8 = e**2, e**4, e**6, e**8
    phi = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * np.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * np.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
        + (4279 * e8 / 161280) * np.sin(8 * chi)
    )
    return np.degrees(phi), np.degrees(lam)
