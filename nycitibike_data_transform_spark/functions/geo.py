"""Geodesic helpers.

Re-expresses the reference's Haversine macro (reference
``macros/dist_lat_lng.sql:1-23``) with its *intended* semantics: the
reference version only emits SQL in the ``km`` branch and interpolates
a bare ``radius`` token (SURVEY.md §2.2 warning b) — we implement the
standard great-circle formula for both units and keep the compile-time
unit validation (``macros/dist_lat_lng.sql:4-5``) as a Python raise at
plan-build time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EARTH_RADIUS = {"km": 6371.0, "mi": 3959.0}


def haversine(
    lat1: Column | str,
    lng1: Column | str,
    lat2: Column | str,
    lng2: Column | str,
    unit: str = "km",
) -> Column:
    """Great-circle distance between two (lat, lng) points.

    ``unit`` must be ``"km"`` or ``"mi"`` — validated here, before any
    job is submitted (plan-build-time failure, the dbt
    ``raise_compiler_error`` analogue).

    Uses the spherical-law-of-cosines form the reference intended:
    ``R * acos(cos(rlat1)cos(rlat2)cos(rlng2-rlng1) + sin(rlat1)sin(rlat2))``
    — pure built-in trig Columns, whole-stage-codegen friendly.
    """
    if unit not in _EARTH_RADIUS:
        raise ValueError(f"haversine unit must be one of {sorted(_EARTH_RADIUS)}, got {unit!r}")
    radius = F.lit(_EARTH_RADIUS[unit])
    rlat1, rlng1 = F.radians(lat1), F.radians(lng1)
    rlat2, rlng2 = F.radians(lat2), F.radians(lng2)
    # Clamp the cosine argument into [-1, 1]: floating rounding can push
    # it epsilon outside for identical points, making acos return NaN.
    arg = F.cos(rlat1) * F.cos(rlat2) * F.cos(rlng2 - rlng1) + F.sin(rlat1) * F.sin(rlat2)
    arg = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), arg))
    return radius * F.acos(arg)
