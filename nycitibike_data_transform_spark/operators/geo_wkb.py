"""WKB geometry surface — the reference's latent geo dimension.

The reference ships an NTA-zones parquet with a WKB ``geometry:
binary`` column it never reads in SQL (reference
``ref/2_DIM___AUX_NYC|nyc_nta_zones.parquet``; SURVEY.md §2.1 S6) —
the obvious intended use is point-in-polygon enrichment of ride
coordinates. This module implements exactly that slice without any
geo library (none in this container): a pure-struct WKB parser for
Point/Polygon/MultiPolygon and a numpy ray-casting point-in-polygon,
run as an Arrow-batched ``mapInPandas``.

Scale shape: the zone dimension (thousands of polygons) is parsed
ONCE driver-side and shipped in the task closure — index metadata,
like an ANN quantizer; the point table streams through in Arrow
batches with a bbox prefilter before exact ray casting. No shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_WKB_POINT = 1
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

# PostGIS EWKB flag bits (high bits of the geometry-type word).
_EWKB_Z = 0x8000_0000
_EWKB_M = 0x4000_0000
_EWKB_SRID = 0x2000_0000


class WkbError(ValueError):
    pass


def _reader(buf: bytes):
    pos = 0

    def read(fmt_le: str, fmt_be: str, size: int, order: str):
        nonlocal pos
        fmt = fmt_le if order == "<" else fmt_be
        (val,) = struct.unpack_from(fmt, buf, pos)
        pos += size
        return val

    def read_header():
        """2D geometry type, with the EWKB/ISO variants handled
        explicitly rather than masked away: an EWKB SRID payload is
        skipped (4 bytes), and Z/M geometries — EWKB flag bits or ISO
        type codes ≥ 1000 (XYZ +1000, XYM +2000, XYZM +3000) — raise
        WkbError instead of silently misparsing coordinates as ring
        counts."""
        nonlocal pos
        order = "<" if buf[pos] == 1 else ">"
        pos += 1
        raw = read("<I", ">I", 4, order)
        if raw & (_EWKB_Z | _EWKB_M):
            raise WkbError(f"Z/M coordinates not supported (EWKB type word 0x{raw:08x})")
        gtype = raw & ~_EWKB_SRID
        if gtype >= 1000:
            raise WkbError(f"ISO WKB Z/M geometry type {gtype} not supported")
        if raw & _EWKB_SRID:
            pos += 4  # skip the EWKB SRID payload
        return order, gtype

    def read_u32(order):
        return read("<I", ">I", 4, order)

    def read_xy(order, n):
        nonlocal pos
        fmt = f"{order}{2 * n}d"
        vals = struct.unpack_from(fmt, buf, pos)
        pos += 16 * n
        arr = np.asarray(vals, dtype=np.float64).reshape(n, 2)
        return arr

    return read_header, read_u32, read_xy


def parse_wkb_point(wkb: bytes) -> tuple[float, float]:
    read_header, _, read_xy = _reader(wkb)
    order, gtype = read_header()
    if gtype != _WKB_POINT:
        raise WkbError(f"expected Point (1), got geometry type {gtype}")
    xy = read_xy(order, 1)
    return float(xy[0, 0]), float(xy[0, 1])


def _parse_polygon_body(order, read_u32, read_xy) -> list[np.ndarray]:
    n_rings = read_u32(order)
    return [read_xy(order, read_u32(order)) for _ in range(n_rings)]


def parse_wkb_polygons(wkb: bytes) -> list[list[np.ndarray]]:
    """Parse Polygon or MultiPolygon WKB into a list of polygons, each
    a list of rings (ring 0 = outer shell, rest = holes), each ring an
    (n, 2) float64 array."""
    read_header, read_u32, read_xy = _reader(wkb)
    order, gtype = read_header()
    if gtype == _WKB_POLYGON:
        return [_parse_polygon_body(order, read_u32, read_xy)]
    if gtype == _WKB_MULTIPOLYGON:
        polys = []
        for _ in range(read_u32(order)):
            inner_order, inner_type = read_header()
            if inner_type != _WKB_POLYGON:
                raise WkbError(f"MultiPolygon member has type {inner_type}")
            polys.append(_parse_polygon_body(inner_order, read_u32, read_xy))
        return polys
    raise WkbError(f"expected (Multi)Polygon, got geometry type {gtype}")


def _ring_contains(ring: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized ray casting: for each point, odd edge-crossings of a
    rightward ray ⇒ inside. Loops over edges (small), vectorizes over
    points (large)."""
    inside = np.zeros(len(xs), dtype=bool)
    vx, vy = ring[:, 0], ring[:, 1]
    n = len(ring)
    j = n - 1
    for i in range(n):
        cond = (vy[i] > ys) != (vy[j] > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_cross = (vx[j] - vx[i]) * (ys - vy[i]) / (vy[j] - vy[i]) + vx[i]
        inside ^= cond & (xs < x_cross)
        j = i
    return inside


def _polygons_contain(polys: list[list[np.ndarray]], xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    out = np.zeros(len(xs), dtype=bool)
    for rings in polys:
        if not rings:
            continue
        hit = _ring_contains(rings[0], xs, ys)
        for hole in rings[1:]:
            hit &= ~_ring_contains(hole, xs, ys)
        out |= hit
    return out


def tag_points_with_zones(
    points: DataFrame,
    zones: list[tuple[object, bytes]],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Append ``zone_id`` to each point row — the id of the first zone
    polygon containing (x, y), NULL when none match.

    ``zones``: (zone_id, wkb_polygon_bytes) pairs, dimension-sized
    (collect the geo dim driver-side first — 2,327 NTA zones in the
    reference). Parsed once here; each Arrow batch gets a bbox
    prefilter per zone, then exact ray casting on the survivors.
    """
    parsed = []
    for zone_id, wkb in zones:
        polys = parse_wkb_polygons(bytes(wkb))
        shell_pts = np.vstack([rings[0] for rings in polys if rings])
        bbox = (
            shell_pts[:, 0].min(),
            shell_pts[:, 0].max(),
            shell_pts[:, 1].min(),
            shell_pts[:, 1].max(),
        )
        parsed.append((zone_id, polys, bbox))
    bboxes = np.array([b for _, _, b in parsed]).reshape(-1, 4)  # (n_zones, 4)

    out_fields = list(points.schema.fields) + [T.StructField("zone_id", T.StringType(), True)]
    out_schema = T.StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs = pdf[x_col].to_numpy(dtype=np.float64)
            ys = pdf[y_col].to_numpy(dtype=np.float64)
            zone = np.full(len(pdf), None, dtype=object)
            unassigned = np.ones(len(pdf), dtype=bool)
            # one broadcasted bbox screen for ALL zones × points
            # (n_zones × batch bools ≈ 2.3 MB per 1k points at NYC
            # scale), then exact ray casting only for zones that have
            # candidate points — most zones never enter the loop
            cand_matrix = (
                (xs[None, :] >= bboxes[:, 0:1])
                & (xs[None, :] <= bboxes[:, 1:2])
                & (ys[None, :] >= bboxes[:, 2:3])
                & (ys[None, :] <= bboxes[:, 3:4])
            )
            for zi in np.nonzero(cand_matrix.any(axis=1))[0]:
                zone_id, polys, _ = parsed[zi]
                cand = unassigned & cand_matrix[zi]
                if not cand.any():
                    continue
                idx = np.nonzero(cand)[0]
                hit = _polygons_contain(polys, xs[idx], ys[idx])
                matched = idx[hit]
                zone[matched] = str(zone_id)
                unassigned[matched] = False
            yield pdf.assign(zone_id=pd.Series(zone, index=pdf.index, dtype=object))

    return points.mapInPandas(run, schema=out_schema)
