"""WKB parsing + point-in-polygon zone tagging (synthetic WKB built
with struct.pack — no geo libs involved on either side)."""

from __future__ import annotations

import struct

import pytest

from nycitibike_data_transform_spark.operators.geo_wkb import (
    WkbError,
    parse_wkb_point,
    parse_wkb_polygons,
    tag_points_with_zones,
)


def wkb_point(x, y, big_endian=False):
    bo, order = (0, ">") if big_endian else (1, "<")
    return struct.pack(f"{order}BI2d", bo, 1, x, y)


def wkb_polygon(*rings, big_endian=False):
    bo, order = (0, ">") if big_endian else (1, "<")
    out = struct.pack(f"{order}BII", bo, 3, len(rings))
    for ring in rings:
        out += struct.pack(f"{order}I", len(ring))
        for x, y in ring:
            out += struct.pack(f"{order}2d", x, y)
    return out


def wkb_multipolygon(*polygons):
    out = struct.pack("<BII", 1, 6, len(polygons))
    return out + b"".join(polygons)


SQUARE = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
FAR_SQUARE = [(20, 20), (30, 20), (30, 30), (20, 30), (20, 20)]
HOLE = [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]


def test_parse_point_both_endians():
    assert parse_wkb_point(wkb_point(1.5, -2.5)) == (1.5, -2.5)
    assert parse_wkb_point(wkb_point(1.5, -2.5, big_endian=True)) == (1.5, -2.5)


def test_ewkb_srid_skipped_and_zm_rejected():
    # EWKB point with SRID flag: 4-byte SRID payload precedes coords.
    ewkb_srid_pt = struct.pack("<BII2d", 1, 1 | 0x20000000, 4326, 1.5, -2.5)
    assert parse_wkb_point(ewkb_srid_pt) == (1.5, -2.5)
    # EWKB polygon with SRID parses identically to plain WKB.
    body = wkb_polygon(SQUARE)[5:]  # rings after the plain header
    ewkb_srid_poly = struct.pack("<BII", 1, 3 | 0x20000000, 4326) + body
    assert len(parse_wkb_polygons(ewkb_srid_poly)) == 1
    # EWKB Z flag and ISO Z type codes both fail cleanly, never misparse.
    for bad_type in (1 | 0x80000000, 1 | 0x40000000):
        with pytest.raises(WkbError, match="Z/M"):
            parse_wkb_point(struct.pack("<BI3d", 1, bad_type, 1.0, 2.0, 3.0))
    with pytest.raises(WkbError, match="1001"):
        parse_wkb_point(struct.pack("<BI3d", 1, 1001, 1.0, 2.0, 3.0))
    with pytest.raises(WkbError, match="1003"):
        parse_wkb_polygons(struct.pack("<BII", 1, 1003, 0))


def test_parse_polygon_and_errors():
    polys = parse_wkb_polygons(wkb_polygon(SQUARE, HOLE))
    assert len(polys) == 1 and len(polys[0]) == 2
    assert polys[0][0].shape == (5, 2)
    with pytest.raises(WkbError, match="Polygon"):
        parse_wkb_polygons(wkb_point(0, 0))
    with pytest.raises(WkbError, match="Point"):
        parse_wkb_point(wkb_polygon(SQUARE))


def test_zone_tagging(spark):
    zones = [
        ("sq", wkb_polygon(SQUARE, HOLE)),
        ("far", wkb_multipolygon(wkb_polygon(FAR_SQUARE))),
    ]
    pts = spark.createDataFrame(
        [
            (1, 2.0, 2.0),    # inside sq
            (2, 5.0, 5.0),    # inside the hole -> no zone
            (3, 25.0, 25.0),  # inside far (multipolygon)
            (4, 15.0, 15.0),  # nowhere
            (5, 9.99, 0.01),  # corner-ish inside sq
        ],
        "id int, x double, y double",
    )
    out = {r["id"]: r["zone_id"] for r in tag_points_with_zones(pts, zones, "x", "y").collect()}
    assert out == {1: "sq", 2: None, 3: "far", 4: None, 5: "sq"}


def test_zone_tagging_preserves_all_rows_and_schema(spark):
    zones = [("sq", wkb_polygon(SQUARE))]
    pts = spark.createDataFrame([(i, float(i), float(i)) for i in range(100)], "id int, x double, y double")
    tagged = tag_points_with_zones(pts, zones, "x", "y")
    assert tagged.count() == 100
    assert tagged.columns == ["id", "x", "y", "zone_id"]
    inside = tagged.filter("zone_id = 'sq'").count()
    # ray casting is half-open: bottom/left boundary (0,0) is inside,
    # top/right boundary (10,10) is not — points 0..9
    assert inside == 10
