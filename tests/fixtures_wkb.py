"""Hand-built golden WKB corpus (FIXTURES.md §1): the reference's 16
named WKT cases, constructed in pure Python (no OGR/Sedona needed), plus
EWKB variants (SRID flag + 4-byte SRID inserted after the header)."""

from __future__ import annotations

import math
import struct

LE = 1  # little-endian marker byte

EWKB_Z_FLAG = 0x80000000
EWKB_SRID_FLAG = 0x20000000


def wkb(geom_type: int, body: bytes = b"") -> bytes:
    return struct.pack("<BI", LE, geom_type) + body


def ewkb(geom_type: int, body: bytes = b"", srid: int = 4326, z: bool = False) -> bytes:
    code = geom_type | EWKB_SRID_FLAG | (EWKB_Z_FLAG if z else 0)
    return struct.pack("<BII", LE, code, srid) + body


def pts(*coords: tuple) -> bytes:
    out = b""
    for c in coords:
        out += struct.pack("<" + "d" * len(c), *c)
    return out


def seq(*coords: tuple) -> bytes:
    return struct.pack("<I", len(coords)) + pts(*coords)


def ring(*coords: tuple) -> bytes:
    return seq(*coords)


NAN = float("nan")

_ls3 = seq((10, 10), (20, 20), (30, 15))
_circ3 = seq((0, 0), (1, 1), (2, 0))
_circ5 = seq((0, 0), (4, 0), (4, 4), (0, 4), (0, 0))
_poly = struct.pack("<I", 1) + ring((30, 10), (40, 40), (20, 40), (10, 20), (30, 10))
_curvepoly = struct.pack("<I", 1) + wkb(8, _circ5)

#: name -> (wkb_bytes, expected get_wkb_geom_type output)
CORPUS: dict[str, tuple[bytes, str]] = {
    "point_2d": (wkb(1, pts((10, 20))), "Point"),
    "linestring_2d": (wkb(2, _ls3), "LineString"),
    "polygon_2d": (wkb(3, _poly), "Polygon"),
    "multipolygon_2d": (
        wkb(6, struct.pack("<I", 1) + wkb(3, struct.pack("<I", 1) + ring((30, 20), (45, 40), (10, 40), (30, 20)))),
        "MultiPolygon",
    ),
    "circularstring_2d": (wkb(8, _circ3), "CircularString"),
    "compoundcurve_2d": (
        wkb(9, struct.pack("<I", 2) + wkb(8, _circ3) + wkb(2, seq((2, 0), (3, 5)))),
        "CompoundCurve",
    ),
    "curvepolygon_2d": (wkb(10, _curvepoly), "CurvePolygon"),
    "multicurve_2d": (
        wkb(11, struct.pack("<I", 2) + wkb(2, seq((0, 0), (1, 1))) + wkb(8, seq((2, 2), (3, 3), (4, 2)))),
        "MultiCurve",
    ),
    "multisurface_2d": (
        wkb(12, struct.pack("<I", 1) + wkb(10, _curvepoly)),
        "MultiSurface",
    ),
    "point_3d_z": (wkb(1001, pts((10, 20, 5))), "Point Z"),
    "linestring_3d_z": (wkb(1002, seq((10, 10, 5), (20, 20, 10))), "LineString Z"),
    "point_3d_m": (wkb(2001, pts((10, 20, 3))), "Point M"),
    "point_4d_zm": (wkb(3001, pts((10, 20, 5, 3))), "Point ZM"),
    "point_empty": (wkb(1, pts((NAN, NAN))), "Point"),
    "polygon_empty": (wkb(3, struct.pack("<I", 0)), "Polygon"),
}

#: EWKB variants for non-curved cases (FIXTURES.md: suffix _ewkb)
EWKB_CORPUS: dict[str, tuple[bytes, str]] = {
    "point_2d_ewkb": (ewkb(1, pts((10, 20))), "Point"),
    "linestring_2d_ewkb": (ewkb(2, _ls3), "LineString"),
    "polygon_2d_ewkb": (ewkb(3, _poly), "Polygon"),
    "point_3d_z_ewkb": (ewkb(1, pts((10, 20, 5)), z=True), "Point Z"),
    "linestring_3d_z_ewkb": (
        ewkb(2, seq((10, 10, 5), (20, 20, 10)), z=True),
        "LineString Z",
    ),
}
