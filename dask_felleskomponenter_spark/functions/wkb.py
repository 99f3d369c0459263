"""WKB/EWKB geometry functions (reference parity: U1/U2, SURVEY.md §2A).

Semantics match the reference's UDFs
(``/root/reference/src/dask_felleskomponenter/udfs/udf_tools.py:49-107``
and ``udf_conversions.py:12-59``) — same type table, same EWKB bit flags
(PostGIS Z/M/SRID high bits) and ISO 1000/2000/3000 offsets, same
``Invalid (...)`` error strings — but the execution strategy is
Spark-first:

- ``wkb_geom_type_col`` is a **pure Column expression** (hex slicing +
  ``conv`` + bitmask arithmetic): geometry-type introspection over 100 TB
  runs inside whole-stage codegen with zero Python workers. This is the
  default path.
- ``get_wkb_geom_type`` is the same logic as a **vectorized pandas UDF**
  (Arrow batches), kept for SQL registration parity and as the
  reference-compatible surface (accepts hex strings, bytes, bytearray,
  null — ``udf_tools.py:56-71``). The reference used a row-at-a-time
  pickle UDF here; SURVEY.md §4 flags the promotion to pandas.
- ``strip_ewkb_srid`` (the EWKB→WKB header rewrite,
  ``udf_conversions.py:25-44``) is pure Python and GDAL-free.
- ``curved_to_linear_wkb`` needs real geometry linearization → OGR,
  gated behind an import-try (the reference imports GDAL unconditionally,
  which breaks bare installs — SURVEY.md §7 step 4 gates it).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, StringType

try:  # optional extra: linearization/contours need GDAL/OGR
    from osgeo import ogr  # type: ignore

    HAS_OGR = True
except ImportError:  # pragma: no cover - env without GDAL
    ogr = None
    HAS_OGR = False

#: ISO/OGC WKB geometry type codes (``udf_tools.py:12-40``).
WKB_GEOM_TYPES = {
    0: "Geometry",
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
    8: "CircularString",
    9: "CompoundCurve",
    10: "CurvePolygon",
    11: "MultiCurve",
    12: "MultiSurface",
    13: "Curve",
    14: "Surface",
    15: "PolyhedralSurface",
    16: "TIN",
    17: "Triangle",
    18: "Circle",
    19: "GeodesicString",
    20: "EllipticalCurve",
    21: "NurbsCurve",
    22: "Clothoid",
    23: "SpiralCurve",
    24: "CompoundSurface",
    102: "AffinePlacement",
    1025: "BrepSolid",
}

# PostGIS EWKB high-bit flags (``udf_tools.py:43-46``).
EWKB_Z_FLAG = 0x80000000
EWKB_M_FLAG = 0x40000000
EWKB_SRID_FLAG = 0x20000000
EWKB_FLAG_MASK = EWKB_Z_FLAG | EWKB_M_FLAG | EWKB_SRID_FLAG


# --- shared pure-Python core (used by the pandas UDF) --------------------

def geom_type_of_wkb(value: bytes | bytearray | str | None) -> str:
    """Geometry type name of one WKB/EWKB value (reference semantics
    including error strings, ``udf_tools.py:56-107``)."""
    if value is None:
        return "Invalid (null input)"
    if isinstance(value, str):
        try:
            data = bytes.fromhex(value)
        except (ValueError, TypeError):
            return "Invalid (not hex)"
    elif isinstance(value, (bytes, bytearray)):
        data = bytes(value)
    else:
        return f"Invalid (unsupported type: {type(value).__name__})"
    if len(data) < 5:
        return "Invalid (too short)"

    order = "big" if data[0] == 0 else "little"
    code = int.from_bytes(data[1:5], byteorder=order, signed=False)

    base, suffix = code, ""
    if code & EWKB_FLAG_MASK:
        z, m = bool(code & EWKB_Z_FLAG), bool(code & EWKB_M_FLAG)
        suffix = " ZM" if (z and m) else (" Z" if z else (" M" if m else ""))
        base &= ~EWKB_FLAG_MASK
    elif 3000 <= code < 4000:
        base, suffix = code - 3000, " ZM"
    elif 2000 <= code < 3000:
        base, suffix = code - 2000, " M"
    elif 1000 <= code < 2000:
        base, suffix = code - 1000, " Z"

    return WKB_GEOM_TYPES.get(base, f"Unknown({base})") + suffix


# --- JVM-side column expression (the scale path) --------------------------

def wkb_geom_type_col(col: str | Column, hex_input: bool = False) -> Column:
    """Geometry type as a pure Column expression — no Python workers.

    ``hex(col)`` → byte-order switch on the first byte → endian-aware
    reassembly of the 4-byte type int via string slicing + ``conv`` →
    flag/offset decoding with integer arithmetic → type-name lookup via a
    literal map. Stays entirely inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    if hex_input:
        data = F.unhex(F.upper(c))
        # Spark's unhex left-pads odd-length input; bytes.fromhex (the
        # reference semantics) rejects it — treat odd length as not-hex.
        not_hex = c.isNotNull() & (data.isNull() | (F.length(c) % 2 != 0))
    else:
        data = c
        not_hex = F.lit(False)

    # Only the first 5 bytes (byte order + type word) are ever read —
    # hex the prefix, not the whole blob: F.hex(data) would materialize
    # a 2× copy of every multi-megabyte geometry per row. The too-short
    # guard below checks length(data), so truncation here is safe.
    h = F.hex(F.substring(data, 1, 5))
    th = F.substring(h, 3, 8)
    little = F.substring(h, 1, 2) != "00"
    swapped = F.when(
        little,
        F.concat(
            F.substring(th, 7, 2),
            F.substring(th, 5, 2),
            F.substring(th, 3, 2),
            F.substring(th, 1, 2),
        ),
    ).otherwise(th)
    code = F.conv(swapped, 16, 10).cast("long")

    has_flags = code.bitwiseAND(F.lit(EWKB_FLAG_MASK)) != 0
    has_z = code.bitwiseAND(F.lit(EWKB_Z_FLAG)) != 0
    has_m = code.bitwiseAND(F.lit(EWKB_M_FLAG)) != 0
    ewkb_suffix = (
        F.when(has_z & has_m, " ZM")
        .when(has_z, " Z")
        .when(has_m, " M")
        .otherwise("")
    )
    iso_suffix = (
        F.when((code >= 3000) & (code < 4000), " ZM")
        .when((code >= 2000) & (code < 3000), " M")
        .when((code >= 1000) & (code < 2000), " Z")
        .otherwise("")
    )
    suffix = F.when(has_flags, ewkb_suffix).otherwise(iso_suffix)

    base_flagged = code.bitwiseAND(F.lit(0xFFFFFFFF & ~EWKB_FLAG_MASK))
    base_iso = (
        F.when((code >= 3000) & (code < 4000), code - 3000)
        .when((code >= 2000) & (code < 3000), code - 2000)
        .when((code >= 1000) & (code < 2000), code - 1000)
        .otherwise(code)
    )
    base = F.when(has_flags, base_flagged).otherwise(base_iso)

    pairs: list[Column] = []
    for k, v in WKB_GEOM_TYPES.items():
        pairs.append(F.lit(k).cast("long"))
        pairs.append(F.lit(v))
    name = F.coalesce(
        # try_element_at, not element_at: under ANSI mode (the Spark 4
        # default) element_at THROWS MAP_KEY_DOES_NOT_EXIST on an
        # unknown geometry code, making the Unknown(n) fallback
        # unreachable and failing the job on one corrupt blob
        F.try_element_at(F.create_map(*pairs), base),
        F.format_string("Unknown(%d)", base),
    )

    return (
        F.when(c.isNull(), "Invalid (null input)")
        .when(not_hex, "Invalid (not hex)")
        .when(F.length(data) < 5, "Invalid (too short)")
        .otherwise(F.concat(name, suffix))
    )


# --- vectorized pandas UDFs ----------------------------------------------

@F.pandas_udf(StringType())
def get_wkb_geom_type(values: pd.Series) -> pd.Series:
    """Reference-parity UDF surface (U1), vectorized over Arrow batches."""
    return values.apply(geom_type_of_wkb)


def strip_ewkb_srid_bytes(data: bytes | bytearray | None) -> bytes | None:
    """Rewrite an EWKB header to standard WKB: clear the SRID flag and
    drop the 4-byte SRID (``udf_conversions.py:25-44``). Pure Python, no
    GDAL. Non-EWKB input passes through unchanged."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    if len(data) >= 9:
        # one byte-order rule everywhere: 0 → big-endian, anything else
        # → little (matching geom_type_of_wkb / wkb_geom_type_col, so
        # the surfaces can never disagree on the same malformed blob)
        fmt = ">I" if data[0] == 0 else "<I"
        code = struct.unpack(fmt, bytes(data[1:5]))[0]
        if code & EWKB_SRID_FLAG:
            header = bytes([data[0]]) + struct.pack(fmt, code & ~EWKB_SRID_FLAG)
            return header + bytes(data[9:])
    return bytes(data)


@F.pandas_udf(BinaryType())
def strip_ewkb_srid(values: pd.Series) -> pd.Series:
    return values.apply(strip_ewkb_srid_bytes)


# --- pure-Python arc linearization engine --------------------------------
#
# OGR's GetLinearGeometry re-expressed from the public ISO/OGC WKB spec:
# curved types (8 CircularString, 9 CompoundCurve, 10 CurvePolygon,
# 11 MultiCurve, 12 MultiSurface) are parsed, every three-point circular
# arc is sampled at a maximum angular step, and the result is written
# back as the linear counterpart (2/2/3/5/6). Z/M input (EWKB flag bits
# or ISO +1000/+2000/+3000 codes) is supported: the circle is solved on
# XY and Z/M interpolate linearly along the swept angle, written out
# with ISO codes. Endpoints are preserved exactly.

_DEFAULT_ARC_STEP_DEG = 4.0  # OGR's documented default when 0 is passed


def _lerp_extras(e0: tuple, e1: tuple, u: float) -> tuple:
    """Linear interpolation of the non-XY coordinates (Z and/or M)."""
    return tuple(a + (b - a) * u for a, b in zip(e0, e1))


def _arc_points(
    p0: tuple,
    p1: tuple,
    p2: tuple,
    step_rad: float,
) -> list[tuple]:
    """Sample the circular arc p0→p1→p2 (inclusive of both endpoints).

    Points may carry extra coordinates beyond (x, y) — Z and/or M. The
    circle is computed on XY; extras are interpolated linearly in swept
    angle, piecewise through the via point (the OGR linearization
    convention: Z varies linearly along the curve parameter)."""
    import math

    ax, ay = p0[0], p0[1]
    bx, by = p1[0], p1[1]
    cx, cy = p2[0], p2[1]
    e0, e1, e2 = p0[2:], p1[2:], p2[2:]

    def sample_extras(frac: float) -> tuple:
        # frac ∈ [0, 1] of the total sweep; via point at frac_b
        if not e0:
            return ()
        if frac <= frac_b:
            u = frac / frac_b if frac_b > 0.0 else 1.0
            return _lerp_extras(e0, e1, u)
        span = 1.0 - frac_b
        u = (frac - frac_b) / span if span > 0.0 else 1.0
        return _lerp_extras(e1, e2, u)

    if (ax, ay) == (cx, cy) and (ax, ay) != (bx, by):
        # closed arc (PostGIS full-circle convention: p1 is the
        # antipode, p0–p1 a diameter) — traversed counter-clockwise
        frac_b = 0.5
        ux, uy = (ax + bx) / 2.0, (ay + by) / 2.0
        r = math.hypot(ax - ux, ay - uy)
        t0 = math.atan2(ay - uy, ax - ux)
        n = max(2, int(math.ceil(2.0 * math.pi / step_rad)))
        pts = [p0]
        for i in range(1, n):
            t = t0 + 2.0 * math.pi * i / n
            pts.append(
                (ux + r * math.cos(t), uy + r * math.sin(t))
                + sample_extras(i / n)
            )
        pts.append(p2)
        return pts
    # Local-origin translation (p0 at 0,0) BEFORE the collinearity test
    # and circumcenter solve: both the tolerance and the (x²+y²) terms
    # must scale with the ARC, not the global coordinate magnitude — at
    # projected (UTM-scale) coordinates ~(5e5, 6.7e6) a global-scaled
    # tolerance 1e-12·scale² ≈ 45 silently flattened every real arc of
    # radius ≲ 30 m into straight chords (≈20 cm–1 m deviation on
    # cadastral/road arcs), and the untranslated circumcenter formula
    # cancels catastrophically at those magnitudes.
    rbx, rby = bx - ax, by - ay
    rcx, rcy = cx - ax, cy - ay
    d = 2.0 * (rbx * rcy - rby * rcx)
    scale = max(abs(rbx), abs(rby), abs(rcx), abs(rcy), 1.0)
    if abs(d) <= 1e-12 * scale * scale:
        # collinear (or repeated) control points: straight segments
        return [p0, p1, p2]
    b2 = rbx * rbx + rby * rby
    c2 = rcx * rcx + rcy * rcy
    ux = ax + (b2 * rcy - c2 * rby) / d
    uy = ay + (c2 * rbx - b2 * rcx) / d
    r = math.hypot(ax - ux, ay - uy)
    t0 = math.atan2(ay - uy, ax - ux)
    t1 = math.atan2(by - uy, bx - ux)
    t2 = math.atan2(cy - uy, cx - ux)
    two_pi = 2.0 * math.pi
    d01 = (t1 - t0) % two_pi
    d02 = (t2 - t0) % two_pi
    # (A closed arc with p0 == p2 never reaches here: the exact-equality
    # case returns a full circle earlier, and p0 == p1 == p2 exits via
    # the collinearity test.)
    if d01 <= d02:
        sweep, ccw = d02, True
    else:
        sweep, ccw = two_pi - d02, False
    sweep_to_b = d01 if ccw else (two_pi - d01) % two_pi
    frac_b = sweep_to_b / sweep if sweep > 0.0 else 1.0
    n = max(2, int(math.ceil(sweep / step_rad)))
    pts = [p0]
    for i in range(1, n):
        t = t0 + (sweep * i / n if ccw else -sweep * i / n)
        pts.append(
            (ux + r * math.cos(t), uy + r * math.sin(t))
            + sample_extras(i / n)
        )
    pts.append(p2)
    return pts


class _WkbReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u8(self) -> int:
        v = self.data[self.pos]
        self.pos += 1
        return v

    def u32(self, fmt: str) -> int:
        v = struct.unpack_from(fmt + "I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def xy(self, fmt: str) -> tuple[float, float]:
        v = struct.unpack_from(fmt + "dd", self.data, self.pos)
        self.pos += 16
        return v

    def pt(self, fmt: str, ndims: int) -> tuple:
        v = struct.unpack_from(fmt + "d" * ndims, self.data, self.pos)
        self.pos += 8 * ndims
        return v


def _decode_dims(code: int) -> tuple[int, bool, bool]:
    """EWKB flag bits AND ISO +1000/+2000/+3000 offsets → (base, z, m)."""
    z = bool(code & EWKB_Z_FLAG)
    m = bool(code & EWKB_M_FLAG)
    base = code & ~EWKB_FLAG_MASK
    k, base = divmod(base, 1000)
    if k == 1:
        z = True
    elif k == 2:
        m = True
    elif k == 3:
        z = m = True
    elif k != 0:
        raise ValueError(f"unsupported WKB type {code}")
    return base, z, m


def _read_geom(r: _WkbReader) -> tuple[int, tuple[bool, bool], object]:
    """Parse one WKB geometry → (base_type, (z, m), payload). Payloads:
    Point → coord tuple (2 + z + m doubles); LineString/CircularString →
    [points]; Polygon/CurvePolygon → [rings] (each ring a parsed
    geometry); Compound/Multi/Collection → [parsed children]. Z/M
    dimensions (EWKB flag or ISO offset encoding) ride along as extra
    coordinates per point."""
    order = r.u8()
    # same rule as every other surface: 0 → big-endian, else little
    fmt = ">" if order == 0 else "<"
    code = r.u32(fmt)
    has_srid = bool(code & EWKB_SRID_FLAG)
    base, z, m = _decode_dims(code & ~EWKB_SRID_FLAG)
    if has_srid:
        r.u32(fmt)  # skip SRID
    dims = (z, m)
    nd = 2 + int(z) + int(m)
    if base == 1:
        return 1, dims, r.pt(fmt, nd)
    if base in (2, 8):
        return base, dims, [r.pt(fmt, nd) for _ in range(r.u32(fmt))]
    if base == 3:
        nrings = r.u32(fmt)
        return 3, dims, [
            (2, dims, [r.pt(fmt, nd) for _ in range(r.u32(fmt))])
            for _ in range(nrings)
        ]
    if base in (4, 5, 6, 7, 9, 10, 11, 12):
        return base, dims, [_read_geom(r) for _ in range(r.u32(fmt))]
    raise ValueError(f"unsupported WKB type {base}")


def _curve_to_points(
    geom: tuple[int, tuple[bool, bool], object], step_rad: float
) -> list[tuple]:
    """Any curve payload (LineString / CircularString / CompoundCurve)
    → one linear point sequence (Z/M extras interpolated along arcs)."""
    code, _dims, payload = geom
    if code == 2:
        return list(payload)
    if code == 8:
        pts_in = list(payload)
        if len(pts_in) < 3 or len(pts_in) % 2 == 0:
            raise ValueError("CircularString needs an odd point count >= 3")
        out: list[tuple] = []
        for i in range(0, len(pts_in) - 2, 2):
            seg = _arc_points(pts_in[i], pts_in[i + 1], pts_in[i + 2], step_rad)
            out.extend(seg if not out else seg[1:])
        return out
    if code == 9:
        out = []
        for comp in payload:
            seg = _curve_to_points(comp, step_rad)
            if out and seg and seg[0] == out[-1]:
                seg = seg[1:]
            out.extend(seg)
        return out
    raise ValueError(f"not a curve type: {code}")


def _iso_code(base: int, dims: tuple[bool, bool]) -> int:
    """Output type code in ISO WKB encoding (+1000 Z, +2000 M)."""
    z, m = dims
    return base + (1000 if z else 0) + (2000 if m else 0)


def _w_header(code: int, n: int) -> bytes:
    return b"\x01" + struct.pack("<II", code, n)


def _w_points(pts: list[tuple]) -> bytes:
    return b"".join(struct.pack("<" + "d" * len(p), *p) for p in pts)


def _write_linearized(
    geom: tuple[int, tuple[bool, bool], object], step_rad: float
) -> bytes:
    code, dims, payload = geom
    if code == 1:
        return (
            b"\x01"
            + struct.pack("<I", _iso_code(1, dims))
            + struct.pack("<" + "d" * len(payload), *payload)
        )
    if code in (2, 8, 9):
        pts = _curve_to_points(geom, step_rad)
        return _w_header(_iso_code(2, dims), len(pts)) + _w_points(pts)
    if code in (3, 10):
        rings = [_curve_to_points(ring, step_rad) for ring in payload]
        body = b"".join(
            struct.pack("<I", len(p)) + _w_points(p) for p in rings
        )
        return _w_header(_iso_code(3, dims), len(rings)) + body
    if code in (4, 5, 6, 7, 11, 12):
        out_code = {4: 4, 5: 5, 6: 6, 7: 7, 11: 5, 12: 6}[code]
        children = [_write_linearized(child, step_rad) for child in payload]
        return _w_header(_iso_code(out_code, dims), len(children)) + b"".join(
            children
        )
    raise ValueError(f"unsupported WKB type {code}")


def linearize_wkb_py(
    data: bytes | bytearray | None, max_angle_step_deg: float = 0.0
) -> bytes | None:
    """Pure-Python curved→linear WKB (the OGR-free U2 engine), including
    Z/M geometries: the circle is solved on XY and the extra coordinates
    interpolate linearly along the swept angle (OGR's convention for
    ``GetLinearGeometry`` on 3-D curves —
    ``udf_conversions.py:47-57``). Output uses ISO type codes (+1000 Z /
    +2000 M). None on unparsable input, exactly like the OGR path's
    failure semantics."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    import math

    step_deg = float(max_angle_step_deg) if max_angle_step_deg else 0.0
    if step_deg <= 0.0:
        step_deg = _DEFAULT_ARC_STEP_DEG
    try:
        r = _WkbReader(bytes(strip_ewkb_srid_bytes(data)))
        geom = _read_geom(r)
        return _write_linearized(geom, math.radians(step_deg))
    except Exception:
        return None


def curved_to_linear_bytes(
    data: bytes | bytearray | None,
    max_angle_step_deg: float = 0.0,
    engine: str = "auto",
) -> bytes | None:
    """Linearize curved geometry after SRID stripping
    (``udf_conversions.py:12-59`` semantics: None on non-bytes or parse
    failure). Engine: OGR when installed, else the pure-Python engine
    (2-D and Z/M) — so U2 executes on bare installs too."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    if engine == "python" or (engine == "auto" and not HAS_OGR):
        return linearize_wkb_py(data, max_angle_step_deg)
    if not HAS_OGR:
        raise NotImplementedError(
            "curved_to_linear_wkb engine='ogr' requires GDAL/OGR"
        )
    wkb = strip_ewkb_srid_bytes(data)
    try:
        geom = ogr.CreateGeometryFromWkb(wkb)
        if geom is None:
            return None
        angle = float(max_angle_step_deg if max_angle_step_deg is not None else 0.0)
        return bytes(geom.GetLinearGeometry(angle).ExportToWkb())
    except Exception:
        return None


@F.pandas_udf(BinaryType())
def curved_to_linear_wkb(
    geometries: pd.Series, max_angle_step_deg: pd.Series
) -> pd.Series:
    """U2 as a vectorized pandas UDF; angle passed as a ``lit()``
    constant (read once per batch, like U3's interval/base —
    ``udf_tools.py:233-236``)."""
    if len(max_angle_step_deg):
        # lit()-constant guard (same as U3's contours_udf): a VARYING
        # angle column would silently apply batch row 0's value to
        # every row, with results changing at Arrow batch boundaries
        if max_angle_step_deg.nunique(dropna=False) > 1:
            raise ValueError(
                "curved_to_linear_wkb: max_angle_step_deg must be a "
                "lit() constant, not a per-row column (the value is "
                "read once per batch)"
            )
        first = max_angle_step_deg.iloc[0]
        # lit(None) / NaN degrade to the OGR-default step, matching
        # curved_to_linear_bytes(None) — never float(None) TypeError
        angle = (
            0.0
            if first is None or (isinstance(first, float) and first != first)
            else float(first)
        )
    else:
        angle = 0.0
    return geometries.apply(lambda g: curved_to_linear_bytes(g, angle))


def register_all_udfs(spark: SparkSession) -> list[str]:
    """Register the geometry UDF surface for SQL use (U4,
    ``udf_tools.py:261-272`` / ``udf_conversions.py:62-91``): nested SQL
    calls like ``get_wkb_geom_type(curved_to_linear_wkb(b, 5.0))`` work."""
    registered = []
    spark.udf.register("get_wkb_geom_type", get_wkb_geom_type)
    registered.append("get_wkb_geom_type")
    spark.udf.register("strip_ewkb_srid", strip_ewkb_srid)
    registered.append("strip_ewkb_srid")
    spark.udf.register("curved_to_linear_wkb", curved_to_linear_wkb)
    registered.append("curved_to_linear_wkb")
    from dask_felleskomponenter_spark.functions.raster import (
        generate_contours_udf,
    )

    spark.udf.register("generate_contours_udf", generate_contours_udf)
    registered.append("generate_contours_udf")
    spark.udf.register("point_in_polygon", point_in_polygon)
    registered.append("point_in_polygon")
    return registered


# --- point-in-polygon (ray casting over linear WKB) -----------------------

def _ring_crossings(ring: list[tuple], x: float, y: float) -> int:
    n = 0
    for i in range(len(ring) - 1):
        # points may carry Z/M extras beyond (x, y)
        (x1, y1), (x2, y2) = ring[i][:2], ring[i + 1][:2]
        if (y1 > y) != (y2 > y):
            xs = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if xs > x:
                n += 1
    return n


def point_in_polygon_bytes(
    data: bytes | bytearray | None, x: float, y: float
) -> bool | None:
    """Even-odd ray-cast containment of (x, y) in a WKB Polygon /
    MultiPolygon (holes handled by parity; curved input: linearize with
    ``linearize_wkb_py`` first). None on null/unparsable input — the
    same failure contract as the other WKB functions. The coordinate
    side honors it too: a None x/y (or the NaN a SQL NULL becomes
    through the Arrow float path) is 'unknown point', never a TypeError
    and never a confident False."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    try:
        px, py = float(x), float(y)
    except (TypeError, ValueError):
        return None
    if px != px or py != py:  # NaN
        return None
    try:
        geom = _read_geom(_WkbReader(bytes(strip_ewkb_srid_bytes(data))))
    except Exception:
        return None

    def poly_hit(payload) -> int:
        crossings = 0
        for ring in payload:
            pts = list(ring[2])  # ring = (type, dims, points)
            if pts and pts[0] != pts[-1]:
                pts = pts + [pts[0]]
            crossings += _ring_crossings(pts, px, py)
        return crossings

    code, _dims, payload = geom
    if code == 3:
        return poly_hit(payload) % 2 == 1
    if code == 6:
        return any(
            poly_hit(child[2]) % 2 == 1 for child in payload if child[0] == 3
        )
    return None


@F.pandas_udf(BooleanType())
def point_in_polygon(
    polygons: pd.Series, xs: pd.Series, ys: pd.Series
) -> pd.Series:
    """Vectorized PIP over Arrow batches; pairs with ``grid_box_join``
    (bbox cells prune candidates, this predicate decides exactly)."""
    return pd.Series(
        [
            point_in_polygon_bytes(g, x, y)
            for g, x, y in zip(polygons, xs, ys)
        ],
        dtype="object",
    )
