"""Raster → contour-line generation (reference parity: U3).

The reference's only heavy data path
(``/root/reference/src/dask_felleskomponenter/udfs/udf_tools.py:127-244``):
GeoTIFF tiles as ``BinaryType`` rows → per-tile ``gdal.ContourGenerate``
→ one MultiLineString WKB per tile, as a scalar pandas UDF with
interval/base passed as ``lit()`` constants.

GDAL is an optional extra here (import-gated); without it the core
raises a clearly-marked ``NotImplementedError``. The Spark-side plumbing
(Arrow batching, constant-argument handling, null propagation, SQL
registration) is real and tested either way via ``make_contours_udf``'s
injectable core — the pattern FIXTURES.md prescribes for multimodal
decode in containers without codec libraries.

Scale note: one tile per row, tile-id partitioning (the reference's
table is keyed by ``kartblad_tile_id``); the pandas UDF processes Arrow
batches so GDAL's per-call overhead amortizes, and relational filters
must stay *ahead* of the UDF in the plan (UDFs are opaque to Catalyst —
SURVEY.md §4).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

try:  # optional extra
    from osgeo import gdal, ogr  # type: ignore

    HAS_GDAL = True
except ImportError:  # pragma: no cover - env without GDAL
    gdal = ogr = None
    HAS_GDAL = False


def generate_contours_wkb(
    raster_binary: bytes | None, interval: float = 10.0, base: float = 0.0
) -> bytes | None:
    """Contours of one in-memory raster as MultiLineString WKB.

    Reference semantics (``udf_tools.py:127-213``): None for empty
    input, unopenable rasters, zero generated contours, or any GDAL
    error; all LineStrings aggregated into a single MultiLineString.
    """
    if not raster_binary:
        return None
    if not HAS_GDAL:
        # GDAL-free executable path: FAKM/PNG grid tiles via marching
        # squares; GeoTIFF raises the documented NotImplementedError
        return generate_contours_py(raster_binary, interval, base)

    mem_path = f"/vsimem/{uuid.uuid4().hex}"
    ds = None
    vec = None
    # UseExceptions is PROCESS-GLOBAL GDAL state: flipping it per row
    # would change error behavior (return codes → RuntimeError) for
    # every other GDAL user in this Python worker. Save and restore.
    prev_use_exc = gdal.GetUseExceptions()
    try:
        gdal.UseExceptions()
        gdal.FileFromMemBuffer(mem_path, raster_binary)
        ds = gdal.Open(mem_path)
        if ds is None:
            return None
        band = ds.GetRasterBand(1)

        vec = ogr.GetDriverByName("Memory").CreateDataSource(uuid.uuid4().hex)
        layer = vec.CreateLayer(
            "contours", srs=ds.GetSpatialRef(), geom_type=ogr.wkbLineString
        )
        layer.CreateField(ogr.FieldDefn("elevation", ogr.OFTReal))
        gdal.ContourGenerate(band, interval, base, [], 0, 0, layer, 0, 0)

        if layer.GetFeatureCount() == 0:
            return None
        multi = ogr.Geometry(ogr.wkbMultiLineString)
        for feature in layer:
            geom = feature.GetGeometryRef()
            if geom is not None:
                multi.AddGeometry(geom.Clone())
        return bytes(multi.ExportToWkb())
    except Exception:
        return None
    finally:
        band = None
        ds = None
        vec = None
        if gdal.VSIStatL(mem_path):
            gdal.Unlink(mem_path)
        if not prev_use_exc:
            gdal.DontUseExceptions()


# --- pure-Python contour engine (marching squares) -----------------------
#
# The GDAL-free U3 executable path: ContourGenerate re-expressed as the
# textbook marching-squares algorithm (public domain; Lorensen-style
# case table) over a numpy grid, with linear interpolation of crossing
# positions and segment chaining into polylines. Rasters arrive as FAKM
# or PNG tiles (1 byte/sample grids via the in-repo codecs); GeoTIFF
# still requires GDAL and raises the documented NotImplementedError.

_TIFF_MAGICS = (b"II*\x00", b"MM\x00*")
_BIGTIFF_MAGICS = (b"II+\x00", b"MM\x00+")


# --- minimal GeoTIFF strip reader ----------------------------------------
#
# Enough of the public TIFF 6.0 + GeoTIFF specs to feed the marching-
# squares engine without GDAL: strip-organized, single-plane rasters,
# uncompressed or deflate, predictor none/horizontal, integer or float
# samples. The geotransform comes from ModelPixelScale + ModelTiepoint
# (the north-up case the reference's DTM tiles use). Anything outside
# that envelope (tiles, LZW/JPEG, BigTIFF, float predictor) raises the
# documented NotImplementedError naming the GDAL upgrade path.

_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
                    10: 8, 11: 4, 12: 8}


def _tiff_read_entries(data: bytes, bo: str):
    import struct as _struct

    ifd_off = _struct.unpack_from(bo + "I", data, 4)[0]
    n = _struct.unpack_from(bo + "H", data, ifd_off)[0]
    tags: dict[int, list] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = _struct.unpack_from(bo + "HHI", data, base)
        size = _TIFF_TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * count
        # Bound BEFORE building any count-sized format string: count is
        # a raw 32-bit field, so a 30-byte corrupt blob can declare
        # count=0xFFFFFFFF and force a multi-GB transient allocation
        # (fmt * count) inside the row-wise decode — the executor pays
        # an OOM for what the contract says is a cheap "malformed →
        # None/raise" path. No legitimate value can exceed the blob.
        if total > len(data):
            raise ValueError(
                f"corrupt TIFF: tag {tag} declares {total} value bytes "
                f"in a {len(data)}-byte blob"
            )
        off = base + 8 if total <= 4 else _struct.unpack_from(
            bo + "I", data, base + 8
        )[0]
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i",
               11: "f", 12: "d"}.get(typ)
        if fmt is None:
            if typ == 5:  # RATIONAL
                vals = []
                for j in range(count):
                    nu, de = _struct.unpack_from(bo + "II", data, off + 8 * j)
                    vals.append(nu / de if de else float("nan"))
                tags[tag] = vals
            continue
        tags[tag] = list(
            _struct.unpack_from(bo + fmt * count, data, off)
        )
    return tags


def geotiff_encode(
    grid,
    geotransform: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
    compress: bool = True,
) -> bytes:
    """Single-band GeoTIFF sink for a 2-D grid (the writer twin of
    ``decode_geotiff_grid``): little-endian, one strip, deflate by
    default, dtype preserved for uint8/16/32, int16/32, float32/64.
    ModelPixelScale/ModelTiepoint carry the (north-up) geotransform so
    GDAL and the in-repo reader agree on coordinates."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    g = np.ascontiguousarray(grid)
    if g.ndim != 2:
        raise ValueError("grid must be 2-D")
    dt = np.dtype(g.dtype).newbyteorder("<")
    sfmt = {"u": 1, "i": 2, "f": 3}.get(dt.kind)
    if sfmt is None or dt.itemsize not in (1, 2, 4, 8):
        raise ValueError(f"unsupported grid dtype {g.dtype}")
    h, w = g.shape
    pixels = g.astype(dt).tobytes()
    if compress:
        pixels = _zlib.compress(pixels, 6)

    ox, sx, rx, oy, ry, nsy = geotransform
    if rx or ry:
        # ModelPixelScale/ModelTiepoint encode AXIS-ALIGNED transforms
        # only; writing them for a rotated geotransform silently shears
        # every coordinate off its true position on the decode side.
        # A rotated raster needs a ModelTransformation tag (GDAL writes
        # it) — raise like the reader does for unsupported features.
        raise NotImplementedError(
            f"rotated geotransform (rx={rx}, ry={ry}) needs the "
            "ModelTransformation tag — write through GDAL (the [gdal] "
            "extra); this writer covers the north-up case"
        )
    sy = -float(nsy)
    def _dim(tag: int, n: int):
        # SHORT while it fits (keeps existing fixtures byte-identical),
        # LONG above 65535 — TIFF allows type 4 for these tags and both
        # GDAL and the in-repo reader accept it
        if n <= 0xFFFF:
            return (tag, 3, 1, _struct.pack("<H", n))
        return (tag, 4, 1, _struct.pack("<I", n))

    entries = [
        _dim(256, w),
        _dim(257, h),
        (258, 3, 1, _struct.pack("<H", dt.itemsize * 8)),
        (259, 3, 1, _struct.pack("<H", 8 if compress else 1)),
        (262, 3, 1, _struct.pack("<H", 1)),
        (273, 4, 1, None),  # strip offset, patched below
        (277, 3, 1, _struct.pack("<H", 1)),
        _dim(278, h),
        (279, 4, 1, _struct.pack("<I", len(pixels))),
        (339, 3, 1, _struct.pack("<H", sfmt)),
        (33550, 12, 3, _struct.pack("<3d", float(sx), sy, 0.0)),
        (33922, 12, 6, _struct.pack(
            "<6d", 0.0, 0.0, 0.0, float(ox), float(oy), 0.0
        )),
    ]
    pixels_off = 8
    # TIFF 6.0 requires every value (and the IFD) to begin on a word
    # boundary; a deflate stream of odd length would otherwise put the
    # 8-byte doubles of ModelPixelScale/ModelTiepoint and the IFD at odd
    # offsets — tolerated by libtiff/GDAL and the in-repo reader, but
    # rejected by strict validators. Strip byte count (tag 279) is
    # already written, so the pad byte is outside the strip.
    if len(pixels) % 2:
        pixels += b"\x00"
    ext_off = pixels_off + len(pixels)
    ext = bytearray()
    ifd = bytearray()
    for tag, typ, count, packed in entries:
        if packed is None:
            packed = _struct.pack("<I", pixels_off)
        if len(packed) <= 4:
            val = packed + b"\x00" * (4 - len(packed))
        else:
            val = _struct.pack("<I", ext_off + len(ext))
            ext.extend(packed)
        ifd += _struct.pack("<HHI", tag, typ, count) + val
    ifd_off = ext_off + len(ext)
    return (
        b"II*\x00"
        + _struct.pack("<I", ifd_off)
        + pixels
        + bytes(ext)
        + _struct.pack("<H", len(entries))
        + bytes(ifd)
        + _struct.pack("<I", 0)
    )


def decode_geotiff_grid(data: bytes):
    """Decode a strip-organized single-band GeoTIFF →
    ``(grid ndarray [h, w] float64, geotransform 6-tuple)``; None when
    the bytes are not TIFF at all. Unsupported-but-real TIFF features
    raise NotImplementedError (install GDAL for full coverage)."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    if not isinstance(data, (bytes, bytearray)) or len(data) < 8:
        return None
    head = bytes(data[:4])
    if head in _BIGTIFF_MAGICS:
        raise NotImplementedError(
            "BigTIFF requires GDAL (install the [gdal] extra)"
        )
    if head not in _TIFF_MAGICS:
        return None
    bo = "<" if head[:2] == b"II" else ">"
    try:
        tags = _tiff_read_entries(bytes(data), bo)
    except Exception:
        return None  # malformed TIFF = GDAL's unopenable-raster None

    def _tag1(tid: int, default):
        # a malformed IFD may declare count=0 for a tag — the stored
        # value list is then EMPTY and a bare [0] raises IndexError
        # outside the parse try, crashing the task instead of honoring
        # the malformed-TIFF→None contract
        vals = tags.get(tid)
        return vals[0] if vals else default

    if 322 in tags or 323 in tags:
        raise NotImplementedError(
            "tiled TIFF requires GDAL (install the [gdal] extra); "
            "strip-organized tiles decode without it"
        )
    w = _tag1(256, None)
    h = _tag1(257, None)
    if not w or not h:
        return None
    comp = _tag1(259, 1)
    if comp not in (1, 8, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} requires GDAL; "
            "uncompressed (1) and deflate (8/32946) decode without it"
        )
    predictor = _tag1(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} requires GDAL"
        )
    sfmt_early = _tag1(339, 1)
    if predictor == 2 and sfmt_early == 3:
        # Predictor 2 (horizontal differencing) is defined for integer
        # samples only; applying the int64 cumsum to float data would
        # silently truncate fractions. Floating-point prediction is
        # predictor 3, which already raises above.
        raise NotImplementedError(
            "TIFF horizontal predictor on floating-point samples "
            "requires GDAL"
        )
    spp = _tag1(277, 1)
    if _tag1(284, 1) != 1 and spp > 1:
        raise NotImplementedError("planar TIFF layout requires GDAL")
    bits = _tag1(258, 8)
    sfmt = _tag1(339, 1)
    dt = {
        (8, 1): "u1", (16, 1): "u2", (32, 1): "u4",
        (8, 2): "i1", (16, 2): "i2", (32, 2): "i4",
        (32, 3): "f4", (64, 3): "f8",
    }.get((bits, sfmt))
    if dt is None:
        raise NotImplementedError(
            f"TIFF sample format {sfmt}/{bits}-bit requires GDAL"
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        return None

    try:
        raw = bytearray()
        for off, cnt in zip(offsets, counts):
            chunk = bytes(data[off : off + cnt])
            if comp in (8, 32946):
                chunk = _zlib.decompress(chunk)
            raw.extend(chunk)
        dtype = np.dtype(dt).newbyteorder(bo)
        if len(raw) < h * w * spp * dtype.itemsize:
            return None  # truncated strips
        arr = np.frombuffer(bytes(raw), dtype=dtype, count=h * w * spp)
        arr = arr.reshape(h, w, spp) if spp > 1 else arr.reshape(h, w, 1)
        if predictor == 2:
            # horizontal differencing: undo with a per-row cumulative
            # sum in the sample's own integer width (matches the TIFF
            # spec's modulo arithmetic)
            arr = np.cumsum(arr, axis=1, dtype=np.int64).astype(dtype)
        grid = arr[:, :, 0].astype("float64")
    except Exception:
        return None

    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    scale = tags.get(33550)
    tie = tags.get(33922)
    if scale and tie and len(scale) >= 2 and len(tie) >= 6:
        sx, sy = float(scale[0]), float(scale[1])
        i, j, _k, x, y, _z = (float(v) for v in tie[:6])
        gt = (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)
    return grid, gt


def _ms_segments(grid, level: float):
    """Marching-squares crossing segments for one level, in pixel-center
    coordinates ((col, row) floats). Linear interpolation along edges.

    Vectorized: corner classification, the active-cell mask, and all
    four edge interpolations are whole-grid numpy ops; Python touches
    only the ACTIVE cells (O(contour length), not O(area)) to assemble
    segments — the asymptotics that keep a 256² production tile at
    milliseconds instead of seconds. ``_ms_segments_scalar`` is the
    reference implementation the vectorized path is property-tested
    against."""
    import numpy as np

    g = np.asarray(grid, dtype="float64")
    if g.size < 1024:
        # tiny tiles: ~30 whole-grid numpy ops cost more than a plain
        # loop over <1k cells (measured 2.7× on 8×8 embedding tiles);
        # the vectorized path takes over where it wins (29× at 256²)
        return _ms_segments_scalar(g, level)
    tl, tr = g[:-1, :-1], g[:-1, 1:]
    bl, br = g[1:, :-1], g[1:, 1:]
    b0, b1, b2, b3 = (
        tl >= level,
        tr >= level,
        br >= level,
        bl >= level,
    )
    case = (
        b0.astype(np.uint8)
        | (b1.astype(np.uint8) << 1)
        | (b2.astype(np.uint8) << 2)
        | (b3.astype(np.uint8) << 3)
    )
    active = (case != 0) & (case != 15)
    rows, cols = np.nonzero(active)
    if rows.size == 0:
        return []

    # edge k joins corner k and corner (k+1)%4 of (tl, tr, br, bl)
    corner_vals = (tl[rows, cols], tr[rows, cols], br[rows, cols], bl[rows, cols])
    cx = cols.astype("float64")
    cy = rows.astype("float64")
    corner_pts = (
        (cx, cy),
        (cx + 1.0, cy),
        (cx + 1.0, cy + 1.0),
        (cx, cy + 1.0),
    )
    has_cross = []
    cross_xy = []
    # no-crossing edges divide by zero / produce NaN coordinates that
    # are never read (masked by has_cross) — silence, don't branch
    with np.errstate(divide="ignore", invalid="ignore"):
        for k in range(4):
            va, vb = corner_vals[k], corner_vals[(k + 1) % 4]
            (ax, ay), (bx, by) = corner_pts[k], corner_pts[(k + 1) % 4]
            hit = (va >= level) != (vb >= level)
            t = (level - va) / (vb - va)
            has_cross.append(hit)
            cross_xy.append((ax + t * (bx - ax), ay + t * (by - ay)))

    center_above = (sum(corner_vals) / 4.0) >= level
    hi_tl = corner_vals[0] >= level
    segs = []
    for i in range(rows.size):
        ks = [k for k in range(4) if has_cross[k][i]]
        pts = {k: (cross_xy[k][0][i], cross_xy[k][1][i]) for k in ks}
        if len(ks) == 2:
            segs.append((pts[ks[0]], pts[ks[1]]))
        elif len(ks) == 4:
            if bool(center_above[i]) == bool(hi_tl[i]):
                segs.append((pts[0], pts[3]))
                segs.append((pts[1], pts[2]))
            else:
                segs.append((pts[0], pts[1]))
                segs.append((pts[2], pts[3]))
    return segs


def _ms_segments_scalar(grid, level: float):
    """Reference (unvectorized) marching squares — kept as the oracle
    for the vectorized path's property test."""
    import numpy as np

    h, w = grid.shape
    segs = []

    def interp(pa, va, pb, vb):
        t = (level - va) / (vb - va)
        return (pa[0] + t * (pb[0] - pa[0]), pa[1] + t * (pb[1] - pa[1]))

    for r in range(h - 1):
        for c in range(w - 1):
            v = (
                float(grid[r, c]),
                float(grid[r, c + 1]),
                float(grid[r + 1, c + 1]),
                float(grid[r + 1, c]),
            )  # tl, tr, br, bl
            p = ((c, r), (c + 1, r), (c + 1, r + 1), (c, r + 1))
            case = sum(1 << i for i in range(4) if v[i] >= level)
            if case in (0, 15):
                continue
            # edge k joins corner k and corner (k+1)%4
            crossings = {}
            for k in range(4):
                a, b = k, (k + 1) % 4
                if (v[a] >= level) != (v[b] >= level):
                    crossings[k] = interp(p[a], v[a], p[b], v[b])
            ks = sorted(crossings)
            if len(ks) == 2:
                segs.append((crossings[ks[0]], crossings[ks[1]]))
            elif len(ks) == 4:
                # saddle: resolve by the cell-center average
                center_above = sum(v) / 4.0 >= level
                hi_tl = v[0] >= level
                if center_above == hi_tl:
                    segs.append((crossings[0], crossings[3]))
                    segs.append((crossings[1], crossings[2]))
                else:
                    segs.append((crossings[0], crossings[1]))
                    segs.append((crossings[2], crossings[3]))
    return segs


def _chain_segments(segs):
    """Join crossing segments into polylines (endpoint matching on
    rounded coordinates)."""
    def key(pt):
        return (round(pt[0], 9), round(pt[1], 9))

    # a level hitting a grid value exactly yields zero-length segments
    # at that corner; they carry no geometry and break endpoint chaining
    segs = [(a, b) for a, b in segs if key(a) != key(b)]
    adj: dict = {}
    for i, (a, b) in enumerate(segs):
        adj.setdefault(key(a), []).append((i, b))
        adj.setdefault(key(b), []).append((i, a))
    used = [False] * len(segs)
    lines = []
    for start in range(len(segs)):
        if used[start]:
            continue
        a, b = segs[start]
        used[start] = True
        line = [a, b]
        # extend forward then backward
        for flip in (False, True):
            while True:
                end = line[-1]
                nxt = None
                for i, other in adj.get(key(end), ()):  # pragma: no branch
                    if not used[i]:
                        nxt = (i, other)
                        break
                if nxt is None:
                    break
                used[nxt[0]] = True
                line.append(nxt[1])
            line.reverse()
        lines.append(line)
    return lines


def contours_from_grid(
    grid,
    interval: float = 10.0,
    base: float = 0.0,
    geotransform: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
) -> bytes | None:
    """Contour polylines of a 2-D numpy grid as MultiLineString WKB
    (GDAL ``ContourGenerate`` semantics: levels at base + k·interval
    strictly inside the value range; None when no contour exists).

    Coordinates map through the standard 6-term geotransform evaluated
    at pixel centers."""
    import math as _math
    import struct as _struct

    import numpy as np

    g = np.asarray(grid, dtype="float64")
    # `not (interval > 0)` and not `interval <= 0`: a NaN interval
    # fails BOTH comparisons, and letting it through crashed at
    # int(floor(NaN)) instead of honoring the malformed-input→None
    # contract. Same guard for a non-finite base.
    if (
        g.ndim != 2
        or g.shape[0] < 2
        or g.shape[1] < 2
        or not (interval > 0)
        or not _math.isfinite(base)
    ):
        return None
    # lo/hi over FINITE values only: a NaN nodata pixel (standard in
    # elevation rasters) made min/max NaN and crashed the level count.
    finite = np.isfinite(g)
    if not finite.any():
        return None
    lo, hi = float(g[finite].min()), float(g[finite].max())
    k0 = int(_math.floor((lo - base) / interval)) + 1
    k1 = int(_math.ceil((hi - base) / interval)) - 1
    if k1 - k0 > 100_000:
        # A huge FINITE nodata sentinel (float32 ±3.4e38) explodes the
        # level range into ~1e37 marching-squares passes — an effective
        # executor hang. A six-figure contour count never comes from
        # real data at one tile: decline (None), matching the GDAL-free
        # fallback's documented posture (mask sentinels to NaN first).
        return None
    gt = geotransform
    has_nonfinite = not finite.all()
    lines_wkb = []
    for k in range(k0, k1 + 1):
        level = base + k * interval
        if not (lo < level < hi):
            continue
        for line in _chain_segments(_ms_segments(g, level)):
            coords = [
                (
                    gt[0] + (c + 0.5) * gt[1] + (r + 0.5) * gt[2],
                    gt[3] + (c + 0.5) * gt[4] + (r + 0.5) * gt[5],
                )
                for c, r in line
            ]
            if has_nonfinite and any(
                not (_math.isfinite(x) and _math.isfinite(y))
                for x, y in coords
            ):
                # a chain that interpolated through a nodata pixel has
                # NaN vertices — drop it rather than emit garbage WKB
                # (GDAL with a nodata mask splits such lines; the
                # GDAL-free fallback documents the coarser behavior)
                continue
            lines_wkb.append(
                b"\x01"
                + _struct.pack("<II", 2, len(coords))
                + b"".join(_struct.pack("<dd", x, y) for x, y in coords)
            )
    if not lines_wkb:
        return None
    return (
        b"\x01" + _struct.pack("<II", 5, len(lines_wkb)) + b"".join(lines_wkb)
    )


def generate_contours_py(
    raster_binary: bytes | None, interval: float = 10.0, base: float = 0.0
) -> bytes | None:
    """GDAL-free per-tile contour core: decodes GeoTIFF (strip-organized
    uncompressed/deflate — ``decode_geotiff_grid``), FAKM, or PNG grid
    tiles and runs marching squares; GeoTIFF coordinates map through the
    tile's ModelPixelScale/ModelTiepoint geotransform, matching
    ``gdal.ContourGenerate`` on the same input
    (``udf_tools.py:127-213``). TIFF features outside the minimal
    reader's envelope raise the documented NotImplementedError."""
    if not raster_binary:
        return None
    data = bytes(raster_binary)
    if data[:4] in _TIFF_MAGICS or data[:4] in _BIGTIFF_MAGICS:
        decoded = decode_geotiff_grid(data)
        if decoded is None:
            return None
        grid, gt = decoded
        return contours_from_grid(grid, interval, base, gt)
    import numpy as np

    from dask_felleskomponenter_spark.functions.multimodal import (
        decode_image_png,
        fakm_decode,
    )

    meta = decode_image_png(data) or fakm_decode(data)
    if meta is None or not meta["payload"]:
        return None
    w, h, c = meta["width"], meta["height"], meta["channels"]
    if w * h * c != len(meta["payload"]):
        return None
    grid = (
        np.frombuffer(meta["payload"], dtype="uint8")
        .reshape(h, w, c)[:, :, 0]
        .astype("float64")
    )
    return contours_from_grid(grid, interval, base)


def make_contours_udf(
    core: Callable[[bytes | None, float, float], bytes | None] | None = None,
):
    """Build the scalar pandas UDF around an injectable per-tile core.

    The default core is the GDAL path; tests (and GDAL-less containers)
    inject a deterministic fake to exercise the Spark plumbing — Arrow
    batch shape, constant-argument extraction, null handling."""
    core_fn = core or generate_contours_wkb

    @F.pandas_udf(BinaryType())
    def contours_udf(
        rasters: pd.Series, interval: pd.Series, base: pd.Series
    ) -> pd.Series:
        # interval/base are declared lit() constants. A real varying
        # column would silently apply batch row 0's value to EVERY
        # raster in the batch (results changing with Arrow batch
        # boundaries) — detect and fail loudly instead. NaN-safe:
        # nunique ignores NaN, so count NaNs separately.
        for name, s in (("interval", interval), ("base", base)):
            if len(s) and (s.nunique(dropna=False) > 1):
                raise ValueError(
                    f"contours {name} must be a lit() constant, got "
                    f"{s.nunique(dropna=False)} distinct values in one "
                    "batch — per-tile parameters need a per-row core"
                )
        def const_of(s: pd.Series, default: float) -> float | None:
            # lit(None) arrives as None/NaN: SQL null-in/null-out, not
            # float(None) TypeError killing the whole batch (and not a
            # NaN slipping past the interval>0 guard into the core)
            if not len(s):
                return default
            v = s.iloc[0]
            if v is None or (isinstance(v, float) and v != v):
                return None
            return float(v)

        iv = const_of(interval, 10.0)
        bs = const_of(base, 0.0)
        if iv is None or bs is None:
            return pd.Series([None] * len(rasters), dtype="object")
        return rasters.apply(lambda r: core_fn(r, iv, bs))

    return contours_udf


#: Default UDF instance (GDAL-backed core).
generate_contours_udf = make_contours_udf()
