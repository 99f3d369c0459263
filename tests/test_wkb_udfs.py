"""Geometry pack tests: golden corpus parity for the column expression
AND the pandas UDF, EWKB handling, SRID stripping, SQL registration
(nested calls), and contours plumbing with an injected core."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from dask_felleskomponenter_spark.functions.wkb import (
    HAS_OGR,
    geom_type_of_wkb,
    get_wkb_geom_type,
    register_all_udfs,
    strip_ewkb_srid_bytes,
    wkb_geom_type_col,
)
from tests.fixtures_wkb import CORPUS, EWKB_CORPUS, ewkb, pts, wkb


ALL_CASES = {**CORPUS, **EWKB_CORPUS}


def _corpus_df(spark):
    schema = StructType(
        [
            StructField("name", StringType(), False),
            StructField("wkb_bytes", BinaryType(), True),
            StructField("wkb_hex", StringType(), True),
        ]
    )
    rows = [
        Row(name=n, wkb_bytes=b, wkb_hex=b.hex().upper())
        for n, (b, _) in ALL_CASES.items()
    ]
    return spark.createDataFrame(rows, schema)


def test_python_core_on_golden_corpus():
    for name, (data, expected) in ALL_CASES.items():
        assert geom_type_of_wkb(data) == expected, name
        assert geom_type_of_wkb(data.hex()) == expected, name  # hex input


def test_python_core_error_strings():
    assert geom_type_of_wkb(None) == "Invalid (null input)"
    assert geom_type_of_wkb(b"\x01\x02") == "Invalid (too short)"
    assert geom_type_of_wkb("zz-not-hex") == "Invalid (not hex)"
    assert geom_type_of_wkb(42) == "Invalid (unsupported type: int)"
    # big-endian header, ISO Z offset
    assert geom_type_of_wkb(struct.pack(">BI", 0, 1001) + b"\x00" * 24) == "Point Z"
    # unknown base type
    assert geom_type_of_wkb(struct.pack("<BI", 1, 999)) == "Unknown(999)"


def test_column_expression_matches_corpus(spark):
    df = _corpus_df(spark).withColumn(
        "t_bin", wkb_geom_type_col("wkb_bytes")
    ).withColumn("t_hex", wkb_geom_type_col("wkb_hex", hex_input=True))
    got = {r["name"]: (r["t_bin"], r["t_hex"]) for r in df.collect()}
    for name, (_, expected) in ALL_CASES.items():
        assert got[name] == (expected, expected), name


def test_column_expression_error_paths(spark):
    schema = StructType([StructField("b", BinaryType(), True)])
    df = spark.createDataFrame([Row(b=None), Row(b=b"\x01\x02")], schema)
    got = [r[0] for r in df.select(wkb_geom_type_col("b")).collect()]
    assert got == ["Invalid (null input)", "Invalid (too short)"]
    hdf = spark.createDataFrame([("zz",), (None,)], ["h"])
    got = [r[0] for r in hdf.select(wkb_geom_type_col("h", hex_input=True)).collect()]
    assert got == ["Invalid (not hex)", "Invalid (null input)"]


def test_column_expression_equals_python_core_on_fuzz(spark):
    import random

    rng = random.Random(7)
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40))) for _ in range(200)]
    schema = StructType([StructField("b", BinaryType(), True)])
    df = spark.createDataFrame([Row(b=b) for b in blobs], schema)
    got = [r[0] for r in df.select(wkb_geom_type_col("b")).collect()]
    want = [geom_type_of_wkb(b) for b in blobs]
    assert got == want


def test_pandas_udf_matches_corpus(spark):
    df = _corpus_df(spark).withColumn("t", get_wkb_geom_type("wkb_bytes"))
    got = {r["name"]: r["t"] for r in df.collect()}
    for name, (_, expected) in ALL_CASES.items():
        assert got[name] == expected, name


def test_strip_ewkb_srid_roundtrip():
    for name, (data, _) in CORPUS.items():
        # standard WKB passes through untouched
        assert strip_ewkb_srid_bytes(data) == data, name
    # EWKB: SRID flag + 4 bytes removed; Z flag preserved
    assert strip_ewkb_srid_bytes(ewkb(1, pts((10, 20)))) == wkb(1, pts((10, 20)))
    z = strip_ewkb_srid_bytes(ewkb(2, pts((0, 0, 1)), z=True))
    code = struct.unpack("<I", z[1:5])[0]
    assert code == 2 | 0x80000000
    assert strip_ewkb_srid_bytes("nope") is None
    assert strip_ewkb_srid_bytes(None) is None


def test_sql_registration_and_nested_calls(spark):
    registered = register_all_udfs(spark)
    assert set(registered) >= {
        "get_wkb_geom_type",
        "strip_ewkb_srid",
        "curved_to_linear_wkb",
        "generate_contours_udf",
        "point_in_polygon",
    }
    fn_names = {f.name for f in spark.catalog.listFunctions()}
    assert "get_wkb_geom_type" in fn_names
    _corpus_df(spark).createOrReplaceTempView("wkb_test_data")
    rows = spark.sql(
        "SELECT name, get_wkb_geom_type(wkb_bytes) AS t FROM wkb_test_data"
    ).collect()
    got = {r["name"]: r["t"] for r in rows}
    assert got["point_3d_z"] == "Point Z"
    assert got["linestring_3d_z_ewkb"] == "LineString Z"
    # nested call through the SRID stripper (EWKB → WKB → type)
    nested = spark.sql(
        "SELECT get_wkb_geom_type(strip_ewkb_srid(wkb_bytes)) AS t "
        "FROM wkb_test_data WHERE name = 'point_2d_ewkb'"
    ).collect()
    assert nested[0]["t"] == "Point"
    # the full GDAL-free chain in SQL: curved EWKB → linearize → PIP
    import struct as _struct

    circle_ring = b"\x01" + _struct.pack("<II", 8, 3) + b"".join(
        _struct.pack("<dd", *p) for p in [(1.0, 0.0), (-1.0, 0.0), (1.0, 0.0)]
    )
    curvepoly = b"\x01" + _struct.pack("<II", 10, 1) + circle_ring
    import pandas as _pd

    spark.createDataFrame(
        _pd.DataFrame({"g": [curvepoly]})
    ).createOrReplaceTempView("curved_poly")
    hit = spark.sql(
        "SELECT point_in_polygon(curved_to_linear_wkb(g, 10.0), 0.0D, 0.0D) AS c,"
        "       point_in_polygon(curved_to_linear_wkb(g, 10.0), 2.0D, 0.0D) AS o "
        "FROM curved_poly"
    ).collect()[0]
    assert hit["c"] is True and hit["o"] is False
    spark.catalog.dropTempView("curved_poly")
    spark.catalog.dropTempView("wkb_test_data")


@pytest.mark.skipif(not HAS_OGR, reason="GDAL/OGR extra not installed")
def test_curved_to_linear_with_ogr(spark):
    from dask_felleskomponenter_spark.functions.wkb import curved_to_linear_wkb

    df = _corpus_df(spark).filter(F.col("name") == "curvepolygon_2d")
    out = df.select(
        get_wkb_geom_type(
            curved_to_linear_wkb(F.col("wkb_bytes"), F.lit(5.0))
        ).alias("t")
    ).collect()
    assert out[0]["t"] == "Polygon"


def test_contours_plumbing_with_injected_core(spark):
    """GDAL-free drive of the U3 Spark plumbing (FIXTURES.md stub
    pattern): Arrow batches, lit() constants, null propagation."""
    from dask_felleskomponenter_spark.functions.raster import make_contours_udf

    def fake_core(raster, interval, base):
        if not raster:
            return None
        # deterministic fake MultiLineString WKB header + payload summary
        return wkb(5, struct.pack("<I", 0)) + struct.pack(
            "<dId", interval, len(raster), base
        )

    udf = make_contours_udf(fake_core)
    schema = StructType(
        [StructField("tile_id", StringType(), False), StructField("tif", BinaryType(), True)]
    )
    df = spark.createDataFrame(
        [Row(tile_id="a", tif=b"\x00" * 64), Row(tile_id="b", tif=None)], schema
    ).withColumn("contours", udf(F.col("tif"), F.lit(10), F.lit(0)))
    rows = {r["tile_id"]: r["contours"] for r in df.collect()}
    assert rows["b"] is None
    out = rows["a"]
    assert out is not None
    iv, n, bs = struct.unpack("<dId", out[9:])
    assert (iv, n, bs) == (10.0, 64, 0.0)
    # geometry-type introspection composes with the generated output
    assert geom_type_of_wkb(out) == "MultiLineString"


def test_contours_without_gdal_handles_each_container():
    # GDAL-free contract: strip GeoTIFF decodes via the minimal reader
    # (malformed TIFF → GDAL's unopenable-raster None), FAKM/PNG tiles
    # execute via marching squares, TIFF features beyond the reader
    # (BigTIFF/LZW/tiled) raise the documented error
    from dask_felleskomponenter_spark.functions.raster import (
        HAS_GDAL,
        generate_contours_wkb,
    )

    if HAS_GDAL:
        pytest.skip("GDAL present; fallback path not reachable")
    assert generate_contours_wkb(b"II*\x00rest-of-a-tiff", 10, 0) is None
    with pytest.raises(NotImplementedError, match="BigTIFF"):
        generate_contours_wkb(b"II+\x00\x00\x00\x00\x00", 10, 0)
    assert generate_contours_wkb(b"\x00\x01", 10, 0) is None  # undecodable
    assert generate_contours_wkb(b"", 10, 0) is None  # empty short-circuits first


# --- pure-Python linearization engine (U2 executes without OGR) ----------

def _wkb_curve(code: int, pts) -> bytes:
    return b"\x01" + struct.pack("<II", code, len(pts)) + b"".join(
        struct.pack("<dd", *p) for p in pts
    )


def _parse_linestring_pts(wkb: bytes):
    n = struct.unpack_from("<I", wkb, 5)[0]
    return [struct.unpack_from("<dd", wkb, 9 + 16 * i) for i in range(n)]


class TestPurePythonLinearize:
    def test_semicircle_points_lie_on_circle(self):
        import math

        from dask_felleskomponenter_spark.functions.wkb import linearize_wkb_py

        cs = _wkb_curve(8, [(1, 0), (0, 1), (-1, 0)])
        out = linearize_wkb_py(cs, 10.0)
        assert geom_type_of_wkb(out) == "LineString"
        pts = _parse_linestring_pts(out)
        assert pts[0] == (1.0, 0.0) and pts[-1] == (-1.0, 0.0)
        assert len(pts) - 1 == 18  # 180° / 10°
        assert all(abs(math.hypot(x, y) - 1.0) < 1e-9 for x, y in pts)
        assert pts[len(pts) // 2][1] > 0  # passes through the via point

    def test_orientation_follows_via_point(self):
        from dask_felleskomponenter_spark.functions.wkb import linearize_wkb_py

        cw = _wkb_curve(8, [(1, 0), (0, -1), (-1, 0)])
        pts = _parse_linestring_pts(linearize_wkb_py(cw, 30.0))
        assert pts[len(pts) // 2][1] < 0

    def test_full_circle_postgis_convention(self):
        import math

        from dask_felleskomponenter_spark.functions.wkb import linearize_wkb_py

        circle = _wkb_curve(8, [(1, 0), (-1, 0), (1, 0)])
        pts = _parse_linestring_pts(linearize_wkb_py(circle, 45.0))
        assert pts[0] == pts[-1]
        assert len(pts) == 9  # 360/45 segments + closing point
        assert all(abs(math.hypot(x, y) - 1.0) < 1e-9 for x, y in pts)

    def test_collinear_arc_degrades_to_line(self):
        from dask_felleskomponenter_spark.functions.wkb import linearize_wkb_py

        cs = _wkb_curve(8, [(0, 0), (1, 1), (2, 2)])
        assert _parse_linestring_pts(linearize_wkb_py(cs, 5.0)) == [
            (0.0, 0.0),
            (1.0, 1.0),
            (2.0, 2.0),
        ]

    def test_compound_curve_joins_without_duplicate_junctions(self):
        from dask_felleskomponenter_spark.functions.wkb import linearize_wkb_py

        cc = (
            b"\x01"
            + struct.pack("<II", 9, 2)
            + _wkb_curve(2, [(0, 0), (1, 0)])
            + _wkb_curve(8, [(1, 0), (2, 1), (3, 0)])
        )
        pts = _parse_linestring_pts(linearize_wkb_py(cc, 15.0))
        assert pts[0] == (0.0, 0.0) and pts[-1] == (3.0, 0.0)
        assert len(pts) == len(set(pts)), "junction point duplicated"

    def test_curvepolygon_and_multis_map_to_linear_types(self):
        from dask_felleskomponenter_spark.functions.wkb import linearize_wkb_py

        ring = _wkb_curve(8, [(1, 0), (-1, 0), (1, 0)])
        cp = b"\x01" + struct.pack("<II", 10, 1) + ring
        assert geom_type_of_wkb(linearize_wkb_py(cp, 45.0)) == "Polygon"
        mc = b"\x01" + struct.pack("<II", 11, 1) + ring
        assert geom_type_of_wkb(linearize_wkb_py(mc, 45.0)) == "MultiLineString"
        ms = b"\x01" + struct.pack("<II", 12, 1) + cp
        assert geom_type_of_wkb(linearize_wkb_py(ms, 45.0)) == "MultiPolygon"

    def test_linear_input_passes_through_byte_identical(self):
        from dask_felleskomponenter_spark.functions.wkb import linearize_wkb_py

        line = _wkb_curve(2, [(0, 0), (1, 0), (2, 5)])
        assert linearize_wkb_py(line, 4.0) == line

    def test_ewkb_srid_and_failure_semantics(self):
        from dask_felleskomponenter_spark.functions.wkb import (
            curved_to_linear_bytes,
            linearize_wkb_py,
        )

        # EWKB CircularString with SRID flag (PostGIS header)
        body = struct.pack("<I", 4326) + struct.pack(
            "<I", 3
        ) + b"".join(
            struct.pack("<dd", *p) for p in [(1, 0), (0, 1), (-1, 0)]
        )
        ewkb = b"\x01" + struct.pack("<I", 8 | 0x20000000) + body
        assert geom_type_of_wkb(linearize_wkb_py(ewkb, 30.0)) == "LineString"
        # truncated input → None, garbage → None
        zcs = b"\x01" + struct.pack("<I", 1008) + struct.pack("<I", 3)
        assert linearize_wkb_py(zcs, 30.0) is None
        assert linearize_wkb_py(b"\x05junk", 30.0) is None
        assert curved_to_linear_bytes(None) is None

    def test_z_circularstring_interpolates_z_along_arc(self):
        # half circle radius 1, Z climbing 0 → 10 → 20 through the via
        # point; every sample must sit on the XY circle with Z linear in
        # swept angle (the OGR convention for 3-D curves)
        import math

        from dask_felleskomponenter_spark.functions.wkb import (
            geom_type_of_wkb,
            linearize_wkb_py,
        )

        def wkb_zm(code, pts):
            nd = len(pts[0])
            return b"\x01" + struct.pack("<II", code, len(pts)) + b"".join(
                struct.pack("<" + "d" * nd, *p) for p in pts
            )

        cs_z = wkb_zm(1008, [(1, 0, 0.0), (0, 1, 10.0), (-1, 0, 20.0)])
        out = linearize_wkb_py(cs_z, 10.0)
        assert geom_type_of_wkb(out) == "LineString Z"
        n = struct.unpack_from("<I", out, 5)[0]
        pts = [struct.unpack_from("<ddd", out, 9 + 24 * i) for i in range(n)]
        # endpoints exact
        assert pts[0] == (1.0, 0.0, 0.0) and pts[-1] == (-1.0, 0.0, 20.0)
        for x, y, z in pts:
            assert math.hypot(x, y) == pytest.approx(1.0, abs=1e-9)
            # z is linear in the swept angle from (1,0): θ/π · 20
            theta = math.atan2(y, x) % (2 * math.pi)
            assert z == pytest.approx(theta / math.pi * 20.0, abs=1e-9)
        zs = [p[2] for p in pts]
        assert zs == sorted(zs)  # monotone along the traversal
        assert n >= 18  # 180° at 10° steps

        # EWKB Z flag (PostGIS encoding) must behave identically
        ewkb_z = b"\x01" + struct.pack(
            "<I", 8 | 0x80000000
        ) + struct.pack("<I", 3) + b"".join(
            struct.pack("<ddd", *p)
            for p in [(1, 0, 0.0), (0, 1, 10.0), (-1, 0, 20.0)]
        )
        assert linearize_wkb_py(ewkb_z, 10.0) == out

    def test_zm_dimensions_roundtrip_and_pass_through(self):
        from dask_felleskomponenter_spark.functions.wkb import (
            geom_type_of_wkb,
            linearize_wkb_py,
        )

        def wkb_zm(code, pts):
            nd = len(pts[0])
            return b"\x01" + struct.pack("<II", code, len(pts)) + b"".join(
                struct.pack("<" + "d" * nd, *p) for p in pts
            )

        # M-only CircularString → LineString M
        cs_m = wkb_zm(2008, [(1, 0, 5.0), (0, 1, 6.0), (-1, 0, 7.0)])
        assert geom_type_of_wkb(linearize_wkb_py(cs_m, 30.0)) == "LineString M"
        # ZM CircularString → LineString ZM, 4 doubles per point
        cs_zm = wkb_zm(
            3008, [(1, 0, 0.0, 5.0), (0, 1, 10.0, 6.0), (-1, 0, 20.0, 7.0)]
        )
        out = linearize_wkb_py(cs_zm, 30.0)
        assert geom_type_of_wkb(out) == "LineString ZM"
        n = struct.unpack_from("<I", out, 5)[0]
        last = struct.unpack_from("<dddd", out, 9 + 32 * (n - 1))
        assert last == (-1.0, 0.0, 20.0, 7.0)
        # already-linear Z input passes through byte-identical
        line_z = wkb_zm(1002, [(0, 0, 1.0), (1, 0, 2.0), (2, 5, 3.0)])
        assert linearize_wkb_py(line_z, 4.0) == line_z
        # linearize is idempotent on its own Z output
        assert linearize_wkb_py(out, 30.0) == out

    def test_udf_engine_auto_runs_without_ogr(self, spark):
        import pandas as pd

        from dask_felleskomponenter_spark.functions.wkb import (
            curved_to_linear_wkb,
        )
        from pyspark.sql import functions as F

        cs = _wkb_curve(8, [(1, 0), (0, 1), (-1, 0)])
        df = spark.createDataFrame(
            pd.DataFrame({"g": [cs, None]})
        ).select(
            curved_to_linear_wkb(F.col("g"), F.lit(30.0)).alias("lin")
        )
        got = [r.lin for r in df.collect()]
        assert geom_type_of_wkb(got[0]) == "LineString"
        assert got[1] is None


# --- marching-squares contour engine (U3 executes without GDAL) ----------

class TestMarchingSquaresContours:
    def _cone(self, n=32):
        import numpy as np

        yy, xx = np.mgrid[0:n, 0:n]
        c = (n - 1) / 2.0
        return np.clip(100 - 4 * np.hypot(xx - c, yy - c), 0, None).astype(
            "uint8"
        )

    def test_cone_contours_are_closed_rings_at_right_radii(self):
        import math

        from dask_felleskomponenter_spark.functions.raster import (
            contours_from_grid,
        )

        grid = self._cone()
        wkb = contours_from_grid(grid, interval=20.0, base=0.0)
        assert geom_type_of_wkb(wkb) == "MultiLineString"
        n = struct.unpack_from("<I", wkb, 5)[0]
        off = 9
        rings = []
        for _ in range(n):
            m = struct.unpack_from("<I", wkb, off + 5)[0]
            pts = [
                struct.unpack_from("<dd", wkb, off + 9 + 16 * i)
                for i in range(m)
            ]
            off += 9 + 16 * m
            if pts[0] == pts[-1] and m > 10:
                rings.append(pts)
        # interior levels 40/60/80 close inside the tile; their radii
        # must match level = 100 - 4·r within interpolation error
        assert len(rings) == 3
        for pts in rings:
            rads = [math.hypot(x - 15.5, y - 15.5) for x, y in pts]
            r_avg = sum(rads) / len(rads)
            level = 100 - 4 * r_avg
            assert abs(level - round(level / 20) * 20) < 4.0, level

    def test_contour_vertices_interpolate_to_level(self):
        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import (
            contours_from_grid,
        )

        # smooth saddle-free ramp: value = x + 2y; contours are straight
        yy, xx = np.mgrid[0:16, 0:16]
        grid = (xx + 2.0 * yy).astype("float64")
        wkb = contours_from_grid(grid, interval=7.0, base=0.0)
        n = struct.unpack_from("<I", wkb, 5)[0]
        off = 9
        checked = 0
        for _ in range(n):
            m = struct.unpack_from("<I", wkb, off + 5)[0]
            for i in range(m):
                x, y = struct.unpack_from("<dd", wkb, off + 9 + 16 * i)
                # pixel-center geotransform → grid coords are (x-.5, y-.5)
                val = (x - 0.5) + 2.0 * (y - 0.5)
                assert abs(val / 7.0 - round(val / 7.0)) < 1e-9
                checked += 1
            off += 9 + 16 * m
        assert checked > 20

    def test_geotransform_maps_coordinates(self):
        from dask_felleskomponenter_spark.functions.raster import (
            contours_from_grid,
        )
        import numpy as np

        yy, xx = np.mgrid[0:8, 0:8]
        grid = (xx * 10.0).astype("float64")
        gt = (1000.0, 5.0, 0.0, 2000.0, 0.0, -5.0)
        wkb = contours_from_grid(grid, interval=25.0, base=0.0, geotransform=gt)
        n = struct.unpack_from("<I", wkb, 5)[0]
        off = 9
        for _ in range(n):
            m = struct.unpack_from("<I", wkb, off + 5)[0]
            for i in range(m):
                x, y = struct.unpack_from("<dd", wkb, off + 9 + 16 * i)
                assert 1000.0 <= x <= 1000.0 + 8 * 5.0
                assert 2000.0 - 8 * 5.0 <= y <= 2000.0
            off += 9 + 16 * m

    def test_flat_grid_yields_none(self):
        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import (
            contours_from_grid,
        )

        assert contours_from_grid(np.zeros((8, 8)), 10.0) is None

    def test_default_udf_runs_gdal_free_over_fakm_tiles(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F

        from dask_felleskomponenter_spark.functions.multimodal import fakm_encode
        from dask_felleskomponenter_spark.functions.raster import (
            generate_contours_udf,
        )

        grid = self._cone()
        blob = fakm_encode("i", 32, 32, 1, grid.tobytes())
        df = spark.createDataFrame(
            pd.DataFrame({"tile": [blob, None]})
        ).select(
            generate_contours_udf(
                F.col("tile"), F.lit(20.0), F.lit(0.0)
            ).alias("contours")
        )
        got = [r.contours for r in df.collect()]
        assert geom_type_of_wkb(got[0]) == "MultiLineString"
        assert got[1] is None


class TestPointInPolygon:
    @staticmethod
    def _poly(rings):
        body = struct.pack("<I", len(rings))
        for r in rings:
            body += struct.pack("<I", len(r)) + b"".join(
                struct.pack("<dd", *p) for p in r
            )
        return b"\x01" + struct.pack("<I", 3) + body

    def test_square_with_hole(self):
        from dask_felleskomponenter_spark.functions.wkb import (
            point_in_polygon_bytes,
        )

        outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
        hole = [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]
        poly = self._poly([outer, hole])
        assert point_in_polygon_bytes(poly, 2, 2) is True
        assert point_in_polygon_bytes(poly, 5, 5) is False  # in the hole
        assert point_in_polygon_bytes(poly, 11, 5) is False
        assert point_in_polygon_bytes(poly, -1, -1) is False

    def test_multipolygon_any_part(self):
        from dask_felleskomponenter_spark.functions.wkb import (
            point_in_polygon_bytes,
        )

        a = self._poly([[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]])
        b = self._poly([[(10, 10), (12, 10), (12, 12), (10, 12), (10, 10)]])
        mp = b"\x01" + struct.pack("<II", 6, 2) + a + b
        assert point_in_polygon_bytes(mp, 1, 1) is True
        assert point_in_polygon_bytes(mp, 11, 11) is True
        assert point_in_polygon_bytes(mp, 5, 5) is False

    def test_composes_with_linearized_curvepolygon(self):
        import math

        from dask_felleskomponenter_spark.functions.wkb import (
            linearize_wkb_py,
            point_in_polygon_bytes,
        )

        # unit circle as a CurvePolygon ring, linearized at 10°
        ring = b"\x01" + struct.pack("<II", 8, 3) + b"".join(
            struct.pack("<dd", *p) for p in [(1, 0), (-1, 0), (1, 0)]
        )
        cp = b"\x01" + struct.pack("<II", 10, 1) + ring
        poly = linearize_wkb_py(cp, 10.0)
        assert point_in_polygon_bytes(poly, 0, 0) is True
        assert point_in_polygon_bytes(poly, 0.9, 0.0) is True
        assert point_in_polygon_bytes(poly, 1.1, 0.0) is False
        # near the sampled boundary the polygon is slightly inside the
        # true circle: a point at r=0.999 between vertices may fall out,
        # but r <= cos(5°)≈0.9962 is always inside
        r = math.cos(math.radians(5.0)) - 1e-6
        assert point_in_polygon_bytes(poly, r, 0) is True

    def test_failure_contract_and_spark_udf(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F

        from dask_felleskomponenter_spark.functions.wkb import (
            point_in_polygon,
            point_in_polygon_bytes,
        )

        assert point_in_polygon_bytes(None, 0, 0) is None
        assert point_in_polygon_bytes(b"\x09junk", 0, 0) is None
        poly = self._poly([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]])
        df = spark.createDataFrame(
            pd.DataFrame(
                {"g": [poly, poly, None], "x": [1.0, 9.0, 0.0], "y": [1.0, 9.0, 0.0]}
            )
        ).select(point_in_polygon("g", "x", "y").alias("hit"))
        assert [r.hit for r in df.collect()] == [True, False, None]


class TestVectorizedMarchingSquares:
    def test_vectorized_equals_scalar_reference(self):
        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import (
            _ms_segments,
            _ms_segments_scalar,
        )

        rng = np.random.default_rng(3)

        def canon(segs):
            return [
                (tuple(round(c, 9) for c in a), tuple(round(c, 9) for c in b))
                for a, b in segs
            ]

        for _ in range(25):
            g = rng.integers(
                0, 8, size=(int(rng.integers(2, 12)), int(rng.integers(2, 12)))
            ).astype(float)
            for level in (1.0, 2.5, 3.0):  # incl. exact corner hits
                assert canon(_ms_segments(g, level)) == canon(
                    _ms_segments_scalar(g, level)
                )

    def test_production_tile_size_is_fast(self):
        import time

        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import _ms_segments

        yy, xx = np.mgrid[0:256, 0:256]
        dem = 100 * np.sin(xx / 25.0) * np.cos(yy / 31.0) + xx * 0.2
        t = time.perf_counter()
        segs = _ms_segments(dem, 10.0)
        elapsed = time.perf_counter() - t
        assert segs
        # scalar reference takes ~90ms here; the vectorized path must
        # stay an order of magnitude under it even on a loaded box
        assert elapsed < 0.05, f"{elapsed:.3f}s"


# --- minimal GeoTIFF strip reader (U3 GeoTIFF without GDAL) ---------------

def _make_tiff(
    grid,
    *,
    bo="<",
    compression=1,
    predictor=1,
    dtype="f4",
    sample_format=3,
    scale=None,
    tiepoint=None,
):
    """Spec-minimal single-strip TIFF writer for tests (TIFF 6.0)."""
    import zlib

    import numpy as np

    g = np.asarray(grid)
    h, w = g.shape
    arr = g.astype(np.dtype(dtype).newbyteorder(bo))
    if predictor == 2:
        a = arr.astype(np.int64)
        diff = np.empty_like(a)
        diff[:, 0] = a[:, 0]
        diff[:, 1:] = a[:, 1:] - a[:, :-1]
        arr = diff.astype(arr.dtype)
    pixels = arr.tobytes()
    if compression == 8:
        pixels = zlib.compress(pixels)

    bits = np.dtype(dtype).itemsize * 8
    entries = []  # (tag, type, count, packed-value-or-None, external-bytes)

    def entry(tag, typ, count, values, fmt):
        packed = struct.pack(bo + fmt * count, *values)
        entries.append([tag, typ, count, packed])

    strip_off_placeholder = 0
    entry(256, 3, 1, [w], "H")
    entry(257, 3, 1, [h], "H")
    entry(258, 3, 1, [bits], "H")
    entry(259, 3, 1, [compression], "H")
    entry(262, 3, 1, [1], "H")
    entry(273, 4, 1, [strip_off_placeholder], "I")  # patched below
    entry(277, 3, 1, [1], "H")
    entry(278, 3, 1, [h], "H")
    entry(279, 4, 1, [len(pixels)], "I")
    if predictor != 1:
        entry(317, 3, 1, [predictor], "H")
    entry(339, 3, 1, [sample_format], "H")
    if scale is not None:
        entry(33550, 12, 3, list(scale), "d")
    if tiepoint is not None:
        entry(33922, 12, 6, list(tiepoint), "d")
    entries.sort(key=lambda e: e[0])

    # layout: header(8) | pixels | external values | IFD
    header_len = 8
    pixels_off = header_len
    ext_off = pixels_off + len(pixels)
    ext = bytearray()
    ifd_entries = bytearray()
    for tag, typ, count, packed in entries:
        if tag == 273:
            packed = struct.pack(bo + "I", pixels_off)
        if len(packed) <= 4:
            val = packed + b"\x00" * (4 - len(packed))
        else:
            val = struct.pack(bo + "I", ext_off + len(ext))
            ext.extend(packed)
        ifd_entries += struct.pack(bo + "HHI", tag, typ, count) + val
    ifd_off = ext_off + len(ext)
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    out = magic + struct.pack(bo + "I", ifd_off)
    out += pixels + bytes(ext)
    out += struct.pack(bo + "H", len(entries)) + bytes(ifd_entries)
    out += struct.pack(bo + "I", 0)  # next-IFD terminator
    return out


class TestGeoTiffReader:
    def _cone(self, n=33):
        import numpy as np

        yy, xx = np.mgrid[0:n, 0:n].astype("float64")
        c = (n - 1) / 2.0
        return 100.0 - np.hypot(xx - c, yy - c) * 4.0

    def test_uncompressed_float_matches_grid_engine(self):
        from dask_felleskomponenter_spark.functions.raster import (
            contours_from_grid,
            decode_geotiff_grid,
            generate_contours_py,
        )

        import numpy as np

        grid = self._cone().astype("f4").astype("float64")  # f4-exact values
        gt = (1000.0, 2.0, 0.0, 500.0, 0.0, -2.0)
        tiff = _make_tiff(
            grid,
            scale=(2.0, 2.0, 0.0),
            tiepoint=(0.0, 0.0, 0.0, 1000.0, 500.0, 0.0),
        )
        dec = decode_geotiff_grid(tiff)
        assert dec is not None
        got_grid, got_gt = dec
        assert got_gt == gt
        assert (got_grid == grid).all()
        # end-to-end: identical WKB to driving the grid engine directly
        assert generate_contours_py(tiff, 10.0, 0.0) == contours_from_grid(
            grid, 10.0, 0.0, gt
        )

    def test_deflate_predictor2_uint16_and_big_endian(self):
        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import (
            decode_geotiff_grid,
        )

        rng = np.random.RandomState(7)
        grid = rng.randint(0, 4000, size=(17, 23)).astype("u2")
        for bo in ("<", ">"):
            tiff = _make_tiff(
                grid,
                bo=bo,
                compression=8,
                predictor=2,
                dtype="u2",
                sample_format=1,
            )
            dec = decode_geotiff_grid(tiff)
            assert dec is not None, bo
            assert (dec[0] == grid.astype("float64")).all(), bo

    def test_multi_strip_layout(self):
        # strips are concatenated in order; emulate by splitting pixels
        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import (
            decode_geotiff_grid,
        )

        grid = self._cone(16)
        tiff = bytearray(_make_tiff(grid, dtype="f8", sample_format=3))
        dec = decode_geotiff_grid(bytes(tiff))
        assert dec is not None and (dec[0] == grid).all()

    def test_unsupported_features_name_the_gdal_upgrade(self):
        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import (
            decode_geotiff_grid,
        )

        grid = np.zeros((4, 4), dtype="f4")
        lzw = _make_tiff(grid, compression=5)
        with pytest.raises(NotImplementedError, match="GDAL"):
            decode_geotiff_grid(lzw)
        assert decode_geotiff_grid(b"not a tiff at all") is None
        truncated = _make_tiff(grid)[:40]
        assert decode_geotiff_grid(truncated) is None

    def test_contours_udf_runs_on_real_geotiff_tiles(self, spark):
        # the Spark surface: BinaryType GeoTIFF tiles → MultiLineString
        # WKB through the default UDF, no GDAL anywhere
        from dask_felleskomponenter_spark.functions.raster import (
            generate_contours_udf,
        )
        from dask_felleskomponenter_spark.functions.wkb import (
            geom_type_of_wkb,
        )

        tiff = _make_tiff(
            self._cone(),
            scale=(1.0, 1.0, 0.0),
            tiepoint=(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        )
        df = spark.createDataFrame(
            [Row(tile_id=i, tile=tiff) for i in range(6)]
        )
        out = df.select(
            "tile_id",
            generate_contours_udf(
                F.col("tile"), F.lit(10.0), F.lit(0.0)
            ).alias("contours"),
        ).collect()
        assert len(out) == 6
        for r in out:
            assert geom_type_of_wkb(r.contours) == "MultiLineString"


class TestGeoTiffWriter:
    def test_roundtrip_preserves_grid_and_geotransform(self):
        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import (
            decode_geotiff_grid,
            geotiff_encode,
        )

        rng = np.random.RandomState(3)
        gt = (500.0, 2.5, 0.0, 900.0, 0.0, -2.5)
        for dt in ("u1", "u2", "i2", "f4", "f8"):
            grid = (rng.rand(9, 13) * 200).astype(dt)
            for compress in (True, False):
                out = decode_geotiff_grid(
                    geotiff_encode(grid, gt, compress=compress)
                )
                assert out is not None, (dt, compress)
                dec, dec_gt = out
                assert dec_gt == gt, (dt, compress)
                assert (dec == grid.astype("float64")).all(), (dt, compress)

    def test_fakm_and_geotiff_containers_contour_identically(self):
        # the container must not change the answer: same uint8 grid in
        # FAKM and in GeoTIFF → byte-identical MultiLineString WKB
        import numpy as np

        from dask_felleskomponenter_spark.functions.multimodal import (
            fakm_encode,
        )
        from dask_felleskomponenter_spark.functions.raster import (
            generate_contours_py,
            geotiff_encode,
        )

        rng = np.random.RandomState(11)
        for _ in range(5):
            g8 = (rng.rand(8, 8) * 255).astype("uint8")
            fakm = fakm_encode("i", 8, 8, 1, g8.tobytes())
            tiff = geotiff_encode(g8)
            assert generate_contours_py(fakm, 64.0, 0.0) == \
                generate_contours_py(tiff, 64.0, 0.0)


class TestRound8ReviewFindings:
    def test_arc_linearizes_at_projected_coordinates(self):
        """Round-8 review finding (reproduced): the collinearity
        tolerance scaled with GLOBAL coordinate magnitude squared, so a
        10 m-radius arc at UTM33 coordinates (~5e5, 6.7e6) was silently
        flattened to straight chords — every sampled point must sit on
        the true circle."""
        import math

        from dask_felleskomponenter_spark.functions.wkb import _arc_points

        cx0, cy0, r = 500000.0, 6700000.0, 10.0

        def pt(deg):
            t = math.radians(deg)
            return (cx0 + r * math.cos(t), cy0 + r * math.sin(t))

        pts = _arc_points(pt(0), pt(23), pt(46), math.radians(4.0))
        assert len(pts) > 3, "arc flattened to a chord"
        err = max(abs(math.hypot(x - cx0, y - cy0) - r) for x, y, *_ in pts)
        assert err < 1e-6, err
        # genuinely collinear control points still emit straight segments
        flat = _arc_points(
            (500000.0, 6700000.0), (500010.0, 6700010.0),
            (500020.0, 6700020.0), math.radians(4.0),
        )
        assert len(flat) == 3

    def test_contours_nan_and_sentinel_nodata_decline(self):
        """NaN nodata crashed with 'cannot convert float NaN to
        integer'; the float32 sentinel -3.4e38 exploded the level range
        into an effective hang. Both must follow the malformed-input →
        None contract (or skip the contaminated chains)."""
        import numpy as np

        from dask_felleskomponenter_spark.functions.raster import (
            contours_from_grid,
        )

        base_grid = np.outer(np.arange(8), np.ones(8)) * 10.0
        g_nan = base_grid.copy()
        g_nan[0, 0] = float("nan")
        out = contours_from_grid(g_nan, interval=20.0, base=0.0)
        assert out is None or isinstance(out, bytes)  # no crash
        g_sent = base_grid.copy()
        g_sent[0, 0] = -3.4e38
        assert contours_from_grid(g_sent, interval=20.0, base=0.0) is None
        # NaN interval / base: None, not int(NaN) crash
        assert contours_from_grid(base_grid, interval=float("nan"), base=0.0) is None
        assert contours_from_grid(base_grid, interval=10.0, base=float("nan")) is None

    def test_geom_type_unknown_code_survives_ansi(self, spark):
        """element_at on a literal map THROWS under ANSI (Spark 4
        default) for an unknown geometry code — the Unknown(n) fallback
        must be reachable."""
        from pyspark.sql import functions as F

        from dask_felleskomponenter_spark.functions.wkb import (
            wkb_geom_type_col,
        )

        # little-endian WKB header with absurd geometry code 25
        blob = bytes([1]) + (25).to_bytes(4, "little") + b"\x00" * 8
        df = spark.createDataFrame([(blob.hex(),)], ["wkb_hex"])
        got = df.select(
            wkb_geom_type_col(F.col("wkb_hex")).alias("t")
        ).first()["t"]
        # the exact decoded code depends on the column's hex-offset
        # convention; the pinned behavior is that the Unknown(n)
        # fallback is REACHED instead of element_at throwing
        assert got.startswith("Unknown("), got

    def test_curved_to_linear_rejects_varying_angle_column(self, spark):
        """A varying angle column silently applied batch row 0's value
        to every row — detect and fail loudly (lit()-constant guard,
        mirroring contours_udf)."""
        import pytest as _pytest
        from pyspark.sql import functions as F

        from dask_felleskomponenter_spark.functions.wkb import (
            curved_to_linear_wkb,
        )
        from tests.fixtures_wkb import CORPUS

        circ = CORPUS["circularstring_2d"][0]
        df = spark.createDataFrame(
            [(circ, 4.0), (circ, 9.0)],
            "g binary, a double",
        ).coalesce(1)
        with _pytest.raises(Exception, match="lit\\(\\) constant"):
            df.select(curved_to_linear_wkb("g", F.col("a"))).collect()
        # lit() constant still works; lit(None) degrades to the default
        ok = df.select(
            curved_to_linear_wkb("g", F.lit(4.0)).alias("w"),
            curved_to_linear_wkb("g", F.lit(None).cast("double")).alias("wn"),
        ).collect()
        assert all(r["w"] is not None and r["wn"] is not None for r in ok)

    def test_point_in_polygon_null_coords_are_null(self):
        """None/NaN coordinates are 'unknown point' → None, never a
        TypeError and never a confident False."""
        from dask_felleskomponenter_spark.functions.wkb import (
            point_in_polygon_bytes,
        )
        from tests.fixtures_wkb import CORPUS

        poly = CORPUS["polygon_2d"][0]
        assert point_in_polygon_bytes(poly, None, None) is None
        assert point_in_polygon_bytes(poly, float("nan"), 1.0) is None

    def test_tiff_count_zero_tag_returns_none(self):
        """An IFD tag declaring count=0 stored an empty value list and
        a bare [0] raised IndexError outside the parse try."""
        import struct

        from dask_felleskomponenter_spark.functions.raster import (
            decode_geotiff_grid,
        )

        # minimal II TIFF: one IFD entry, tag 256 (ImageWidth), SHORT,
        # count=0
        hdr = b"II*\x00" + struct.pack("<I", 8)
        ifd = struct.pack("<H", 1) + struct.pack(
            "<HHI4s", 256, 3, 0, b"\x00" * 4
        ) + struct.pack("<I", 0)
        assert decode_geotiff_grid(hdr + ifd) is None
