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


def test_contours_without_gdal_raises_cleanly():
    from dask_felleskomponenter_spark.functions.raster import (
        HAS_GDAL,
        generate_contours_wkb,
    )

    if HAS_GDAL:
        pytest.skip("GDAL present; stub path not reachable")
    with pytest.raises(NotImplementedError, match="GDAL"):
        generate_contours_wkb(b"\x00\x01", 10, 0)
    assert generate_contours_wkb(b"", 10, 0) is None  # empty short-circuits first
