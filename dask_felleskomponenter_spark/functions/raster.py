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
        raise NotImplementedError(
            "generate_contours_wkb requires GDAL (install the [gdal] extra)"
        )

    mem_path = f"/vsimem/{uuid.uuid4().hex}"
    ds = None
    vec = None
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
        # interval/base arrive as lit() constants — one value per batch
        iv = float(interval.iloc[0]) if len(interval) else 10.0
        bs = float(base.iloc[0]) if len(base) else 0.0
        return rasters.apply(lambda r: core_fn(r, iv, bs))

    return contours_udf


#: Default UDF instance (GDAL-backed core).
generate_contours_udf = make_contours_udf()
