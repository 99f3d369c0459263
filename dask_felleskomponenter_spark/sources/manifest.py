"""Corpus manifests — "is this the exact dataset we trained on?"

A training-corpus export is only reproducible if its identity can be
checked later: row count, an order-independent content checksum, and
the file inventory. The checksum is computed BY THE CLUSTER (a map-side
``xxhash64`` per row folded with ``bit_xor`` — one aggregate, no data
movement beyond a single 8-byte partial per partition), so verifying a
100 TB corpus costs one scan, not a driver-side read.

XOR-fold properties that make this the right reduction:
- order-independent (shuffle/partitioning cannot change it),
- any single-row change flips it with probability ~1-2^-64,
- BUT duplicate-pair insertions cancel — which is why the manifest
  also records the exact row count (a cancelled pair changes count).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_corpus_manifest.json"


def df_checksum(df: DataFrame, cols: list[str] | None = None) -> tuple[int, int]:
    """Order-independent (checksum, row_count) of a DataFrame.

    ``xxhash64`` over the selected columns per row, ``bit_xor``-folded.
    One whole-stage-codegen aggregate: each partition emits an 8-byte
    partial, the driver receives numbers, never rows. Column order is
    canonicalized by hashing a fixed column list — pass ``cols`` to pin
    the schema subset that defines corpus identity.

    NULLs are hashed through a per-column sentinel: Spark's raw
    ``xxhash64`` SKIPS null inputs, which made ``('a', NULL)`` and
    ``(NULL, 'a')`` hash identically — corruption that shifts a value
    across a NULL column would verify clean with probability 1, not
    2^-64. Values are cast to string for sentinel coalescing; Spark's
    casts are deterministic, and the checksum only needs determinism +
    sensitivity, not numeric identity.
    """
    use = cols or sorted(df.columns)
    hashed = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>")) for c in use
    ]
    row = df.agg(
        F.bit_xor(F.xxhash64(*hashed)).alias("_x"),
        F.count(F.lit(1)).alias("_n"),
    ).first()
    return (row["_x"] if row["_x"] is not None else 0, row["_n"])


def _file_inventory(data_path: str) -> dict[str, int]:
    """Relative-path → byte-size map of the corpus files (underscore/dot
    sidecars excluded). Driver-local filesystem walk — the checksum side
    is fully distributed, but the inventory (and the manifest JSON I/O)
    needs a local or NFS-mounted path; on object stores, swap this for a
    Hadoop ``FileSystem.listFiles`` walk.
    """
    files: dict[str, int] = {}
    for base, _dirs, names in os.walk(data_path):
        for f in sorted(names):
            if f.startswith("_") or f.startswith("."):
                continue
            p = os.path.join(base, f)
            files[os.path.relpath(p, data_path)] = os.path.getsize(p)
    return files


def write_corpus_manifest(
    spark: SparkSession,
    data_path: str,
    cols: list[str] | None = None,
    extra: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Compute and persist the manifest for a parquet corpus directory.

    Records the distributed checksum + row count, the per-file byte
    inventory, and caller metadata (``extra`` — e.g. the mixture weights
    or filter thresholds that produced the export). Returns the
    manifest dict; writes ``_corpus_manifest.json`` inside the
    directory (underscore-prefixed files are invisible to Spark's
    parquet reader, like ``_SUCCESS``)."""
    df = spark.read.parquet(data_path)
    checksum, n_rows = df_checksum(df, cols)
    files = _file_inventory(data_path)
    manifest = {
        "checksum_xor64": checksum,
        "n_rows": n_rows,
        "columns": cols or sorted(df.columns),
        "files": files,
        "extra": extra or {},
    }
    with open(os.path.join(data_path, MANIFEST_NAME), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_corpus_manifest(
    spark: SparkSession, data_path: str
) -> dict[str, Any]:
    """Re-derive the manifest facts and diff them against the recorded
    ones. Returns ``{"ok": bool, "problems": [...]}`` — content drift
    (checksum/count) and file-inventory drift are reported separately
    so a benign re-layout (same rows, different files) is
    distinguishable from data corruption."""
    with open(os.path.join(data_path, MANIFEST_NAME), encoding="utf-8") as fh:
        recorded = json.load(fh)
    # drop cached file statuses/footers — verification must see the
    # directory as it is NOW, not as this session first listed it
    spark.catalog.refreshByPath(data_path)
    df = spark.read.parquet(data_path)
    checksum, n_rows = df_checksum(df, recorded["columns"])
    problems: list[str] = []
    if n_rows != recorded["n_rows"]:
        problems.append(f"row count {n_rows} != recorded {recorded['n_rows']}")
    if checksum != recorded["checksum_xor64"]:
        problems.append("content checksum mismatch")
    if _file_inventory(data_path) != recorded["files"]:
        problems.append("file inventory changed")
    return {"ok": not problems, "problems": problems}
