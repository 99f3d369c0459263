"""Corpus manifests — "is this the exact dataset we trained on?"

A training-corpus export is only reproducible if its identity can be
checked later: row count, an order-independent content checksum, and
the file inventory. The checksum is computed BY THE CLUSTER (a map-side
``xxhash64`` per row folded with a modular SUM — one aggregate, no data
movement beyond one small partial per partition), so verifying a 100 TB
corpus costs one scan, not a driver-side read.

SUM-fold (mod 2^64) properties that make this the right reduction:
- order-independent (addition commutes; shuffle/partitioning cannot
  change it),
- any single-row change moves it with probability ~1-2^-64,
- multiplicity-sensitive: k copies of a row contribute k·h mod 2^64,
  so duplicate-pair substitutions ({A,A} → {B,B}) are detected — the
  failure class a ``bit_xor`` fold misses with probability 1 (each
  even-multiplicity set XORs to 0 while preserving row count).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_corpus_manifest.json"


def df_checksum(df: DataFrame, cols: list[str] | None = None) -> tuple[int, int]:
    """Order-independent (checksum, row_count) of a DataFrame.

    ``xxhash64`` over the selected columns per row, folded with a
    modular SUM into [0, 2^64). One whole-stage-codegen aggregate: each
    partition emits one small partial, the driver receives numbers,
    never rows. Column order is canonicalized by hashing a fixed column
    list — pass ``cols`` to pin the schema subset that defines corpus
    identity.

    The per-row hashes are summed exactly as ``decimal(38,0)`` (ANSI-
    safe: a signed-long SUM would overflow-error under Spark 4's
    default ANSI mode) and reduced mod 2^64 driver-side; the decimal
    sum itself cannot overflow below ~10^19 rows.

    NULLs are hashed through an explicit per-column IS-NULL FLAG
    hashed alongside the (null-coalesced) value: Spark's raw
    ``xxhash64`` SKIPS null inputs, which made ``('a', NULL)`` and
    ``(NULL, 'a')`` hash identically — corruption that shifts a value
    across a NULL column would verify clean with probability 1, not
    2^-64. A string SENTINEL alone reopened the same class: a real cell
    holding the sentinel's exact text collided with NULL, so that
    substitution also verified clean with probability 1; the flag
    column removes every collision (no value can impersonate NULL).
    Values are cast to string; Spark's casts are deterministic, and the
    checksum only needs determinism + sensitivity, not numeric
    identity.
    """
    # `is None`, not falsy-or: a caller-computed identity subset that
    # comes out EMPTY must not silently checksum the full schema (the
    # same distinction sources/tables.py::load_tables draws) — it is a
    # caller bug, reported loudly.
    if cols is not None and len(cols) == 0:
        raise ValueError(
            "df_checksum: cols is an empty list — pass None to checksum "
            "all columns, or a non-empty identity subset"
        )
    use = sorted(df.columns) if cols is None else cols
    hashed = []
    for c in use:
        # backtick-quoted: a literal dot in a top-level column name
        # (legal in parquet) would otherwise parse as nested-field
        # access and fail resolution — the corpus could be written but
        # never manifested/verified
        qc = F.col("`" + c.replace("`", "``") + "`")
        hashed.append(qc.isNull().cast("string"))
        hashed.append(F.coalesce(qc.cast("string"), F.lit("")))
    row = df.agg(
        F.sum(F.xxhash64(*hashed).cast("decimal(38,0)")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    ).first()
    total = int(row["_s"]) if row["_s"] is not None else 0
    return (total % (1 << 64), row["_n"])


def _file_inventory(data_path: str) -> dict[str, int]:
    """Relative-path → byte-size map of the corpus files (underscore/dot
    sidecars excluded). Driver-local filesystem walk — the checksum side
    is fully distributed, but the inventory (and the manifest JSON I/O)
    needs a local or NFS-mounted path; on object stores, swap this for a
    Hadoop ``FileSystem.listFiles`` walk.
    """
    files: dict[str, int] = {}
    for base, dirs, names in os.walk(data_path):
        # Prune Spark-invisible DIRECTORIES too (_temporary/,
        # _spark_metadata/, .staging-*): their inner files often have
        # plain names, and recording such residue as corpus identity
        # makes its later cleanup — a no-op for Spark-visible data —
        # fail verification as a false corruption alarm.
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
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
    # Same staleness guard as the verify side: if this session listed
    # the directory before a re-export rewrote it, the shared
    # FileStatusCache would serve the OLD file listing — the checksum
    # job would hit deleted part files or silently checksum the old
    # content while _file_inventory (os.walk, always fresh) records the
    # new files: a manifest that can never verify.
    spark.catalog.refreshByPath(data_path)
    df = spark.read.parquet(data_path)
    checksum, n_rows = df_checksum(df, cols)
    files = _file_inventory(data_path)
    manifest = {
        "checksum_sum64_v2": checksum,
        "n_rows": n_rows,
        "columns": sorted(df.columns) if cols is None else cols,
        "files": files,
        "extra": extra or {},
    }
    from dask_felleskomponenter_spark.ioutil import atomic_json_dump

    atomic_json_dump(
        os.path.join(data_path, MANIFEST_NAME),
        manifest,
        indent=1,
        sort_keys=True,
    )
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
    problems: list[str] = []
    # Schema drift first: a recorded column missing from the live data
    # must be a reported problem, not an AnalysisException out of
    # df_checksum's unresolved-column reference.
    missing = [c for c in recorded["columns"] if c not in df.columns]
    if missing:
        return {
            "ok": False,
            "problems": [f"recorded column(s) missing from data: {missing}"],
        }
    if "checksum_sum64_v2" not in recorded:
        # Earlier formats are not comparable: the XOR fold was blind to
        # even-multiplicity substitutions, and the v1 sum fold's string
        # sentinel collided with a real cell holding the sentinel text.
        # Checked BEFORE df_checksum — the full corpus scan's result
        # would be known-unusable, and on the 100 TB corpus this module
        # exists for that scan is hours; only the row count (a cheap
        # parquet-metadata count) remains comparable.
        problems.append(
            "manifest predates the null-flag checksum; re-write it with "
            "write_corpus_manifest"
        )
        n_rows = df.count()
    else:
        checksum, n_rows = df_checksum(df, recorded["columns"])
        if checksum != recorded["checksum_sum64_v2"]:
            problems.append("content checksum mismatch")
    if n_rows != recorded["n_rows"]:
        problems.append(f"row count {n_rows} != recorded {recorded['n_rows']}")
    if _file_inventory(data_path) != recorded["files"]:
        problems.append("file inventory changed")
    return {"ok": not problems, "problems": problems}
