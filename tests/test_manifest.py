"""Corpus manifest / distributed checksum (``sources/manifest.py``)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dask_felleskomponenter_spark.sources.manifest import (
    df_checksum,
    verify_corpus_manifest,
    write_corpus_manifest,
)


def _corpus(spark, n=500, salt=0):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"text{salt} "), F.col("id").cast("string")).alias("text"),
    )


def test_checksum_is_layout_invariant_and_content_sensitive(spark):
    base = _corpus(spark)
    c0 = df_checksum(base)
    # partitioning / order cannot change identity
    assert df_checksum(base.repartition(17)) == c0
    assert df_checksum(base.orderBy(F.col("doc_id").desc())) == c0
    # any single value change flips it
    mutated = base.withColumn(
        "text",
        F.when(F.col("doc_id") == 250, F.lit("tampered")).otherwise(
            F.col("text")
        ),
    )
    assert df_checksum(mutated) != c0
    # a dropped row changes the count even if XOR cancelled
    assert df_checksum(base.filter("doc_id <> 7"))[1] == c0[1] - 1


def test_manifest_roundtrip_and_tamper_detection(spark, tmp_path):
    path = str(tmp_path / "corpus")
    _corpus(spark).repartition(4).write.parquet(path)
    m = write_corpus_manifest(
        spark, path, extra={"mixture": "v1", "quality_cut": 0.5}
    )
    assert m["n_rows"] == 500 and len(m["files"]) >= 4
    assert verify_corpus_manifest(spark, path) == {"ok": True, "problems": []}
    # overwrite one data file with different rows → checksum + inventory
    victim = os.path.join(
        path, next(f for f in m["files"] if f.endswith(".parquet"))
    )
    _corpus(spark, n=30, salt=9).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "evil")
    )
    evil = next(
        os.path.join(str(tmp_path / "evil"), f)
        for f in os.listdir(str(tmp_path / "evil"))
        if f.endswith(".parquet")
    )
    os.replace(evil, victim)
    # an adversarial swap also removes Hadoop's .crc sidecar (otherwise
    # the local filesystem itself rejects the read before we compare)
    crc = os.path.join(
        os.path.dirname(victim), f".{os.path.basename(victim)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    report = verify_corpus_manifest(spark, path)
    assert not report["ok"]
    assert any("checksum" in p for p in report["problems"])
    assert any("inventory" in p for p in report["problems"])


def test_verify_reports_missing_column_instead_of_crashing(spark, tmp_path):
    """Schema drift (a recorded column gone from the data) must be a
    problems entry, not an AnalysisException out of df_checksum."""
    from dask_felleskomponenter_spark.sources.manifest import (
        verify_corpus_manifest,
        write_corpus_manifest,
    )

    p = str(tmp_path / "corpus")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(p)
    write_corpus_manifest(spark, p)
    # re-export without column v
    import shutil

    shutil.rmtree(p)
    spark.range(10).selectExpr("id").write.parquet(p)
    # restore the old manifest (the re-export wiped it with the dir)
    write_corpus_manifest(spark, p)
    manifest_path = f"{p}/_corpus_manifest.json"
    import json

    rec = json.load(open(manifest_path))
    rec["columns"] = ["id", "v"]
    json.dump(rec, open(manifest_path, "w"))
    out = verify_corpus_manifest(spark, p)
    assert out["ok"] is False
    assert any("missing from data" in s for s in out["problems"])


def test_manifest_write_is_atomic_no_tmp_left(spark, tmp_path):
    from dask_felleskomponenter_spark.sources.manifest import (
        MANIFEST_NAME,
        write_corpus_manifest,
    )
    import os

    p = str(tmp_path / "corpus")
    spark.range(5).write.parquet(p)
    write_corpus_manifest(spark, p)
    assert os.path.exists(os.path.join(p, MANIFEST_NAME))
    assert not os.path.exists(os.path.join(p, MANIFEST_NAME + ".tmp"))


def test_checksum_detects_even_multiplicity_substitution(spark):
    """Regression: a bit_xor fold maps every even-multiplicity row set
    to 0, so replacing {A, A} with {B, B} (same row count) verified
    clean with probability 1. The modular-SUM fold contributes k·h per
    k copies and must distinguish them."""
    aa = spark.createDataFrame([("dup",), ("dup",)], "text string")
    bb = spark.createDataFrame([("other",), ("other",)], "text string")
    ca, cb = df_checksum(aa), df_checksum(bb)
    assert ca[1] == cb[1] == 2
    assert ca[0] != cb[0]
    # and duplicate multiplicity itself is visible in the checksum
    assert df_checksum(aa)[0] != df_checksum(aa.limit(1))[0]


def test_checksum_detects_null_column_shifts(spark):
    """Regression: raw xxhash64 SKIPS null inputs, making ('a', NULL)
    and (NULL, 'a') hash identically — a value shifting across a NULL
    column verified clean. The sentinel coalescing must distinguish
    them."""
    a = spark.createDataFrame([("a", None)], "c1 string, c2 string")
    b = spark.createDataFrame([(None, "a")], "c1 string, c2 string")
    assert df_checksum(a, ["c1", "c2"])[0] != df_checksum(b, ["c1", "c2"])[0]


def test_checksum_no_value_can_impersonate_null(spark):
    """Regression on the regression: the v1 string SENTINEL collided
    with a real cell holding the sentinel's exact text, so sentinel↔NULL
    substitutions verified clean with probability 1. The is-null flag
    hashed alongside the value removes the collision for EVERY value."""
    for text in ("\x00<null>", ""):
        real = spark.createDataFrame([(text,)], "c1 string")
        nul = spark.createDataFrame([(None,)], "c1 string")
        assert df_checksum(real, ["c1"])[0] != df_checksum(nul, ["c1"])[0]


def test_inventory_prunes_spark_invisible_directories(spark, tmp_path):
    """Residue under underscore/dot-prefixed DIRECTORIES (_temporary/,
    .staging-*/) is invisible to Spark readers, so it must not be
    recorded as corpus identity: deleting it later — a no-op for the
    data — must not fail verification as a phantom inventory change."""
    import os

    from dask_felleskomponenter_spark.sources.manifest import (
        verify_corpus_manifest,
        write_corpus_manifest,
    )

    path = str(tmp_path / "corpus")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(path)
    # plant abandoned-job residue with Spark-visible inner names
    resid = os.path.join(path, "_temporary", "0")
    os.makedirs(resid)
    with open(os.path.join(resid, "part-00003.parquet"), "wb") as fh:
        fh.write(b"not really parquet")
    m = write_corpus_manifest(spark, path)
    assert not any("part-00003" in f and "_temporary" in f for f in m["files"])
    # cleaning up the residue must verify clean
    import shutil

    shutil.rmtree(os.path.join(path, "_temporary"))
    report = verify_corpus_manifest(spark, path)
    assert report["ok"], report


def test_checksum_handles_dotted_column_names(spark, tmp_path):
    """A literal dot in a top-level column name is legal parquet; the
    checksum must quote it instead of parsing nested-field access
    (round-7 review finding)."""
    from dask_felleskomponenter_spark.sources.manifest import (
        verify_corpus_manifest,
        write_corpus_manifest,
    )

    path = str(tmp_path / "dotted")
    spark.createDataFrame(
        [(1, 2.5), (2, 3.5)], ["id", "geo.lat"]
    ).write.parquet(path)
    m = write_corpus_manifest(spark, path)
    assert m["n_rows"] == 2 and "geo.lat" in m["columns"]
    assert verify_corpus_manifest(spark, path)["ok"]


def test_write_manifest_sees_rewritten_corpus(spark, tmp_path):
    """write_corpus_manifest must refreshByPath like the verify side: a
    session that listed the directory BEFORE a re-export would record a
    checksum of stale file statuses against a fresh inventory — a
    manifest that can never verify (round-7 review finding)."""
    from dask_felleskomponenter_spark.sources.manifest import (
        verify_corpus_manifest,
        write_corpus_manifest,
    )

    path = str(tmp_path / "rewritten")
    spark.createDataFrame([(1, "a")], ["id", "t"]).write.parquet(path)
    # poison the session's file-status cache with the first listing
    assert spark.read.parquet(path).count() == 1
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "t"]
    ).write.mode("overwrite").parquet(path)
    m = write_corpus_manifest(spark, path)
    assert m["n_rows"] == 3
    assert verify_corpus_manifest(spark, path)["ok"]


def test_pre_v2_manifest_skips_the_checksum_scan(spark, tmp_path, monkeypatch):
    """A manifest without checksum_sum64_v2 is known-incomparable: the
    verify must report that WITHOUT paying the full corpus checksum
    scan (hours at the 100 TB scale this module exists for); the row
    count (cheap metadata count) is still compared."""
    import json as _json
    import os as _os

    import dask_felleskomponenter_spark.sources.manifest as mod

    path = str(tmp_path / "prev2")
    spark.createDataFrame([(1, "a")], ["id", "t"]).write.parquet(path)
    files = mod._file_inventory(path)
    with open(_os.path.join(path, mod.MANIFEST_NAME), "w") as fh:
        _json.dump(
            {"n_rows": 1, "columns": ["id", "t"], "files": files,
             "checksum_xor64": 12345, "extra": {}},
            fh,
        )

    def boom(*a, **k):
        raise AssertionError("df_checksum must not run for a pre-v2 manifest")

    monkeypatch.setattr(mod, "df_checksum", boom)
    out = mod.verify_corpus_manifest(spark, path)
    assert not out["ok"]
    assert any("predates" in p for p in out["problems"])
    assert not any("checksum mismatch" in p for p in out["problems"])


def test_df_checksum_rejects_empty_cols(spark):
    """Round-9 review: an explicitly-passed empty cols list silently
    checksummed the full schema via the falsy `cols or ...` default —
    a caller-computed identity subset that comes out empty must be a
    loud error (the distinction load_tables already draws)."""
    import pytest

    from dask_felleskomponenter_spark.sources.manifest import df_checksum

    df = spark.range(3)
    with pytest.raises(ValueError, match="empty list"):
        df_checksum(df, [])
    # None still means all columns
    c1, n = df_checksum(df, None)
    c2, _ = df_checksum(df, ["id"])
    assert n == 3 and c1 == c2
