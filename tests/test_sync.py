"""Sync pack tests: SQL generation parity + pure-Spark MERGE semantics.

SQL-builder tests need no database (pure functions); merge-semantics
tests run on the shared local SparkSession and check every MERGE branch
the reference's Postgres MERGE defines
(``/root/reference/.../sync_df_to_pgdb.py:222-252``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dask_felleskomponenter_spark.sync import (
    PostgresSyncManager,
    PostgresTargetConfig,
    merge_into_path,
    merge_sql,
    merge_upsert,
    quote_ident,
    snapshot_sql,
)


def _config(**over) -> PostgresTargetConfig:
    base = dict(
        host="db.example",
        dbname="geodata",
        user="etl",
        password="pw",
        staging_table="public.buildings_staging",
        target_table="public.buildings",
        srid=4326,
    )
    base.update(over)
    return PostgresTargetConfig(**base)


class TestSqlBuilders:
    def test_snapshot_sql_shape(self):
        sql = snapshot_sql(["id", "name", "geom"], _config(), geometry_cols=["geom"])
        assert 'TRUNCATE TABLE "public"."buildings";' in sql
        assert sql.startswith("BEGIN;")
        assert sql.endswith("COMMIT;")
        # geometry column wrapped, plain columns referenced
        assert 'ST_GeomFromWKB("public"."buildings_staging"."geom", 4326)' in sql
        assert '"public"."buildings_staging"."name"' in sql
        assert 'INSERT INTO "public"."buildings" ("id", "name", "geom")' in sql

    def test_merge_sql_clauses(self):
        sql = merge_sql(
            ["id", "name", "geom", "update_type"],
            keys=["id"],
            config=_config(),
            geometry_cols=["geom"],
        )
        # delete branch before update branch, exact reference semantics
        assert "WHEN MATCHED AND" in sql and "= 'delete' THEN\n    DELETE" in sql
        assert "!= 'delete' THEN\n    UPDATE SET" in sql
        assert "WHEN NOT MATCHED AND" in sql
        # update-set excludes keys and the update_type column
        update_set = sql.split("UPDATE SET ")[1].split("\n")[0]
        assert '"id" =' not in update_set
        assert "update_type" not in update_set
        assert '"name" =' in update_set
        # insert excludes update_type
        insert_clause = sql.split("INSERT (")[1].split(")")[0]
        assert "update_type" not in insert_clause
        assert '"id"' in insert_clause
        # geometry wrap in both update and insert values
        assert sql.count('ST_GeomFromWKB("public"."buildings_staging"."geom", 4326)') == 2

    def test_identifier_quoting_blocks_injection(self):
        assert quote_ident('x"; DROP TABLE y;--') == '"x""; DROP TABLE y;--"'
        sql = snapshot_sql(['evil"col'], _config(target_table='sch.t"bl'))
        assert '"sch"."t""bl"' in sql
        assert '"evil""col"' in sql

    def test_merge_requires_keys_and_known_mode(self, spark):
        captured = []
        mgr = PostgresSyncManager(_config(), sql_executor=lambda s: captured.append(s) or 0)
        df = spark.createDataFrame([Row(id=1, update_type="upsert")])
        with pytest.raises(ValueError, match="merge_keys"):
            mgr.sync(df, mode="merge")
        with pytest.raises(ValueError, match="Unknown mode"):
            mgr.sync(df, mode="append")
        assert captured == []  # nothing executed on validation failure

    def test_jdbc_options_ssl_and_batching(self):
        cfg = _config(ssl_ca="/certs/ca.pem", ssl_cert="/certs/c.pem", ssl_key="/certs/k.pem")
        opts = cfg.jdbc_options()
        assert opts["url"] == "jdbc:postgresql://db.example:5432/geodata"
        assert opts["sslmode"] == "verify-ca"
        assert opts["sslrootcert"] == "/certs/ca.pem"
        assert opts["reWriteBatchedInserts"] == "true"
        # no-SSL config omits ssl options entirely
        assert "ssl" not in _config().jdbc_options()


class TestMergeUpsert:
    def _frames(self, spark):
        target = spark.createDataFrame(
            [
                Row(id=1, val="keep-me"),
                Row(id=2, val="update-me"),
                Row(id=3, val="delete-me"),
                Row(id=None, val="null-key-target"),
            ]
        )
        staging = spark.createDataFrame(
            [
                Row(id=2, val="updated", update_type="upsert"),
                Row(id=3, val="x", update_type="delete"),
                Row(id=4, val="inserted", update_type="upsert"),
                Row(id=5, val="ghost", update_type="delete"),  # unmatched delete
                Row(id=None, val="null-key-insert", update_type="upsert"),
            ]
        )
        return target, staging

    def test_all_merge_branches(self, spark):
        target, staging = self._frames(spark)
        out = merge_upsert(target, staging, keys=["id"])
        assert out.columns == ["id", "val"]
        got = {(r["id"], r["val"]) for r in out.collect()}
        assert got == {
            (1, "keep-me"),              # no staging match: untouched
            (2, "updated"),              # matched upsert: staging wins
            (4, "inserted"),             # unmatched upsert: inserted
            (None, "null-key-target"),   # null key never matches: kept
            (None, "null-key-insert"),   # null-key staging upsert: inserted
        }  # id=3 deleted; id=5 unmatched delete silently ignored

    def test_unmatched_delete_ignored(self, spark):
        target, staging = self._frames(spark)
        out = merge_upsert(target, staging, keys=["id"])
        ids = [r["id"] for r in out.collect()]
        assert 5 not in ids  # ghost delete never inserted
        assert 3 not in ids  # matched delete removed

    def test_null_update_type_fires_no_branch(self, spark):
        # MERGE three-valued logic: `ut = 'delete'` and `ut != 'delete'`
        # are both NULL-false, so a NULL-typed staging row neither
        # deletes, updates, nor inserts (reference sync_df_to_pgdb.py
        # :243-248).
        target = spark.createDataFrame(
            [Row(id=1, val="keep"), Row(id=2, val="also-keep")]
        )
        staging = spark.createDataFrame(
            [
                (1, "overwrite-attempt", None),
                (9, "insert-attempt", None),
            ],
            "id bigint, val string, update_type string",
        )
        out = merge_upsert(target, staging, keys=["id"])
        got = {(r["id"], r["val"]) for r in out.collect()}
        assert got == {(1, "keep"), (2, "also-keep")}

    def test_duplicate_staging_keys_validation(self, spark):
        target = spark.createDataFrame([Row(id=1, val="a")])
        staging = spark.createDataFrame(
            [
                Row(id=1, val="b", update_type="upsert"),
                Row(id=1, val="c", update_type="upsert"),
            ]
        )
        with pytest.raises(ValueError, match="duplicate merge-key"):
            merge_upsert(
                target, staging, keys=["id"], validate_unique_keys=True
            )
        # without opt-in validation the fan-out is the caller's problem
        assert merge_upsert(target, staging, keys=["id"]).count() == 2

    def test_missing_update_type_raises(self, spark):
        target, _ = self._frames(spark)
        with pytest.raises(ValueError, match="update-type"):
            merge_upsert(target, target, keys=["id"])

    def test_missing_key_raises(self, spark):
        target, staging = self._frames(spark)
        with pytest.raises(ValueError, match="merge keys"):
            merge_upsert(target, staging, keys=["nope"])

    def test_merge_into_path_roundtrip(self, spark, tmp_path):
        target, staging = self._frames(spark)
        path = str(tmp_path / "tgt")
        target.write.parquet(path)
        merge_into_path(path, staging, keys=["id"])
        back = spark.read.parquet(path)
        got = {(r["id"], r["val"]) for r in back.collect()}
        assert (2, "updated") in got and (4, "inserted") in got
        assert all(v != "delete-me" for _, v in got)
