"""Live-Postgres execution of the sync SQL builders (X2/X3 hard gate).

The Derby wire tests prove the JDBC plumbing and the property tests pin
the MERGE three-valued-logic semantics against the Spark twin — but
until this module, the SQL that ``snapshot_sql``/``merge_sql`` generate
(reference ``sync_df_to_pgdb.py:198-252``) had never been executed by a
real PostgreSQL parser/executor. Here a throwaway Postgres instance is
initdb'd into a temp directory (unix socket only, no TCP), the builders'
output is run through ``psql``, and the resulting table states are
asserted row-for-row — including the documented NULL-``update_type``
fires-no-branch case and the ``ST_GeomFromWKB`` wrap.

PostGIS itself is not installed in this environment (verified:
``pg_available_extensions`` has no postgis row), so the geometry test
probes for it: with PostGIS present it exercises the real function;
without, it installs a pass-through stub with the same signature so the
generated SQL — the artifact under test — still parses, plans, and
executes against the live server.

Skips (with the exact reason) when no Postgres server binaries are on
PATH or the instance cannot be started (e.g. no non-root user to run it
under — the server refuses uid 0).
"""

from __future__ import annotations

import os
import pwd
import shutil
import subprocess
import tempfile

import pytest

from dask_felleskomponenter_spark.sync.postgres import (
    PostgresTargetConfig,
    merge_sql,
    snapshot_sql,
)

INITDB = shutil.which("initdb")
PG_CTL = shutil.which("pg_ctl")
PSQL = shutil.which("psql")

pytestmark = pytest.mark.skipif(
    not (INITDB and PG_CTL and PSQL),
    reason="PostgreSQL server binaries (initdb/pg_ctl/psql) not on PATH",
)


def _run_user() -> list[str]:
    """Command prefix that runs Postgres tooling as a non-root user.

    The server refuses to run as uid 0; when the test session is root
    (this sandbox), wrap every call in ``runuser -u postgres``."""
    if os.geteuid() != 0:
        return []
    try:
        pwd.getpwnam("postgres")
    except KeyError:
        pytest.skip("running as root and no 'postgres' user to drop to")
    if not shutil.which("runuser"):
        pytest.skip("running as root and no runuser(1) to drop privileges")
    return ["runuser", "-u", "postgres", "--"]


class _Pg:
    def __init__(self, sockdir: str, prefix: list[str]):
        self.sockdir = sockdir
        self.prefix = prefix

    def psql(self, sql: str, dbname: str = "postgres") -> str:
        """Execute ``sql`` via psql, raising on any statement error."""
        proc = subprocess.run(
            self.prefix
            + [PSQL, "-X", "-h", self.sockdir, "-d", dbname,
               "-v", "ON_ERROR_STOP=1", "-c", sql],
            capture_output=True,
            text=True,
            cwd=tempfile.gettempdir(),  # postgres user cannot read /root
        )
        if proc.returncode != 0:
            raise AssertionError(f"psql failed for:\n{sql}\n{proc.stderr}")
        return proc.stdout

    def rows(self, query: str) -> list[tuple[str, ...]]:
        """Tuples-only SELECT; every value comes back as text."""
        out = self.psql_tuples(query)
        return [tuple(line.split("|")) for line in out.splitlines() if line]

    def psql_tuples(self, query: str) -> str:
        proc = subprocess.run(
            self.prefix
            + [PSQL, "-X", "-h", self.sockdir, "-d", "postgres",
               "-v", "ON_ERROR_STOP=1", "-tA", "-c", query],
            capture_output=True,
            text=True,
            cwd=tempfile.gettempdir(),
        )
        if proc.returncode != 0:
            raise AssertionError(f"psql failed for:\n{query}\n{proc.stderr}")
        return proc.stdout


@pytest.fixture(scope="module")
def pg():
    prefix = _run_user()
    base = tempfile.mkdtemp(prefix="pg-live-", dir="/tmp")
    data = os.path.join(base, "data")
    try:
        if prefix:
            shutil.chown(base, user="postgres", group=None)
        boot = subprocess.run(
            prefix + [INITDB, "-D", data, "-A", "trust", "--no-sync"],
            capture_output=True,
            text=True,
            cwd=tempfile.gettempdir(),
        )
        if boot.returncode != 0:
            pytest.skip(f"initdb failed: {boot.stderr[-300:]}")
        start = subprocess.run(
            prefix
            + [PG_CTL, "-D", data, "-l", os.path.join(base, "log"), "-w",
               "-o", f"-k {base} -c listen_addresses=''", "start"],
            capture_output=True,
            text=True,
            cwd=tempfile.gettempdir(),
        )
        if start.returncode != 0:
            pytest.skip(f"pg_ctl start failed: {start.stderr[-300:]}")
        yield _Pg(base, prefix)
    finally:
        subprocess.run(
            prefix + [PG_CTL, "-D", data, "-w", "-m", "immediate", "stop"],
            capture_output=True,
            cwd=tempfile.gettempdir(),
        )
        shutil.rmtree(base, ignore_errors=True)


def _config(**kw) -> PostgresTargetConfig:
    return PostgresTargetConfig(
        host="localhost",
        dbname="postgres",
        user="postgres",
        password="",
        staging_table=kw.pop("staging_table", "stg"),
        target_table=kw.pop("target_table", "tgt"),
        **kw,
    )


def test_snapshot_sql_executes_and_replaces_target(pg):
    pg.psql(
        "DROP TABLE IF EXISTS tgt, stg;"
        "CREATE TABLE tgt (id int, name text);"
        "CREATE TABLE stg (id int, name text);"
        "INSERT INTO tgt VALUES (99, 'stale');"
        "INSERT INTO stg VALUES (1, 'a'), (2, 'b');"
    )
    pg.psql(snapshot_sql(["id", "name"], _config()))
    assert pg.rows("SELECT id, name FROM tgt ORDER BY id") == [
        ("1", "a"),
        ("2", "b"),
    ]
    # idempotent republish: TRUNCATE inside the transaction, not append
    pg.psql(snapshot_sql(["id", "name"], _config()))
    assert pg.rows("SELECT count(*) FROM tgt") == [("2",)]


def test_snapshot_sql_quoted_identifiers_survive_real_parser(pg):
    """quote_ident against the actual Postgres parser: mixed case, a
    space, and a dotted schema path — the injection surface the
    reference's raw f-strings left open (SURVEY.md §4)."""
    pg.psql(
        'DROP SCHEMA IF EXISTS "Sync Area" CASCADE;'
        'CREATE SCHEMA "Sync Area";'
        'CREATE TABLE "Sync Area"."Target Table" ("Id" int, "Some Name" text);'
        'CREATE TABLE "Sync Area"."Staging Table" ("Id" int, "Some Name" text);'
        'INSERT INTO "Sync Area"."Staging Table" VALUES (7, \'x\');'
    )
    cfg = _config(
        staging_table="Sync Area.Staging Table",
        target_table="Sync Area.Target Table",
    )
    pg.psql(snapshot_sql(["Id", "Some Name"], cfg))
    assert pg.rows('SELECT "Id" FROM "Sync Area"."Target Table"') == [("7",)]


def test_merge_sql_semantics_on_live_postgres(pg, spark):
    """The full MERGE matrix on a real executor, differentially checked
    against the pure-Spark twin (``sync/merge.py::merge_upsert``) on the
    same rows: update, delete, insert, unmatched-delete ignored, and the
    NULL ``update_type`` row firing NO branch under three-valued logic.
    """
    pg.psql(
        "DROP TABLE IF EXISTS tgt, stg;"
        "CREATE TABLE tgt (id int, val text);"
        "CREATE TABLE stg (id int, val text, update_type text);"
        "INSERT INTO tgt VALUES (1, 'one'), (2, 'two'), (3, 'three'), (4, 'four');"
        "INSERT INTO stg VALUES"
        "  (1, 'ONE', 'upsert'),"   # matched, non-delete → UPDATE
        "  (2, NULL, 'delete'),"    # matched, delete → DELETE
        "  (3, 'xxx', NULL),"       # matched, NULL type → NO branch
        "  (5, 'five', 'upsert'),"  # unmatched, non-delete → INSERT
        "  (6, NULL, 'delete');"    # unmatched delete → ignored
    )
    pg.psql(merge_sql(["id", "val", "update_type"], ["id"], _config()))
    got = pg.rows("SELECT id, val FROM tgt ORDER BY id")
    assert got == [
        ("1", "ONE"),
        ("3", "three"),
        ("4", "four"),
        ("5", "five"),
    ]

    from dask_felleskomponenter_spark.sync.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")], "id int, val string"
    )
    staging = spark.createDataFrame(
        [
            (1, "ONE", "upsert"),
            (2, None, "delete"),
            (3, "xxx", None),
            (5, "five", "upsert"),
            (6, None, "delete"),
        ],
        "id int, val string, update_type string",
    )
    twin = sorted(
        (r["id"], r["val"]) for r in merge_upsert(target, staging, ["id"]).collect()
    )
    assert [(int(i), v) for i, v in got] == twin


def test_merge_sql_key_only_table_has_no_update_branch(pg):
    """cols == keys + update_type: the builder must omit the UPDATE
    branch entirely (an empty SET list is a live syntax error)."""
    pg.psql(
        "DROP TABLE IF EXISTS tgt, stg;"
        "CREATE TABLE tgt (id int);"
        "CREATE TABLE stg (id int, update_type text);"
        "INSERT INTO tgt VALUES (1), (2);"
        "INSERT INTO stg VALUES (2, 'delete'), (3, 'upsert');"
    )
    pg.psql(merge_sql(["id", "update_type"], ["id"], _config()))
    assert pg.rows("SELECT id FROM tgt ORDER BY id") == [("1",), ("3",)]


#: OGC WKB for POINT(1 2), little-endian — the fixture family
#: tests/fixtures_wkb.py uses; 21 bytes: byte order + type + 2 doubles.
_WKB_POINT_1_2 = (
    "01" "01000000" "000000000000f03f" "0000000000000040"
)


def test_geometry_wrap_executes_with_postgis_probe(pg):
    """``ST_GeomFromWKB(col, srid)`` in both generated statements against
    the live server. With PostGIS installed the real function parses the
    WKB; without it (this sandbox) a pass-through stub with the same
    signature stands in, so the generated SQL itself — the artifact
    under test — still round-trips the parser, planner, and executor."""
    has_postgis = pg.psql_tuples(
        "SELECT count(*) FROM pg_available_extensions WHERE name='postgis'"
    ).strip() == "1"
    if has_postgis:
        pg.psql("CREATE EXTENSION IF NOT EXISTS postgis;")
        geom_type, probe = "geometry", "ST_SRID(geom)::text"
    else:
        pg.psql(
            "CREATE OR REPLACE FUNCTION ST_GeomFromWKB(wkb bytea, srid int) "
            "RETURNS bytea AS 'SELECT $1' LANGUAGE sql IMMUTABLE;"
        )
        geom_type, probe = "bytea", "encode(geom, 'hex')"
    pg.psql(
        "DROP TABLE IF EXISTS tgt, stg;"
        f"CREATE TABLE tgt (id int, geom {geom_type});"
        "CREATE TABLE stg (id int, geom bytea, update_type text);"
        "INSERT INTO stg VALUES "
        f"(1, decode('{_WKB_POINT_1_2}', 'hex'), 'upsert');"
    )
    cfg = _config(srid=4326)
    pg.psql(snapshot_sql(["id", "geom"], cfg, geometry_cols=["geom"]))
    (row,) = pg.rows(f"SELECT id, {probe} FROM tgt")
    assert row[0] == "1"
    assert row[1] == ("4326" if has_postgis else _WKB_POINT_1_2)
    # and the MERGE variant (UPDATE + INSERT branches carry the wrap)
    pg.psql("INSERT INTO stg VALUES (2, NULL, 'upsert');")
    pg.psql(
        merge_sql(["id", "geom", "update_type"], ["id"], cfg,
                  geometry_cols=["geom"])
    )
    assert len(pg.rows("SELECT id FROM tgt")) == 2
