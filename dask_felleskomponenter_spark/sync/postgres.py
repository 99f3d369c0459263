"""Spark-DataFrame → PostgreSQL/PostGIS sync (reference parity: X2/X3).

Capability parity with the reference's ``PostgresSyncManager``
(``/root/reference/src/dask_felleskomponenter/felleskomponenter/
sync_df_to_pgdb.py:73-291``) — staging write over JDBC, then a
Postgres-side snapshot (``TRUNCATE`` + ``INSERT``) or ``MERGE`` with
``update_type``-driven delete/upsert and ``ST_GeomFromWKB`` wrapping of
declared geometry columns — re-founded for open Spark:

- No Databricks touchpoints: credentials come from an explicit config or
  ``PostgresTargetConfig.from_env``; no ``DBUtils``, no cluster-mode
  guard (``sync_df_to_pgdb.py:62-69,97-154`` are Databricks-only).
- SSL is optional (``ssl_ca``/``ssl_cert``/``ssl_key`` paths); the
  reference hard-requires cert env vars (``:39-47``).
- The SQL the manager runs is produced by **pure functions**
  (``snapshot_sql``/``merge_sql``) so semantics are unit-testable with
  no database; the executor is injectable for the same reason.
- Identifiers are quoted everywhere (the reference f-strings raw names
  into SQL — SURVEY.md §4 flags the injection surface).
- The reference computes the DataFrame twice (``df.count()`` for a log
  line, then the JDBC write, ``:174,188-196``); this manager never
  triggers an extra job.
- Scale: the JDBC write bounds Postgres connection fan-in with
  ``max_connections`` (coalesce, never a shuffle) and sets
  ``batchsize`` / ``reWriteBatchedInserts`` so each executor streams
  batched inserts.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field, fields

from pyspark.sql import DataFrame


def quote_ident(name: str) -> str:
    """Postgres identifier quoting for TABLE names; accepts dotted
    ``schema.table`` (each part quoted separately). NOT for columns —
    use :func:`quote_column`, which quotes the whole name as ONE
    identifier: a legal column literally named ``order.id`` must become
    ``"order.id"``, not the bogus qualification ``"order"."id"``."""
    return ".".join('"' + part.replace('"', '""') + '"' for part in name.split("."))


def quote_column(name: str) -> str:
    """Postgres COLUMN identifier quoting: one identifier, dots kept
    literal (the SQL twin of ``operators/shuffle.quoted_col``)."""
    return '"' + name.replace('"', '""') + '"'


@dataclass
class PostgresTargetConfig:
    """Connection + table contract for a sync run.

    Mirrors the reference config surface
    (``sync_df_to_pgdb.py:10-29``: host, dbname, user, password,
    staging_table, target_table, update_type_col, srid) with SSL made
    optional and explicit instead of env-mandated.
    """

    host: str
    dbname: str
    user: str
    password: str
    staging_table: str
    target_table: str
    update_type_col: str = "update_type"
    srid: int = 0
    port: int = 5432
    ssl_ca: str | None = None
    ssl_cert: str | None = None
    ssl_key: str | None = None
    #: Upper bound on simultaneous executor→Postgres connections.
    max_connections: int = 8
    #: Rows per JDBC batch insert.
    batch_size: int = 10_000
    extra_jdbc_options: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, prefix: str = "PGSYNC_", **overrides) -> "PostgresTargetConfig":
        """Build a config from ``{prefix}HOST/DBNAME/USER/PASSWORD/...``
        environment variables (the open replacement for the reference's
        Databricks-secrets factory, ``sync_df_to_pgdb.py:97-154``)."""
        env = {
            k[len(prefix):].lower(): v
            for k, v in os.environ.items()
            if k.startswith(prefix)
        }
        env.update(overrides)
        valid = {f.name for f in fields(cls)}
        unknown = sorted(set(env) - valid)
        if unknown:
            raise ValueError(
                f"unknown {prefix}* environment variables: "
                f"{', '.join(prefix + u.upper() for u in unknown)} "
                f"(valid fields: {', '.join(sorted(valid))})"
            )
        # Environment values arrive as strings; coerce the int-typed
        # fields so comparisons like `n > max_connections` don't TypeError.
        for int_field in ("port", "srid", "max_connections", "batch_size"):
            if int_field in env and env[int_field] is not None:
                env[int_field] = int(env[int_field])
        # Dict-typed field: a raw env string would pass the unknown-key
        # check (the field exists) and only crash much later inside
        # jdbc_options()'s dict.update, far from the cause — coerce at
        # construction so a malformed value fails HERE, naming the var.
        if isinstance(env.get("extra_jdbc_options"), str):
            import json

            try:
                parsed = json.loads(env["extra_jdbc_options"])
            except ValueError as exc:
                raise ValueError(
                    f"{prefix}EXTRA_JDBC_OPTIONS must be a JSON object, "
                    f"got {env['extra_jdbc_options']!r}"
                ) from exc
            if not isinstance(parsed, dict):
                raise ValueError(
                    f"{prefix}EXTRA_JDBC_OPTIONS must be a JSON object, "
                    f"got {type(parsed).__name__}"
                )
            env["extra_jdbc_options"] = {str(k): str(v) for k, v in parsed.items()}
        return cls(**env)


    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.dbname}"

    def jdbc_options(self) -> dict[str, str]:
        opts = {
            "url": self.jdbc_url,
            "user": self.user,
            "password": self.password,
            "driver": "org.postgresql.Driver",
            "batchsize": str(self.batch_size),
            "reWriteBatchedInserts": "true",
        }
        if self.ssl_ca or self.ssl_cert or self.ssl_key:
            # verify-ca only when a CA is actually provided — matching
            # _default_executor's psycopg leg. A cert/key-only config
            # under verify-ca would make pgJDBC hunt for
            # ~/.postgresql/root.crt on every executor and fail, while
            # the publish leg of the same config connected with
            # 'require' (split security posture).
            opts.update(
                {
                    "ssl": "true",
                    "sslmode": "verify-ca" if self.ssl_ca else "require",
                }
            )
            if self.ssl_ca:
                opts["sslrootcert"] = self.ssl_ca
            if self.ssl_cert:
                opts["sslcert"] = self.ssl_cert
            if self.ssl_key:
                opts["sslkey"] = self.ssl_key
        opts.update(self.extra_jdbc_options)
        return opts


def _select_expr(col: str, table: str, geometry_cols: Sequence[str], srid: int) -> str:
    """Column reference, wrapped in ``ST_GeomFromWKB(col, srid)`` when the
    column is a declared WKB geometry (``sync_df_to_pgdb.py:198-202``)."""
    ref = f"{quote_ident(table)}.{quote_column(col)}"
    if col in geometry_cols:
        return f"ST_GeomFromWKB({ref}, {int(srid)})"
    return ref


def snapshot_sql(
    cols: Sequence[str], config: PostgresTargetConfig, geometry_cols: Sequence[str] = ()
) -> str:
    """Transactional truncate-and-load of the target from staging
    (``sync_df_to_pgdb.py:204-218`` semantics)."""
    tgt = quote_ident(config.target_table)
    col_list = ", ".join(quote_column(c) for c in cols)
    sel_list = ", ".join(
        _select_expr(c, config.staging_table, geometry_cols, config.srid) for c in cols
    )
    return (
        "BEGIN;\n"
        f"TRUNCATE TABLE {tgt};\n"
        f"INSERT INTO {tgt} ({col_list})\n"
        f"SELECT {sel_list} FROM {quote_ident(config.staging_table)};\n"
        "COMMIT;"
    )


def merge_sql(
    cols: Sequence[str],
    keys: Sequence[str],
    config: PostgresTargetConfig,
    geometry_cols: Sequence[str] = (),
) -> str:
    """``MERGE`` upsert/delete from staging into target.

    Exact reference semantics (``sync_df_to_pgdb.py:222-249``):
    matched + ``update_type='delete'`` → DELETE; matched +
    ``update_type`` non-NULL and not delete → UPDATE all non-key,
    non-update-type columns; not matched + non-NULL non-delete →
    INSERT (update_type column never lands in the target); unmatched
    delete rows are silently ignored. A NULL ``update_type`` makes
    ``!= 'delete'`` UNKNOWN under three-valued logic, so such rows fire
    NO branch — deliberately byte-compatible with the reference SQL and
    mirrored by the pure-Spark twin (``sync/merge.py``, property-tested
    for exactly this case). Tables whose only columns are the merge
    keys + update_type get no UPDATE branch at all (an empty SET list
    is a syntax error; matched rows need no update anyway).
    """
    tgt = quote_ident(config.target_table)
    stg = quote_ident(config.staging_table)
    ut = quote_column(config.update_type_col)

    on = " AND ".join(
        f"{tgt}.{quote_column(k)} = {stg}.{quote_column(k)}" for k in keys
    )
    update_cols = [c for c in cols if c not in keys and c != config.update_type_col]
    update_set = ", ".join(
        f"{quote_column(c)} = "
        f"{_select_expr(c, config.staging_table, geometry_cols, config.srid)}"
        for c in update_cols
    )
    insert_cols = [c for c in cols if c != config.update_type_col]
    insert_names = ", ".join(quote_column(c) for c in insert_cols)
    insert_vals = ", ".join(
        _select_expr(c, config.staging_table, geometry_cols, config.srid)
        for c in insert_cols
    )
    update_branch = (
        f"WHEN MATCHED AND {stg}.{ut} != 'delete' THEN\n"
        f"    UPDATE SET {update_set}\n"
        if update_cols
        else ""
    )
    return (
        f"MERGE INTO {tgt}\n"
        f"USING {stg}\n"
        f"ON {on}\n"
        f"WHEN MATCHED AND {stg}.{ut} = 'delete' THEN\n"
        "    DELETE\n"
        f"{update_branch}"
        f"WHEN NOT MATCHED AND {stg}.{ut} != 'delete' THEN\n"
        f"    INSERT ({insert_names}) VALUES ({insert_vals});"
    )


def _default_executor(config: PostgresTargetConfig) -> Callable[[str], int]:
    def run(sql: str) -> int:
        try:
            import psycopg  # type: ignore
        except ImportError as exc:  # pragma: no cover - env without psycopg
            raise NotImplementedError(
                "Postgres execution requires psycopg (install the [postgres] "
                "extra) or an injected sql_executor"
            ) from exc
        kwargs = dict(
            host=config.host,
            port=config.port,
            dbname=config.dbname,
            user=config.user,
            password=config.password,
        )
        # mirror jdbc_options(): ANY ssl material enables TLS, and
        # cert/key-only configs must not silently publish over a
        # different security posture than the staging write used
        if config.ssl_ca or config.ssl_cert or config.ssl_key:
            kwargs["sslmode"] = "verify-ca" if config.ssl_ca else "require"
            if config.ssl_ca:
                kwargs["sslrootcert"] = config.ssl_ca
            if config.ssl_cert:
                kwargs["sslcert"] = config.ssl_cert
            if config.ssl_key:
                kwargs["sslkey"] = config.ssl_key
        with psycopg.connect(**kwargs) as conn:  # pragma: no cover - needs DB
            with conn.cursor() as cur:
                cur.execute(sql)
                return cur.rowcount

    return run


class PostgresSyncManager:
    """Stage a DataFrame to Postgres over JDBC, then publish it into the
    target table as a snapshot or merge — the reference's sync contract
    (``sync_df_to_pgdb.py:254-291``) minus the Databricks coupling.

    ``sql_executor`` is injectable (signature ``sql -> rowcount``) so the
    publish step is testable without a live database; the default uses
    psycopg when available.
    """

    def __init__(
        self,
        config: PostgresTargetConfig,
        sql_executor: Callable[[str], int] | None = None,
    ):
        self.config = config
        self._execute = sql_executor or _default_executor(config)

    def _write_to_staging(self, df: DataFrame) -> None:
        # Bound connection fan-in via the JDBC writer's numPartitions
        # (the connector coalesces internally). NOT df.rdd probing:
        # touching .rdd under AQE finalizes the adaptive plan and runs
        # every upstream shuffle stage, after which the write recomputes
        # the lineage — the exact double-compute the reference was
        # criticized for (its .count() before .save()).
        (
            df.write.format("jdbc")
            .options(**self.config.jdbc_options())
            # quote_ident, matching the generated publish SQL: Spark
            # interpolates dbtable RAW into CREATE/INSERT, so an
            # unquoted mixed-case name would be case-FOLDED by Postgres
            # while snapshot_sql/merge_sql later read it quoted as
            # written — 'relation "MyStaging" does not exist' after the
            # full staging write. Quoting on both legs keeps the two
            # naming the same relation for any identifier.
            .option("dbtable", quote_ident(self.config.staging_table))
            .option("numPartitions", str(self.config.max_connections))
            .mode("overwrite")
            .option("truncate", "true")
            .save()
        )

    def sync(
        self,
        df: DataFrame,
        mode: str = "snapshot",
        merge_keys: Sequence[str] | None = None,
        geometry_cols: Sequence[str] | None = None,
    ) -> int:
        """Write ``df`` to staging, then publish. Returns the publish
        rowcount as reported by the executor — note drivers report the
        LAST statement of the multi-statement snapshot script (COMMIT →
        -1 under psycopg); inject an executor that splits statements if
        the INSERT count matters."""
        if mode == "merge" and not merge_keys:
            raise ValueError("Argument 'merge_keys' is required when mode='merge'.")
        if isinstance(merge_keys, str):
            # 'id' would splat into ['i', 'd'] below — at best a
            # misleading missing-column error, at worst (single-char
            # columns exist) a silent merge on the wrong key set
            raise TypeError(
                f"merge_keys must be a sequence of column names, got the "
                f"string {merge_keys!r} — pass [{merge_keys!r}]"
            )
        if mode not in ("snapshot", "merge"):
            raise ValueError(f"Unknown mode: {mode}")
        if self.config.staging_table == self.config.target_table:
            # snapshot mode would TRUNCATE the table and self-INSERT
            # zero rows — both the old target and the new data
            # destroyed, with a clean exit (merge mode at least fails
            # loudly on the duplicate relation)
            raise ValueError(
                f"staging_table and target_table are both "
                f"{self.config.target_table!r} — the snapshot publish "
                "would truncate the target and insert nothing"
            )
        geometry_cols = list(geometry_cols or [])
        # Fail BEFORE the staging write: a typo'd key/geometry/
        # update-type column would otherwise surface only at the
        # publish step, after the (potentially hours-long)
        # full-DataFrame JDBC write completed.
        required = [*(merge_keys or []), *geometry_cols]
        if mode == "merge":
            required.append(self.config.update_type_col)
        missing = [c for c in required if c not in df.columns]
        if missing:
            raise ValueError(
                f"column(s) {missing} not in the DataFrame "
                f"(columns: {df.columns})"
            )

        self._write_to_staging(df)
        if mode == "snapshot":
            sql = snapshot_sql(df.columns, self.config, geometry_cols)
        else:
            sql = merge_sql(df.columns, list(merge_keys), self.config, geometry_cols)
        return self._execute(sql)
