"""Sync pack: Postgres/PostGIS publish + pure-Spark MERGE twins (X2/X3)."""

from dask_felleskomponenter_spark.sync.merge import (
    merge_into_path,
    merge_upsert,
    snapshot_overwrite,
)
from dask_felleskomponenter_spark.sync.incremental import (
    refresh_incremental_summary,
    summary_with_avg,
)
from dask_felleskomponenter_spark.sync.postgres import (
    PostgresSyncManager,
    PostgresTargetConfig,
    merge_sql,
    quote_ident,
    snapshot_sql,
)

__all__ = [
    "PostgresSyncManager",
    "PostgresTargetConfig",
    "merge_into_path",
    "merge_upsert",
    "merge_sql",
    "quote_ident",
    "refresh_incremental_summary",
    "summary_with_avg",
    "snapshot_overwrite",
    "snapshot_sql",
]
