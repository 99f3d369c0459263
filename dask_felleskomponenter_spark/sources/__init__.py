from dask_felleskomponenter_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
    write_bucketed,
)

from dask_felleskomponenter_spark.sources.files import (
    read_csv,
    read_jdbc,
    read_json,
)

from dask_felleskomponenter_spark.sources.ann_store import (
    build_ann_store,
    ensure_ann_store,
    load_ann_store,
)

from dask_felleskomponenter_spark.sources.dedup_store import (
    compact_history,
    dedup_against_history,
    history_exists,
    history_stats,
)

from dask_felleskomponenter_spark.sources.manifest import (
    df_checksum,
    verify_corpus_manifest,
    write_corpus_manifest,
)

__all__ = [
    "TABLE_NAMES",
    "build_ann_store",
    "compact_history",
    "dedup_against_history",
    "df_checksum",
    "history_exists",
    "history_stats",
    "verify_corpus_manifest",
    "write_corpus_manifest",
    "ensure_ann_store",
    "load_ann_store",
    "load_table",
    "load_tables",
    "read_csv",
    "read_jdbc",
    "read_json",
    "register_views",
    "write_bucketed",
]
