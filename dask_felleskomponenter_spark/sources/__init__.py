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
    dedup_against_history,
    history_exists,
    history_stats,
)

__all__ = [
    "TABLE_NAMES",
    "build_ann_store",
    "dedup_against_history",
    "history_exists",
    "history_stats",
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
