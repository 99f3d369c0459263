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

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_jdbc",
    "read_json",
    "register_views",
    "write_bucketed",
]
