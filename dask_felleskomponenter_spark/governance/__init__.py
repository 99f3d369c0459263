from dask_felleskomponenter_spark.governance.erasure import erase_keys_parquet
from dask_felleskomponenter_spark.governance.model import (
    MEDALJONGNIVAA,
    CodelistEntry,
    MetadataError,
    TableMetadata,
)
from dask_felleskomponenter_spark.governance.codelists import (
    CODELIST_URLS,
    DEFAULT_REGISTRY,
    GEOMETRI_ENCODING,
    SIKKERHETSNIVAA,
    TILGANGSNIVAA,
    VALID_GEOMETRI_ENCODING,
    CodelistRegistry,
)
from dask_felleskomponenter_spark.governance.checks import (
    check_geometri_encoding,
    check_medaljongnivaa,
    checks_for_level,
    get_mandatory_metadata_for_medaljongnivaa,
    validate_table,
)
from dask_felleskomponenter_spark.governance.store import (
    Metadata,
    TblPropertiesMetadataStore,
    errors_to_df,
)

__all__ = [
    "erase_keys_parquet",
    "MEDALJONGNIVAA",
    "CodelistEntry",
    "MetadataError",
    "errors_to_df",
    "TableMetadata",
    "CODELIST_URLS",
    "DEFAULT_REGISTRY",
    "GEOMETRI_ENCODING",
    "SIKKERHETSNIVAA",
    "TILGANGSNIVAA",
    "VALID_GEOMETRI_ENCODING",
    "CodelistRegistry",
    "check_geometri_encoding",
    "check_medaljongnivaa",
    "checks_for_level",
    "get_mandatory_metadata_for_medaljongnivaa",
    "validate_table",
    "Metadata",
    "TblPropertiesMetadataStore",
]
