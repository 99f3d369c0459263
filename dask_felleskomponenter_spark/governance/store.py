"""Open metadata backend + ``Metadata`` entry point.

The reference reads table tags/comments from Databricks-proprietary
``system.information_schema`` views (``governance/main.py:13-62``). The
open rebuild stores governance tags as **table properties** on any
Spark-catalog table:

- table-level tags as plain property keys (``tittel``, ``emneord``, ...);
- the description under the standard ``comment`` property;
- per-column properties as ``columns.<col>.<prop>`` keys — exactly the
  shape the reference's own remedy SQL emits
  (``checks/column.py:32``: ``SET TBLPROPERTIES
  ('columns.<col>.geometri_encoding' = ...)``), so remedies are
  executable against this backend verbatim.

All identifiers are backtick-quoted and values are escaped — the
reference's f-string SQL (``main.py:17-22``) is an injection hazard
SURVEY.md §4 flags for repair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_felleskomponenter_spark.governance.checks import quote_ident, validate_table
from dask_felleskomponenter_spark.governance.codelists import CodelistRegistry
from dask_felleskomponenter_spark.governance.model import (
    INTERNAL_PREFIXES,
    MetadataError,
    TableMetadata,
)


def _parse_column_prop(key: str) -> tuple[str, str] | None:
    """Split a ``columns.<col>.<prop>`` property key into (col, prop),
    or None for a malformed key. The PROPERTY is the LAST dot-segment:
    property names are simple identifiers while column names may
    legally contain dots — partitioning on the first dot misattributed
    column ``a.b``'s tags to a column named ``a`` (and the tag then
    silently vanished from the column view). One definition shared by
    get_table_metadata and get_table_column_metadata so the two views
    can never disagree about which column owns a tag."""
    col, _, prop = key[len("columns.") :].rpartition(".")
    if not col or not prop:
        return None
    return col, prop


class TblPropertiesMetadataStore:
    """Governance tags on Spark table properties."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    # -- helpers -----------------------------------------------------------
    @staticmethod
    def _qualify(schema: str, table: str, catalog: str | None = None) -> str:
        # Three-part qualification when the caller names a catalog: the
        # schema.table form resolves in the session's CURRENT catalog,
        # which on a multi-catalog cluster can silently be a different
        # table than the one the metadata claims to describe.
        parts = ([quote_ident(catalog)] if catalog else []) + [
            quote_ident(schema), quote_ident(table),
        ]
        return ".".join(parts)

    @staticmethod
    def _quote_value(value: str) -> str:
        # Backslashes FIRST: Spark's default lexer treats backslash as
        # an escape inside string literals, so a value ending in '\'
        # (a Windows path) would swallow the closing quote and every
        # write path would die with PARSE_SYNTAX_ERROR — and doubling
        # them first guarantees no stray backslash ever precedes the
        # doubled quote.
        escaped = str(value).replace("\\", "\\\\").replace("'", "''")
        return "'" + escaped + "'"

    # -- writes ------------------------------------------------------------
    def set_tags(
        self,
        schema: str,
        table: str,
        tags: dict[str, str],
        catalog: str | None = None,
    ) -> None:
        # Writes take the same optional catalog as every read: without
        # it, an ALTER issued while the session's current catalog
        # differs from the one the metadata describes would land the
        # governance tags on the wrong table.
        if not tags:
            return
        pairs = ", ".join(
            f"{self._quote_value(k)} = {self._quote_value(v)}"
            for k, v in tags.items()
        )
        self.spark.sql(
            f"ALTER TABLE {self._qualify(schema, table, catalog)} "
            f"SET TBLPROPERTIES ({pairs})"
        )

    def set_comment(
        self,
        schema: str,
        table: str,
        comment: str,
        catalog: str | None = None,
    ) -> None:
        self.set_tags(schema, table, {"comment": comment}, catalog)

    def set_column_properties(
        self,
        schema: str,
        table: str,
        column: str,
        props: dict[str, str],
        catalog: str | None = None,
    ) -> None:
        # The read side (_parse_column_prop) takes the LAST dot-segment
        # as the property name so that DOTTED COLUMN names parse
        # correctly — which is only a safe convention if property names
        # never contain dots. Enforce that here at write time: a key
        # like 'tags.pii' on column 'a' would round-trip as property
        # 'pii' on a phantom column 'a.tags' and silently vanish from
        # column 'a'.
        for k in props:
            if "." in k:
                raise ValueError(
                    f"column property name {k!r} on "
                    f"{schema}.{table}.{column} contains '.' — property "
                    "names must be dot-free (the columns.<col>.<prop> "
                    "encoding reserves the last dot-segment for the "
                    "property, so a dotted name would silently "
                    "misattribute the tag to a phantom column)"
                )
        self.set_tags(
            schema,
            table,
            {f"columns.{column}.{k}": v for k, v in props.items()},
            catalog,
        )

    # -- reads -------------------------------------------------------------
    def get_properties(
        self, schema: str, table: str, catalog: str | None = None
    ) -> dict[str, str]:
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self._qualify(schema, table, catalog)}"
        ).collect()
        return {r["key"]: r["value"] for r in rows}

    def get_comment(
        self, schema: str, table: str, catalog: str | None = None
    ) -> str | None:
        # 'comment' is a reserved table property: SET TBLPROPERTIES routes
        # it to the table comment and SHOW TBLPROPERTIES hides it.
        # Backtick-quoted like every other identifier in the module
        # (catalog.getTable parses its argument as a multipart
        # identifier, so an unquoted dotted schema/table misresolves).
        tbl = self.spark.catalog.getTable(
            self._qualify(schema, table, catalog)
        )
        return tbl.description or None

    def get_table_metadata(
        self, catalog: str, schema: str, table: str
    ) -> TableMetadata:
        """Assemble ``TableMetadata`` the way the reference does from
        table_tags + comment (``main.py:13-45``), including the
        ``delta.*``/internal-key skip and the open optional-params bag."""
        props = self.get_properties(schema, table, catalog)
        keys: dict[str, str] = {}
        column_properties: dict[str, dict] = {}
        for k, v in props.items():
            if any(k.startswith(p) for p in INTERNAL_PREFIXES):
                continue
            if k.startswith("columns."):
                parsed = _parse_column_prop(k)
                if parsed:
                    col, prop = parsed
                    column_properties.setdefault(col, {})[prop] = v
                continue
            keys[k] = v
        beskrivelse = keys.pop("comment", None) or self.get_comment(
            schema, table, catalog
        )
        known = {
            f: keys.pop(f, None)
            for f in (
                "tittel",
                "tilgangsnivaa",
                "medaljongnivaa",
                "hovedkategori",
                "emneord",
                "epsg_koder",
                "begrep",
                "sikkerhetsnivaa",
            )
        }
        # Tags colliding with explicit constructor arguments (a user
        # setting 'beskrivelse' as a plain TBLPROPERTY, or pathological
        # 'catalog'/'schema'/'table' keys) must not become duplicate
        # keyword arguments: route them into optional_params under a
        # prefixed name and prefer the structured source.
        reserved = {
            "catalog", "schema", "table", "beskrivelse",
            "column_properties", "optional_params",
        }
        for r in sorted(reserved & keys.keys()):
            keys[f"tag.{r}"] = keys.pop(r)
        return TableMetadata(
            catalog=catalog,
            schema=schema,
            table=table,
            beskrivelse=beskrivelse,
            column_properties=column_properties,
            **{k: v for k, v in known.items() if v is not None},
            **keys,  # unknown tags land in optional_params
        )

    def get_table_column_metadata(
        self, catalog: str, schema: str, table: str
    ) -> DataFrame:
        """Columns × column-tags left join (J1 shape, ``main.py:47-62``)
        rebuilt over open sources: the table schema joined with the
        ``columns.*`` properties."""
        spark = self.spark
        fields = spark.table(self._qualify(schema, table, catalog)).schema.fields
        # Explicit DDL schema, not inference: with catalog=None (a
        # spelling _qualify and every other read/write accepts) the
        # all-None column cannot be inferred and createDataFrame dies
        # with CANNOT_DETERMINE_TYPE.
        cols_df = spark.createDataFrame(
            [
                (catalog, schema, table, f.name, f.dataType.simpleString(), i)
                for i, f in enumerate(fields)
            ],
            "table_catalog string, table_schema string, table_name string, "
            "column_name string, data_type string, ordinal_position int",
        )
        props = self.get_properties(schema, table, catalog)
        tag_rows = []
        for k, v in props.items():
            if k.startswith("columns."):
                parsed = _parse_column_prop(k)
                if parsed:
                    col, prop = parsed
                    tag_rows.append((catalog, schema, table, col, prop, v))
        tags_df = spark.createDataFrame(
            tag_rows,
            "catalog_name string, schema_name string, table_name2 string, "
            "column_name2 string, tag_name string, tag_value string",
        )
        # eqNullSafe on catalog: a None catalog is a legal spelling, and
        # NULL == NULL is NULL — a plain equality would drop EVERY tag
        # for catalog-less stores. column_name compares LOWERCASED:
        # Spark identifiers are case-insensitive, so a tag written as
        # 'NAVN' legitimately describes the schema's 'navn' field — a
        # case-sensitive join silently dropped it from this view while
        # get_table_metadata still showed it, and the two read views
        # must never disagree about which column owns a tag.
        joined = cols_df.join(
            tags_df,
            cols_df["table_catalog"].eqNullSafe(tags_df["catalog_name"])
            & (cols_df["table_schema"] == tags_df["schema_name"])
            & (cols_df["table_name"] == tags_df["table_name2"])
            & (
                F.lower(cols_df["column_name"])
                == F.lower(tags_df["column_name2"])
            ),
            "left",
        )
        return joined.drop("table_name2", "column_name2")


class Metadata:
    """Entry point mirroring the reference's ``Metadata`` class
    (``governance/main.py:8-68``), over the open property store."""

    def __init__(
        self,
        catalog: str,
        schema: str,
        table: str,
        spark: SparkSession | None = None,
        store: TblPropertiesMetadataStore | None = None,
        registry: CodelistRegistry | None = None,
    ) -> None:
        self.catalog = catalog
        self.schema = schema
        self.table = table
        if store is None:
            if spark is None:
                spark = SparkSession.builder.getOrCreate()
            store = TblPropertiesMetadataStore(spark)
        self.store = store
        self.registry = registry

    def get_table_metadata(self) -> TableMetadata:
        return self.store.get_table_metadata(self.catalog, self.schema, self.table)

    def get_table_column_metadata(self) -> DataFrame:
        return self.store.get_table_column_metadata(
            self.catalog, self.schema, self.table
        )

    def validate(self) -> list[MetadataError]:
        return validate_table(self.get_table_metadata(), self.registry)

    def validate_as_df(self) -> DataFrame:
        """Findings surfaced as a DataFrame for reporting pipelines."""
        return errors_to_df(self.store.spark, self.validate())


def errors_to_df(spark: SparkSession, errors: list[MetadataError]) -> DataFrame:
    """Materialize findings as a DataFrame (SURVEY.md §1.1 rebuild note:
    findings-as-DataFrame is the open reporting surface)."""
    rows = [
        (
            e.catalog,
            e.schema,
            e.table,
            e.column,
            e.description,
            e.solution,
            e.for_field,
            str(e.valid_values),
        )
        for e in errors
    ]
    schema = (
        "catalog string, schema string, table string, column string, "
        "description string, solution string, for_field string, valid_values string"
    )
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
