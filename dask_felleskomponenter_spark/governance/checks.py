"""Medallion-gated governance checks.

Fresh implementation of the reference's check chain
(``/root/reference/src/dask_felleskomponenter/governance/checks/table.py``)
with identical semantics:

- ``validate_table`` gates on a valid ``medaljongnivaa`` first and
  returns early when the gate fails (``table.py:236-240``);
- per-level chains (``table.py:214-233``): bronze = tittel, beskrivelse,
  sikkerhetsnivaa; silver adds emneord + begrep; gold adds hovedkategori,
  tilgangsnivaa and the per-column geometri_encoding check;
- each check folds ``(TableMetadata, context) -> context``;
- findings carry executable remedies (``table.py:17-46``): ``COMMENT ON
  TABLE`` for beskrivelse, ``ALTER TABLE ... SET TAGS`` otherwise, and
  ``SET TBLPROPERTIES ('columns.<col>.geometri_encoding' = ...)`` for
  column findings (``column.py:10-36``).

Identifiers are SQL-quoted with backticks in generated remedies — the
reference interpolates raw f-strings (SURVEY.md §4 injection hazard);
the message *shape* is otherwise kept.
"""

from __future__ import annotations

from collections.abc import Callable

from dask_felleskomponenter_spark.governance.codelists import (
    DEFAULT_REGISTRY,
    VALID_GEOMETRI_ENCODING,
    CodelistRegistry,
)
from dask_felleskomponenter_spark.governance.model import (
    MEDALJONGNIVAA,
    MetadataError,
    TableMetadata,
)

CheckFn = Callable[[TableMetadata, list[MetadataError]], list[MetadataError]]


def quote_ident(name: str | None) -> str:
    """Backtick-quote one SQL identifier part."""
    return "`" + str(name).replace("`", "``") + "`"


def _qualified(md: TableMetadata) -> str:
    return ".".join(quote_ident(p) for p in (md.catalog, md.schema, md.table))


def _field_error(
    md: TableMetadata,
    field: str,
    type_name: str,
    is_missing: bool,
    valid_values_description: str | None = None,
    valid_values="string",
) -> MetadataError:
    reason = "mangler" if is_missing else "er ugyldig"
    description = f"🔴 Feil: '{field}' {reason} i table properties. Type: <{type_name}>"
    if valid_values_description is not None:
        description += f" - {valid_values_description}"
    if field == "beskrivelse":
        solution = (
            f"COMMENT ON TABLE {_qualified(md)} IS '<<SETT_{field.upper()}_HER>>'"
        )
    else:
        # the reference emits Databricks-only ``SET TAGS`` here
        # (``table.py:35-36``); open Spark has no TAGS syntax, so the
        # executable remedy against the TBLPROPERTIES backend is:
        solution = (
            f"ALTER TABLE {_qualified(md)} SET TBLPROPERTIES "
            f"( '{field}' = '<<SETT_{field.upper()}_HER>>')"
        )
    return MetadataError(
        catalog=md.catalog,
        schema=md.schema,
        table=md.table,
        column=None,
        description=description,
        solution=solution,
        for_field=field,
        valid_values=valid_values,
    )


def make_presence_check(field: str) -> CheckFn:
    """Free-text field check: any non-None value passes
    (tittel/beskrivelse/emneord — ``table.py:49-80,152-168``)."""

    def check(md: TableMetadata, ctx: list[MetadataError]) -> list[MetadataError]:
        if getattr(md, field) is None:
            ctx.append(_field_error(md, field, "string", True))
        return ctx

    check.__name__ = f"check_{field}"
    return check


def make_codelist_check(
    field: str, type_name: str, registry: CodelistRegistry
) -> CheckFn:
    """Codelist-backed field check (tilgangsnivaa/sikkerhetsnivaa/
    hovedkategori/begrep — ``table.py:83-109,171-231``)."""

    def check(md: TableMetadata, ctx: list[MetadataError]) -> list[MetadataError]:
        value = getattr(md, field)
        if not registry.is_valid(field, value):
            valid = registry.get(field)
            # offline degradation (remote-backed codelist, no
            # remote_loader): registry.get returns None — the hint must
            # say the list is unavailable, not render Python's None as
            # "gyldige verdier: None"
            hint = (
                f"gyldige verdier: {valid}"
                if valid is not None
                else "gyldige verdier: (codelist ikke tilgjengelig uten "
                "remote_loader)"
            )
            ctx.append(
                _field_error(
                    md,
                    field,
                    type_name,
                    value is None,
                    hint,
                    valid_values=valid if valid is not None else "string",
                )
            )
        return ctx

    check.__name__ = f"check_{field}"
    return check


def check_medaljongnivaa(
    md: TableMetadata, ctx: list[MetadataError], registry: CodelistRegistry
) -> list[MetadataError]:
    """Gate check (``table.py:112-130``) against the registry's
    ``medaljongnivaa`` list — an injected override (custom levels) must
    actually gate here, not just sit in the registry unread."""
    levels = registry.get("medaljongnivaa") or list(MEDALJONGNIVAA)
    if md.medaljongnivaa not in levels:
        ctx.append(
            _field_error(
                md,
                "medaljongnivaa",
                "valør",
                md.medaljongnivaa is None,
                f"gyldige verdier: {levels}",
                valid_values=list(levels),
            )
        )
    return ctx


def check_geometri_encoding(
    md: TableMetadata, ctx: list[MetadataError]
) -> list[MetadataError]:
    """Per-column check (``column.py:10-36``): every column declaring an
    ``epsg`` code must declare a valid ``geometri_encoding`` (case-
    insensitive membership in WKT/WKB/GeoJson/S2)."""
    for column, props in (md.column_properties or {}).items():
        if props.get("epsg") is None:
            continue
        encoding = props.get("geometri_encoding") or ""  # key may hold None
        if encoding.lower() not in VALID_GEOMETRI_ENCODING:
            # the column name lands inside a SQL STRING literal in the
            # remedy: double any apostrophe so a column named geom'd
            # cannot terminate the literal (quote-everything contract)
            col_lit = column.replace("'", "''")
            ctx.append(
                MetadataError(
                    catalog=md.catalog,
                    schema=md.schema,
                    table=md.table,
                    column=column,
                    for_field="geometri_encoding",
                    valid_values=list(VALID_GEOMETRI_ENCODING),
                    description=(
                        "🔴 Feil: 'geometri_encoding' mangler i column "
                        "properties. Type: <geometri_encoding> - gyldige "
                        "verdier er WKT, WKB, GeoJson eller S2cell "
                    ),
                    solution=(
                        f"ALTER TABLE {_qualified(md)} SET TBLPROPERTIES "
                        f"( 'columns.{col_lit}.geometri_encoding' = "
                        f"'<<SETT_ROMLIG_REPRESENTASJONSTYPE_HER>>')"
                    ),
                )
            )
    return ctx


def checks_for_level(
    registry: CodelistRegistry | None = None,
) -> dict[str, list[CheckFn]]:
    """Per-medallion check chains (``table.py:214-233``)."""
    reg = registry or DEFAULT_REGISTRY
    tittel = make_presence_check("tittel")
    beskrivelse = make_presence_check("beskrivelse")
    emneord = make_presence_check("emneord")
    sikkerhet = make_codelist_check("sikkerhetsnivaa", "sikkerhetsniva", reg)
    tilgang = make_codelist_check("tilgangsnivaa", "tilgangsrestriksjoner", reg)
    hovedkategori = make_codelist_check(
        "hovedkategori", "tematisk-hovedkategori", reg
    )
    begrep = make_codelist_check("begrep", "nasjonal-temainndeling", reg)
    return {
        "bronze": [tittel, beskrivelse, sikkerhet],
        "silver": [tittel, beskrivelse, emneord, begrep, sikkerhet],
        "gold": [
            tittel,
            beskrivelse,
            hovedkategori,
            emneord,
            begrep,
            tilgang,
            sikkerhet,
            check_geometri_encoding,
        ],
    }


def validate_table(
    metadata: TableMetadata, registry: CodelistRegistry | None = None
) -> list[MetadataError]:
    """Run the medallion-appropriate chain (``table.py:236-245``)."""
    reg = registry or DEFAULT_REGISTRY
    ctx = check_medaljongnivaa(metadata, [], reg)
    if ctx:
        return ctx
    # Registry-overridden levels beyond bronze/silver/gold pass the gate
    # but have no built-in chain — run the strictest (gold) chain rather
    # than KeyError; callers defining custom levels extend
    # checks_for_level's dict with their own chains.
    chains = checks_for_level(reg)
    for check in chains.get(metadata.medaljongnivaa, chains["gold"]):
        ctx = check(metadata, ctx)
    return ctx


def get_mandatory_metadata_for_medaljongnivaa(
    medaljongnivaa: str,
    column_properties: dict | None = None,
    registry: CodelistRegistry | None = None,
) -> dict[str, MetadataError]:
    """Enumerate what a level requires by running its chain against an
    empty ``TableMetadata`` (``table.py:248-260``)."""
    out: dict[str, MetadataError] = {}
    reg = registry or DEFAULT_REGISTRY
    empty = TableMetadata(column_properties=column_properties or {})
    # The two entry points must agree on which levels are acceptable:
    # validate_table gates against the registry's medaljongnivaa list,
    # so enumeration must too — a typo'd level silently returning the
    # gold requirements would tell the caller a nonexistent level is
    # real. Registry-custom levels beyond bronze/silver/gold still
    # enumerate the strictest (gold) chain instead of KeyError.
    levels = reg.get("medaljongnivaa") or list(MEDALJONGNIVAA)
    if medaljongnivaa not in levels:
        raise ValueError(
            f"unknown medaljongnivaa {medaljongnivaa!r}; the registry "
            f"accepts {levels}"
        )
    chains = checks_for_level(reg)
    for check in chains.get(medaljongnivaa, chains["gold"]):
        findings = check(empty, [])
        if findings:
            out[findings[0].for_field] = findings[0]
    return out
